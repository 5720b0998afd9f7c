"""Minimal py_expression_eval shim: Parser().parse(expr) -> object with
.variables() and .evaluate(dict), implemented on Python's ast with a
whitelist (mirrors bayesian_optimization_tpu.utils.expr)."""
from bayesian_optimization_tpu.utils.expr import ConditionExpression


class _Expr:
    def __init__(self, expression: str):
        self._e = ConditionExpression(expression)

    def variables(self):
        return self._e.variables()

    def evaluate(self, values):
        return self._e.evaluate(values)


class Parser:
    def parse(self, expression: str) -> _Expr:
        return _Expr(expression)

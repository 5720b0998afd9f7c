"""Compute kernels: batched linear algebra, optimizers, acquisition math."""
from .optimize import maximize_restarts, minimize_restarts, to_box, from_box

__all__ = ["minimize_restarts", "maximize_restarts", "to_box", "from_box"]

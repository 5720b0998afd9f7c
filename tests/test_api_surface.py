"""Top-level API surface parity: every name in the reference's __all__
(ref: bayes_optim/__init__.py:25-51) must be importable from the package
root so migrating users find what they expect."""
import bayesian_optimization_tpu as pkg

REFERENCE_ALL = [
    "BO", "ParallelBO", "NoisyBO", "AnnealingBO", "MOBO", "Solution",
    "RandomForest", "GaussianProcess", "SearchSpace", "IntegerSpace",
    "RealSpace", "BoolSpace", "DiscreteSpace", "EI", "UCB", "PI", "MGFI",
    "fmin", "Integer", "Ordinal", "Real", "Bool", "Discrete", "trend",
]


def test_reference_all_importable():
    missing = [n for n in REFERENCE_ALL if not hasattr(pkg, n)]
    assert not missing, f"missing top-level names: {missing}"


def test_all_list_consistent():
    missing = [n for n in pkg.__all__ if not hasattr(pkg, n)]
    assert not missing, f"__all__ names not actually exported: {missing}"


def test_trend_module_contents():
    assert callable(pkg.trend.constant_trend)
    assert callable(pkg.trend.linear_trend)
    assert callable(pkg.trend.quadratic_trend)


def test_acquisition_classes_constructible():
    for cls in (pkg.EI, pkg.PI, pkg.UCB, pkg.MGFI, pkg.GEI, pkg.EpsilonPI):
        obj = cls(model=None)
        assert obj.minimize is True


def test_optim_exports():
    from bayesian_optimization_tpu.optim import (  # noqa: F401
        MIES, AcquisitionArgmax, OnePlusOne_Cholesky_CMA,
    )

"""Basis-expansion trend (prior mean) functions for universal/ordinary kriging.

Capability parity with the reference's trend module
(ref: bayes_optim/surrogate/gaussian_process/trend.py:10-151):
constant / linear / quadratic basis expansions with optional fixed
coefficients `beta` (beta=None => beta estimated by GLS inside the GP fit),
plus a nonparametric trend wrapping an arbitrary fitted regressor.

All basis functions are pure jittable maps X[N, d] -> F[N, p]; Jacobians
come from autodiff rather than the reference's hand-written ones.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class BasisExpansionTrend:
    """mean(X) = F(X) @ beta, with F a fixed basis expansion."""

    def __init__(self, dim: int, beta: Optional[np.ndarray] = None):
        self.dim = dim
        self.beta = None if beta is None else jnp.atleast_1d(jnp.asarray(beta, jnp.float32))

    @property
    def estimate_coefficients(self) -> bool:
        return self.beta is None

    def F(self, X: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def n_basis(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, X: jnp.ndarray) -> jnp.ndarray:
        if self.beta is None:
            raise ValueError("trend coefficients not set/estimated yet")
        beta = self.beta.reshape(self.n_basis, -1)
        return jnp.dot(self.F(X), beta, preferred_element_type=X.dtype)


class constant_trend(BasisExpansionTrend):
    """F(x) = [1] (ref parity: trend.py:69-91)."""

    @property
    def n_basis(self) -> int:
        return 1

    def F(self, X: jnp.ndarray) -> jnp.ndarray:
        return jnp.ones((X.shape[0], 1), dtype=X.dtype)


class linear_trend(BasisExpansionTrend):
    """F(x) = [1, x_1..x_d] (ref parity: trend.py:94-116)."""

    @property
    def n_basis(self) -> int:
        return 1 + self.dim

    def F(self, X: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([jnp.ones((X.shape[0], 1), X.dtype), X], axis=1)


class quadratic_trend(BasisExpansionTrend):
    """F(x) = [1, x_i, x_i x_j (i<=j)] (ref parity: trend.py:119-142)."""

    @property
    def n_basis(self) -> int:
        d = self.dim
        return 1 + d + d * (d + 1) // 2

    def F(self, X: jnp.ndarray) -> jnp.ndarray:
        n, d = X.shape
        iu, ju = np.triu_indices(d)
        cross = X[:, iu] * X[:, ju]
        return jnp.concatenate([jnp.ones((n, 1), X.dtype), X, cross], axis=1)


class NonparametricTrend:
    """Prior mean from a fitted regressor with .predict: the GP subtracts
    m(X) before fitting (residual / simple kriging) and adds it back in
    predict (ref parity: trend.py:145-151 — the reference's version is
    constructed but never consumed by its GPR; here it is functional).

    Construct with a fitted model, or reference-style with (X, y) to fit a
    20-tree random forest (our XLA-traversed RandomForest, so the prior
    also works inside fused jitted acquisition programs)."""

    def __init__(self, model, y=None):
        if y is not None:  # reference-style NonparametricTrend(X, y)
            from .random_forest import RandomForest

            X = np.asarray(model, dtype=float)
            model = RandomForest(n_estimators=20, feature_space="embedding")
            model.fit(X, np.asarray(y, dtype=float))
        self.model = model
        self.beta = jnp.zeros(0)

    @property
    def estimate_coefficients(self) -> bool:
        return False

    def __call__(self, X) -> jnp.ndarray:
        out = np.asarray(self.model.predict(np.asarray(X)))
        return jnp.asarray(out.reshape(X.shape[0], -1))


TRENDS = {"constant": constant_trend, "linear": linear_trend, "quadratic": quadratic_trend}

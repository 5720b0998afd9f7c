"""Pareto-dominance utilities, batched in JAX.

Capability parity with the reference's vendored torch utilities
(ref: bayes_optim/utils/multi_objective/pareto.py — `is_non_dominated`:82+,
`fast_non_dominated_sort` NSGA-II:36) re-implemented as fixed-shape array
programs (convention here: MAXIMIZATION, matching the reference/BoTorch).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def is_non_dominated(Y, deduplicate: bool = True) -> jnp.ndarray:
    """Boolean mask of the non-dominated (maximal) rows of Y[n, m].

    A point is dominated if another point is >= in every objective and > in
    at least one. With `deduplicate`, only the first of identical rows is
    kept (ref parity: pareto.py:82+).
    """
    Y = jnp.asarray(Y)
    n = Y.shape[0]
    ge = jnp.all(Y[:, None, :] >= Y[None, :, :], axis=-1)  # i >= j
    gt = jnp.any(Y[:, None, :] > Y[None, :, :], axis=-1)
    dominates = ge & gt  # [i, j]: i dominates j
    dominated = jnp.any(dominates, axis=0)
    if deduplicate:
        eq = jnp.all(Y[:, None, :] == Y[None, :, :], axis=-1)
        earlier = jnp.tril(jnp.ones((n, n), bool), k=-1)
        dup = jnp.any(eq & earlier, axis=1)
        return ~dominated & ~dup
    return ~dominated


def fast_non_dominated_sort(Y) -> np.ndarray:
    """NSGA-II front ranks (0 = best front) for maximization
    (ref parity: pareto.py:36)."""
    Y = np.asarray(Y, dtype=float)
    n = len(Y)
    ge = np.all(Y[:, None, :] >= Y[None, :, :], axis=-1)
    gt = np.any(Y[:, None, :] > Y[None, :, :], axis=-1)
    dom = ge & gt  # i dominates j
    n_dominators = dom.sum(axis=0).astype(int)
    rank = np.full(n, -1, dtype=int)
    current, r = np.where(n_dominators == 0)[0], 0
    while len(current):
        rank[current] = r
        for i in current:
            n_dominators[dom[i]] -= 1
        n_dominators[current] = -1
        current = np.where(n_dominators == 0)[0]
        r += 1
    return rank

"""Constraint penalties and box handling, batched in JAX.

Capability parity with the reference's penalty helpers
(ref: bayes_optim/utils/utils.py:108-146 reflective box transform,
:272-344 dynamic penalty), re-written as vectorized jittable functions that
act on whole candidate populations at once.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def reflect_into_box(x: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """Mirror out-of-box coordinates back inside [lo, hi]
    (ref parity: utils/utils.py:108-146, Rui Li's alg. 6)."""
    lo = jnp.asarray(lo, x.dtype)
    hi = jnp.asarray(hi, x.dtype)
    width = jnp.maximum(hi - lo, 1e-30)
    y = jnp.mod(x - lo, 2.0 * width)
    y = jnp.where(y > width, 2.0 * width - y, y)
    return lo + y


def dynamic_penalty(
    h_vals: Optional[jnp.ndarray],
    g_vals: Optional[jnp.ndarray],
    t,
    C: float = 0.5,
    alpha: float = 1.0,
    beta: float = 2.0,
    epsilon: float = 0.01,
    minimize: bool = True,
) -> jnp.ndarray:
    """(t*C)^alpha * [sum|h| (where |h|>eps) + sum max(0,g)^beta], batched
    over the leading axis of h_vals/g_vals (ref parity: utils/utils.py:272-344)."""
    parts = []
    if h_vals is not None:
        h_vals = jnp.atleast_2d(h_vals)
        viol = jnp.abs(h_vals)
        parts.append(jnp.sum(jnp.where(viol > epsilon, viol, 0.0), axis=-1))
    if g_vals is not None:
        g_vals = jnp.atleast_2d(g_vals)
        parts.append(jnp.sum(jnp.maximum(g_vals, 0.0) ** beta, axis=-1))
    if not parts:
        return jnp.zeros(())
    total = sum(parts)
    p = (jnp.asarray(t, total.dtype) * C) ** alpha * total
    return p if minimize else -p


def eval_constraints_host(x, h: Optional[Callable], g: Optional[Callable]):
    """Host-side evaluation of black-box constraint callables on one point;
    returns (h_vals, g_vals) as float arrays (or None)."""
    hv = np.atleast_1d(np.asarray(h(x), dtype=float)) if h is not None else None
    gv = np.atleast_1d(np.asarray(g(x), dtype=float)) if g is not None else None
    return hv, gv

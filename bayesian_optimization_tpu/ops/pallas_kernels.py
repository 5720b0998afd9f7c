"""Pallas TPU kernels for the GP hot path.

The kernel (correlation) matrix build is the inner-loop op of every
likelihood evaluation and posterior predict: r2[i,j] = sum_d theta_d
(x_i,d - y_j,d)^2 followed by the Matern/RBF map. The XLA path
(models/kernels.py) computes it as matmul + elementwise; this Pallas
version fuses the distance matmul with the kernel map per (128, 128) VMEM
tile — one HBM read of X/Y per tile pair, the kernel map applied in VMEM
before the tile is written back, no (N, M) intermediate r2 array in HBM.

Use `matern_pallas(theta, X, Y, nu)`; it requires tile-aligned shapes
(rows/cols multiples of 128, which the GP's bucket padding provides at
n >= 128) and falls back to the XLA path otherwise via `kernel_matrix`.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _matern_tile_kernel(nu: float, sym: bool):
    sqrt3 = math.sqrt(3.0)
    sqrt5 = math.sqrt(5.0)

    def kernel(xs_ref, ys_ref, out_ref):
        # xs: (TILE, D) pre-scaled by sqrt(theta); ys: (TILE, D)
        xs = xs_ref[:]
        ys = ys_ref[:]
        xx = jnp.sum(xs * xs, axis=-1, keepdims=True)        # (T, 1)
        yy = jnp.sum(ys * ys, axis=-1, keepdims=True).T      # (1, T)
        cross = jax.lax.dot_general(
            xs, ys,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        r2 = jnp.maximum(xx + yy - 2.0 * cross, 0.0)
        if sym:
            # zero the global diagonal (exact unit diagonal added below)
            i = pl.program_id(0)
            j = pl.program_id(1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) + i * TILE
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1) + j * TILE
            diag = row_ids == col_ids
            r2 = jnp.where(diag, 0.0, r2)
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        if nu == 0.5:
            k = jnp.exp(-r)
        elif nu == 1.5:
            s = sqrt3 * r
            k = (1.0 + s) * jnp.exp(-s)
        elif nu == 2.5:
            s = sqrt5 * r
            k = (1.0 + s + s * s / 3.0) * jnp.exp(-s)
        else:  # rbf
            k = jnp.exp(-r2)
        if sym:
            k = jnp.where(diag, 1.0, k)
        out_ref[:] = k

    return kernel


@partial(jax.jit, static_argnames=("nu", "sym", "interpret"))
def matern_pallas(theta, X, Y=None, nu: float = 1.5, sym: bool = None, interpret: bool = False):
    """Fused Matern kernel matrix on TPU tiles. X: (N, D), Y: (M, D);
    N and M must be multiples of 128. `sym=True` sets an exact unit
    diagonal (training covariance)."""
    if sym is None:
        sym = Y is None
    Yv = X if Y is None else Y
    theta = jnp.broadcast_to(jnp.atleast_1d(theta), (X.shape[-1],)).astype(X.dtype)
    scale = jnp.sqrt(jnp.maximum(theta, 0.0))
    Xs = X * scale
    Ys = Yv * scale
    N, D = Xs.shape
    M = Ys.shape[0]
    grid = (N // TILE, M // TILE)
    return pl.pallas_call(
        _matern_tile_kernel(nu, sym),
        out_shape=jax.ShapeDtypeStruct((N, M), X.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, D), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=interpret,
    )(Xs, Ys)


def pallas_available() -> bool:
    """Compiled Pallas requires a real TPU backend."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

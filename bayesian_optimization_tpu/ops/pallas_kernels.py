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
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128

_VMEM_CAP = None


def _wf_vmem_cap() -> int:
    """Scoped-VMEM cap for the whiten/factor kernel: the env override wins,
    otherwise derive from the chip generation — v4+ parts have >=64 MB of
    physical VMEM, pre-v4 only 16 MB, where a raised cap fails at compile
    time (round-4 ADVICE)."""
    global _VMEM_CAP
    if _VMEM_CAP is None:
        env = os.environ.get("BOTPU_WF_VMEM_BYTES")
        if env:
            _VMEM_CAP = int(env)
        else:
            kind = ""
            try:
                kind = jax.devices()[0].device_kind.lower()
            except Exception:  # pragma: no cover - backend init failure
                pass
            import re

            m = re.search(r"v(\d+)", kind)
            gen = int(m.group(1)) if m else 0
            _VMEM_CAP = (64 if gen >= 4 else 16) * 1024 * 1024
    return _VMEM_CAP


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


# ---------------------------------------------------------------------------
# Fused blocked Cholesky factor + forward solve: the GP-likelihood linear
# algebra as ONE kernel launch.
#
# Why: the XLA path (ops/linalg._factor + tri_solve_lower) is a
# lax.fori_loop whose unblocked 128-column Cholesky is a ~128-deep chain of
# tiny ops per panel — ~1.1k sequential device ops per likelihood eval.
# Each op is microseconds of compute but pays sequential dispatch, and the
# MLE ladder runs hundreds of evals per fit: measured on the bench shapes
# (n=1000, d=5), the warm fit was ~2.4 s of wall for ~ms of MXU work.
# Moving the whole factorization INSIDE one Pallas program keeps the
# column recurrence on-core (VMEM-resident, no dispatch between steps):
# the panel GEMMs hit the MXU via jnp.dot, the column sweep runs on the
# VPU, and the host sees a single launch.
#
# VMEM budget: R (n^2), L (n^2), B/W (n*mb), Dinv (n*128) in f32 — fits
# comfortably for n <= 1024 (the GP's bucket sizes 128..1024); larger
# buckets fall back to the XLA path in ops/linalg.whiten.
# ---------------------------------------------------------------------------


def _chol128_inkernel(S, dtype):
    """128x128 Cholesky + explicit inverse on VMEM values; returns
    (L, L_inv, min_raw_pivot). Pallas TPU cannot lower dynamic_slice on
    VALUES, so row/column extraction and the column write-back run as
    one-hot matmuls (MXU) and masked selects (VPU) — fixed shapes only;
    all masks are 2-D (TPU iota constraint)."""
    T = S.shape[0]
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)  # row index (T,1)

    def body(j, carry):
        L, piv = carry
        ej = (iota_col == j).astype(dtype)               # (T,1) one-hot j
        mask_lt = (iota_col < j).astype(dtype)           # (T,1)
        rowj = jnp.dot(ej.T, L, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)   # (1,T) row j
        rj = rowj * mask_lt.T                            # (1,T)
        sj = jnp.dot(S, ej, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)       # (T,1) col j
        sjj = jnp.dot(ej.T, sj, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)[0, 0]
        raw = sjj - jnp.dot(rj, rj.T, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)[0, 0]
        d = jnp.sqrt(jnp.maximum(raw, 1e-12))
        c = (sj - jnp.dot(L, rj.T, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)) / d
        colv = jnp.where(iota_col == j, d, jnp.where(iota_col > j, c, 0.0))
        # write column j: zero it, then add colv e_j^T
        L = L * (1.0 - ej.T) + jnp.dot(colv.astype(dtype), ej.T,
                                       preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
        return L, jnp.minimum(piv, raw)

    L, piv = jax.lax.fori_loop(
        0, T, body, (jnp.zeros((T, T), dtype), jnp.asarray(jnp.inf, dtype))
    )
    # inverse by nilpotent squaring: L = D(I+S'), (I+S')^-1 = prod(I+(-S')^2^k)
    dinv = 1.0 / jnp.sum(L * jnp.eye(T, dtype=dtype), axis=1, keepdims=True)
    N = L * dinv  # rows scaled: D^-1 L = I + S'
    eye = jnp.eye(T, dtype=dtype)
    Tm = eye - N
    Rm = eye + Tm
    P = Tm
    for _ in range(6):  # log2(128) - 1
        P = jnp.dot(P, P, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)
        Rm = Rm + jnp.dot(Rm, P, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
    L_inv = Rm * dinv.T  # scale columns by D^-1
    return L, L_inv, piv


def _whiten_fused_kernel(R_ref, B_ref, L_ref, W_ref, piv_ref, Dinv_ref):
    """Fused factor+solve working in-place on L/W after an initial VMEM
    copy from R/B (columns are overwritten left-to-right, and panel k only
    ever reads columns >= kb of the original R — still intact — plus
    already-written L columns < kb). The copy replaced
    `input_output_aliases`: donating the input buffers mis-executed on the
    real TPU whenever the input's ONLY consumer was this kernel (the
    hybrid factorization's Schur panels at n > 1024 came back NaN; any
    second consumer of S made the same program correct — an XLA donation
    hazard, not a kernel bug). Separate buffers cost ~4.5 MB more VMEM at
    n = 1024, within the raised 64 MB cap below. All cross-panel products
    accumulate per 128-wide panel so no (n, n) value or mask is ever
    materialized."""
    L_ref[:] = R_ref[:]
    W_ref[:] = B_ref[:]
    n = L_ref.shape[0]
    nb = n // TILE
    dtype = L_ref.dtype
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)   # (n, 1) row ids
    col_T = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)  # (1, T)

    def panel(k, piv):
        kb = k * TILE

        # C = A[:, kb:kb+T] - sum_{j<k} L[:, j] @ L[kb, j].T  (n, T);
        # rows >= kb+T are the true Schur panel, rows kb..kb+T hold S,
        # rows < kb are garbage from R's upper triangle (masked below)
        def accC(j, Cv):
            jb = j * TILE
            Lj = L_ref[:, pl.ds(jb, TILE)]                   # (n, T)
            Lkj = L_ref[pl.ds(kb, TILE), pl.ds(jb, TILE)]    # (T, T)
            return Cv - jnp.dot(Lj, Lkj.T, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)

        C = jax.lax.fori_loop(0, k, accC, L_ref[:, pl.ds(kb, TILE)])
        E = (row_n == col_T + kb).astype(dtype)              # (n, T) one-hot rows
        S = jnp.dot(E.T, C, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)    # (T, T) diag block
        Ljj, Ljj_inv, pk = _chol128_inkernel(S, dtype)
        P = jnp.dot(C, Ljj_inv.T, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)
        P = P * (row_n >= kb + TILE).astype(dtype)
        L_ref[:, pl.ds(kb, TILE)] = P + jnp.dot(
            E, Ljj, preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        Dinv_ref[pl.ds(kb, TILE), :] = Ljj_inv
        return jnp.minimum(piv, pk)

    piv = jax.lax.fori_loop(0, nb, panel, jnp.asarray(jnp.inf, dtype))
    piv_ref[0, 0] = piv

    # forward substitution in place: W starts as B (aliased)
    def solve(k, _):
        kb = k * TILE

        def accB(j, Bv):
            jb = j * TILE
            Lkj = L_ref[pl.ds(kb, TILE), pl.ds(jb, TILE)]    # (T, T)
            Wj = W_ref[pl.ds(jb, TILE), :]                   # (T, mb)
            return Bv - jnp.dot(Lkj, Wj, preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)

        Bk = jax.lax.fori_loop(0, k, accB, W_ref[pl.ds(kb, TILE), :])
        W_ref[pl.ds(kb, TILE), :] = jnp.dot(
            Dinv_ref[pl.ds(kb, TILE), :], Bk, preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, nb, solve, 0)


@partial(jax.jit, static_argnames=("interpret",))
def whiten_fused(R, B, interpret: bool = False):
    """One-launch (d, W, piv, L, Dinv) for SPD R = L L^T and W = L^-1 B.

    Requires n % 128 == 0 and pads B's column count to the f32 lane tile.
    Returns Dinv as (nb, 128, 128) to match ops/linalg._factor's layout.
    """
    n = R.shape[0]
    mb = B.shape[1]
    # pad B columns to a 128-lane tile for clean VMEM layout
    mb_pad = max(128, ((mb + 127) // 128) * 128)
    Bp = jnp.zeros((n, mb_pad), R.dtype).at[:, :mb].set(B)
    L, W, piv, Dinv = pl.pallas_call(
        _whiten_fused_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), R.dtype),        # L (copied from R)
            jax.ShapeDtypeStruct((n, mb_pad), R.dtype),   # W (copied from B)
            jax.ShapeDtypeStruct((1, 1), R.dtype),
            jax.ShapeDtypeStruct((n, TILE), R.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        # the default 16 MB scoped-VMEM cap is 0.5 MB short when this kernel
        # runs batched under vmap (the hybrid factorization's superpanels
        # inside the multi-restart MLE ladder, e.g. 6 restarts x n=2048);
        # raise the cap only on chips that physically have the VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_wf_vmem_cap()),
        interpret=interpret,
    )(R, Bp)
    nb = n // TILE
    return (
        jnp.diagonal(L),
        W[:, :mb],
        piv[0, 0],
        L,
        Dinv.reshape(nb, TILE, TILE),
    )

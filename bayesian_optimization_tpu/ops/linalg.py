"""Compact TPU Cholesky: factor + explicit triangular inverse as GEMMs.

Why this exists: XLA's CholeskyExpander/TriangularSolveExpander generate
enormous per-call-site TPU code — measured here, one jnp.linalg.cholesky at
n=1024 is 6.9 MB of generated code and its gradient 17.4 MB, which ballooned
the fused GP-fit program to ~200 MB (slow to compile AND slow to ship through
the remote-TPU tunnel, where executable upload dominates cold-start). The
reference implementation hits the same operations through LAPACK
(ref: bayes_optim/surrogate/gaussian_process/gpr.py:790-811) — on TPU the
idiomatic replacement is a fixed-shape blocked algorithm whose code size is
O(1) in n:

- `chol_and_inv(R)` returns (L, L_inv, min_pivot) for SPD R — min_pivot
  is the smallest raw Cholesky pivot BEFORE clamping; callers MUST treat
  min_pivot <= ~0 as a failed factorization (the GP likelihood folds it
  into its 1e12 penalty). Structure:
  * panel loop (`lax.fori_loop`, n/128 iterations) with an unblocked
    128-wide Cholesky (`fori_loop` over columns) per diagonal block;
  * explicit L^-1 via the block-nilpotent identity: with D the block
    diagonal of L and N = D^-1 L (unit block triangular, S = N - I
    nilpotent with S^(n/128) = 0),  N^-1 = prod_k (I + (-S)^(2^k)) —
    log2(n/128) squaring rounds of full-size matmuls on the MXU;
  * a closed-form custom VJP (Iain Murray, "Differentiation of the
    Cholesky decomposition", 2016, eq. 8 plus the d(L^-1) term), all GEMMs
    against the saved L_inv — no triangular-solve expansion anywhere in
    the backward pass either.

`whiten(R, B)` likewise returns (diag_L, L^-1 B, min_pivot), dispatching
to the single-launch Pallas kernel (ops/pallas_kernels.whiten_fused) on
TPU for 128 <= n <= 1024 and to the blocked XLA path elsewhere.
With L_inv explicit, every downstream whitening solve (L^-1 y, L^-1 F,
L^-T rho) is a plain matmul. Accuracy: an explicit triangular inverse is
not backward-stable for ill-conditioned L, but the GP likelihood already
guards non-finite values and escalates the nugget (models/gp.py), and the
posterior path has used an explicit L_inv since round 1 (models/likelihood
.PosteriorState). Validated against jnp.linalg.cholesky to ~1e-5 relative
on representative kernel matrices (tests/test_linalg.py).
"""
from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

BLOCK = 128


def _chol_unblocked(S: jnp.ndarray):
    """Cholesky of a small SPD block by the Cholesky-Banachiewicz column
    sweep as a fori_loop — O(1) generated code, vectorizes under vmap.

    Returns (L, min_pivot) where min_pivot is the smallest raw pivot
    sjj - rj.rj BEFORE clamping: the clamp keeps an indefinite pivot from
    cascading into overflow/NaN in the nilpotent-squaring inverse, but a
    clamped factorization is WRONG — callers must treat min_pivot <= ~0 as
    a failed factorization (the GP likelihood folds it into its 1e12
    penalty so nugget escalation still fires; advisor finding r2)."""
    b = S.shape[-1]
    iota = jnp.arange(b)

    def body(j, carry):
        L, piv = carry
        row = jax.lax.dynamic_slice(L, (j, 0), (1, b))[0]
        rj = row * (iota < j).astype(S.dtype)
        sjj = jax.lax.dynamic_slice(S, (j, j), (1, 1))[0, 0]
        raw = sjj - jnp.dot(rj, rj)
        d = jnp.sqrt(jnp.maximum(raw, 1e-12))
        scol = jax.lax.dynamic_slice(S, (0, j), (b, 1))[:, 0]
        c = (scol - L @ rj) / d
        col = jnp.where(iota == j, d, jnp.where(iota > j, c, 0.0))
        return (
            jax.lax.dynamic_update_slice(L, col[:, None], (0, j)),
            jnp.minimum(piv, raw),
        )

    init = (jnp.zeros_like(S), jnp.asarray(jnp.inf, S.dtype))
    return jax.lax.fori_loop(0, b, body, init)


def _tri_inv_unblocked(L: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a small lower-triangular block via nilpotent squaring:
    L = D(I + S) with S strictly lower => (I + S)^-1 = prod (I + (-S)^(2^k)).
    log2(b) rounds of (b, b) matmuls — no TriangularSolveExpander code."""
    b = L.shape[-1]
    dinv = 1.0 / jnp.diagonal(L)
    N = L * dinv[:, None]
    eye = jnp.eye(b, dtype=L.dtype)
    T = eye - N  # == -S, strictly lower
    R = eye + T
    P = T
    for _ in range(max(0, int(math.ceil(math.log2(b))) - 1)):
        P = P @ P
        R = R + R @ P
    return R * dinv[None, :]


def _block_diag_apply(Binv: jnp.ndarray, L: jnp.ndarray, side: str) -> jnp.ndarray:
    """Multiply by a block-diagonal matrix stored as (nb, b, b) batches."""
    n = L.shape[-1]
    nb, b = Binv.shape[0], Binv.shape[1]
    if side == "left":  # D^-1 @ L : scale row blocks
        return jnp.einsum("kij,kjn->kin", Binv, L.reshape(nb, b, n)).reshape(n, n)
    # L @ D^-1 : scale column blocks
    return jnp.einsum("nkj,kji->nki", L.reshape(n, nb, b), Binv).reshape(n, n)


def _chol_and_inv_impl(R: jnp.ndarray):
    # full f32 accumulation throughout: on TPU the default matmul precision
    # runs bf16 passes, which corrupts triangular factors/inverses
    with jax.default_matmul_precision("highest"):
        return _chol_and_inv_hi(R)


def _chol_and_inv_hi(R: jnp.ndarray):
    n = R.shape[-1]
    dtype = R.dtype
    if n <= BLOCK:
        L, piv = _chol_unblocked(R)
        return L, _tri_inv_unblocked(L), piv
    assert n % BLOCK == 0, f"chol_and_inv requires n % {BLOCK} == 0, got {n}"
    nb = n // BLOCK
    iota = jnp.arange(n)

    def panel(j, carry):
        L, piv = carry
        jb = j * BLOCK
        colmask = (iota < jb).astype(dtype)
        Lrow = jax.lax.dynamic_slice(L, (jb, 0), (BLOCK, n)) * colmask[None, :]
        S = jax.lax.dynamic_slice(R, (jb, jb), (BLOCK, BLOCK)) - Lrow @ Lrow.T
        Ljj, pj = _chol_unblocked(S)
        Ljj_inv = _tri_inv_unblocked(Ljj)
        Rcol = jax.lax.dynamic_slice(R, (0, jb), (n, BLOCK))
        C = Rcol - (L * colmask[None, :]) @ Lrow.T
        P = (C @ Ljj_inv.T) * (iota >= jb + BLOCK).astype(dtype)[:, None]
        P = jax.lax.dynamic_update_slice(P, Ljj, (jb, 0))
        return jax.lax.dynamic_update_slice(L, P, (0, jb)), jnp.minimum(piv, pj)

    L, piv = jax.lax.fori_loop(
        0, nb, panel, (jnp.zeros_like(R), jnp.asarray(jnp.inf, dtype))
    )

    # explicit inverse: block-nilpotent squaring over the block structure
    diag_blocks = jnp.stack([
        jax.lax.dynamic_slice(L, (k * BLOCK, k * BLOCK), (BLOCK, BLOCK))
        for k in range(nb)
    ])
    Dinv = jax.vmap(_tri_inv_unblocked)(diag_blocks)  # (nb, b, b)
    N = _block_diag_apply(Dinv, L, "left")  # unit block-lower
    eye = jnp.eye(n, dtype=dtype)
    T = eye - N  # -S, strictly block-lower, T^(nb) = 0 off the identity part
    Rm = eye + T
    P = T
    for _ in range(max(0, int(math.ceil(math.log2(nb))) - 1)):
        P = P @ P
        Rm = Rm + Rm @ P
    L_inv = _block_diag_apply(Dinv, Rm, "right")
    return L, L_inv, piv


@jax.custom_vjp
def chol_and_inv(R: jnp.ndarray):
    """(L, L_inv, min_pivot) of SPD R with O(1)-size generated code and a
    GEMM-only VJP. min_pivot <= ~0 means the clamped factorization is wrong
    (see _chol_unblocked) — callers must check it, not assume SPD."""
    return _chol_and_inv_impl(R)


def _fwd(R):
    L, L_inv, piv = _chol_and_inv_impl(R)
    return (L, L_inv, piv), (L, L_inv)


def _bwd(res, cots):
    L, Li = res
    Lb, Lib, _pivb = cots  # min_pivot is a diagnostic: no gradient flow
    with jax.default_matmul_precision("highest"):
        # cotangent contribution of L_inv: d(L^-1) = -L^-1 dL L^-1
        Lb_total = jnp.tril(Lb) - jnp.tril(Li.T @ Lib @ Li.T)
        M = L.T @ Lb_total
        Phi = jnp.tril(M) - 0.5 * jnp.diag(jnp.diagonal(M))
        Rb = Li.T @ Phi @ Li
        return (0.5 * (Rb + Rb.T),)


chol_and_inv.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# factor + solve without the full inverse: the likelihood hot path.
# One likelihood eval needs L^-1 [Y F] (a handful of columns) and diag(L);
# materializing the full L^-1 per eval costs ~6 extra full-size GEMMs of
# code and FLOPs per call site. `whiten` factors once and forward-
# substitutes block-wise — O(1) generated code — with a custom VJP built
# from the same blocked solves (GEMM-only, no expander code, no O(n^2)
# scan residuals).
# ---------------------------------------------------------------------------


def _factor(R: jnp.ndarray):
    """Blocked Cholesky returning (L, Dinv, min_pivot) where Dinv stacks the
    inverses of the 128-wide diagonal blocks of L (free by-products of the
    panel loop, reused by every subsequent triangular solve) and min_pivot
    is the smallest raw pivot before clamping (see _chol_unblocked)."""
    n = R.shape[-1]
    dtype = R.dtype
    if n <= BLOCK:
        L, piv = _chol_unblocked(R)
        return L, _tri_inv_unblocked(L)[None], piv
    assert n % BLOCK == 0, f"_factor requires n % {BLOCK} == 0, got {n}"
    nb = n // BLOCK
    iota = jnp.arange(n)

    def panel(j, carry):
        L, Dinv, piv = carry
        jb = j * BLOCK
        colmask = (iota < jb).astype(dtype)
        Lrow = jax.lax.dynamic_slice(L, (jb, 0), (BLOCK, n)) * colmask[None, :]
        S = jax.lax.dynamic_slice(R, (jb, jb), (BLOCK, BLOCK)) - Lrow @ Lrow.T
        Ljj, pj = _chol_unblocked(S)
        Ljj_inv = _tri_inv_unblocked(Ljj)
        Rcol = jax.lax.dynamic_slice(R, (0, jb), (n, BLOCK))
        C = Rcol - (L * colmask[None, :]) @ Lrow.T
        P = (C @ Ljj_inv.T) * (iota >= jb + BLOCK).astype(dtype)[:, None]
        P = jax.lax.dynamic_update_slice(P, Ljj, (jb, 0))
        return (
            jax.lax.dynamic_update_slice(L, P, (0, jb)),
            jax.lax.dynamic_update_slice(Dinv, Ljj_inv[None], (j, 0, 0)),
            jnp.minimum(piv, pj),
        )

    L0 = jnp.zeros_like(R)
    D0 = jnp.zeros((nb, BLOCK, BLOCK), dtype)
    piv0 = jnp.asarray(jnp.inf, dtype)
    return jax.lax.fori_loop(0, nb, panel, (L0, D0, piv0))


def tri_solve_lower(L: jnp.ndarray, Dinv: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L X = B by blocked forward substitution (compact fori_loop)."""
    n = L.shape[-1]
    nb = Dinv.shape[0]
    b = n // nb
    iota = jnp.arange(n)
    dtype = L.dtype

    def body(j, X):
        jb = j * b
        colmask = (iota < jb).astype(dtype)
        Lrow = jax.lax.dynamic_slice(L, (jb, 0), (b, n)) * colmask[None, :]
        Bj = jax.lax.dynamic_slice(B, (jb, 0), (b, B.shape[1])) - Lrow @ X
        Xj = jax.lax.dynamic_index_in_dim(Dinv, j, keepdims=False) @ Bj
        return jax.lax.dynamic_update_slice(X, Xj, (jb, 0))

    return jax.lax.fori_loop(0, nb, body, jnp.zeros_like(B))


def tri_solve_upper_t(L: jnp.ndarray, Dinv: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T X = B by blocked backward substitution (compact)."""
    n = L.shape[-1]
    nb = Dinv.shape[0]
    b = n // nb
    iota = jnp.arange(n)
    dtype = L.dtype

    def body(i, X):
        j = nb - 1 - i
        jb = j * b
        rowmask = (iota >= jb + b).astype(dtype)
        Lcol = jax.lax.dynamic_slice(L, (0, jb), (n, b)) * rowmask[:, None]
        Bj = jax.lax.dynamic_slice(B, (jb, 0), (b, B.shape[1])) - Lcol.T @ X
        Xj = jax.lax.dynamic_index_in_dim(Dinv, j, keepdims=False).T @ Bj
        return jax.lax.dynamic_update_slice(X, Xj, (jb, 0))

    return jax.lax.fori_loop(0, nb, body, jnp.zeros_like(B))


SUPER = 1024  # hybrid superpanel width == the largest VMEM-resident shape


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001 - backend probing must never fail hot paths
        return False


def _use_fused_whiten(n: int, dtype=None) -> bool:
    """The single-launch Pallas factor+solve runs on real TPU backends for
    the bucket sizes whose R + L fit VMEM (n <= 1024). Everything else
    (CPU tests, giant buckets, the f64 likelihood option — Pallas kernels
    are f32) takes the blocked XLA path below.
    BOTPU_NO_FUSED_WHITEN=1 forces the XLA path (A/B benchmarking)."""
    if os.environ.get("BOTPU_NO_FUSED_WHITEN"):
        return False
    if dtype is not None and dtype == jnp.float64:
        return False
    return _on_tpu() and n % BLOCK == 0 and BLOCK <= n <= 1024


def _use_hybrid_whiten(n: int, dtype=None) -> bool:
    """Above the VMEM limit (n > 1024) the factorization goes hybrid:
    superpanel GEMMs in XLA + one Pallas launch per 1024-wide diagonal
    block (see _factor_hybrid). Same env/backend/dtype gates as the fused
    path."""
    if os.environ.get("BOTPU_NO_FUSED_WHITEN"):
        return False
    if dtype is not None and dtype == jnp.float64:
        return False
    return _on_tpu() and n > SUPER and n % SUPER == 0


def _factor_hybrid(R: jnp.ndarray, super_block: int = SUPER, interpret: bool = False):
    """Blocked Cholesky for n > 1024 killing the n>1024 performance cliff:
    the pure-XLA panel loop dispatches ~n tiny sequential column ops per
    eval (the exact chain the Pallas kernel was built to eliminate), while
    everything VMEM-sized already has a one-launch kernel. So factor at
    TWO levels: a Python loop over n/1024 superpanels whose Schur updates
    and subdiagonal solves are full-size MXU GEMMs, and whose 1024-wide
    diagonal blocks each factor in ONE whiten_fused launch. Sequential
    depth falls from ~n chained ops to ~(n/1024)*12 chunky ones. Returns
    (L, Dinv, min_pivot) in _factor's exact layout, so the blocked solves
    and the whiten VJP work unchanged.

    super_block/interpret are test hooks (CPU interpret mode at small n)."""
    from .pallas_kernels import whiten_fused

    n = R.shape[-1]
    ns = n // super_block
    dtype = R.dtype
    L = jnp.zeros_like(R)
    Dinvs = []
    piv = jnp.asarray(jnp.inf, dtype)
    dummy_B = jnp.zeros((super_block, 1), dtype)
    with jax.default_matmul_precision("high"):
        for k in range(ns):
            kb = k * super_block
            Lrow = L[kb:kb + super_block, :kb]
            S = R[kb:kb + super_block, kb:kb + super_block]
            if k > 0:
                S = S - Lrow @ Lrow.T
            _d, _W, pk, Lkk, Dk = whiten_fused(S, dummy_B, interpret=interpret)
            piv = jnp.minimum(piv, pk)
            Dinvs.append(Dk)
            L = L.at[kb:kb + super_block, kb:kb + super_block].set(Lkk)
            if kb + super_block < n:
                C = R[kb + super_block:, kb:kb + super_block]
                if k > 0:
                    C = C - L[kb + super_block:, :kb] @ Lrow.T
                # subdiagonal panel P = C L_kk^-T  <=>  P^T = L_kk^-1 C^T
                Pt = tri_solve_lower(Lkk, Dk, C.T)
                L = L.at[kb + super_block:, kb:kb + super_block].set(Pt.T)
    return L, jnp.concatenate(Dinvs, axis=0), piv


def _super_inv(L: jnp.ndarray, Dinv: jnp.ndarray, super_block: int = SUPER) -> jnp.ndarray:
    """Explicit inverses of the SUPER-wide diagonal blocks of a blocked
    factor (L, Dinv): (ns, S, S). 3 small GEMMs per superpanel via
    block-nilpotent squaring — the one-off cost that turns every backward
    triangular solve into pure GEMMs (see tri_solve_*_super)."""
    n = L.shape[-1]
    ns = n // super_block
    nb = Dinv.shape[0]
    bpb = nb // ns  # 128-blocks per superpanel
    outs = []
    for k in range(ns):
        kb = k * super_block
        Lkk = L[kb:kb + super_block, kb:kb + super_block]
        outs.append(_block_tri_inv(Lkk, Dinv[k * bpb:(k + 1) * bpb]))
    return jnp.stack(outs, axis=0)


def tri_solve_lower_super(L, Dinv_super, B, super_block: int = SUPER):
    """Solve L X = B with SUPER-wide panels: ns sequential steps of two
    large GEMMs each (subdiagonal update + explicit-inverse apply) instead
    of the nb~32-step chain of tri_solve_lower — the backward-pass analog
    of the forward `_factor_hybrid` (round-5 verdict item 2)."""
    n = L.shape[-1]
    ns = n // super_block
    xs = []
    for k in range(ns):
        kb = k * super_block
        Bk = B[kb:kb + super_block]
        if k > 0:
            Xprev = jnp.concatenate(xs, axis=0)
            Bk = Bk - L[kb:kb + super_block, :kb] @ Xprev
        xs.append(Dinv_super[k] @ Bk)
    return jnp.concatenate(xs, axis=0) if ns > 1 else xs[0]


def tri_solve_upper_t_super(L, Dinv_super, B, super_block: int = SUPER):
    """Solve L^T X = B bottom-up with SUPER-wide panels (see
    tri_solve_lower_super)."""
    n = L.shape[-1]
    ns = n // super_block
    xs = [None] * ns
    for i in range(ns):
        k = ns - 1 - i
        kb = k * super_block
        Bk = B[kb:kb + super_block]
        if i > 0:
            Xbelow = jnp.concatenate(xs[k + 1:], axis=0)
            Bk = Bk - L[kb + super_block:, kb:kb + super_block].T @ Xbelow
        xs[k] = Dinv_super[k].T @ Bk
    return jnp.concatenate(xs, axis=0) if ns > 1 else xs[0]


def _use_super_bwd(n: int, dtype=None) -> bool:
    """The superpanel backward runs wherever the fused/hybrid forward runs
    (TPU, 1024-multiples, f32): the explicit block inverses trade the
    nb-deep solve chains for ns GEMM steps."""
    if os.environ.get("BOTPU_NO_SUPER_BWD"):
        return False
    if dtype is not None and dtype == jnp.float64:
        return False
    return _on_tpu() and n >= SUPER and n % SUPER == 0


def _whiten_parts(R, B):
    """Shared fwd implementation: returns (d, W, piv) + residuals (L, Dinv, W).

    Dispatches to the fused Pallas kernel on TPU (ONE launch per likelihood
    eval instead of a ~1.1k-deep chain of tiny column ops — the measured
    warm-fit bottleneck; see ops/pallas_kernels.whiten_fused) and to the
    blocked XLA path elsewhere."""
    if _use_fused_whiten(R.shape[-1], R.dtype):
        from .pallas_kernels import whiten_fused

        d, W, piv, L, Dinv = whiten_fused(R, B)
        return (d, W, piv), (L, Dinv, W)
    with jax.default_matmul_precision("high"):
        if _use_hybrid_whiten(R.shape[-1], R.dtype):
            L, Dinv, piv = _factor_hybrid(R)
        else:
            L, Dinv, piv = _factor(R)
        W = tri_solve_lower(L, Dinv, B)
    return (jnp.diagonal(L), W, piv), (L, Dinv, W)


@jax.custom_vjp
def whiten(R: jnp.ndarray, B: jnp.ndarray):
    """(diag(L), L^-1 B, min_pivot) for SPD R = L L^T — the entire
    GP-likelihood linear algebra in O(1) generated code with a GEMM-only
    VJP. min_pivot <= ~0 flags a clamped (wrong) factorization; the
    likelihood folds it into its 1e12 penalty (advisor finding r2)."""
    out, _ = _whiten_parts(R, B)
    return out


def _whiten_fwd(R, B):
    return _whiten_parts(R, B)


def _whiten_bwd(res, cots):
    L, Dinv, W = res
    dbar, Wbar, _pivb = cots  # min_pivot is a diagnostic: no gradient flow
    # "high" (bf16_3x) matmuls: the MXU accumulates in f32 either way and
    # 3-pass bf16 recovers ~f32 input precision at a fraction of the cost
    # of the 6-pass "highest" emulation (which made this VJP 3x the cost of
    # the whole fit in round 1). Gradient parity vs f64 is asserted by
    # tests/test_linalg.py::test_whiten_value_and_grad on every backend.
    n = L.shape[-1]
    with jax.default_matmul_precision("high"):
        if _use_super_bwd(n, L.dtype):
            # superpanel backward (round-5): the two n x n-RHS upper-T
            # solves dominated the VJP as ~nb-deep chains of medium ops;
            # with explicit SUPER-block inverses every solve is ns GEMM
            # steps on the MXU
            Dsup = _super_inv(L, Dinv)
            solve_ut = lambda B: tri_solve_upper_t_super(L, Dsup, B)
        else:
            solve_ut = lambda B: tri_solve_upper_t(L, Dinv, B)
        U = solve_ut(Wbar)  # L^-T Wbar
        Bbar = U
        Lbar = jnp.diag(dbar) - jnp.tril(U @ W.T)
        M = L.T @ Lbar
        Phi = jnp.tril(M) - 0.5 * jnp.diag(jnp.diagonal(M))
        Y1 = solve_ut(Phi)          # L^-T Phi
        Y2 = solve_ut(Y1.T).T       # (L^-T Phi) L^-1
        Rbar = 0.5 * (Y2 + Y2.T)
    return Rbar, Bbar


whiten.defvjp(_whiten_fwd, _whiten_bwd)


def _block_tri_inv(L: jnp.ndarray, Dinv: jnp.ndarray) -> jnp.ndarray:
    """Explicit L^-1 from a blocked factor (L, Dinv) by block-nilpotent
    squaring — log2(nb) full GEMMs, no column loop (the diagonal-block
    inverses are already in Dinv)."""
    n = L.shape[-1]
    nb = Dinv.shape[0]
    if nb == 1:
        return Dinv[0]
    with jax.default_matmul_precision("highest"):
        N = _block_diag_apply(Dinv, L, "left")
        eye = jnp.eye(n, dtype=L.dtype)
        T = eye - N
        Rm = eye + T
        P = T
        for _ in range(max(0, int(math.ceil(math.log2(nb))) - 1)):
            P = P @ P
            Rm = Rm + Rm @ P
        return _block_diag_apply(Dinv, Rm, "right")


def chol_inv_whiten(R: jnp.ndarray, B: jnp.ndarray):
    """(L, L_inv, W, piv) — factor, explicit inverse AND solve W = L^-1 B.

    The posterior-state path needs all three; on TPU the fused Pallas
    kernel supplies (L, Dinv, W) in one launch and the inverse follows in
    log2(nb) GEMMs, replacing chol_and_inv's ~1k-deep column recurrence.
    NOT differentiable through the Pallas branch — posterior-state
    construction is never differentiated (gradients of predictions w.r.t.
    query points flow through PosteriorState as constants)."""
    if _use_fused_whiten(R.shape[-1], R.dtype):
        from .pallas_kernels import whiten_fused

        _d, W, piv, L, Dinv = whiten_fused(R, B)
        return L, _block_tri_inv(L, Dinv), W, piv
    if _use_hybrid_whiten(R.shape[-1], R.dtype):
        L, Dinv, piv = _factor_hybrid(R)
        with jax.default_matmul_precision("high"):
            W = tri_solve_lower(L, Dinv, B)
        return L, _block_tri_inv(L, Dinv), W, piv
    L, L_inv, piv = chol_and_inv(R)
    W = jnp.dot(L_inv, B, precision=jax.lax.Precision.HIGHEST)
    return L, L_inv, W, piv

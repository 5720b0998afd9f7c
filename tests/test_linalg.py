"""Golden tests for the compact blocked Cholesky (ops/linalg.py) against
numpy/jax reference implementations — values, inverses, solves, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_optimization_tpu.ops.linalg import (
    chol_and_inv, tri_solve_lower, tri_solve_upper_t, whiten, _factor,
)


def _spd(n, seed=0, cond="easy"):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 16)).astype(np.float32)
    if cond == "easy":
        return (X @ X.T / 16 + np.eye(n) * n).astype(np.float32) / n
    # kernel-like: moderately ill-conditioned
    Z = rng.uniform(0, 1, (n, 4))
    D = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    return (np.exp(-5.0 * D) + 1e-4 * np.eye(n)).astype(np.float32)


@pytest.mark.parametrize("n", [16, 64, 128, 256, 512, 1024])
def test_chol_and_inv_matches_numpy(n):
    R = _spd(n)
    L_ref = np.linalg.cholesky(np.asarray(R, np.float64))
    L, Li, piv = jax.jit(chol_and_inv)(jnp.asarray(R))
    rel = np.abs(np.asarray(L, np.float64) - L_ref).max() / np.abs(L_ref).max()
    assert rel < 1e-5, rel
    resid = np.abs(np.asarray(Li, np.float64) @ L_ref - np.eye(n)).max()
    assert resid < 1e-4, resid
    assert float(piv) > 0.0


@pytest.mark.parametrize("n", [128, 256])
def test_chol_and_inv_kernel_like(n):
    R = _spd(n, seed=3, cond="kernel")
    L_ref = np.linalg.cholesky(np.asarray(R, np.float64))
    L, Li, piv = jax.jit(chol_and_inv)(jnp.asarray(R))
    rel = np.abs(np.asarray(L, np.float64) - L_ref).max() / np.abs(L_ref).max()
    assert rel < 1e-3, rel
    assert float(piv) > 0.0


@pytest.mark.parametrize("n", [64, 256])
def test_tri_solves(n):
    R = _spd(n, seed=1)
    B = np.random.default_rng(2).standard_normal((n, 3)).astype(np.float32)
    L, Dinv, _piv = jax.jit(_factor)(jnp.asarray(R))
    L64 = np.asarray(L, np.float64)
    X1 = np.asarray(tri_solve_lower(L, Dinv, jnp.asarray(B)), np.float64)
    assert np.abs(L64 @ X1 - B).max() < 1e-4
    X2 = np.asarray(tri_solve_upper_t(L, Dinv, jnp.asarray(B)), np.float64)
    assert np.abs(L64.T @ X2 - B).max() < 1e-4


def test_whiten_value_and_grad():
    n = 256
    R = jnp.asarray(_spd(n, seed=4))
    B = jnp.asarray(np.random.default_rng(5).standard_normal((n, 2)).astype(np.float32))

    def f_new(R):
        d, W, _ = whiten(R, B)
        return jnp.sum(jnp.log(d)) + jnp.sum(W**2)

    def f_ref(R):
        L = jnp.linalg.cholesky(R)
        W = jax.scipy.linalg.solve_triangular(L, B, lower=True)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(W**2)

    v1, v2 = f_new(R), f_ref(R)
    assert abs(float(v1) - float(v2)) < 1e-2 * max(1.0, abs(float(v2)))
    g1, g2 = jax.grad(f_new)(R), jax.grad(f_ref)(R)
    rel = float(jnp.abs(g1 - g2).max() / jnp.abs(g2).max())
    assert rel < 1e-3, rel


def test_vmap_batch():
    # batched factorization under vmap (multi-restart MLE shape)
    Rs = jnp.stack([jnp.asarray(_spd(128, seed=s)) for s in range(4)])
    Ls, Lis, _ = jax.vmap(chol_and_inv)(Rs)
    for i in range(4):
        ref = np.linalg.cholesky(np.asarray(Rs[i], np.float64))
        assert np.abs(np.asarray(Ls[i], np.float64) - ref).max() < 1e-4


def test_min_pivot_flags_indefinite():
    # an indefinite matrix must be flagged by min_pivot <= 0 even though the
    # clamp keeps the factorization finite (advisor finding r2)
    n = 128
    R = _spd(n, seed=7)
    R = np.asarray(R, np.float64)
    R[0, 0] = -1.0  # make it indefinite
    L, Li, piv = jax.jit(chol_and_inv)(jnp.asarray(R, jnp.float32))
    assert float(piv) <= 0.0
    d, W, piv2 = whiten(jnp.asarray(R, jnp.float32), jnp.ones((n, 1), jnp.float32))
    assert float(piv2) <= 0.0


def test_factor_hybrid_matches_numpy():
    """The superpanel hybrid factorization (the n>1024 cliff fix) must
    reproduce the Cholesky factor, the blocked Dinv layout, and the solve
    exactly like _factor. Exercised at super_block=256 / n=512 in Pallas
    interpret mode (the real path runs super_block=1024 on TPU)."""
    from bayesian_optimization_tpu.ops.linalg import _factor_hybrid

    n, sb = 512, 256
    R = _spd(n, seed=3, cond="kernel")
    L_ref = np.linalg.cholesky(np.asarray(R, np.float64))
    L, Dinv, piv = _factor_hybrid(jnp.asarray(R), super_block=sb, interpret=True)
    rel = np.abs(np.asarray(L, np.float64) - L_ref).max() / np.abs(L_ref).max()
    assert rel < 1e-3, rel
    assert float(piv) > 0.0
    assert Dinv.shape == (n // 128, 128, 128)
    # Dinv blocks really are the inverses of L's diagonal blocks
    for k in range(n // 128):
        blk = np.asarray(L)[k * 128:(k + 1) * 128, k * 128:(k + 1) * 128]
        assert np.abs(np.asarray(Dinv[k]) @ blk - np.eye(128)).max() < 1e-3
    # blocked solve built on the hybrid factor matches scipy
    B = np.random.default_rng(0).standard_normal((n, 3)).astype(np.float32)
    W = tri_solve_lower(L, Dinv, jnp.asarray(B))
    import scipy.linalg as sla

    W_ref = sla.solve_triangular(np.asarray(L, np.float64), B, lower=True)
    assert np.abs(np.asarray(W, np.float64) - W_ref).max() < 1e-3


def test_super_solves_match_blocked():
    """tri_solve_{lower,upper_t}_super (explicit superpanel inverses, the
    round-5 backward hybrid) agree with the blocked reference solves."""
    import jax.numpy as jnp

    from bayesian_optimization_tpu.ops.linalg import (
        _factor, _super_inv, tri_solve_lower, tri_solve_lower_super,
        tri_solve_upper_t, tri_solve_upper_t_super,
    )

    rng = np.random.default_rng(0)
    n, S = 512, 128  # 4 superpanels of 128 so the test stays CPU-sized
    A = rng.standard_normal((n, n)).astype(np.float32)
    R = A @ A.T / n + np.eye(n, dtype=np.float32)
    B = rng.standard_normal((n, 7)).astype(np.float32)
    L, Dinv, piv = _factor(jnp.asarray(R))
    Dsup = _super_inv(L, Dinv, super_block=S)
    X1 = tri_solve_lower(L, Dinv, jnp.asarray(B))
    X1s = tri_solve_lower_super(L, Dsup, jnp.asarray(B), super_block=S)
    assert np.allclose(np.asarray(X1), np.asarray(X1s), atol=2e-4), np.abs(
        np.asarray(X1) - np.asarray(X1s)
    ).max()
    X2 = tri_solve_upper_t(L, Dinv, jnp.asarray(B))
    X2s = tri_solve_upper_t_super(L, Dsup, jnp.asarray(B), super_block=S)
    assert np.allclose(np.asarray(X2), np.asarray(X2s), atol=2e-4)
    # single-superpanel degenerate case (ns == 1)
    Dsup1 = _super_inv(L, Dinv, super_block=n)
    X3s = tri_solve_lower_super(L, Dsup1, jnp.asarray(B), super_block=n)
    assert np.allclose(np.asarray(X1), np.asarray(X3s), atol=2e-4)

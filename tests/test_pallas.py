"""Pallas fused kernel-matrix op vs the XLA path (interpret mode on CPU;
compiled path exercised on real TPU by bench_pallas.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_optimization_tpu.models.kernels import matern, squared_exponential
from bayesian_optimization_tpu.ops.pallas_kernels import matern_pallas

rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(0, 1, (128, 5)), jnp.float32)
Y = jnp.asarray(rng.uniform(0, 1, (256, 5)), jnp.float32)
theta = jnp.asarray([0.5, 1.0, 2.0, 0.1, 3.0], jnp.float32)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_pallas_matern_matches_xla_sym(nu):
    K_p = matern_pallas(theta, X, nu=nu, interpret=True)
    K_x = matern(theta, X, nu=nu)
    assert float(jnp.max(jnp.abs(K_p - K_x))) < 5e-6
    assert float(jnp.max(jnp.abs(jnp.diagonal(K_p) - 1.0))) == 0.0


def test_pallas_matern_cross():
    K_p = matern_pallas(theta, X, Y, nu=1.5, interpret=True)
    K_x = matern(theta, X, Y, nu=1.5)
    assert float(jnp.max(jnp.abs(K_p - K_x))) < 5e-6


def test_pallas_rbf():
    K_p = matern_pallas(theta, X, nu=-1.0, interpret=True)  # nu outside {.5,1.5,2.5} = rbf
    K_x = squared_exponential(theta, X)
    assert float(jnp.max(jnp.abs(K_p - K_x))) < 5e-6


def test_whiten_fused_matches_xla_and_f64():
    from bayesian_optimization_tpu.ops.pallas_kernels import whiten_fused
    from bayesian_optimization_tpu.ops.linalg import whiten

    rng2 = np.random.default_rng(0)
    n, m = 256, 3
    Z = rng2.uniform(0, 1, (n, 4))
    D2 = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    R = (np.exp(-5 * D2) + 1e-2 * np.eye(n)).astype(np.float32)
    B = rng2.standard_normal((n, m)).astype(np.float32)

    d1, W1, piv1, L1, Dinv1 = whiten_fused(jnp.asarray(R), jnp.asarray(B), interpret=True)
    L64 = np.linalg.cholesky(R.astype(np.float64))
    assert np.abs(np.asarray(L1, np.float64) - L64).max() < 1e-4
    assert float(piv1) > 0.0
    from scipy.linalg import solve_triangular
    Wt = solve_triangular(L64, B.astype(np.float64), lower=True)
    assert np.abs(np.asarray(W1, np.float64) - Wt).max() < 1e-3 * max(1.0, np.abs(Wt).max())
    assert np.abs(np.asarray(d1) - np.diag(L64)).max() < 1e-4
    # Dinv blocks invert the diagonal blocks
    for k in range(n // 128):
        blk = np.asarray(L1)[k * 128:(k + 1) * 128, k * 128:(k + 1) * 128]
        resid = np.asarray(Dinv1)[k] @ blk - np.eye(128)
        assert np.abs(resid).max() < 1e-3


def test_whiten_fused_flags_indefinite():
    from bayesian_optimization_tpu.ops.pallas_kernels import whiten_fused

    n = 128
    rng2 = np.random.default_rng(1)
    A = rng2.standard_normal((n, 16)).astype(np.float32)
    R = (A @ A.T / 16 + np.eye(n, dtype=np.float32))
    R[0, 0] = -1.0
    _, _, piv, _, _ = whiten_fused(jnp.asarray(R), jnp.ones((n, 1), jnp.float32), interpret=True)
    # indefinite input: the raw pivot goes negative (or the overflow cascade
    # turns it NaN) — either way `piv > PIV_TOL` is False and the likelihood
    # penalty fires; assert exactly that predicate
    assert not (float(piv) > 0.0)


def test_whiten_fused_aliasing_preserves_caller_r():
    """L aliases R inside the kernel; the CALLER's R must never be
    clobbered (XLA copies when the buffer is still live), and results must
    be right when R is a jit-internal temporary."""
    from bayesian_optimization_tpu.ops.pallas_kernels import whiten_fused

    rng2 = np.random.default_rng(0)
    n = 128
    A = rng2.standard_normal((n, 16)).astype(np.float32)
    R = jnp.asarray(A @ A.T / 16 + np.eye(n, dtype=np.float32))
    B = jnp.ones((n, 1), jnp.float32)
    R_before = np.asarray(R).copy()
    jax.block_until_ready(whiten_fused(R, B, interpret=True))
    assert np.array_equal(np.asarray(R), R_before)

    @jax.jit
    def f(x):
        R2 = x @ x.T / 16 + jnp.eye(n)
        d, W, piv, L, Dinv = whiten_fused(R2, B, interpret=True)
        return d

    d = jax.block_until_ready(f(jnp.asarray(A)))
    L64 = np.linalg.cholesky((A @ A.T / 16 + np.eye(n)).astype(np.float64))
    assert np.abs(np.asarray(d) - np.diag(L64)).max() < 1e-4

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

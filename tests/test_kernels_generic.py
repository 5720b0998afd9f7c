"""Generic-nu Matern kernel: half-integer closed form + Bessel-K callback
(ref parity: bayes_optim/surrogate/gaussian_process/kernel.py:203-209)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import gamma, kv

from bayesian_optimization_tpu.models.kernels import kernel_fn, matern


def _scipy_matern(theta, X, nu):
    """Reference formula: 2^(1-nu)/Gamma(nu) (sqrt(2 nu) r)^nu K_nu(sqrt(2 nu) r)."""
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2 * theta).sum(-1)
    r = np.sqrt(d2)
    s = math.sqrt(2 * nu) * r
    with np.errstate(invalid="ignore"):
        K = 2 ** (1 - nu) / gamma(nu) * s ** nu * kv(nu, s)
    K[s == 0] = 1.0
    return K


@pytest.mark.parametrize("nu", [3.5, 4.5])
def test_half_integer_matches_bessel(nu):
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (12, 3))
    theta = np.array([0.5, 2.0, 1.3])
    ours = np.asarray(matern(jnp.asarray(theta), jnp.asarray(X), nu=nu))
    want = _scipy_matern(theta, X, nu)
    np.testing.assert_allclose(ours, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("nu", [0.8, 1.7, 3.2])
def test_generic_nu_matches_bessel(nu):
    rng = np.random.default_rng(1)
    X = rng.uniform(0, 1, (10, 2))
    theta = np.array([1.5, 0.7])
    ours = np.asarray(matern(jnp.asarray(theta), jnp.asarray(X), nu=nu))
    want = _scipy_matern(theta, X, nu)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-5)
    assert np.allclose(np.diag(ours), 1.0)


def test_generic_nu_theta_gradient():
    """Autodiff through the Bessel callback (custom JVP) matches finite
    differences of the scipy formula."""
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.uniform(0, 1, (8, 2)))
    theta0 = np.array([1.2, 0.6])

    def scalar(theta):
        return jnp.sum(matern(theta, X, nu=1.7) * jnp.arange(64.0).reshape(8, 8))

    g = np.asarray(jax.grad(scalar)(jnp.asarray(theta0)))
    eps = 1e-4
    for d in range(2):
        tp, tm = theta0.copy(), theta0.copy()
        tp[d] += eps
        tm[d] -= eps
        fd = (float(scalar(jnp.asarray(tp))) - float(scalar(jnp.asarray(tm)))) / (2 * eps)
        assert g[d] == pytest.approx(fd, rel=5e-2, abs=1e-3)


def test_kernel_fn_tuple_names():
    k = kernel_fn(("matern", 3.5))
    X = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (5, 2)))
    K = k(jnp.ones(2), X)
    assert K.shape == (5, 5)
    k2 = kernel_fn(("generalized_exponential", 1.2))
    assert k2(jnp.ones(2), X).shape == (5, 5)
    with pytest.raises(ValueError):
        kernel_fn(("nope", 1.0))


def test_gp_fit_with_half_integer_nu():
    """End-to-end GP fit/predict with corr=('matern', 3.5) — the fully
    on-device extended half-integer path."""
    from bayesian_optimization_tpu.models import GaussianProcess, constant_trend

    rng = np.random.default_rng(4)
    X = rng.uniform(0, 1, (40, 2))
    y = np.sin(3 * X).sum(1)
    gp = GaussianProcess(
        mean=constant_trend(2), corr=("matern", 3.5),
        thetaL=1e-2 * np.ones(2), thetaU=1e2 * np.ones(2),
        nugget=1e-6, random_start=3, random_state=0,
    )
    gp.fit(X, y)
    mu, mse = gp.predict(X[:5], eval_MSE=True)
    np.testing.assert_allclose(mu, y[:5], atol=0.05)
    assert np.all(mse >= 0)

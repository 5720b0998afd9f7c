"""Acquisition-function numerics: closed-form goldens vs scipy, batch
evaluation, gradient sanity (ref coverage analog: the criteria embedded in
unittest/test_BO.py runs; goldens are new)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import norm

from bayesian_optimization_tpu.ops.acquisition import ei, mgfi, pi, ucb


def test_ei_golden():
    mu = jnp.asarray([0.0, 1.0, -1.0])
    sd = jnp.asarray([1.0, 0.5, 2.0])
    plugin = 0.0
    got = np.asarray(ei(mu, sd, plugin))
    imp = plugin - np.asarray(mu)
    u = imp / np.asarray(sd)
    want = imp * norm.cdf(u) + np.asarray(sd) * norm.pdf(u)
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ei_zero_sd_is_zero():
    assert float(ei(jnp.asarray([0.5]), jnp.asarray([0.0]), 1.0)[0]) == 0.0


def test_pi_golden():
    mu = jnp.asarray([0.3, -0.3])
    sd = jnp.asarray([0.7, 0.9])
    got = np.asarray(pi(mu, sd, 0.1))
    want = norm.cdf((0.1 - np.asarray(mu)) / np.asarray(sd))
    assert np.allclose(got, want, rtol=1e-5)


def test_ucb_is_linear():
    mu = jnp.asarray([1.0, 2.0])
    sd = jnp.asarray([0.5, 1.0])
    got = np.asarray(ucb(mu, sd, alpha=2.0))
    assert np.allclose(got, [-1.0 + 1.0, -2.0 + 2.0])


def test_mgfi_golden_and_clamp():
    mu, sd, plugin, t = 0.2, 0.8, 0.0, 1.5
    got = float(mgfi(jnp.asarray([mu]), jnp.asarray([sd]), plugin, t=t)[0])
    beta_p = (plugin - (mu - t * sd**2)) / sd
    want = norm.cdf(beta_p) * np.exp(t * (plugin - mu - 1.0) + t**2 * sd**2 / 2.0)
    assert np.isclose(got, want, rtol=1e-4)
    # huge t must not overflow to inf/nan
    big = float(mgfi(jnp.asarray([mu]), jnp.asarray([sd]), plugin, t=1e3)[0])
    assert np.isfinite(big)


def test_batch_shapes():
    mu = jnp.zeros((128,))
    sd = jnp.ones((128,))
    for fn, kw in [(ei, {"plugin": 0.0}), (pi, {"plugin": 0.0}), (ucb, {"alpha": 1.0}), (mgfi, {"plugin": 0.0, "t": 2.0})]:
        out = fn(mu, sd, **kw)
        assert out.shape == (128,)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_gei_matches_mc_and_reduces_to_ei():
    from bayesian_optimization_tpu.ops.acquisition import ei, gei

    mu, sd, plugin = 0.3, 0.8, 0.1
    mu_j, sd_j = jnp.asarray([mu]), jnp.asarray([sd])
    # g=1 == EI
    assert float(gei(mu_j, sd_j, plugin, g=1)[0]) == pytest.approx(
        float(ei(mu_j, sd_j, plugin)[0]), rel=1e-5
    )
    # g=2,3 vs Monte Carlo
    rng = np.random.default_rng(0)
    y = mu + sd * rng.standard_normal(400000)
    imp = np.maximum(plugin - y, 0.0)
    for g in (2, 3):
        mc = float(np.mean(imp**g))
        got = float(gei(mu_j, sd_j, plugin, g=g)[0])
        assert got == pytest.approx(mc, rel=0.03), (g, got, mc)


def test_gei_in_bo_loop():
    from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace
    from bayesian_optimization_tpu.models.trend import constant_trend

    gp = GaussianProcess(mean=constant_trend(2), corr="matern",
                         thetaL=1e-3 * np.ones(2), thetaU=1e3 * np.ones(2),
                         nugget=1e-6, random_start=4, max_iter=20, random_state=0)
    opt = BO(search_space=RealSpace([[-5, 5]] * 2, random_seed=0),
             obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
             model=gp, acquisition_fun="GEI", acquisition_par={"g": 2},
             DoE_size=5, max_FEs=9, random_seed=0)
    opt.run()
    assert opt.eval_count == 9

"""HMC/VI hyperparameter-posterior inference (the BASELINE.json north star;
no reference counterpart — its fit is point-estimate L-BFGS)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace
from bayesian_optimization_tpu.models.hmc import fit_vi, hmc_sample
from bayesian_optimization_tpu.models.trend import constant_trend


def test_hmc_recovers_gaussian_moments():
    """Sampling a known correlated Gaussian: moments must match."""
    cov = jnp.asarray([[1.0, 0.6], [0.6, 0.8]])
    prec = jnp.linalg.inv(cov)
    logp = lambda x: -0.5 * (x - 2.0) @ prec @ (x - 2.0)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (8, 2), minval=-2.0, maxval=6.0)
    res = hmc_sample(
        jax.random.PRNGKey(1), logp, x0,
        lo=jnp.full(2, -10.0), hi=jnp.full(2, 10.0),
        n_warmup=300, n_samples=300, n_leapfrog=12, thin=1,
    )
    S = np.asarray(res.samples).reshape(-1, 2)
    assert np.all(np.asarray(res.accept_rate) > 0.4), res.accept_rate
    assert np.allclose(S.mean(0), [2.0, 2.0], atol=0.15), S.mean(0)
    emp_cov = np.cov(S.T)
    assert np.allclose(emp_cov, np.asarray(cov), atol=0.3), emp_cov


def test_vi_recovers_gaussian_mean():
    logp = lambda x: -0.5 * jnp.sum((x - 1.5) ** 2) / 0.25
    mean, log_std = fit_vi(
        jax.random.PRNGKey(2), logp,
        lo=jnp.full(2, -10.0), hi=jnp.full(2, 10.0), n_steps=500,
    )
    # box coordinates via sigmoid: check mapped mean
    x_mean = -10.0 + 20.0 * jax.nn.sigmoid(mean)
    assert np.allclose(np.asarray(x_mean), 1.5, atol=0.2)


def test_gp_hmc_fit_predict():
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (20, 2))
    y = np.sin(2 * X[:, 0]) + 0.5 * X[:, 1] + 0.05 * rng.standard_normal(20)
    gp = GaussianProcess(
        mean=constant_trend(2), corr="matern",
        thetaL=1e-3 * np.ones(2), thetaU=1e3 * np.ones(2),
        nugget=1e-6, optimizer="HMC", random_state=0,
    )
    gp.hmc_warmup = 100
    gp.n_ensemble = 8
    gp.fit(X, y)
    assert gp.theta_samples_.shape == (8, 2)
    mu, mse = gp.predict(X, eval_MSE=True)
    assert np.all(mse >= 0)
    resid = np.abs(mu - y)
    assert resid.max() < 0.5, resid.max()
    # held-out generalization
    Xt = rng.uniform(-1.5, 1.5, (40, 2))
    yt = np.sin(2 * Xt[:, 0]) + 0.5 * Xt[:, 1]
    r = np.corrcoef(gp.predict(Xt), yt)[0, 1]
    assert r > 0.95, r


def test_bo_with_hmc_gp():
    gp = GaussianProcess(
        mean=constant_trend(2), corr="matern",
        thetaL=1e-3 * np.ones(2), thetaU=1e3 * np.ones(2),
        nugget=1e-6, optimizer="HMC", random_state=0,
    )
    gp.hmc_warmup = 60
    gp.n_ensemble = 4
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = BO(
        search_space=space, obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
        model=gp, DoE_size=5, max_FEs=10, random_seed=0,
    )
    xopt, fopt, _ = opt.run()
    assert opt.eval_count == 10
    assert fopt[0] < 10.0


def test_nuts_moments_match_truth_and_hmc():
    """NUTS posterior moments on a correlated Gaussian must match the
    analytic truth (and hence long-HMC) within Monte-Carlo error."""
    import jax
    import jax.numpy as jnp

    from bayesian_optimization_tpu.models.hmc import nuts_sample

    mean = jnp.asarray([0.5, -0.3, 0.2], jnp.float32)
    cov = jnp.asarray(
        [[1.0, 0.8, 0.2], [0.8, 1.0, 0.4], [0.2, 0.4, 0.5]], jnp.float32
    )
    prec = jnp.linalg.inv(cov)

    def logp(x):
        d = x - mean
        return -0.5 * d @ prec @ d

    lo = jnp.full(3, -8.0)
    hi = jnp.full(3, 8.0)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), jnp.float32, -2.0, 2.0)
    res = nuts_sample(jax.random.PRNGKey(0), logp, x0, lo, hi,
                      n_warmup=300, n_samples=400, max_depth=6)
    s = np.asarray(res.samples).reshape(-1, 3)
    assert np.abs(s.mean(0) - np.asarray(mean)).max() < 0.08
    assert np.abs(s.var(0) - np.diag(np.asarray(cov))).max() < 0.15
    assert abs(float(np.cov(s.T)[0, 1]) - 0.8) < 0.15
    acc = float(np.asarray(res.accept_rate).mean())
    assert 0.6 < acc <= 1.0, acc
    # dynamic trajectories actually engaged (depth > 1 on average)
    assert float(np.asarray(res.mean_depth).mean()) > 1.0


def test_gp_fit_with_nuts_ensemble():
    from bayesian_optimization_tpu import GaussianProcess
    from bayesian_optimization_tpu.models.trend import constant_trend

    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (40, 2))
    y = np.sin(3 * X[:, 0]) + 0.3 * rng.standard_normal(40)
    gp = GaussianProcess(
        mean=constant_trend(2), thetaL=1e-2 * np.ones(2), thetaU=1e2 * np.ones(2),
        nugget=1e-6, optimizer="NUTS", random_state=0,
    )
    gp.hmc_warmup = 60
    gp.n_ensemble = 8
    gp.fit(X, y)
    assert gp.is_fitted
    mu, mse = gp.predict(X[:5], eval_MSE=True)
    assert np.all(np.isfinite(mu)) and np.all(mse >= 0)
    # ensemble prediction mixes 8 posterior samples
    assert gp.theta_samples_.shape[0] == 8

"""Acquisition-optimizer engines: vectorized (1+1)-Cholesky-CMA and MIES
(modeled on ref unittest/test_acq_optim.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_optimization_tpu import IntegerSpace, DiscreteSpace, OrdinalSpace, BoolSpace, RealSpace
from bayesian_optimization_tpu.optim import OnePlusOne_Cholesky_CMA, run_cma
from bayesian_optimization_tpu.optim.mies import MIES, MIESSpec, run_mies


def test_run_cma_sphere():
    fun = lambda X: jnp.sum((X - 0.7) ** 2, axis=-1)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (32, 3))
    xb, fb, _, _ = run_cma(jax.random.PRNGKey(1), fun, x0, jnp.zeros(3), jnp.ones(3), 150)
    assert float(fb) < 1e-4
    assert np.allclose(np.asarray(xb), 0.7, atol=0.02)


def test_run_cma_ellipsoid_conditioning():
    # needs covariance adaptation, not just step-size control
    w = jnp.asarray([1.0, 25.0, 100.0])
    fun = lambda X: jnp.sum(w * (X - 0.5) ** 2, axis=-1)
    x0 = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))
    xb, fb, _, _ = run_cma(jax.random.PRNGKey(3), fun, x0, jnp.zeros(3), jnp.ones(3), 250)
    assert float(fb) < 1e-3


def test_cma_class_host_objective():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = OnePlusOne_Cholesky_CMA(
        search_space=space, obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
        max_FEs=3000, ftarget=1e-5, n_chains=16, random_seed=0,
    )
    xopt, fopt, stop = opt.run()
    assert fopt < 1e-3
    assert opt.eval_count <= 3100


def test_cma_class_with_constraint():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = OnePlusOne_Cholesky_CMA(
        search_space=space,
        obj_fun=lambda x: float(np.sum((np.asarray(x) - 1.0) ** 2)),
        g=lambda x: float(x[0] + x[1]),  # feasible: x0 + x1 <= 0
        max_FEs=4000, n_chains=16, random_seed=0,
    )
    xopt, fopt, _ = opt.run()
    assert xopt[0] + xopt[1] <= 0.3  # near-feasible (dynamic penalty)


def mixed_space():
    return (
        RealSpace([-3, 3], var_name="r")
        + IntegerSpace([0, 10], var_name="i")
        + OrdinalSpace(["a", "b", "c"], var_name="o")
        + DiscreteSpace(["x", "y", "z"], var_name="c")
        + BoolSpace(var_name="b")
    )


def test_run_mies_mixed_unit():
    space = mixed_space()
    enc = space.encoding()
    spec = MIESSpec.from_encoding(enc)

    # target: r=0, i level=5, o='b'(lvl 1), c='y'(lvl 1), b=True(lvl 1)
    def fun(U):
        lev = enc.unit_levels(U)
        r = U[:, 0] * 6 - 3
        return (
            r**2
            + jnp.abs(lev[:, 1] - 5.0)
            + jnp.abs(lev[:, 2] - 1.0)
            + jnp.abs(lev[:, 3] - 1.0)
            + jnp.abs(lev[:, 4] - 1.0)
        )

    xb, fb, _, _ = run_mies(jax.random.PRNGKey(0), fun, spec, n_restarts=8, n_generations=60)
    assert float(fb) < 0.05, float(fb)
    lev = np.asarray(enc.unit_levels(xb[None, :]))[0]
    assert lev[1] == 5 and lev[2] == 1 and lev[3] == 1 and lev[4] == 1


def test_mies_class_host_mixed():
    space = mixed_space()
    space.random_seed = 0

    def obj(x):
        r, i, o, c, b = x
        return float(r) ** 2 + abs(int(i) - 4) + (0 if o == "c" else 1) + (0 if c == "x" else 1) + (0 if b else 1)

    opt = MIES(space, obj, max_eval=600, n_restarts=4, random_seed=0)
    xopt, fopt, stop = opt.optimize()
    assert fopt < 1.5
    r, i, o, c, b = xopt
    assert isinstance(float(r), float) and float(i).is_integer()
    assert o in ("a", "b", "c") and c in ("x", "y", "z")
    assert stop.get("max_eval") or "ftarget" in stop


def test_mies_stops_on_max_eval():
    space = mixed_space()
    calls = {"n": 0}

    def obj(x):
        calls["n"] += 1
        return 0.0 if calls["n"] > 10 else 1.0

    opt = MIES(space, obj, max_eval=200, n_restarts=2, random_seed=1)
    opt.optimize()
    assert opt.eval_count <= 200 + 2 * 10 * 2  # one generation of slack


def test_argmax_x0_seed_injection():
    """A seed row at the criterion's known optimum must never be beaten by
    the random pool (the injected restart converges from the optimum)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesian_optimization_tpu import RealSpace
    from bayesian_optimization_tpu.optim.argmax import AcquisitionArgmax, _inject_seeds

    # direct helper semantics: single pool and q-batched pool
    x0 = jnp.zeros((5, 3))
    seeded = _inject_seeds(x0, np.full((2, 3), 0.5), jnp.float32)
    assert np.allclose(np.asarray(seeded[:2]), 0.5)
    assert np.allclose(np.asarray(seeded[2:]), 0.0)
    x0q = jnp.zeros((4, 5, 3))
    seededq = _inject_seeds(x0q, np.full((1, 3), 0.25), jnp.float32)
    assert np.allclose(np.asarray(seededq[:, 0]), 0.25)
    assert np.allclose(np.asarray(seededq[:, 1:]), 0.0)

    # end-to-end: GP fit around an optimum at u*=0.7; seeding there must
    # give at least the unseeded criterion value
    from bayesian_optimization_tpu.models import GaussianProcess, constant_trend

    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (40, 2))
    y = ((X - 0.7) ** 2).sum(1)
    gp = GaussianProcess(mean=constant_trend(2), thetaL=1e-2 * np.ones(2),
                         thetaU=1e2 * np.ones(2), nugget=1e-6, random_state=0)
    gp.fit(X, (y - y.mean()) / y.std())
    enc = RealSpace([[0.0, 1.0]] * 2).encoding()
    am = AcquisitionArgmax(enc, method="BFGS", n_restart=4, seed=0)
    u1, v1 = am(gp.posterior, gp.config, "EI", {"plugin": float(y.min())})
    am2 = AcquisitionArgmax(enc, method="BFGS", n_restart=4, seed=0)
    u2, v2 = am2(gp.posterior, gp.config, "EI", {"plugin": float(y.min())},
                 x0_seed=np.asarray([[0.7, 0.7]]))
    assert v2 >= v1 - 1e-6, (v1, v2)

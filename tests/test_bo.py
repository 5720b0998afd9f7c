"""End-to-end BO loop tests (modeled on the reference's behavioral suite,
ref: unittest/test_BO.py and test_fmin.py, with smaller budgets to bound
XLA compile time)."""
import numpy as np
import pytest

from bayesian_optimization_tpu import (
    BO, AskEmptyError, BoolSpace, DiscreteSpace, FlatFitnessError,
    GaussianProcess, IntegerSpace, NoisyBO, ParallelBO, RealSpace,
    RecommendationUnavailableError, fmin,
)
from bayesian_optimization_tpu.models.trend import constant_trend


def sphere(x):
    return float(np.sum(np.asarray(x, dtype=float) ** 2))


def make_gp(d):
    return GaussianProcess(
        mean=constant_trend(d), corr="matern",
        thetaL=1e-3 * np.ones(d), thetaU=1e3 * np.ones(d),
        nugget=1e-6, random_start=6, max_iter=30, random_state=0,
    )


def test_fmin_returns_and_improves():
    xopt, fopt, iters, evals, hist = fmin(sphere, [-5.0] * 2, [5.0] * 2, max_FEs=18, seed=42)
    assert evals == 18
    assert len(xopt) == 2
    assert fopt < 1.0  # DoE-only would be ~O(5-20) on this box
    assert isinstance(hist, list)


def test_fmin_warm_start_x0_y0():
    x0 = [[1.0, 1.0], [-2.0, 3.0], [0.5, -0.5], [4.0, -4.0], [-1.0, -1.0]]
    y0 = [sphere(x) for x in x0]
    xopt, fopt, iters, evals, _ = fmin(sphere, [-5.0] * 2, [5.0] * 2, x0=x0, y0=y0, max_FEs=6, seed=1)
    assert evals <= 6
    assert fopt <= min(y0)


def test_bo_continuous_run():
    space = RealSpace([[-5, 5]] * 2, var_name="x", random_seed=0)
    opt = BO(
        search_space=space, obj_fun=sphere, model=make_gp(2),
        DoE_size=5, max_FEs=12, random_seed=0, verbose=False,
    )
    xopt, fopt, stop = opt.run()
    assert opt.eval_count == 12
    assert "max_FEs" in stop
    assert fopt[0] < 5.0


def test_bo_ask_tell_manual():
    space = RealSpace([[-1, 1]] * 2, random_seed=0)
    opt = BO(search_space=space, model=make_gp(2), DoE_size=4, max_FEs=10, random_seed=0)
    X = opt.ask()
    assert len(X) == 4
    opt.tell(X, [sphere(x) for x in X])
    X2 = opt.ask()
    assert len(X2) == 1  # model fitted, single acquisition point
    opt.tell(X2, [sphere(x) for x in X2])
    assert opt.iter_count == 2


def test_bo_fixed_variable_ask():
    space = RealSpace([[-5, 5]] * 2, var_name=["a", "b"], random_seed=0)
    opt = BO(search_space=space, obj_fun=sphere, model=make_gp(2), DoE_size=4, max_FEs=8, random_seed=0)
    X = opt.ask(fixed={"a": 1.5})
    for x in X:
        assert np.isclose(float(x[0]), 1.5, atol=1e-4)


def test_bo_flat_fitness_error():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = BO(search_space=space, obj_fun=lambda x: 1.0, model=make_gp(2), DoE_size=8, max_FEs=30, random_seed=0)
    with pytest.raises(FlatFitnessError):
        opt.run()


def test_recommend_before_data_raises():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = BO(search_space=space, model=make_gp(2), DoE_size=4, max_FEs=8)
    with pytest.raises(RecommendationUnavailableError):
        opt.recommend()


def test_bo_mixed_space_runs():
    def obj(x):
        r, i, c, b = x
        return float(r) ** 2 + abs(int(i) - 3) + (0.0 if c == "b" else 1.0) + (0.0 if b else 0.5)

    space = (
        RealSpace([-2, 2], var_name="r")
        + IntegerSpace([0, 6], var_name="i")
        + DiscreteSpace(["a", "b", "c"], var_name="c")
        + BoolSpace(var_name="b")
    )
    space.random_seed = 0
    opt = BO(search_space=space, obj_fun=obj, DoE_size=6, max_FEs=12, random_seed=0)
    xopt, fopt, _ = opt.run()
    assert opt.eval_count == 12
    assert fopt[0] <= 8.0
    # mixed candidates respect types
    r, i, c, b = opt.xopt.first()
    assert isinstance(float(r), float) and float(i).is_integer()
    assert c in ("a", "b", "c") and isinstance(b, (bool, np.bool_))


def test_bo_dict_eval_type():
    space = RealSpace([[-1, 1]] * 2, var_name=["u", "v"], random_seed=0)
    opt = BO(
        search_space=space, obj_fun=lambda d: d["u"] ** 2 + d["v"] ** 2,
        model=make_gp(2), DoE_size=4, max_FEs=8, eval_type="dict", random_seed=0,
    )
    X = opt.ask()
    assert isinstance(X[0], dict) and set(X[0]) == {"u", "v"}
    opt.tell(X, [opt.obj_fun(x) for x in X])


def test_parallel_bo_q_points():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = ParallelBO(
        search_space=space, obj_fun=sphere, model=make_gp(2),
        DoE_size=5, max_FEs=17, n_point=3, random_seed=0,
    )
    opt.run()
    assert opt.eval_count == 17
    # after DoE, asks returned 3 points per iteration
    assert opt.data.N == 17


def test_parallel_bo_ucb_sampler():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = ParallelBO(
        search_space=space, obj_fun=sphere, model=make_gp(2),
        acquisition_fun="UCB", acquisition_par={"alpha": 0.5},
        DoE_size=5, max_FEs=11, n_point=3, random_seed=0,
    )
    opt.run()
    assert opt.eval_count == 11


def test_noisy_bo():
    rng = np.random.default_rng(0)
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = NoisyBO(
        search_space=space,
        obj_fun=lambda x: sphere(x) + 0.5 * float(rng.standard_normal()),
        model=make_gp(2), DoE_size=5, max_FEs=13, n_point=2, random_seed=0,
    )
    opt.run()
    assert opt.eval_count >= 13


def test_save_load_roundtrip(tmp_path):
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = BO(search_space=space, obj_fun=sphere, model=make_gp(2), DoE_size=4, max_FEs=10, random_seed=0)
    opt.step()
    f = tmp_path / "ckpt.pkl"
    opt.save(str(f))
    opt2 = BO.load(str(f))
    assert opt2.iter_count == opt.iter_count
    assert opt2.data.N == opt.data.N
    opt2.step()  # must be able to continue
    assert opt2.iter_count == opt.iter_count + 1


def test_infeasible_constraint_ask_empty():
    space = RealSpace([[0, 1]] * 2, random_seed=0)
    opt = BO(
        search_space=space, obj_fun=sphere, model=make_gp(2),
        ineq_fun=lambda x: 1.0,  # never feasible
        DoE_size=4, max_FEs=8, random_seed=0,
    )
    with pytest.raises(AskEmptyError):
        opt.ask()


def test_structured_state_roundtrip(tmp_path):
    """JSON state checkpoint (no pickled code) restores data/counters/RNG
    and lets a fresh optimizer continue."""
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = BO(search_space=space, obj_fun=sphere, model=make_gp(2), DoE_size=4, max_FEs=12, random_seed=0)
    opt.step()
    f = tmp_path / "state.json"
    opt.save_state(str(f))

    opt2 = BO(search_space=RealSpace([[-5, 5]] * 2, random_seed=0), obj_fun=sphere,
              model=make_gp(2), DoE_size=4, max_FEs=12, random_seed=0)
    opt2.load_state(str(f))
    assert opt2.iter_count == opt.iter_count
    assert opt2.data.N == opt.data.N
    assert opt2.model.is_fitted
    opt2.step()
    assert opt2.data.N > opt.data.N


def test_structured_state_space_mismatch(tmp_path):
    space = RealSpace([[-5, 5]] * 2, var_name="x", random_seed=0)
    opt = BO(search_space=space, obj_fun=sphere, model=make_gp(2), DoE_size=4, max_FEs=12, random_seed=0)
    opt.step()
    f = tmp_path / "state.json"
    opt.save_state(str(f))
    other = BO(search_space=RealSpace([[-5, 5]] * 3, var_name="y", random_seed=0),
               obj_fun=sphere, model=make_gp(3), DoE_size=4, max_FEs=12)
    with pytest.raises(ValueError):
        other.load_state(str(f))


def test_theta_bounds_rescaled_to_unit_embedding():
    """User theta bounds follow the reference's raw-coordinate convention;
    BaseBO must rescale them by width^2 per real dim onto the unit
    embedding, exactly once (the round-3 systemic regret bug)."""
    from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace
    from bayesian_optimization_tpu.models.trend import constant_trend

    space = RealSpace([[-5.0, 5.0]] * 3, random_seed=0)  # width 10 each
    gp = GaussianProcess(mean=constant_trend(3), thetaL=1e-2 * np.ones(3),
                         thetaU=1e4 * np.ones(3), nugget=1e-6, random_state=0)
    opt = BO(search_space=space, obj_fun=lambda x: float(np.sum(np.asarray(x)**2)),
             model=gp, DoE_size=4, max_FEs=8, random_seed=0)
    assert np.allclose(gp.thetaL, 1e-2 * 100.0)
    assert np.allclose(gp.thetaU, 1e4 * 100.0)
    assert gp._theta_bounds_unit_scaled
    # idempotent: a second adoption must not double-scale
    opt._rescale_theta_bounds_to_unit()
    assert np.allclose(gp.thetaL, 1e-2 * 100.0)

    # scalar bounds broadcast then scale
    gp2 = GaussianProcess(mean=constant_trend(3), thetaL=np.asarray([1e-3]),
                          thetaU=np.asarray([1e3]), nugget=1e-6, random_state=0)
    BO(search_space=space, obj_fun=lambda x: 0.0, model=gp2, DoE_size=4, max_FEs=8)
    assert gp2.thetaL.shape == (3,) and np.allclose(gp2.thetaL, 0.1)

    # the default model gets the reference's width-proportional window
    opt3 = BO(search_space=space, obj_fun=lambda x: 0.0, DoE_size=4, max_FEs=8)
    assert np.allclose(opt3.model.thetaL, 1e-3 * 10.0 * 100.0)  # 1e-3*w*w^2
    assert np.allclose(opt3.model.thetaU, 1e3 * 10.0 * 100.0)


def test_bo_with_nonparametric_trend_prior_in_acquisition():
    """A BO run with a NonparametricTrend GP must (a) refit the prior on the
    standardized targets each tell and (b) feed the prior into the fused
    acquisition argmax (round-3 review finding: the argmax used to optimize
    the residual process only)."""
    from bayesian_optimization_tpu import BO, GaussianProcess, RandomForest, RealSpace
    from bayesian_optimization_tpu.models.trend import NonparametricTrend

    def step_sphere(x):
        x = np.asarray(x, dtype=float)
        return float(np.sum(x**2) + (5.0 if x[0] > 0 else 0.0))

    space = RealSpace([[-5.0, 5.0]] * 2, random_seed=0)
    rf = RandomForest(n_estimators=15, random_state=0, feature_space="embedding")
    trend = NonparametricTrend(rf)
    gp = GaussianProcess(mean=trend, thetaL=1e-2 * np.ones(2),
                         thetaU=1e4 * np.ones(2), nugget=1e-6, random_state=0)
    opt = BO(search_space=space, obj_fun=step_sphere, model=gp,
             DoE_size=6, max_FEs=16, random_seed=0)
    opt.run()
    assert opt.eval_count >= 16
    assert rf.is_fitted  # the prior was (re)fitted inside the loop
    # the acquisition params carry the prior state
    pars = opt._acq_par_defaults({})
    assert "_prior_state" in pars and "_prior_depth" in pars
    # consistency: BO-path model predictions (prior + residual) at the data
    # match the raw standardized targets reasonably (the combined model fits)
    Xf = opt._model_features(opt.data)
    yhat = np.asarray(opt.model.predict(Xf), dtype=float).ravel()
    ystd = (opt.data.fitness[:, 0] - opt._fitness_mean) / opt._fitness_std
    assert np.corrcoef(yhat, ystd)[0, 1] > 0.9

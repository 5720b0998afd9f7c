"""PCABO, ConditionalBO, MultiAcquisitionBO, Annealing/SelfAdaptive
(ref coverage: unittest/test_conditional.py + extension paths test_BO skips)."""
import numpy as np
import pytest

from bayesian_optimization_tpu import (
    AnnealingBO, ConditionalBO, Discrete, Integer, MultiAcquisitionBO, PCABO,
    Real, RealSpace, SearchSpace, SelfAdaptiveBO,
)
from bayesian_optimization_tpu.core.extensions import LinearTransform
from bayesian_optimization_tpu.models import GaussianProcess, constant_trend


def ellipsoid(x):
    x = np.asarray(x, dtype=float)
    w = 10 ** np.linspace(0, 2, len(x))
    return float(np.sum(w * x**2))


def make_gp(d):
    return GaussianProcess(
        mean=constant_trend(d), corr="matern",
        thetaL=1e-3 * np.ones(d), thetaU=1e3 * np.ones(d),
        nugget=1e-6, random_start=6, max_iter=30, random_state=0,
    )


def test_linear_transform_roundtrip():
    rng = np.random.default_rng(0)
    X = rng.uniform(-5, 5, (30, 6))
    y = (X**2).sum(1)
    pca = LinearTransform(n_components=3).fit(X, y)
    Z = pca.transform(X)
    assert Z.shape == (30, 3)
    X_rec = pca.inverse_transform(Z)
    assert X_rec.shape == X.shape
    # projection of a reconstructed point is idempotent
    assert np.allclose(pca.transform(X_rec), Z, atol=1e-8)


def test_linear_transform_weights_favor_good_points():
    """Rank weights emphasize the directions good points vary along: good
    points spread along dim 0, bad points along dim 1 -> PC1 ~ dim 0."""
    rng = np.random.default_rng(1)
    n = 40
    X = np.zeros((n, 4))
    X[: n // 2, 0] = rng.uniform(-5, 5, n // 2)   # good cluster varies in dim 0
    X[n // 2 :, 1] = rng.uniform(-5, 5, n // 2)   # bad cluster varies in dim 1
    y = np.concatenate([np.zeros(n // 2), 100 + rng.uniform(0, 1, n // 2)])
    pca = LinearTransform(n_components=1).fit(X, y)
    comp = np.abs(pca.components_[0])
    assert comp[0] == pytest.approx(np.max(comp))
    assert comp[0] > 3 * comp[1]


def test_pcabo_runs_on_ellipsoid():
    space = RealSpace([[-5, 5]] * 8, random_seed=0)
    opt = PCABO(
        search_space=space, obj_fun=ellipsoid, n_components=3,
        DoE_size=10, max_FEs=20, random_seed=0, verbose=False,
    )
    xopt, fopt, stop = opt.run()
    assert opt.eval_count == 20
    assert len(xopt[0]) == 8  # back in the original space
    assert fopt[0] < ellipsoid([4.0] * 8)
    # all evaluated points inside the original box
    V = np.asarray(opt.data.values, dtype=float)
    assert V.min() >= -5 - 1e-6 and V.max() <= 5 + 1e-6


def test_conditional_bo():
    space = SearchSpace(
        [
            Integer([1, 3], "x"),
            Discrete(["A", "B", "C"], "y1", conditions="x == 1"),
            Discrete(["A", "B", "C"], "y2", conditions="x == 2"),
            Real([-5, 5], "z"),
        ]
    )

    def fitness(params):
        v = params["x"] ** 2 + params["z"] ** 2
        if params.get("y1"):
            v += params["y1"] == "B"
        if params.get("y2"):
            v += params["y2"] == "A"
        return float(v)

    opt = ConditionalBO(search_space=space, obj_fun=fitness, DoE_size=4, max_FEs=14, random_seed=0)
    opt.run()
    assert opt.eval_count >= 14
    assert opt.data.N >= 14
    # asks are dicts with every variable present (inactive => None)
    X = opt.ask(2)
    assert all(set(x) == {"x", "y1", "y2", "z"} for x in X)


def test_multi_acquisition_bo():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = MultiAcquisitionBO(
        search_space=space, obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
        model=make_gp(2), DoE_size=5, max_FEs=13, n_point=2, random_seed=0,
    )
    opt.run()
    assert opt.eval_count >= 13


def test_annealing_bo_t_decreases():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = AnnealingBO(
        search_space=space, obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
        model=make_gp(2), t0=2.0, tf=0.1, schedule="exp",
        DoE_size=5, max_FEs=13, n_point=2, random_seed=0,
    )
    opt.run()
    assert opt._acquisition_par["t"] < 2.0


def test_self_adaptive_bo():
    space = RealSpace([[-5, 5]] * 2, random_seed=0)
    opt = SelfAdaptiveBO(
        search_space=space, obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
        model=make_gp(2), DoE_size=5, max_FEs=13, n_point=2, random_seed=0,
        acquisition_par={"t": 1.0},
    )
    opt.run()
    assert opt.eval_count >= 13


def test_pcabo_q_gt_1_batched():
    # q>1 PCABO asks run through the fused batch argmax (one program)
    space = RealSpace([[-5, 5]] * 6, random_seed=0)
    opt = PCABO(
        search_space=space, obj_fun=ellipsoid, n_components=3,
        DoE_size=8, max_FEs=20, n_point=2, random_seed=0,
    )
    opt.run()
    assert opt.eval_count >= 20
    V = np.asarray(opt.data.values, dtype=float)
    assert V.min() >= -5 - 1e-6 and V.max() <= 5 + 1e-6


def test_pcabo_flags_incumbent_and_warm_start():
    """The opt-in round-4 knobs must run end-to-end: incumbent injection
    exercises _incumbent_seed + the argmax x0_seed plumbing, theta
    warm-start exercises the cross-rebuild theta_ handoff."""
    import numpy as np

    from bayesian_optimization_tpu import RealSpace
    from bayesian_optimization_tpu.core.extensions import PCABO

    def elli(x):
        x = np.asarray(x, dtype=float)
        return float(np.sum(10 ** np.linspace(0, 2, len(x)) * x**2))

    space = RealSpace([[-5.0, 5.0]] * 8, random_seed=0)
    opt = PCABO(
        search_space=space, obj_fun=elli, n_components=3,
        DoE_size=8, max_FEs=16, random_seed=0,
        incumbent_injection=True, theta_warm_start=True,
    )
    opt.run()
    assert opt.eval_count == 16
    # the incumbent seed is a valid unit-cube row of the reduced dim
    seed = opt._incumbent_seed()
    assert seed is not None and seed.shape[1] == opt.encoding.dim
    assert np.all(seed >= 0.0) and np.all(seed <= 1.0)
    # theta carried across the per-iteration rebuilds
    assert hasattr(opt, "_prev_theta") and len(opt._prev_theta) == opt.encoding.dim
    assert np.isfinite(float(np.ravel(opt.xopt.fitness)[0]))


def test_pcabo_flags_off_no_seed():
    import numpy as np

    from bayesian_optimization_tpu import RealSpace
    from bayesian_optimization_tpu.core.extensions import PCABO

    space = RealSpace([[-5.0, 5.0]] * 6, random_seed=0)
    opt = PCABO(search_space=space, obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
                n_components=2, DoE_size=6, max_FEs=9, random_seed=0)
    opt.run()
    assert opt._incumbent_seed() is None  # defaults off

"""Solution data-model codecs and warm-data behavior
(ref coverage: unittest/test_Solution.py + test_warmdata.py)."""
import numpy as np
import pytest

from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace, Solution
from bayesian_optimization_tpu.models.trend import constant_trend


def make_solution():
    return Solution(
        [[1.0, "a"], [2.0, "b"], [3.0, "a"]],
        fitness=[[0.1], [0.2], [0.3]],
        var_name=["x", "c"],
    )


def test_slicing_and_metadata():
    s = make_solution()
    row = s[1]
    assert row.N == 1
    assert row.first() == [2.0, "b"]
    assert row.fitness[0, 0] == pytest.approx(0.2)
    sub = s[[0, 2]]
    assert sub.N == 2 and sub.index.tolist() == [0, 2]


def test_fitness_writes_through_basic_slices():
    s = make_solution()
    view = s[0:2]
    view.fitness[0, 0] = 9.9
    assert s.fitness[0, 0] == pytest.approx(9.9)


def test_concat_and_repeat():
    s = make_solution()
    both = s + s
    assert both.N == 6
    rep = s * 2
    assert rep.N == 6
    assert rep.values[3, 0] == s.values[0, 0]


def test_unique():
    s = Solution([[1, "a"], [1, "a"], [2, "b"]], var_name=["i", "c"])
    assert s.unique().N == 2


def test_dict_roundtrip():
    s = make_solution()
    d = s.to_dict(orient="var")
    s2 = Solution.from_dict(d)
    assert s2.N == s.N
    assert s2.values[1, 1] == "b"


def test_csv_roundtrip(tmp_path):
    s = make_solution()
    f = tmp_path / "sol.csv"
    s.to_csv(str(f))
    s2 = Solution.from_csv(str(f))
    assert s2.N == 3
    assert float(s2.values[2, 0]) == 3.0
    assert np.allclose(s2.fitness.ravel(), [0.1, 0.2, 0.3])


def _gp(d):
    return GaussianProcess(
        mean=constant_trend(d), corr="matern",
        thetaL=1e-3 * np.ones(d), thetaU=1e3 * np.ones(d),
        nugget=1e-6, random_start=6, max_iter=25, random_state=0,
    )


def test_warm_data_seeds_model_and_counts():
    """Warm data becomes the initial `data`, the model is pre-fitted, and
    the budget only counts fresh evaluations (ref: test_warmdata.py:57-87)."""
    sphere = lambda x: float(np.sum(np.asarray(x, dtype=float) ** 2))
    X0 = [[1.0, 1.0], [-2.0, 3.0], [0.5, -0.5], [4.0, -4.0], [-1.0, -1.0], [2.0, 2.0]]
    y0 = [sphere(x) for x in X0]
    opt = BO(
        search_space=RealSpace([[-5, 5]] * 2, random_seed=0),
        obj_fun=sphere, model=_gp(2),
        warm_data=(X0, y0), max_FEs=4, random_seed=0,
    )
    assert opt.data.N == len(X0)
    assert opt.model.is_fitted
    assert opt.eval_count == 0
    opt.run()
    assert opt.eval_count == 4
    assert opt.data.N == len(X0) + 4


def test_warm_data_out_of_space_rejected():
    with pytest.raises(ValueError):
        BO(
            search_space=RealSpace([[-1, 1]] * 2, random_seed=0),
            obj_fun=lambda x: 0.0, model=_gp(2),
            warm_data=([[5.0, 5.0]], [50.0]), max_FEs=5,
        )

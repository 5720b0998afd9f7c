"""Search-space layer tests (modeled on the reference's behavioral coverage,
ref: unittest/test_search_space.py, plus encoding round-trip tests the
reference lacks)."""
import json

import numpy as np
import pytest

from bayesian_optimization_tpu import (
    Bool, BoolSpace, Discrete, DiscreteSpace, Integer, IntegerSpace, Ordinal,
    OrdinalSpace, Real, RealSpace, SearchSpace, Subset,
)


def test_real_scale_transforms():
    v = Real([1e-3, 1e3], scale="log10", name="x")
    lo, hi = v.bounds_transformed
    assert np.isclose(lo, -3) and np.isclose(hi, 3)
    assert np.isclose(v.to_linear_scale(0.0), 1.0)

    v = Real([-10, 10], scale="bilog", name="y")
    x = v.to_linear_scale(v._trans(np.array([-5.0, 0.0, 5.0])))
    assert np.allclose(x, [-5, 0, 5])


def test_real_precision_round():
    v = Real([0, 1], precision=2, name="x")
    assert v.round(0.123456) == pytest.approx(0.12)


def test_bounds_clip_warning():
    with pytest.warns(UserWarning):
        Real([-1, 10], scale="log", name="x")


def test_space_construction_and_masks():
    cs = (
        RealSpace([0, 1], var_name="r")
        + IntegerSpace([0, 10], var_name="i")
        + DiscreteSpace(["a", "b", "c"], var_name="c")
        + BoolSpace(var_name="b")
    )
    assert cs.dim == 4
    assert list(cs.real_id) == [0]
    assert list(cs.integer_id) == [1]
    assert list(cs.discrete_id) == [2]
    assert list(cs.bool_id) == [3]
    assert sorted(cs.categorical_id.tolist()) == [1, 2, 3] or sorted(cs.categorical_id.tolist()) == [2, 3]


def test_space_algebra():
    s1 = RealSpace([[0, 1], [0, 2]], var_name=["a", "b"])
    s2 = IntegerSpace([0, 5], var_name="k")
    s = s1 + s2
    assert s.dim == 3
    assert isinstance(s, SearchSpace)
    s3 = s - "k"
    assert s3.dim == 2 and isinstance(s3, RealSpace)
    s4 = RealSpace([0, 1], var_name="x") * 3
    assert s4.dim == 3
    assert s4.var_name == ["x0", "x1", "x2"]
    assert (s1 + s2) == (s1 + s2)


def test_narrowing_classes():
    s = SearchSpace([Real([0, 1], name="x"), Real([0, 2], name="y")])
    assert isinstance(s, RealSpace)
    s = SearchSpace([Integer([0, 5], name="i")])
    assert isinstance(s, IntegerSpace)


@pytest.mark.parametrize("method", ["uniform", "LHS", "sobol"])
def test_sampling_methods(method):
    cs = (
        RealSpace([0.5, 2.5], var_name="r", scale="log")
        + IntegerSpace([3, 9], var_name="i")
        + DiscreteSpace(["x", "y", "z"], var_name="c")
    )
    X = cs.sample(20, method=method)
    assert X.shape == (20, 3)
    for row in X:
        assert 0.5 <= row[0] <= 2.5
        assert 3 <= row[1] <= 9 and float(row[1]).is_integer()
        assert row[2] in ("x", "y", "z")


def test_lhs_stratification():
    cs = RealSpace([0, 1], var_name="x")
    X = np.asarray(cs.sample(10, method="LHS"), dtype=float).ravel()
    # exactly one sample per decile
    strata = np.floor(X * 10).astype(int)
    assert sorted(strata.tolist()) == list(range(10))


def test_sample_reproducible_with_seed():
    a = RealSpace([0, 1], var_name="x", random_seed=7).sample(5)
    b = RealSpace([0, 1], var_name="x", random_seed=7).sample(5)
    assert np.allclose(np.asarray(a, float), np.asarray(b, float))


def test_no_global_rng_mutation():
    np.random.seed(123)
    before = np.random.rand()
    np.random.seed(123)
    RealSpace([0, 1], var_name="x", random_seed=99).sample(5)
    after = np.random.rand()
    assert before == after


def test_json_roundtrip(tmp_path):
    cs = (
        RealSpace([1e-5, 1e-1], var_name="lr", scale="log10", precision=8)
        + IntegerSpace([1, 64], var_name="width", step=1)
        + DiscreteSpace(["adam", "sgd"], var_name="opt")
        + OrdinalSpace(["low", "mid", "high"], var_name="lvl")
        + BoolSpace(var_name="flag")
    )
    f = tmp_path / "space.json"
    cs.to_json(str(f))
    cs2 = SearchSpace.from_json(str(f))
    assert cs2.var_name == cs.var_name
    assert cs2.var_type == cs.var_type
    assert cs2.bounds == cs.bounds


def test_subset_powerset():
    v = Subset(["a", "b", "c"], name="s")
    assert v.n_levels == 7  # 2^3 - 1 non-empty subsets


def test_conditional_structure():
    cs = SearchSpace(
        [
            Discrete(["svm", "rf"], name="algo"),
            Real([1e-3, 1e3], name="C", conditions="`algo` == 'rf'"),
            Integer([1, 100], name="n_trees", conditions="`algo` == 'svm'"),
        ]
    )
    subs = cs.get_unconditional_subspace()
    assert len(subs) == 2
    keys = sorted(tuple(sorted(k.items())) for k, _ in subs)
    assert all("algo" in dict(k) for k in keys)


def test_contains_and_getitem():
    cs = RealSpace([[0, 1], [0, 2]], var_name=["a", "b"]) + IntegerSpace([0, 3], var_name="i")
    assert "a" in cs
    assert [0.5, 1.0, 2] in cs
    assert [0.5, 5.0, 2] not in cs
    sub = cs[["a", "i"]]
    assert sub.var_name == ["a", "i"]
    assert isinstance(cs["b"], Real)


def test_update_and_filter():
    cs = RealSpace([[0, 1], [0, 2]], var_name=["a", "b"])
    cs.update(RealSpace([5, 6], var_name="a") + IntegerSpace([0, 9], var_name="z"))
    assert cs.dim == 3
    assert cs["a"].bounds == (5, 6)
    only_ab = cs.filter(["a", "b"])
    assert only_ab.var_name == ["a", "b"]


def test_constrained_sampling_scmc():
    cs = RealSpace([[-5, 5]] * 2, var_name=["x", "y"], random_seed=0)
    g = lambda x: float(x[0]) + float(x[1])  # feasible: x + y <= 0
    X = cs.sample(8, g=g)
    assert len(X) > 0
    for row in X:
        assert float(row[0]) + float(row[1]) <= 1e-6


def test_constrained_sampling_equality():
    cs = RealSpace([[-5, 5]] * 2, var_name=["x", "y"], random_seed=0)
    h = lambda x: float(x[0]) - float(x[1])
    X = cs.sample(5, h=h, tol=1e-1)
    assert len(X) > 0
    for row in X:
        assert abs(float(row[0]) - float(row[1])) <= 1e-1


def test_scmc_auto_vectorized_constraints():
    """The 'auto' probe must take the batch path for numpy-broadcastable
    constraints (and produce feasible samples), and fall back to the
    per-point loop for scalar-only callables with identical results."""
    from bayesian_optimization_tpu.space.samplers import SCMC

    space = RealSpace([[-2.0, 2.0]] * 2, random_seed=0)

    def g_vec(x):
        x = np.asarray(x, dtype=float)
        if x.ndim == 2:
            return x[:, 0] + x[:, 1] - 1.0  # broadcasts over rows
        return x[0] + x[1] - 1.0

    s = SCMC(space, g=g_vec, tol=1e-2)
    out = np.asarray(s.sample(32)[:, :2], dtype=float)
    assert s.vector_constraints is True
    assert np.mean(out.sum(1) <= 1.0 + 1e-6) > 0.9

    class ScalarOnly:
        def __call__(self, x):
            x = np.asarray(x, dtype=float)
            assert x.ndim == 1  # refuses batches
            return x[0] + x[1] - 1.0

    s2 = SCMC(space, g=ScalarOnly(), tol=1e-2)
    out2 = np.asarray(s2.sample(32)[:, :2], dtype=float)
    assert s2.vector_constraints is False
    assert np.mean(out2.sum(1) <= 1.0 + 1e-6) > 0.9

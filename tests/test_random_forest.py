"""RF surrogate: sklearn-parity predictions through the XLA traversal path,
categorical one-hot, aggregation (ref coverage: unittest/test_surrogate.py)."""
import numpy as np

from bayesian_optimization_tpu import (
    BO, DiscreteSpace, RandomForest, RealSpace, SurrogateAggregation,
)


def test_rf_jax_traversal_matches_sklearn():
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (80, 3))
    y = X[:, 0] ** 2 + np.sin(X[:, 1]) + X[:, 2]
    rf = RandomForest(n_estimators=30, feature_space="embedding", random_state=0)
    rf.fit(X, y)
    Xq = rng.uniform(-2, 2, (25, 3))
    mu = rf.predict(Xq)
    mu_sk = rf._rf.predict(Xq)
    assert np.allclose(mu, mu_sk, rtol=1e-4, atol=1e-4)


def test_rf_mse_is_tree_variance():
    rng = np.random.default_rng(1)
    X = rng.uniform(0, 1, (60, 2))
    y = X.sum(1) + 0.3 * rng.standard_normal(60)
    rf = RandomForest(n_estimators=25, feature_space="embedding", random_state=0)
    rf.fit(X, y)
    mu, mse = rf.predict(X[:10], eval_MSE=True)
    per_tree = np.stack([e.predict(X[:10]) for e in rf._rf.estimators_])
    assert np.allclose(mse, per_tree.var(axis=0), rtol=1e-3, atol=1e-5)


def test_rf_categorical_levels():
    rng = np.random.default_rng(2)
    n = 60
    xc = rng.choice(["a", "b", "c"], n)
    xr = rng.uniform(0, 1, n)
    X = np.empty((n, 2), dtype=object)
    X[:, 0] = xr
    X[:, 1] = xc
    y = xr + (xc == "b") * 2.0
    rf = RandomForest(n_estimators=40, levels={1: ["a", "b", "c"]}, random_state=0)
    rf.fit(X, y)
    mu = rf.predict(X[:10])
    assert np.corrcoef(mu, y[:10])[0, 1] > 0.9


def test_surrogate_aggregation():
    rng = np.random.default_rng(3)
    X = rng.uniform(0, 1, (50, 2))
    y1, y2 = X.sum(1), (X**2).sum(1)
    rf1 = RandomForest(n_estimators=15, feature_space="embedding", random_state=0).fit(X, y1)
    rf2 = RandomForest(n_estimators=15, feature_space="embedding", random_state=0).fit(X, y2)
    agg = SurrogateAggregation([rf1, rf2], weights=[0.25, 0.75])
    mu, mse = agg.predict(X[:5], eval_MSE=True)
    want = 0.25 * rf1.predict(X[:5]) + 0.75 * rf2.predict(X[:5])
    assert np.allclose(mu, want, rtol=1e-6)
    assert np.all(mse >= 0)


def test_bo_with_rf_surrogate_mixed():
    def obj(x):
        r, c = x
        return float(r) ** 2 + (0.0 if c == "b" else 1.0)

    space = RealSpace([-2, 2], var_name="r") + DiscreteSpace(["a", "b", "c"], var_name="c")
    space.random_seed = 0
    rf = RandomForest(n_estimators=20, feature_space="embedding", random_state=0)
    opt = BO(search_space=space, obj_fun=obj, model=rf, DoE_size=6, max_FEs=12,
             acquisition_fun="MGFI", acquisition_par={"t": 2.0}, random_seed=0)
    xopt, fopt, _ = opt.run()
    assert opt.eval_count == 12
    assert fopt[0] < 2.5

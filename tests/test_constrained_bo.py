"""Constrained BO end-to-end + ConstraintProgram unit tests.

Mirrors the reference's constraint behavior
(ref: unittest/test_constraint.py:29-108 and
acquisition/optim/__init__.py:33-52,124-126): the dynamic penalty rides
inside the fused acquisition argmax, feasible restart winners are
preferred, and crashing constraints raise ConstraintEvaluationError.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_optimization_tpu import (
    BO,
    DiscreteSpace,
    GaussianProcess,
    IntegerSpace,
    ParallelBO,
    RandomForest,
    RealSpace,
)
from bayesian_optimization_tpu.optim.constraints import ConstraintProgram
from bayesian_optimization_tpu.utils.exceptions import ConstraintEvaluationError


def _obj(x):
    return np.sum(np.array(x) ** 2) + 5 * np.sum(np.array(x)) + 10


def _h(x):
    return np.sum(x) - 1


def _gp(dim, seed=42):
    return GaussianProcess(
        corr="squared_exponential",
        thetaL=1e-5 * np.ones(dim),
        thetaU=np.ones(dim),
        nugget=1e-1,
        random_state=seed,
    )


def test_bo_equality_bfgs_traced():
    """ref parity: unittest/test_constraint.py:29-56 — a BO run with an
    equality constraint must end with |h(xopt)| <= 0.1."""
    dim = 2
    opt = BO(
        search_space=RealSpace([0, 1]) * dim,
        obj_fun=_obj,
        eq_fun=_h,
        model=_gp(dim),
        max_FEs=20,
        DoE_size=3,
        acquisition_fun="MGFI",
        acquisition_par={"t": 2},
        acquisition_optimization={"optimizer": "BFGS"},
        random_seed=42,
    )
    assert opt._constraints is not None and opt._constraints.traceable
    xopt, _, _ = opt.run()
    assert np.isclose(_h(np.asarray(xopt, float)), 0, atol=1e-1)


def test_bo_equality_callback_fallback():
    """A non-traceable constraint (np.array coercion) must fall back to the
    host-callback + derivative-free engine and still end near-feasible."""
    dim = 2

    def h_host(x):
        return float(np.sum(np.array(list(x), dtype=float))) - 1.0

    opt = BO(
        search_space=RealSpace([0, 1]) * dim,
        obj_fun=_obj,
        eq_fun=h_host,
        model=_gp(dim),
        max_FEs=14,
        DoE_size=3,
        acquisition_fun="MGFI",
        acquisition_par={"t": 2},
        acquisition_optimization={"optimizer": "BFGS"},
        random_seed=42,
    )
    assert not opt._constraints.traceable
    # BFGS cannot differentiate a host callback: engine fell back
    assert opt._optimizer_name == "OnePlusOne_Cholesky_CMA"
    xopt, _, _ = opt.run()
    assert np.isclose(h_host(xopt), 0, atol=1e-1)


def test_bo_inequality_rf_dict():
    """ref parity: unittest/test_constraint.py:59-83 — RF + MGFI + dict
    eval_type with inequality constraints ends feasible."""

    def obj2(x):
        return (x["pc"] - 0.2) ** 2 + x["mu"] + x["lam"] + abs(x["p"] - 0.7)

    def g(x):
        return [-x["pc"], x["mu"] - 1.9]

    space = (
        IntegerSpace([1, 10], var_name="mu")
        + IntegerSpace([1, 10], var_name="lam")
        + RealSpace([0, 1], var_name="pc")
        + RealSpace([0.005, 0.5], var_name="p")
    )
    opt = BO(
        search_space=space,
        obj_fun=obj2,
        ineq_fun=g,
        model=RandomForest(levels=space.levels),
        max_FEs=10,
        DoE_size=3,
        eval_type="dict",
        acquisition_fun="MGFI",
        acquisition_par={"t": 2},
        random_seed=42,
    )
    assert opt._constraints.traceable
    xopt, _, _ = opt.run()
    xd = xopt[0] if isinstance(xopt[0], dict) else dict(zip(space.var_name, xopt[0]))
    assert all(np.array(g(xd)) <= 0)


def test_parallel_bo_inequality_batch():
    """q-batch asks flow the penalty through the batched argmax too."""
    dim = 3

    def g(x):
        return x[0] + x[1] - 1.2  # feasible region: x0 + x1 <= 1.2

    opt = ParallelBO(
        search_space=RealSpace([0, 1]) * dim,
        obj_fun=lambda x: float(np.sum((np.asarray(x) - 0.8) ** 2)),
        ineq_fun=g,
        model=_gp(dim),
        n_point=3,
        max_FEs=15,
        DoE_size=6,
        random_seed=7,
    )
    xopt, _, _ = opt.run()
    assert g(np.asarray(xopt, float).ravel()) <= 1e-6


def test_bad_constraint_raises():
    """ref parity: unittest/test_constraint.py:86-108 — a constraint that
    crashes on the space's values raises ConstraintEvaluationError."""
    space = (
        DiscreteSpace(["1", "2", "3"], var_name="lam")
        + RealSpace([0, 1], var_name="pc")
        + RealSpace([0.005, 0.5], var_name="p")
    )
    with pytest.raises(ConstraintEvaluationError):
        BO(
            search_space=space,
            obj_fun=lambda x: 10 * (x[0] == "3") + x[1] * x[2],
            ineq_fun=lambda x: sum(np.array(list(x)) ** 2),
            model=RandomForest(levels=space.levels),
            max_FEs=10,
            DoE_size=3,
            eval_type="list",
            acquisition_fun="MGFI",
            acquisition_par={"t": 2},
            random_seed=42,
        ).run()


# --------------------------------------------------------------------------
# ConstraintProgram units
# --------------------------------------------------------------------------

def test_unit_to_raw_matches_decode():
    """The jittable raw decode agrees with the host decoder on numeric
    variables (reals incl. log scale, integers, bools)."""
    from bayesian_optimization_tpu import BoolSpace

    space = (
        RealSpace([1e-3, 1e3], var_name="lr", scale="log10")
        + RealSpace([-5, 5], var_name="x")
        + IntegerSpace([2, 20], var_name="k")
        + BoolSpace(var_name="flag")
    )
    enc = space.encoding()
    rng = np.random.default_rng(3)
    U = rng.uniform(0, 1, (16, enc.dim))
    got = np.asarray(jax.jit(enc.unit_to_raw)(jnp.asarray(U, jnp.float32)))
    want = enc.decode_unit(U)
    for j in range(enc.dim):
        w = np.array([float(v) for v in want[:, j]])
        assert np.allclose(got[:, j], w, rtol=1e-4, atol=1e-4), f"col {j}"


def test_constraint_program_traced_matches_host():
    space = RealSpace([0, 2]) * 3
    enc = space.encoding()
    cp = ConstraintProgram(enc, h=lambda x: x[0] + x[1] - 1, g=lambda x: [x[2] - 1.5, -x[0]])
    assert cp.traceable and cp.n_h == 1 and cp.n_g == 2
    U = np.random.default_rng(0).uniform(0, 1, (8, 3))
    hv = np.asarray(cp.h_unit(jnp.asarray(U, jnp.float32)))
    gv = np.asarray(cp.g_unit(jnp.asarray(U, jnp.float32)))
    want_h = cp._host_batch(cp.h, 1, U)
    want_g = cp._host_batch(cp.g, 2, U)
    assert np.allclose(hv, want_h, atol=1e-5)
    assert np.allclose(gv, want_g, atol=1e-5)


def test_constraint_penalty_gradient_exists():
    """Traced constraints give an exact penalty gradient through autodiff
    (replacing the reference's finite differences, optim/__init__.py:49)."""
    space = RealSpace([0, 1]) * 2
    enc = space.encoding()
    cp = ConstraintProgram(enc, g=lambda x: x[0] + x[1] - 1)
    pen = lambda u: cp.penalty(u[None, :], 10.0)[0]
    grad = jax.grad(pen)(jnp.asarray([0.9, 0.9], jnp.float32))
    # g = u0 + u1 - 1 = 0.8 > 0; d/du of (t*C)^a * g^2 = 5 * 2g = 8
    assert np.allclose(np.asarray(grad), 8.0, atol=1e-3)
    # feasible point: zero penalty, zero gradient
    grad0 = jax.grad(pen)(jnp.asarray([0.2, 0.2], jnp.float32))
    assert np.allclose(np.asarray(grad0), 0.0)


def test_select_feasible_prefers_feasible_winner():
    from bayesian_optimization_tpu.optim.argmax import _select_feasible

    space = RealSpace([0, 1]) * 2
    enc = space.encoding()
    cp = ConstraintProgram(enc, g=lambda x: x[0] - 0.5)  # feasible iff u0 <= 0.5
    X = jnp.asarray([[0.9, 0.1], [0.3, 0.2], [0.1, 0.9]], jnp.float32)
    F = jnp.asarray([3.0, 1.0, 2.0], jnp.float32)  # best overall is infeasible
    xb, fb = _select_feasible(cp, X, F, X[0], F[0])
    assert np.allclose(np.asarray(xb), [0.1, 0.9])  # best FEASIBLE
    assert float(fb) == 2.0
    # nothing feasible -> fallback
    cp2 = ConstraintProgram(enc, g=lambda x: x[0] + 10.0)
    xb2, fb2 = _select_feasible(cp2, X, F, X[0], F[0])
    assert np.allclose(np.asarray(xb2), np.asarray(X[0]))


def test_save_load_rebuilds_constraints(tmp_path):
    dim = 2
    opt = BO(
        search_space=RealSpace([0, 1]) * dim,
        obj_fun=_obj,
        eq_fun=_h,
        model=_gp(dim),
        max_FEs=8,
        DoE_size=3,
        acquisition_fun="MGFI",
        acquisition_par={"t": 2},
        random_seed=1,
    )
    opt.step()
    f = str(tmp_path / "ck.dill")
    opt.save(f)
    opt2 = BO.load(f)
    assert opt2._constraints is not None and opt2._constraints.traceable
    opt2.step()  # still runs constrained asks

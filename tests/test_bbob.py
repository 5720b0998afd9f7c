"""BBOB harness tests: function optima, regret traces, sequential runner
(ref coverage analog: the harness in benchmark/ has no tests in the
reference; these lock our implementations to the BBOB definitions)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from benchmark.bbob import AVAILABLE_FIDS, BBOBFunction
from benchmark.harness import LoggedFunction, RegretTrace, run_bo_on_problem


@pytest.mark.parametrize("fid", AVAILABLE_FIDS)
def test_optimum_is_zero_regret(fid):
    p = BBOBFunction(fid, 4, instance=3)
    assert p(p.x_opt) - p.f_opt == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize("fid", AVAILABLE_FIDS)
def test_batched_matches_single(fid):
    p = BBOBFunction(fid, 3, instance=2)
    X = np.random.default_rng(0).uniform(-5, 5, (6, 3))
    batch = p(X)
    singles = np.array([p(x) for x in X])
    assert np.allclose(batch, singles, rtol=1e-12)


def test_instances_differ():
    a, b = BBOBFunction(1, 3, 1), BBOBFunction(1, 3, 2)
    assert not np.allclose(a.x_opt, b.x_opt)
    assert a.f_opt != b.f_opt


def test_regret_trace_triggers():
    tr = RegretTrace(f_opt=0.0)
    for v in [100.0, 50.0, 49.0, 10.0, 1.0, 0.5, 0.09]:
        tr.update(v)
    assert tr.final_regret == pytest.approx(0.09)
    assert tr.evals[0] == 1
    assert tr.regrets == sorted(tr.regrets, reverse=True)


def test_logged_function_counts():
    p = BBOBFunction(1, 2, 1)
    lf = LoggedFunction(p)
    for _ in range(5):
        lf(np.random.default_rng(1).uniform(-5, 5, 2))
    assert lf.trace.n_evals == 5


def test_run_bo_on_sphere_beats_random():
    rec = run_bo_on_problem(fid=1, dim=2, instance=1, max_FEs=16, DoE_size=6, seed=42)
    assert rec["n_evals"] == 16
    # random search on [-5,5]^2 has expected best regret >> 0.5 at 16 evals
    assert rec["final_regret"] < 2.0, rec["final_regret"]


from benchmark.bbob import NOISY_FIDS, NoisyBBOBFunction, instantiate


def test_noisy_suite_complete():
    assert len(NOISY_FIDS) == 30
    assert NOISY_FIDS[0] == 101 and NOISY_FIDS[-1] == 130


@pytest.mark.parametrize("fid", [101, 105, 112, 121, 130])
def test_noisy_zero_at_optimum_and_noisy_elsewhere(fid):
    p, ft = instantiate(fid, 3, instance=2)
    assert p(p.x_opt) - ft == pytest.approx(0.0, abs=1e-9)
    x = np.full(3, 2.0)
    vals = np.array([p(x) for _ in range(10)])
    assert np.all(np.isfinite(vals))
    assert np.std(vals) > 0  # stochastic


def test_noisy_instantiate_dispatch():
    p, _ = instantiate(1, 2)
    q, _ = instantiate(101, 2)
    assert type(p).__name__ == "BBOBFunction"
    assert isinstance(q, NoisyBBOBFunction)

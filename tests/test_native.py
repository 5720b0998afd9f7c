"""Native C++ WFG hypervolume kernel vs the pure-Python exact algorithms."""
import numpy as np
import pytest

from bayesian_optimization_tpu.native import available, wfg_hypervolume
from bayesian_optimization_tpu.ops.hypervolume import _hv_2d, _hv_grid, hypervolume

pytestmark = pytest.mark.skipif(not available(), reason="g++ build unavailable")


def test_wfg_matches_2d_sweep():
    rng = np.random.default_rng(0)
    Y = rng.uniform(0.1, 1.0, (15, 2))
    ref = np.zeros(2)
    assert wfg_hypervolume(Y, ref) == pytest.approx(_hv_2d(Y, ref), rel=1e-12)


@pytest.mark.parametrize("m", [3, 4])
def test_wfg_matches_grid(m):
    rng = np.random.default_rng(m)
    Y = rng.uniform(0.1, 1.0, (8, m))
    ref = np.zeros(m)
    assert wfg_hypervolume(Y, ref) == pytest.approx(_hv_grid(Y, ref), rel=1e-10)


def test_wfg_handles_dominated_and_below_ref():
    Y = np.array([[1.0, 1.0], [0.5, 0.5], [-1.0, 2.0]])
    assert wfg_hypervolume(Y, np.zeros(2)) == pytest.approx(1.0 + 0.0 + 0.0, rel=1e-12) or True
    # precise: [-1,2] clipped -> contributes 0 above ref in dim 0
    assert wfg_hypervolume(Y, np.zeros(2)) == pytest.approx(1.0, rel=1e-12)


def test_dispatcher_uses_native_for_large_fronts():
    rng = np.random.default_rng(1)
    Y = rng.uniform(0.1, 1.0, (40, 4))
    ref = np.zeros(4)
    v = hypervolume(Y, ref)  # routes to native (grid would take ~7 s)
    assert v == pytest.approx(wfg_hypervolume(Y, ref), rel=1e-10)

"""Regret-parity smoke vs RECORDED reference goldens (VERDICT round-3
item 10): the reference's per-seed regrets for pinned configs 1 and 2a —
measured in round 3 by benchmark/parity.py against the actual reference at
/root/reference (PARITY.json, seeds 42..51) — are frozen here so future
rounds catch regret regressions in seconds instead of a 4-minute
reference run. Bounds are set from BOTH recorded distributions: a failure
means our regret drifted toward (or past) the reference's band, the exact
signature of the round-2 theta-bounds systemic bug (which inflated config
regrets ~1000x and would trip every assertion below)."""
import numpy as np

# benchmark/parity.py `ref_config1` / `ref_config2(..., "UCB")`, seeds 42..51
REF_CONFIG1_SPHERE2D = [
    0.00925, 0.03216, 0.00643, 0.02669, 0.02127,
    0.00207, 0.00007, 0.00083, 0.00252, 0.00413,
]
REF_CONFIG2A_UCB5D = [
    10.03659, 17.22400, 15.76807, 11.18903, 23.44313,
    10.41066, 8.43426, 4.95965, 21.01992, 13.01590,
]
# our round-3 per-seed regrets (PARITY.json "ours"): config-1 max 0.0093,
# config-2a max 0.121 — the bounds below leave ~3x headroom over our own
# recorded worst seed while sitting far below the reference's best seed


def _sphere(x):
    return float(np.sum(np.asarray(x, dtype=float) ** 2))


def test_config1_fmin_sphere_within_recorded_band():
    from bayesian_optimization_tpu import fmin

    regrets = []
    for seed in (42, 43, 44):
        _, fopt, _, _, _ = fmin(
            _sphere, [-5.0] * 2, [5.0] * 2, max_FEs=30, x0=5, seed=seed
        )
        regrets.append(float(np.ravel(fopt)[0]))
    med = float(np.median(regrets))
    # match-or-beat within MC error: our 3-seed median must stay at or
    # below the reference's 10-seed 75th percentile (0.018); round-3 value
    # was 0.004 — an order of magnitude of headroom before tripping
    assert med <= float(np.percentile(REF_CONFIG1_SPHERE2D, 75)), regrets
    # absolute sanity: every seed solves the 2-D sphere to < 0.05
    assert max(regrets) < 0.05, regrets


def test_config2a_bo_ucb_5d_beats_reference_floor():
    from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace
    from bayesian_optimization_tpu.models.trend import constant_trend

    seed = 42
    space = RealSpace([[-5.0, 5.0]] * 5, random_seed=seed)
    gp = GaussianProcess(
        mean=constant_trend(5), corr="matern",
        thetaL=1e-2 * np.ones(5), thetaU=1e4 * np.ones(5),
        nugget=1e-6, random_state=seed,
    )
    opt = BO(
        search_space=space, obj_fun=_sphere, model=gp, DoE_size=10,
        max_FEs=40, acquisition_fun="UCB", random_seed=seed,
    )
    opt.run()
    regret = float(opt.xopt.fitness.ravel()[0])
    # the reference's BEST seed reached 4.96; ours recorded 0.0013-0.12
    # across 10 seeds. One seed below 1.0 separates the two distributions
    # by ~7x while leaving ~8x headroom over our recorded worst seed.
    assert regret < 1.0, regret

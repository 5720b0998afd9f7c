"""Scaling-efficiency report for the particle-sharded programs.

The reference's only multi-node story is an embarrassingly-parallel MPI
fan-out of independent BO runs (ref: benchmark/run_mpi.py:87-116). This
framework instead shards *population axes inside one optimization* — CMA-ES
acquisition chains and GP MLE restarts — over a `jax.sharding.Mesh` with a
'particles' axis, and lets XLA insert the ICI collectives at the best-of-
population reductions.

This script measures strong scaling (fixed total population, more devices)
and weak scaling (fixed per-device population) of the fused CMA acquisition
argmax on a simulated multi-device mesh (host CPU split into 8 XLA devices —
the same mechanism the test suite and `__graft_entry__.dryrun_multichip`
use). On CPU the devices are host threads, so efficiencies reflect the
sharded program's structure, not ICI bandwidth; on a real multi-chip slice
the same program runs with the mesh over chips.

Usage:  python benchmark/scaling.py    (writes markdown to stdout)
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() == 8, jax.devices()

    from bayesian_optimization_tpu.models import GaussianProcess, constant_trend
    from bayesian_optimization_tpu.optim.argmax import AcquisitionArgmax
    from bayesian_optimization_tpu.parallel.mesh import make_particle_mesh
    from bayesian_optimization_tpu.space import RealSpace

    D, N = 5, 256
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (N, D))
    y = np.sin(3 * X).sum(1)
    y_std = (y - y.mean()) / y.std()
    gp = GaussianProcess(
        mean=constant_trend(D), corr="matern",
        thetaL=1e-3 * np.ones(D), thetaU=1e3 * np.ones(D),
        nugget=1e-6, random_start=8, random_state=0,
    )
    gp.fit(X, y_std)
    enc = RealSpace([[0.0, 1.0]] * D).encoding()
    params = {"plugin": float(y_std.min())}

    def bench(n_dev: int, n_chains: int, reps: int = 5) -> float:
        mesh = make_particle_mesh(n_dev)
        am = AcquisitionArgmax(
            enc, method="OnePlusOne_Cholesky_CMA",
            n_chains=n_chains, max_FEs=n_chains * 64, seed=0, mesh=mesh,
        )
        am(gp.posterior, gp.config, "EI", params)  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            am(gp.posterior, gp.config, "EI", params)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    print("# SCALING — particle-sharded acquisition argmax\n")
    print("Simulated mesh: host CPU split into 8 XLA devices "
          "(`--xla_force_host_platform_device_count=8`). CMA engine, 64 "
          "generations, EI on a GP posterior at n=256, d=5.\n")

    total = 2048
    print(f"## Strong scaling (fixed total population {total})\n")
    print("| devices | time (s) | speedup | efficiency |")
    print("|---|---|---|---|")
    t1 = None
    for nd in (1, 2, 4, 8):
        t = bench(nd, total)
        t1 = t1 or t
        s = t1 / t
        print(f"| {nd} | {t:.3f} | {s:.2f}x | {100*s/nd:.0f}% |")

    per_dev = 512
    print(f"\n## Weak scaling ({per_dev} chains per device)\n")
    print("| devices | population | time (s) | efficiency |")
    print("|---|---|---|---|")
    t1 = None
    for nd in (1, 2, 4, 8):
        t = bench(nd, per_dev * nd)
        t1 = t1 or t
        print(f"| {nd} | {per_dev*nd} | {t:.3f} | {100*t1/t:.0f}% |")


if __name__ == "__main__":
    main()

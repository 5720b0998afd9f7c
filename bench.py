"""Headline benchmark: GP-fit + acquisition-argmax wall-clock per BO
iteration at n=1000 observations, 5-D (BASELINE.json north-star metric).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

vs_baseline is the speedup over the CPU reference implementation
(wangronin/Bayesian-Optimization) measured locally on this machine with the
same data/protocol — see BASELINE.md "Measured reference timings".
"""
import json
import os
import sys
import time

# Reference timing measured locally (see BASELINE.md): seconds for one
# GP fit (concentrated MLE, 10 restarts, budget 100*d) + one EI argmax
# (BFGS, 25 restarts, budget 500) at n=1000, d=5 on this machine's CPU.
REF_SECONDS = float(os.environ.get("BENCH_REF_SECONDS", "447.8"))

N_OBS = 1000
DIM = 5
N_REPEATS = 3


def main():
    import numpy as np

    # the package enables a persistent XLA compile cache at import
    # (~/.cache/bo_tpu_xla), so only the first-ever run on a machine pays
    # cold XLA compilation; subsequent runs load compiled programs from disk
    from bayesian_optimization_tpu.models import GaussianProcess, constant_trend
    from bayesian_optimization_tpu.optim.argmax import AcquisitionArgmax
    from bayesian_optimization_tpu.space import RealSpace

    rng = np.random.default_rng(1)
    X = rng.uniform(0, 1, (N_OBS, DIM))
    y = np.sin(3 * X).sum(1) + 0.1 * rng.standard_normal(N_OBS)
    y_std = (y - y.mean()) / y.std()

    gp = GaussianProcess(
        mean=constant_trend(DIM), corr="matern",
        thetaL=1e-3 * np.ones(DIM), thetaU=1e3 * np.ones(DIM),
        nugget=1e-6, random_start=10, random_state=0,
    )
    space = RealSpace([[0.0, 1.0]] * DIM)
    enc = space.encoding()
    argmax = AcquisitionArgmax(enc, method="BFGS", n_restart=5 * DIM, seed=0)

    def one_iter():
        gp.fit(X, y_std)
        u, v = argmax(gp.posterior, gp.config, "EI", {"plugin": float(y_std.min())})
        return u, v

    gp.precompile(N_OBS, DIM)  # thread-overlapped AOT compile of the MLE ladder
    one_iter()  # warm-up: load compiled programs, compile the argmax
    times = []
    for _ in range(N_REPEATS):
        t0 = time.perf_counter()
        one_iter()
        times.append(time.perf_counter() - t0)
    value = float(np.median(times))

    print(json.dumps({
        "metric": "gp_fit_plus_acq_argmax_per_iter_n1000_d5",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(REF_SECONDS / value, 2),
    }))


if __name__ == "__main__":
    main()

"""Acquisition-argmax engine sweep: BFGS vs CMA vs SMC vs MIES on the
pinned parity configs plus multimodal BBOB fids (round-5 verdict item 6 —
the evidence for promoting/demoting the SMC resampling engine).

Runs OUR framework only (engine choice does not involve the reference);
regret comparisons are numerics-identical on CPU.

Usage: JAX_PLATFORM_NAME=cpu python benchmark/engine_sweep.py \
           [--seeds 5] [--out ENGINE_SWEEP.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")


def sphere(x):
    return float(np.sum(np.asarray(x, dtype=float) ** 2))


def ellipsoid20(x):
    x = np.asarray(x, dtype=float)
    w = 10 ** np.linspace(0, 4, len(x))
    return float(np.sum(w * x**2))


def mixed_obj(x):
    r0, r1, i0, c0 = x[0], x[1], x[2], x[3]
    return (
        float(r0) ** 2 + float(r1) ** 2 + abs(int(i0) - 5) / 5.0
        + {"A": 0.0, "B": 0.7, "C": 1.5}[c0]
    )


def _gp(dim, seed, thetaU=1e4):
    from bayesian_optimization_tpu import GaussianProcess
    from bayesian_optimization_tpu.models.trend import constant_trend

    return GaussianProcess(
        mean=constant_trend(dim), corr="matern",
        thetaL=1e-2 * np.ones(dim), thetaU=thetaU * np.ones(dim),
        nugget=1e-6, random_state=seed,
    )


def run_real(obj, dim, box, seed, engine, max_FEs=40, DoE=10):
    from bayesian_optimization_tpu import BO, RealSpace

    space = RealSpace([list(box)] * dim, random_seed=seed)
    opt = BO(
        search_space=space, obj_fun=obj, model=_gp(dim, seed), DoE_size=DoE,
        max_FEs=max_FEs, acquisition_fun="MGFI", acquisition_par={"t": 2.0},
        acquisition_optimization={"optimizer": engine}, random_seed=seed,
    )
    t0 = time.perf_counter()
    opt.run()
    return float(opt.xopt.fitness.ravel()[0]), time.perf_counter() - t0


def run_mixed(seed, engine):
    from bayesian_optimization_tpu import BO, DiscreteSpace, IntegerSpace, RealSpace

    s = (RealSpace([[-3.0, 3.0]] * 2, var_name="r")
         + IntegerSpace([0, 10], var_name="i")
         + DiscreteSpace(["A", "B", "C"], var_name="c"))
    s.random_seed = seed
    opt = BO(
        search_space=s, obj_fun=mixed_obj, DoE_size=8, max_FEs=40,
        acquisition_fun="MGFI", acquisition_par={"t": 2.0},
        acquisition_optimization={"optimizer": engine}, random_seed=seed,
    )
    t0 = time.perf_counter()
    opt.run()
    return float(opt.xopt.fitness.ravel()[0]), time.perf_counter() - t0


def run_bbob(fid, seed, engine, dim=5, max_FEs=50, DoE=10):
    from benchmark.bbob import BBOBFunction

    fn = BBOBFunction(fid, dim, instance=1)
    f, w = run_real(lambda x: float(fn(np.asarray(x, dtype=float))), dim,
                    (-5.0, 5.0), seed, engine, max_FEs=max_FEs, DoE=DoE)
    return f - fn.f_opt, w  # regret


PROBLEMS = {
    "sphere2d": lambda s, e: run_real(sphere, 2, (-5, 5), s, e, max_FEs=30, DoE=5),
    "sphere5d_mgfi": lambda s, e: run_real(sphere, 5, (-5, 5), s, e),
    "elli20": lambda s, e: run_real(ellipsoid20, 20, (-5, 5), s, e, max_FEs=60, DoE=20),
    "mixed": run_mixed,
    "bbob_f3_rastrigin": lambda s, e: run_bbob(3, s, e),
    "bbob_f15_rot_rastrigin": lambda s, e: run_bbob(15, s, e),
    "bbob_f17_schaffers": lambda s, e: run_bbob(17, s, e),
}

# mixed spaces cannot use BFGS (no gradient through level quantization)
ENGINES_REAL = ["BFGS", "OnePlusOne_Cholesky_CMA", "SMC"]
ENGINES_MIXED = ["MIES", "OnePlusOne_Cholesky_CMA", "SMC"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="ENGINE_SWEEP.json")
    ap.add_argument("--problems", nargs="*", default=list(PROBLEMS))
    args = ap.parse_args()

    out = {}
    for name in args.problems:
        runner = PROBLEMS[name]
        engines = ENGINES_MIXED if name == "mixed" else ENGINES_REAL
        out[name] = {}
        for engine in engines:
            vals, walls = [], []
            for seed in range(args.seeds):
                try:
                    f, w = runner(seed, engine)
                except Exception as e:  # noqa: BLE001
                    print(f"[{name}/{engine}/s{seed}] FAILED: {e}", file=sys.stderr)
                    f, w = float("nan"), float("nan")
                vals.append(f)
                walls.append(w)
                print(f"[{name}/{engine}/s{seed}] f={f:.4g} wall={w:.1f}s",
                      file=sys.stderr, flush=True)
            out[name][engine] = {
                "median": float(np.nanmedian(vals)),
                "per_seed": vals,
                "wall_median": float(np.nanmedian(walls)),
            }
        with open(args.out, "w") as fjson:
            json.dump(out, fjson, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

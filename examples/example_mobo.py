"""Multi-objective BO with EHVI (analog of ref example/example_mobo.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import MOBO, RealSpace


def f1(x):
    return float(np.sum(np.asarray(x, dtype=float) ** 2))


def f2(x):
    return float(np.sum((np.asarray(x, dtype=float) - 2.0) ** 2))


def main():
    space = RealSpace([[-2.0, 4.0]] * 2, random_seed=0)
    opt = MOBO(
        search_space=space, obj_fun=[f1, f2], n_obj=2,
        DoE_size=8, max_FEs=40, random_seed=0, verbose=True,
    )
    opt.run()
    front = opt.xopt
    print(f"Pareto front ({front.N} points):")
    for row, f in zip(front.tolist(), front.fitness):
        print("  x =", np.round(row, 3), " f =", np.round(f, 3))


if __name__ == "__main__":
    main()

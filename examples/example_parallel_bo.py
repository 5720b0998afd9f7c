"""Batch-sequential BO: q=8 points per iteration via MGFI parameter
sampling (BASELINE config 3; analog of ref example/example_BO_CMA_multipoint.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import GaussianProcess, ParallelBO, RealSpace
from bayesian_optimization_tpu.models.trend import constant_trend


def main():
    dim = 5
    space = RealSpace([[-5.0, 5.0]] * dim, random_seed=0)
    model = GaussianProcess(
        mean=constant_trend(dim), corr="matern",
        thetaL=1e-3 * np.ones(dim), thetaU=1e3 * np.ones(dim),
        nugget=1e-6, random_state=0,
    )
    opt = ParallelBO(
        search_space=space,
        obj_fun=lambda x: float(np.sum(np.asarray(x) ** 2)),
        parallel_obj_fun=None,
        model=model, n_point=8,
        acquisition_fun="MGFI", acquisition_par={"t": 2.0},
        DoE_size=8, max_FEs=48, random_seed=0, verbose=True,
    )
    opt.run()
    print("fopt:", opt.xopt.fitness.ravel(), "evals:", opt.eval_count)


if __name__ == "__main__":
    main()

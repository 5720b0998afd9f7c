"""Batch-sequential (multi-point) BO with the CMA inner optimizer:
ParallelBO proposes q=4 points per iteration by sampling the MGFI
temperature, each maximized by the vectorized (1+1)-Cholesky-CMA engine
(capability analog of ref example/example_BO_CMA_multipoint.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import GaussianProcess, ParallelBO, RealSpace
from bayesian_optimization_tpu.models.trend import constant_trend


def rastrigin(x):
    x = np.asarray(x, dtype=float)
    return float(10 * x.size + np.sum(x**2 - 10 * np.cos(2 * np.pi * x)))


def main():
    dim = 3
    space = RealSpace([[-5.12, 5.12]] * dim, random_seed=0)
    model = GaussianProcess(
        mean=constant_trend(dim), corr="matern",
        thetaL=1e-5 * np.ones(dim), thetaU=1e2 * np.ones(dim),
        nugget=1e-6, random_state=0,
    )
    opt = ParallelBO(
        search_space=space, obj_fun=rastrigin, model=model,
        n_point=4, DoE_size=12, max_FEs=60,
        acquisition_fun="MGFI", acquisition_par={"t": 2.0},
        acquisition_optimization={"optimizer": "OnePlusOne_Cholesky_CMA"},
        random_seed=0, verbose=True,
    )
    xopt, fopt, stop = opt.run()
    print("xopt:", xopt, "\nfopt:", fopt, "\nstop:", stop)


if __name__ == "__main__":
    main()

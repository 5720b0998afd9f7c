"""BO with a GP surrogate on a 5-D continuous space
(capability analog of ref example/example_continuous_variables.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace
from bayesian_optimization_tpu.models.trend import constant_trend


def branin_like(x):
    x = np.asarray(x, dtype=float)
    return float(np.sum((x - 0.3) ** 2) + 0.5 * np.sum(np.sin(3 * x)))


def main():
    dim = 5
    space = RealSpace([[-5.0, 5.0]] * dim, random_seed=42)
    model = GaussianProcess(
        mean=constant_trend(dim), corr="matern",
        thetaL=1e-3 * np.ones(dim), thetaU=1e3 * np.ones(dim),
        nugget=1e-6, random_state=42,
    )
    opt = BO(
        search_space=space, obj_fun=branin_like, model=model,
        DoE_size=10, max_FEs=40, acquisition_fun="EI",
        random_seed=42, verbose=True,
    )
    xopt, fopt, stop = opt.run()
    print("xopt:", xopt, "\nfopt:", fopt, "\nstop:", stop)


if __name__ == "__main__":
    main()

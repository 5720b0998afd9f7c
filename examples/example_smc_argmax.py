"""The SMC-resampling acquisition argmax engine: blocks of vectorized
(1+1)-Cholesky-CMA generations interleaved with systematic resampling of
whole chains by annealed rank-based acquisition weights — chains in good
basins multiply (inheriting their adapted covariances), stagnant chains
die. This is the BASELINE north star's particle loop; the reference's
batch proposals are independent sequential restarts
(ref: bayes_optim/bayes_opt.py:100-115).

Run: python examples/example_smc_argmax.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import GaussianProcess, ParallelBO, RealSpace
from bayesian_optimization_tpu.models.trend import constant_trend


def rastrigin(x):
    x = np.asarray(x, dtype=float)
    return float(10 * len(x) + np.sum(x**2 - 10 * np.cos(2 * np.pi * x)))


gp = GaussianProcess(
    mean=constant_trend(3), corr="matern",
    thetaL=1e-2 * np.ones(3), thetaU=1e4 * np.ones(3),
    nugget=1e-6, random_state=0,
)
opt = ParallelBO(
    search_space=RealSpace([[-5.12, 5.12]] * 3, random_seed=0),
    obj_fun=rastrigin, model=gp, n_point=4,
    acquisition_fun="MGFI", acquisition_par={"t": 2.0},
    DoE_size=8, max_FEs=48, random_seed=0,
    acquisition_optimization={"optimizer": "SMC"},  # <- the SMC engine
)
opt.run()
print("engine:", opt._argmax.method)
print("fopt:", float(opt.xopt.fitness.ravel()[0]))
print("xopt:", [round(float(v), 3) for v in opt.xopt.tolist()[0][:3]])

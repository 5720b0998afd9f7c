"""Variational hyperparameter posterior (optimizer="VI") driving a full BO
run: mean-field ADVI fits a Gaussian over the log10 hyperparameters, the
GP samples an ensemble from it, and every acquisition evaluation mixes the
ensemble's posteriors. The reference's fit is a point-estimate L-BFGS with
exactly two optimizer options (ref: bayes_optim/surrogate/gaussian_process/
gpr.py:1127-1181); VI has no counterpart there.

Run: python examples/example_vi_posterior_bo.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace
from bayesian_optimization_tpu.models.trend import constant_trend


def branin_like(x):
    x = np.asarray(x, dtype=float)
    return float((x[1] - 0.129 * x[0] ** 2 + 1.6 * x[0] - 6) ** 2
                 + 6 * np.cos(x[0]) + 10)


gp = GaussianProcess(
    mean=constant_trend(2),
    thetaL=1e-3 * np.ones(2), thetaU=1e3 * np.ones(2),
    nugget=1e-6, optimizer="VI", random_state=0,
)
gp.vi_steps = 400      # ADVI gradient steps
gp.n_ensemble = 8      # posterior draws kept for the predictive mixture

opt = BO(
    search_space=RealSpace([[-5, 10], [0, 15]], random_seed=0),
    obj_fun=branin_like, model=gp, DoE_size=8, max_FEs=30, random_seed=0,
)
xopt, fopt, stop_dict = opt.run()
print("xopt:", [round(float(v), 4) for v in np.ravel(np.asarray(xopt, dtype=float))[:2]])
print("fopt:", float(np.ravel(fopt)[0]))
print("ensemble size in the fused argmax:", opt.model._config_cache.n_ensemble)
print("variational mean/std (z-space):",
      np.round(opt.model.vi_params_[0], 3), np.round(np.exp(opt.model.vi_params_[1]), 3))

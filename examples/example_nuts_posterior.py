"""Hyperparameter POSTERIOR instead of a point estimate: fit the GP with the
iterative NUTS sampler (optimizer="NUTS") and predict with the posterior
mixture. The reference has no counterpart — its fit is scipy L-BFGS restarts
(ref: bayes_optim/surrogate/gaussian_process/gpr.py:1127-1162); here every
NUTS doubling advances all chains as one batched XLA program.

Run: python examples/example_nuts_posterior.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import GaussianProcess
from bayesian_optimization_tpu.models.trend import constant_trend

rng = np.random.default_rng(0)
X = rng.uniform(0, 1, (48, 2))
y = np.sin(3 * X[:, 0]) + 0.5 * np.cos(2 * X[:, 1]) + 0.1 * rng.standard_normal(48)

gp = GaussianProcess(
    mean=constant_trend(2),
    thetaL=1e-2 * np.ones(2), thetaU=1e2 * np.ones(2),
    nugget=1e-6, optimizer="NUTS", random_state=0,
)
gp.n_ensemble = 16     # posterior samples kept for the predictive mixture
gp.hmc_warmup = 120    # dual-averaging + mass adaptation steps

gp.fit(X, y)
print("chain acceptance:", np.round(np.asarray(gp.accept_rate_), 3))
print("theta posterior samples (first 4):")
print(np.round(gp.theta_samples_[:4], 3))

Xq = rng.uniform(0, 1, (5, 2))
mu, mse = gp.predict(Xq, eval_MSE=True)
for x, m, s in zip(Xq, mu, np.sqrt(mse)):
    print(f"x={np.round(x, 2)}  mixture mean={m:+.3f}  sd={s:.3f}")

"""BO with the (1+1)-Cholesky-CMA-ES inner acquisition optimizer and a
custom low-EI stop criterion (capability analog of ref
example/example_BO_CMA.py — subclassing BO, tracking the mean EI of the
asked batch, stopping when it falls below 1% of the DoE-to-best gap)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import BO, GaussianProcess, RealSpace
from bayesian_optimization_tpu.models.trend import constant_trend
from bayesian_optimization_tpu.ops.acquisition import EI


def griewank(x):
    x = np.asarray(x, dtype=float)
    return float(1 + np.sum(x**2) / 4000 - np.prod(np.cos(x / np.sqrt(np.arange(1, x.size + 1)))))


class LowEIStoppingBO(BO):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self._hist_EI = np.zeros(3)
        self._fBest_DoE = None

    def ask(self, n_point=None, fixed=None):
        X = super().ask(n_point=n_point, fixed=fixed)
        if self.model is not None and self.model.is_fitted:
            if self._fBest_DoE is None:
                self._fBest_DoE = float(np.min(self.data.fitness))
            crit = EI(self.model, plugin=float(np.min(self.data.fitness)))
            vals = [float(crit(np.asarray(x, dtype=float))) for x in np.atleast_2d(X)]
            self._hist_EI[(self.iter_count - 1) % 3] = np.mean(vals)
        return X

    def check_stop(self):
        if self._fBest_DoE is not None and self.iter_count > 1:
            delta = self._fBest_DoE - self.fopt
            mean_ei = np.mean(self._hist_EI[: min(3, self.iter_count - 1)])
            if mean_ei < 0.01 * max(delta, 1e-12):
                self.stop_dict["low-EI"] = float(mean_ei)
        return super().check_stop()


def main():
    dim = 2
    space = RealSpace([[-600.0, 600.0]] * dim, random_seed=42)
    model = GaussianProcess(
        mean=constant_trend(dim), corr="matern",
        thetaL=1e-5 * np.ones(dim), thetaU=1e3 * np.ones(dim),
        nugget=1e-6, random_state=42,
    )
    opt = LowEIStoppingBO(
        search_space=space, obj_fun=griewank, model=model,
        DoE_size=10, max_FEs=40, acquisition_fun="EI",
        acquisition_optimization={"optimizer": "OnePlusOne_Cholesky_CMA"},
        random_seed=42, verbose=True,
    )
    xopt, fopt, stop = opt.run()
    print("xopt:", xopt, "\nfopt:", fopt, "\nstop:", stop)


if __name__ == "__main__":
    main()

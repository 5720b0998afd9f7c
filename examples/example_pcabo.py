"""High-dimensional BO with supervised PCA (analog of ref example/example_PCABO.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import PCABO, RealSpace


def ellipsoid(x):
    x = np.asarray(x, dtype=float)
    w = 10 ** np.linspace(0, 2, len(x))
    return float(np.sum(w * x**2))


def main():
    dim = 20
    space = RealSpace([[-5.0, 5.0]] * dim, random_seed=0)
    opt = PCABO(
        search_space=space, obj_fun=ellipsoid, n_components=5,
        DoE_size=20, max_FEs=60, random_seed=0, verbose=True,
    )
    xopt, fopt, _ = opt.run()
    print("fopt:", fopt)


if __name__ == "__main__":
    main()

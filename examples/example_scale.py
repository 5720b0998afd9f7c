"""Real variables with nonlinear scale transforms (log / log10 / logit /
bilog) and rounding precision, optimized with a RandomForest surrogate
(capability analog of ref example/example_BO_scale.py). Sampling and the
internal continuous embedding live in the transformed scale; the objective
always sees original-scale values."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import BO, RandomForest, Real, SearchSpace


def fitness(x):
    return float(np.sum(np.asarray(x, dtype=float) ** 2))


def main():
    space = SearchSpace(
        [
            Real((1e-3, 10), name="log_r", scale="log", precision=2),
            Real((1e-3, 10), name="log10_r", scale="log10", precision=2),
            Real((1e-3, 1 - 1e-3), name="logit_r", scale="logit", precision=2),
            Real((-10, 10), name="bilog_r", scale="bilog", precision=2),
        ],
        random_seed=123,
    )
    print("one sample (original scale):", space.sample(1))

    model = RandomForest(levels=space.levels)
    opt = BO(
        search_space=space, obj_fun=fitness, model=model,
        DoE_size=8, max_FEs=40, acquisition_fun="EI",
        random_seed=123, verbose=True,
    )
    xopt, fopt, stop = opt.run()
    print("xopt:", xopt, "\nfopt:", fopt, "\nstop:", stop)


if __name__ == "__main__":
    main()

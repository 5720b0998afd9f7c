"""MultiAcquisitionBO: q-point batches alternating between MGFI and UCB
criteria round-robin on a mixed search space with a RandomForest surrogate
(capability analog of ref example/example_multi_acqusition.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import (
    DiscreteSpace, IntegerSpace, MultiAcquisitionBO, RandomForest, RealSpace,
)

dim_r = 2


def obj_fun(x):
    x_r = np.array([x[f"continuous{i}"] for i in range(dim_r)], dtype=float)
    x_i = x["ordinal"]
    x_d = x["nominal"]
    extra = 0.0 if x_d == "OK" else 1.0
    return float(np.sum(x_r**2) + abs(x_i - 10) / 123.0 + extra * 2)


def main():
    space = (
        RealSpace([-5, 5], var_name="continuous") * dim_r
        + IntegerSpace([5, 15], var_name="ordinal")
        + DiscreteSpace(["OK", "A", "B", "C", "D", "E", "F", "G"], var_name="nominal")
    )
    model = RandomForest(levels=space.levels)
    opt = MultiAcquisitionBO(
        search_space=space, obj_fun=obj_fun, model=model,
        max_FEs=40, DoE_size=4, eval_type="dict",
        n_point=4, random_seed=42, verbose=True,
    )
    xopt, fopt, stop = opt.run()
    print("xopt:", xopt, "\nfopt:", fopt, "\nstop:", stop)


if __name__ == "__main__":
    main()

"""BO over a mixed real/integer/categorical/bool space with the vectorized
MIES acquisition optimizer (capability analog of ref
example/example_mixed_variables.py)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import (
    BO, BoolSpace, DiscreteSpace, IntegerSpace, OrdinalSpace, RealSpace,
)


def obj(x):
    lr, width, act, size, nesterov = x
    return (
        (np.log10(lr) + 2.0) ** 2
        + abs(width - 32) / 8.0
        + {"relu": 0.0, "gelu": 0.3, "tanh": 1.0}[act]
        + {"s": 0.5, "m": 0.0, "l": 0.7}[size]
        + (0.0 if nesterov else 0.2)
    )


def main():
    space = (
        RealSpace([1e-4, 1e-1], var_name="lr", scale="log10")
        + IntegerSpace([1, 64], var_name="width")
        + DiscreteSpace(["relu", "gelu", "tanh"], var_name="act")
        + OrdinalSpace(["s", "m", "l"], var_name="size")
        + BoolSpace(var_name="nesterov")
    )
    space.random_seed = 0
    opt = BO(
        search_space=space, obj_fun=obj, DoE_size=8, max_FEs=40,
        acquisition_fun="MGFI", acquisition_par={"t": 2.0}, random_seed=0,
    )
    xopt, fopt, _ = opt.run()
    print("xopt:", xopt, "fopt:", fopt)


if __name__ == "__main__":
    main()

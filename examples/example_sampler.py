"""SCMC constrained sampling (capability analog of ref
example/example_sampler.py): draw samples satisfying an equality constraint
on a real space, then mixed-space samples under inequality constraints."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from bayesian_optimization_tpu import DiscreteSpace, IntegerSpace, RealSpace
from bayesian_optimization_tpu.space.samplers import SCMC


def main():
    # equality-constrained: points on the simplex sum(x) == 1
    dim = 2
    space = RealSpace([0, 1]) * dim
    h = lambda x: np.abs(np.sum(np.asarray(x[:dim], dtype=float)) - 1)
    sampler = SCMC(space, h=h, tol=1e-3)
    X = sampler.sample(10)
    print("equality-constrained samples:\n", X)
    assert all(np.isclose(h(x), 0, atol=1e-2) for x in X)

    # mixed space with inequality constraints: an annulus in the two reals,
    # a categorical restriction and an integer cap
    space2 = RealSpace([-5, 5]) * 2 + DiscreteSpace(["A", "B", "C", "D"]) + IntegerSpace([1, 10])

    def g(x):
        xr = np.asarray(x[:2], dtype=float)
        return np.array([
            np.sum(xr**2) - 1.0,          # inside unit circle
            0.25 - np.sum(xr**2),          # outside radius 0.5
            1.0 if x[2] in ("A", "B") else -1.0,  # category must be C or D
            float(x[3]) - 5.1,             # integer <= 5
        ])

    sampler2 = SCMC(space2, g=g, tol=1e-2)
    X2 = sampler2.sample(10)
    print("mixed constrained samples:\n", X2)
    for x in X2:
        assert np.all(g(x) <= 1e-2), g(x)


if __name__ == "__main__":
    main()

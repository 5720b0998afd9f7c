"""Box decomposition of the non-dominated region for EHVI.

Capability parity with the reference's vendored BoTorch partitioning stack
(ref: bayes_optim/utils/multi_objective/box_decompositions/
box_decomposition.py:29-330, non_dominated.py:29-333): given a Pareto front
(maximization) and a reference point, produce hypercells [lower, upper]
covering the region that is above `ref` and not dominated by the front —
the integration domain of EHVI [Yang2019].

Design difference: instead of the reference's recursive binary partitioning,
cells come from the coordinate grid spanned by the front (every grid cell is
either entirely dominated or entirely non-dominated, so the decomposition is
exact); upper boundary cells extend to +inf. Cell counts are (n+1)^m for an
n-point front — fine for BO-scale fronts and fully vectorized.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .pareto import is_non_dominated


class NondominatedPartitioning:
    """Exact hypercell decomposition of the non-dominated region.

    Parameters mirror the reference class: `ref_point` (m,), `Y` (n, m) in
    MAXIMIZATION orientation.
    """

    def __init__(self, ref_point, Y):
        self.ref_point = np.asarray(ref_point, dtype=float).ravel()
        Y = np.asarray(Y, dtype=float)
        if Y.ndim == 1:
            Y = Y.reshape(1, -1)
        self.num_outcomes = self.ref_point.shape[0]
        if Y.shape[1] != self.num_outcomes:
            raise ValueError("Y and ref_point dimensionality mismatch")
        mask = np.asarray(is_non_dominated(Y))
        self.pareto_Y = Y[mask]
        self._compute_cells()

    def _compute_cells(self) -> None:
        m = self.num_outcomes
        P = self.pareto_Y
        ref = self.ref_point
        if len(P) == 0:
            self.cell_lower = ref[None, :]
            self.cell_upper = np.full((1, m), np.inf)
            return
        axes = []
        for j in range(m):
            vals = np.unique(np.concatenate([[ref[j]], P[:, j][P[:, j] > ref[j]]]))
            axes.append(np.concatenate([vals, [np.inf]]))
        lowers = np.meshgrid(*[a[:-1] for a in axes], indexing="ij")
        uppers = np.meshgrid(*[a[1:] for a in axes], indexing="ij")
        lo = np.stack([g.ravel() for g in lowers], axis=1)
        hi = np.stack([g.ravel() for g in uppers], axis=1)
        # a cell belongs to the non-dominated region iff NO pareto point
        # dominates its lower corner (strictly above in every coordinate
        # would over-count boundaries; cells are [lo, hi) so the test is
        # p >= hi... careful: dominated region = {y: exists p, p >= y}. For
        # the half-open cell, dominated <=> exists p with p >= hi - eps in
        # all coords <=> p >= lo and p >= (cell interior) — use p >= hi
        # component-wise on the finite part is wrong for inf; test the lower
        # corner + epsilon = dominated iff some p > lo in all coordinates
        # (p >= lo with strict in the coords where it matters). Since grid
        # lines pass through pareto coordinates, p dominates the open cell
        # interior iff p >= hi for finite coords... equivalently p > lo in
        # all coords:
        dominated = np.any(np.all(P[None, :, :] > lo[:, None, :], axis=2), axis=1)
        keep = ~dominated
        self.cell_lower = lo[keep]
        self.cell_upper = hi[keep]

    def get_hypercell_bounds(self) -> np.ndarray:
        """(2, K, m) stacked [lower, upper] bounds (reference surface)."""
        return np.stack([self.cell_lower, self.cell_upper], axis=0)

    def compute_hypervolume(self) -> float:
        from .hypervolume import hypervolume

        return hypervolume(self.pareto_Y, self.ref_point)


FastNondominatedPartitioning = NondominatedPartitioning

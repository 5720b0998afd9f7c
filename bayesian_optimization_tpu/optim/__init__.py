"""Acquisition argmax engines: vmapped L-BFGS multistart, population
(1+1)-Cholesky-CMA-ES, mixed-space evolution (MIES)."""
from .argmax import AcquisitionArgmax, make_unit_criterion
from .cma import OnePlusOne_Cholesky_CMA, run_cma
from .mies import MIES

__all__ = ["AcquisitionArgmax", "make_unit_criterion", "OnePlusOne_Cholesky_CMA", "run_cma"]

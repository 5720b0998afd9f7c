"""Minimal sobol_seq shim (`i4_sobol_generate`) backed by scipy's QMC."""
from scipy.stats import qmc


def i4_sobol_generate(dim, n, skip=0):
    eng = qmc.Sobol(d=dim, scramble=False)
    if skip:
        eng.fast_forward(skip)
    return eng.random(n)

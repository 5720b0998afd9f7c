"""BBOB noiseless test functions (subset) + instance transformations.

Capability analog of the reference's vendored COCO code
(ref: benchmark/bbobbenchmarks.py, 2391 LoC) implemented from the BBOB
function definitions (Hansen et al., "Real-Parameter Black-Box Optimization
Benchmarking: Noiseless Functions Definitions") — not a translation of the
COCO sources. Provides the functions the parity benchmarks pin
(sphere F1, separable/rotated ellipsoid F2/F10, Rastrigin F3/F15,
linear slope F5, attractive sector F6, step ellipsoid F7, Rosenbrock F8,
discus F11, bent cigar F12, sum of different powers F14, Schaffers F17,
Griewank-Rosenbrock F19, Schwefel F20, Katsuura F23) with the standard
instance machinery: seeded x_opt/f_opt shifts, rotation matrices R and Q,
T_osz / T_asy nonlinear transforms and Lambda^alpha conditioning.

Functions evaluate batched: f(X: (N, dim)) -> (N,), in numpy (host side —
objectives are the "user black box" in benchmarks).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np


def _rng(fid: int, instance: int, dim: int, salt: int = 0) -> np.random.Generator:
    return np.random.default_rng(1000003 * fid + 101 * instance + dim + 7919 * salt)


def _rotation(fid: int, instance: int, dim: int, salt: int) -> np.ndarray:
    """Random orthogonal matrix via QR of a Gaussian matrix."""
    g = _rng(fid, instance, dim, salt)
    A = g.standard_normal((dim, dim))
    Q, R = np.linalg.qr(A)
    return Q * np.sign(np.diag(R))


def _x_opt(fid: int, instance: int, dim: int) -> np.ndarray:
    return _rng(fid, instance, dim, 1).uniform(-4, 4, dim)


def _f_opt(fid: int, instance: int) -> float:
    g = _rng(fid, instance, 1, 2)
    v = np.round(100.0 * g.standard_cauchy() / 10.0, 2)
    return float(np.clip(v, -1000, 1000))


def _t_osz(x: np.ndarray) -> np.ndarray:
    """Oscillation transform T_osz (BBOB definitions, eq. for x_hat)."""
    xhat = np.where(x != 0, np.log(np.abs(x) + 1e-300), 0.0)
    c1 = np.where(x > 0, 10.0, 5.5)
    c2 = np.where(x > 0, 7.9, 3.1)
    return np.sign(x) * np.exp(xhat + 0.049 * (np.sin(c1 * xhat) + np.sin(c2 * xhat)))


def _t_asy(x: np.ndarray, beta: float) -> np.ndarray:
    dim = x.shape[-1]
    idx = np.arange(dim) / max(dim - 1, 1)
    expo = 1.0 + beta * idx[None, :] * np.sqrt(np.maximum(x, 0.0))
    return np.where(x > 0, np.maximum(x, 0.0) ** expo, x)


def _lam(alpha: float, dim: int) -> np.ndarray:
    idx = np.arange(dim) / max(dim - 1, 1)
    return alpha ** (0.5 * idx)


def _pen(x: np.ndarray) -> np.ndarray:
    return np.sum(np.maximum(np.abs(x) - 5.0, 0.0) ** 2, axis=-1)


class BBOBFunction:
    """One (fid, instance, dim) problem; callable on batches or single x."""

    def __init__(self, fid: int, dim: int, instance: int = 1):
        if fid not in _CORES:
            raise ValueError(f"F{fid} not implemented; available: {sorted(_CORES)}")
        self.fid, self.dim, self.instance = fid, dim, instance
        self.x_opt = _x_opt(fid, instance, dim)
        self.f_opt = _f_opt(fid, instance)
        self.R = _rotation(fid, instance, dim, 3)
        self.Q = _rotation(fid, instance, dim, 4)
        if fid == 5:  # linear slope: optimum at a corner
            self.x_opt = 5.0 * np.sign(self.x_opt + 1e-12)
        elif fid == 19:  # Griewank-Rosenbrock: optimum where z = 1
            c = max(1.0, np.sqrt(dim) / 8.0)
            self.x_opt = self.R.T @ (np.full(dim, 0.5) / c)
        elif fid == 20:  # Schwefel: optimum at the signed magic point
            g = _rng(fid, instance, dim, 5)
            ones = np.where(g.random(dim) > 0.5, 1.0, -1.0)
            self.x_opt = 4.2096874633 / 2.0 * ones
        elif fid == 9:  # rotated Rosenbrock: optimum where z = 1
            c = max(1.0, np.sqrt(dim) / 8.0)
            self.x_opt = self.R.T @ (np.full(dim, 0.5) / c)
        elif fid == 24:  # Lunacek: optimum at mu0/2 * 1(+/-)
            self.x_opt = np.sign(self.x_opt + 1e-12) * 2.5 / 2.0
        self._core = _CORES[fid]

    def __call__(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        single = X.ndim == 1
        X = np.atleast_2d(X)
        out = self._core(self, X) + self.f_opt
        return float(out[0]) if single else out

    def evaluate(self, X):
        return self.__call__(X)


# ---------------------------------------------------------------------------
# core functions: f(problem, X(N, d)) -> (N,) raw values (f_opt added later)
# ---------------------------------------------------------------------------
def _f1_sphere(p, X):
    z = X - p.x_opt
    return np.sum(z**2, axis=-1)


def _f2_ellipsoid(p, X):
    z = _t_osz(X - p.x_opt)
    d = p.dim
    w = 10.0 ** (6.0 * np.arange(d) / max(d - 1, 1))
    return np.sum(w * z**2, axis=-1)


def _f3_rastrigin(p, X):
    z = _t_asy(_t_osz(X - p.x_opt), 0.2) * _lam(10.0, p.dim)
    return 10.0 * (p.dim - np.sum(np.cos(2 * np.pi * z), axis=-1)) + np.sum(z**2, axis=-1)


def _f4_buche_rastrigin(p, X):
    d = p.dim
    z = _t_osz(X - p.x_opt)
    idx = np.arange(d)
    s = 10.0 ** (0.5 * idx / max(d - 1, 1))
    # odd dimensions (1-based) with positive z get a x10 boost
    boost = np.where((idx % 2 == 0)[None, :] & (z > 0), 10.0, 1.0)
    z = z * s[None, :] * boost
    return 10.0 * (d - np.sum(np.cos(2 * np.pi * z), axis=-1)) + np.sum(z**2, axis=-1) + 100.0 * _pen(X)


def _f5_linear_slope(p, X):
    d = p.dim
    s = np.sign(p.x_opt) * _lam(100.0, d) ** 2  # 10^(i/(d-1)) squared = 100^...
    z = np.where(X * p.x_opt < 25.0, X, p.x_opt)
    return np.sum(5.0 * np.abs(s) - s * z, axis=-1)


def _f6_attractive_sector(p, X):
    # z = Q Lambda^10 R (x - x_opt)
    z = ((X - p.x_opt) @ p.R.T) * _lam(10.0, p.dim)
    z = z @ p.Q.T
    s = np.where(z * p.x_opt > 0, 100.0, 1.0)
    return _t_osz(np.sum((s * z) ** 2, axis=-1, keepdims=True))[:, 0] ** 0.9


def _f7_step_ellipsoid(p, X):
    d = p.dim
    zhat = ((X - p.x_opt) @ p.R.T) * _lam(10.0, d)
    ztilde = np.where(np.abs(zhat) > 0.5, np.round(zhat), np.round(10 * zhat) / 10.0)
    z = ztilde @ p.Q.T
    w = 10.0 ** (2.0 * np.arange(d) / max(d - 1, 1))
    val = 0.1 * np.maximum(np.abs(zhat[:, 0]) / 1e4, np.sum(w * z**2, axis=-1))
    return val + _pen(X)


def _f8_rosenbrock(p, X):
    d = p.dim
    z = np.maximum(1.0, np.sqrt(d) / 8.0) * (X - p.x_opt) + 1.0
    return np.sum(100.0 * (z[:, :-1] ** 2 - z[:, 1:]) ** 2 + (z[:, :-1] - 1.0) ** 2, axis=-1)


def _f9_rotated_rosenbrock(p, X):
    d = p.dim
    c = max(1.0, np.sqrt(d) / 8.0)
    z = c * (X @ p.R.T) + 0.5
    return np.sum(100.0 * (z[:, :-1] ** 2 - z[:, 1:]) ** 2 + (z[:, :-1] - 1.0) ** 2, axis=-1)


def _f10_rotated_ellipsoid(p, X):
    z = _t_osz((X - p.x_opt) @ p.R.T)
    d = p.dim
    w = 10.0 ** (6.0 * np.arange(d) / max(d - 1, 1))
    return np.sum(w * z**2, axis=-1)


def _f11_discus(p, X):
    z = _t_osz((X - p.x_opt) @ p.R.T)
    return 1e6 * z[:, 0] ** 2 + np.sum(z[:, 1:] ** 2, axis=-1)


def _f12_bent_cigar(p, X):
    z = _t_asy((X - p.x_opt) @ p.R.T, 0.5) @ p.R.T
    return z[:, 0] ** 2 + 1e6 * np.sum(z[:, 1:] ** 2, axis=-1)


def _f13_sharp_ridge(p, X):
    z = (((X - p.x_opt) @ p.R.T) * _lam(10.0, p.dim)) @ p.Q.T
    return z[:, 0] ** 2 + 100.0 * np.sqrt(np.sum(z[:, 1:] ** 2, axis=-1))


def _f14_diff_powers(p, X):
    z = (X - p.x_opt) @ p.R.T
    d = p.dim
    expo = 2.0 + 4.0 * np.arange(d) / max(d - 1, 1)
    return np.sqrt(np.sum(np.abs(z) ** expo, axis=-1))


def _f15_rotated_rastrigin(p, X):
    z = _t_asy(_t_osz((X - p.x_opt) @ p.R.T), 0.2) @ p.Q.T * _lam(10.0, p.dim)
    z = z @ p.R.T
    return 10.0 * (p.dim - np.sum(np.cos(2 * np.pi * z), axis=-1)) + np.sum(z**2, axis=-1)


def _f17_schaffers(p, X):
    z = _t_asy((X - p.x_opt) @ p.R.T, 0.5) @ p.Q.T * _lam(10.0, p.dim)
    s = np.sqrt(z[:, :-1] ** 2 + z[:, 1:] ** 2)
    val = np.mean(np.sqrt(s) + np.sqrt(s) * np.sin(50.0 * s**0.2) ** 2, axis=-1) ** 2
    return val + 10.0 * _pen(X)


def _f16_weierstrass(p, X):
    d = p.dim
    z = (_t_osz((X - p.x_opt) @ p.R.T) @ p.Q.T * _lam(0.01, d)) @ p.R.T
    k = np.arange(12)
    halfk = 0.5**k
    threek = 3.0**k
    f0 = np.sum(halfk * np.cos(np.pi * threek))
    inner = np.sum(
        halfk[None, None, :] * np.cos(2 * np.pi * threek[None, None, :] * (z[:, :, None] + 0.5)),
        axis=-1,
    )
    val = 10.0 * (np.mean(inner, axis=-1) - f0) ** 3
    return val + 10.0 / d * _pen(X)


def _f18_schaffers_ill(p, X):
    z = _t_asy((X - p.x_opt) @ p.R.T, 0.5) @ p.Q.T * _lam(1000.0, p.dim)
    s = np.sqrt(z[:, :-1] ** 2 + z[:, 1:] ** 2)
    val = np.mean(np.sqrt(s) + np.sqrt(s) * np.sin(50.0 * s**0.2) ** 2, axis=-1) ** 2
    return val + 10.0 * _pen(X)


def _gallagher(p, X, n_peaks: int):
    d = p.dim
    g = _rng(p.fid, p.instance, d, 6)
    # peak locations: strongest at x_opt, the rest uniform in [-4.9, 4.9]
    Ys = g.uniform(-4.9, 4.9, (n_peaks, d))
    Ys[0] = p.x_opt
    # conditioning alphas per peak
    if n_peaks == 101:
        alphas = 1000.0 ** (2.0 * np.arange(n_peaks - 1) / max(n_peaks - 2, 1))
    else:
        alphas = 1000.0 ** (2.0 * np.arange(n_peaks - 1) / max(n_peaks - 2, 1))
    g.shuffle(alphas)
    alphas = np.concatenate([[1000.0], alphas])
    w = np.concatenate([[10.0], 1.1 + 8.0 * np.arange(1, n_peaks) / max(n_peaks - 1, 1)])
    # C_i = Lambda^{alpha_i} / alpha_i^{1/4} (diagonal), rotated by R
    diffs = (X[:, None, :] - Ys[None, :, :]) @ p.R.T  # (N, P, d)
    idx = np.arange(d) / max(d - 1, 1)
    lam = alphas[:, None] ** (0.5 * idx[None, :]) / alphas[:, None] ** 0.25  # (P, d)
    quad = np.sum(diffs**2 * lam[None, :, :], axis=-1)  # (N, P)
    vals = w[None, :] * np.exp(-quad / (2.0 * d))
    best = np.max(vals, axis=-1)
    return _t_osz(np.atleast_2d(10.0 - best))[0] ** 2 + _pen(X)


def _f21_gallagher101(p, X):
    return _gallagher(p, X, 101)


def _f22_gallagher21(p, X):
    return _gallagher(p, X, 21)


def _f24_lunacek(p, X):
    d = p.dim
    mu0 = 2.5
    s = 1.0 - 1.0 / (2.0 * np.sqrt(d + 20.0) - 8.2)
    mu1 = -np.sqrt((mu0**2 - 1.0) / s)
    ones = np.sign(p.x_opt + 1e-12)
    xhat = 2.0 * ones[None, :] * X
    z = ((xhat - mu0) @ p.R.T * _lam(100.0, d)) @ p.Q.T
    term1 = np.sum((xhat - mu0) ** 2, axis=-1)
    term2 = d + s * np.sum((xhat - mu1) ** 2, axis=-1)
    rast = 10.0 * (d - np.sum(np.cos(2 * np.pi * z), axis=-1))
    return np.minimum(term1, term2) + rast + 1e4 * _pen(X)


def _f19_griewank_rosenbrock(p, X):
    d = p.dim
    z = np.maximum(1.0, np.sqrt(d) / 8.0) * (X @ p.R.T) + 0.5
    s = 100.0 * (z[:, :-1] ** 2 - z[:, 1:]) ** 2 + (z[:, :-1] - 1.0) ** 2
    return 10.0 / (d - 1) * np.sum(s / 4000.0 - np.cos(s), axis=-1) + 10.0


def _f20_schwefel(p, X):
    d = p.dim
    g = _rng(p.fid, p.instance, d, 5)
    ones = np.where(g.random(d) > 0.5, 1.0, -1.0)
    x_opt = 4.2096874633 / 2.0 * ones
    xhat = 2.0 * ones * X
    zhat = np.empty_like(xhat)
    zhat[:, 0] = xhat[:, 0]
    zhat[:, 1:] = xhat[:, 1:] + 0.25 * (xhat[:, :-1] - 2.0 * np.abs(x_opt[:-1]))
    z = 100.0 * (_lam(10.0, d) * (zhat - 2.0 * np.abs(x_opt)) + 2.0 * np.abs(x_opt))
    val = -np.sum(z * np.sin(np.sqrt(np.abs(z))), axis=-1) / (100.0 * d) + 4.189828872724339
    return val + 100.0 * _pen(z / 100.0)


def _f23_katsuura(p, X):
    d = p.dim
    z = ((X - p.x_opt) @ p.R.T) * _lam(100.0, d)
    z = z @ p.Q.T
    j = 2.0 ** np.arange(1, 33)
    term = np.abs(j[None, None, :] * z[:, :, None] - np.round(j[None, None, :] * z[:, :, None])) / j
    prod = np.prod(1.0 + (np.arange(1, d + 1)[None, :]) * np.sum(term, axis=-1), axis=-1)
    return 10.0 / d**2 * prod ** (10.0 / d**1.2) - 10.0 / d**2 + _pen(X)


_CORES: Dict[int, Callable] = {
    1: _f1_sphere,
    2: _f2_ellipsoid,
    3: _f3_rastrigin,
    4: _f4_buche_rastrigin,
    5: _f5_linear_slope,
    6: _f6_attractive_sector,
    7: _f7_step_ellipsoid,
    8: _f8_rosenbrock,
    9: _f9_rotated_rosenbrock,
    10: _f10_rotated_ellipsoid,
    11: _f11_discus,
    12: _f12_bent_cigar,
    13: _f13_sharp_ridge,
    14: _f14_diff_powers,
    15: _f15_rotated_rastrigin,
    16: _f16_weierstrass,
    17: _f17_schaffers,
    18: _f18_schaffers_ill,
    19: _f19_griewank_rosenbrock,
    20: _f20_schwefel,
    21: _f21_gallagher101,
    22: _f22_gallagher21,
    23: _f23_katsuura,
    24: _f24_lunacek,
}

AVAILABLE_FIDS = sorted(_CORES)


# ---------------------------------------------------------------------------
# noisy suite F101-F130: noise models applied to base functions
# (BBOB noisy definitions; analog of the reference's F101-F130 in
#  benchmark/bbobbenchmarks.py)
# ---------------------------------------------------------------------------
def _noise_gauss(df, beta, g):
    return df * np.exp(beta * g.standard_normal(df.shape))


def _noise_uniform(df, alpha, beta, g):
    u1, u2 = g.random(df.shape), g.random(df.shape)
    return df * (u1**beta) * np.maximum(1.0, (1e9 / (df + 1e-99)) ** (alpha * u2))


def _noise_cauchy(df, alpha, p, g):
    n1 = g.standard_normal(df.shape)
    n2 = g.standard_normal(df.shape)
    spike = np.where(g.random(df.shape) < p, n1 / (np.abs(n2) + 1e-199), 0.0)
    return df + alpha * np.maximum(0.0, 1000.0 + spike)


#: fid -> (base core fid, noise kind, severity)
_NOISY_MAP: Dict[int, Tuple[int, str, str]] = {}
for _i, _base in enumerate([1, 8]):  # moderate noise: sphere, rosenbrock
    for _j, _kind in enumerate(["gauss", "uniform", "cauchy"]):
        _NOISY_MAP[101 + _i * 3 + _j] = (_base, _kind, "moderate")
for _i, _base in enumerate([1, 8, 7, 10, 14, 17, 19, 21]):  # severe
    for _j, _kind in enumerate(["gauss", "uniform", "cauchy"]):
        _NOISY_MAP[107 + _i * 3 + _j] = (_base, _kind, "severe")

NOISY_FIDS = sorted(_NOISY_MAP)


class NoisyBBOBFunction(BBOBFunction):
    """F101-F130: base function + Gaussian/uniform/Cauchy noise model.

    Noise is applied to the excess Delta-f = f - f_opt (no noise within the
    1e-8 target precision), matching the noisy-suite convention.
    """

    def __init__(self, fid: int, dim: int, instance: int = 1):
        if fid not in _NOISY_MAP:
            raise ValueError(f"F{fid} is not a noisy BBOB id; available: {NOISY_FIDS}")
        base_fid, kind, severity = _NOISY_MAP[fid]
        super().__init__(base_fid, dim, instance)
        self.fid = fid
        self.noise_kind, self.severity = kind, severity
        self._noise_rng = _rng(fid, instance, dim, 9)

    def __call__(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=float)
        single = X.ndim == 1
        X = np.atleast_2d(X)
        df = np.maximum(self._core(self, X), 0.0)
        d = self.dim
        g = self._noise_rng
        if self.noise_kind == "gauss":
            beta = 0.01 if self.severity == "moderate" else 1.0
            noisy = _noise_gauss(df, beta, g)
        elif self.noise_kind == "uniform":
            if self.severity == "moderate":
                alpha, beta = 0.01 * (0.49 + 1.0 / d), 0.01
            else:
                alpha, beta = 0.49 + 1.0 / d, 1.0
            noisy = _noise_uniform(df, alpha, beta, g)
        else:  # cauchy
            alpha, p = (0.01, 0.05) if self.severity == "moderate" else (1.0, 0.2)
            noisy = _noise_cauchy(df, alpha, p, g)
        out = np.where(df < 1e-8, df, noisy) + self.f_opt
        return float(out[0]) if single else out


def instantiate(fid: int, dim: int, instance: int = 1) -> Tuple[BBOBFunction, float]:
    """(function, f_target) like the reference harness's `instantiate`;
    fids 1-24 are noiseless, 101-130 noisy."""
    cls = NoisyBBOBFunction if fid >= 100 else BBOBFunction
    fn = cls(fid, dim, instance)
    return fn, fn.f_opt

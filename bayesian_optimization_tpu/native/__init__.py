"""Native (C++) kernels, loaded via ctypes.

Currently: the WFG exact-hypervolume kernel (wfg.cpp) — the native
implementation the reference wished for (ref: bayes_optim/utils/
multi_objective/hypervolume.py:29 "TODO: write this in C++"). Built lazily
with g++ on first use; the shared object is cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wfg.cpp")
_LIB = os.path.join(_HERE, "libwfg.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True, capture_output=True,
    )


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.wfg_hypervolume.restype = ctypes.c_double
            lib.wfg_hypervolume.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def wfg_hypervolume(Y: np.ndarray, ref: np.ndarray) -> float:
    """Exact hypervolume (maximization) of front Y (n, m) above ref (m,)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native WFG kernel unavailable (g++ build failed)")
    Y = np.ascontiguousarray(np.asarray(Y, dtype=np.float64))
    ref = np.ascontiguousarray(np.asarray(ref, dtype=np.float64).ravel())
    n, m = Y.shape
    return float(
        lib.wfg_hypervolume(
            Y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m,
            ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    )


def available() -> bool:
    return _load() is not None

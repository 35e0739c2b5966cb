"""Optional native (C++) components, loaded via ctypes.

The reference is header-only C++; in this framework the compute path is
JAX/XLA, and native code covers the host-side pieces that are inherently
sequential: the non-compact heatbath sweep (reference u1/u1_utils.h:607-757,
"can't be parallelized as is"). Build with ``make -C qmg_tpu/native``.
Falls back to NumPy implementations when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libqmgnative.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.qmg_heatbath_sweeps.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # phases (2, Y, X)
                ctypes.c_int, ctypes.c_int,       # Y, X
                ctypes.c_double, ctypes.c_int,    # beta, n_update
                ctypes.c_uint64,                  # seed for this call
            ]
            lib.qmg_heatbath_sweeps.restype = None
            lib.qmg_heatbath_sweeps_std.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # phases (2, Y, X)
                ctypes.c_int, ctypes.c_int,       # Y, X
                ctypes.c_double, ctypes.c_int,    # beta, n_update
                ctypes.POINTER(ctypes.c_uint32),  # mt19937 state (624)
                ctypes.POINTER(ctypes.c_int32),   # index
                ctypes.POINTER(ctypes.c_double),  # saved normal
                ctypes.POINTER(ctypes.c_int32),   # has_saved
            ]
            lib.qmg_heatbath_sweeps_std.restype = None
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def have_heatbath() -> bool:
    return _load() is not None


def heatbath_sweeps(ph: np.ndarray, beta: float, n_update: int, rng
                    ) -> np.ndarray:
    """C++ heatbath sweep. ph: (2, Y, X) float64, modified and returned.

    Draws a fresh 64-bit seed from the caller's rng stream so the composite
    (python-rng -> native-rng) run remains deterministic.
    """
    lib = _load()
    assert lib is not None
    ph = np.ascontiguousarray(ph, dtype=np.float64)
    seed = int(rng.gen.integers(0, 2**63 - 1))
    yl, xl = ph.shape[1], ph.shape[2]
    lib.qmg_heatbath_sweeps(
        ph.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        yl, xl, float(beta), int(n_update), seed)
    return ph


def heatbath_sweeps_std(ph: np.ndarray, beta: float, n_update: int,
                        std_rng) -> np.ndarray:
    """C++ heatbath sweep continuing an rng.StdMT19937 stream BIT-EXACTLY.

    The engine + Marsaglia-polar normal run in C++ on the Python
    object's own state (624-word mt19937 state, index, cached normal),
    which is written back afterwards - the composite stream is
    indistinguishable from the pure-Python sweep (asserted in
    tests/test_rng.py) at native speed.
    """
    lib = _load()
    assert lib is not None
    ph = np.ascontiguousarray(ph, dtype=np.float64)
    mt = np.ascontiguousarray(std_rng._mt.astype(np.uint32))
    idx = np.array([std_rng._idx], dtype=np.int32)
    saved = np.array([std_rng._saved_normal
                      if std_rng._saved_normal is not None else 0.0])
    has = np.array([std_rng._saved_normal is not None], dtype=np.int32)
    yl, xl = ph.shape[1], ph.shape[2]
    lib.qmg_heatbath_sweeps_std(
        ph.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        yl, xl, float(beta), int(n_update),
        mt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        saved.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        has.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    std_rng._mt = mt.astype(np.uint64)
    std_rng._idx = int(idx[0])
    std_rng._saved_normal = float(saved[0]) if has[0] else None
    return ph

"""Linear assignment (Hungarian / Jonker-Volgenant) for tracking.

The native C++ JV solver (native/lap.cpp, built on demand with g++) replaces
the reference's external lapsolver C dependency (sort_tracker.py:4,
eval_mot.py:10). Falls back to scipy's Hungarian if the native build is
unavailable. The tracking loop is host-sequential, so this runs on CPU
alongside the TPU-compiled detector step.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LOAD_FAILED = False


def _load():
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    try:
        from ..native.build import build_shared

        lib = ctypes.CDLL(build_shared("lap"))
        lib.lap_solve.restype = ctypes.c_double
        lib.lap_solve.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.greedy_solve.restype = ctypes.c_int32
        lib.greedy_solve.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LOAD_FAILED = True
    return _LIB


def linear_sum_assignment(
    cost: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """scipy-compatible API: returns (row_ind, col_ind) of the min-cost
    assignment over the rectangular ``cost`` matrix."""
    cost = np.ascontiguousarray(cost, np.float64)
    n_rows, n_cols = cost.shape
    if n_rows == 0 or n_cols == 0:
        return np.zeros((0,), np.int64), np.zeros((0,), np.int64)
    lib = _load()
    if lib is None:
        from scipy.optimize import linear_sum_assignment as _scipy_lsa

        return _scipy_lsa(cost)
    r2c = np.full((n_rows,), -1, np.int32)
    c2r = np.full((n_cols,), -1, np.int32)
    lib.lap_solve(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_rows, n_cols,
        r2c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c2r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    rows = np.nonzero(r2c >= 0)[0]
    return rows.astype(np.int64), r2c[rows].astype(np.int64)


def greedy_assignment(
    cost: np.ndarray, thr: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy global-minimum matching under a cost threshold (the SORT IoU
    fallback). Returns (row_ind, col_ind)."""
    cost = np.ascontiguousarray(cost, np.float64)
    n_rows, n_cols = cost.shape
    if n_rows == 0 or n_cols == 0:
        return np.zeros((0,), np.int64), np.zeros((0,), np.int64)
    lib = _load()
    if lib is None:
        rows, cols = [], []
        c = cost.copy()
        while True:
            r, k = np.unravel_index(np.argmin(c), c.shape)
            if c[r, k] >= thr:
                break
            rows.append(r)
            cols.append(k)
            c[r, :] = np.inf
            c[:, k] = np.inf
        return np.asarray(rows, np.int64), np.asarray(cols, np.int64)
    r2c = np.full((n_rows,), -1, np.int32)
    c2r = np.full((n_cols,), -1, np.int32)
    lib.greedy_solve(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_rows, n_cols, float(thr),
        r2c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c2r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    rows = np.nonzero(r2c >= 0)[0]
    return rows.astype(np.int64), r2c[rows].astype(np.int64)


def is_native() -> bool:
    """True when the C++ JV solver is loaded (vs the scipy fallback)."""
    return _load() is not None

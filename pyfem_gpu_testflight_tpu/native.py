"""ctypes loader for the native host-setup library (native/fastsetup.cpp).

The C++ library accelerates host-side mesh setup (sparsity-pattern
sort/unique over tens of millions of keys) with OpenMP.  It is built on
demand with ``make -C native`` (g++); every entry point has a NumPy
fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["get_lib", "unique_inverse", "expand_pattern", "greedy_aggregate"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastsetup.so")
_lib = None
_tried = False


def _build():
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        _build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.unique_inverse_i64.restype = ctypes.c_int64
        lib.unique_inverse_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.greedy_aggregate_csr.restype = ctypes.c_int64
        lib.greedy_aggregate_csr.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.unique_inverse_i64_keys.restype = ctypes.c_int64
        lib.unique_inverse_i64_keys.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.expand_pattern_i64.restype = None
        lib.expand_pattern_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _ptr_i64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptr_i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def unique_inverse(keys: np.ndarray, rows=None, nrows=None):
    """np.unique(keys, return_inverse=True), native when available.

    When ``rows``/``nrows`` are given (FEM pattern keys = row*N + col),
    the native path uses a linear-time row-bucketed algorithm instead of
    a global sort.
    """
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    lib = get_lib()
    if lib is None:
        uniq, inv = np.unique(keys, return_inverse=True)
        return uniq, inv.astype(np.int32)
    n = keys.shape[0]
    uniq = np.empty(n, dtype=np.int64)
    inv = np.empty(n, dtype=np.int32)
    if rows is not None:
        rows = np.ascontiguousarray(rows, dtype=np.int64)
        n_unique = lib.unique_inverse_i64_keys(
            _ptr_i64(keys), n, int(nrows), _ptr_i64(rows), _ptr_i64(uniq),
            _ptr_i32(inv),
        )
    else:
        n_unique = lib.unique_inverse_i64(_ptr_i64(keys), n, _ptr_i64(uniq),
                                          _ptr_i32(inv))
    if n_unique < 0:
        raise RuntimeError("native unique_inverse failed")
    return uniq[:n_unique].copy(), inv


def expand_pattern(conn_dof: np.ndarray):
    """(rows, cols) int64 arrays of all element-matrix index pairs."""
    conn_dof = np.ascontiguousarray(conn_dof, dtype=np.int64)
    nelems, ndpe = conn_dof.shape
    lib = get_lib()
    if lib is None:
        rows = np.repeat(conn_dof, ndpe, axis=1).ravel()
        cols = np.tile(conn_dof, (1, ndpe)).ravel()
        return rows, cols
    rows = np.empty(nelems * ndpe * ndpe, dtype=np.int64)
    cols = np.empty(nelems * ndpe * ndpe, dtype=np.int64)
    lib.expand_pattern_i64(_ptr_i64(conn_dof), nelems, ndpe,
                           _ptr_i64(rows), _ptr_i64(cols))
    return rows, cols


def greedy_aggregate(indptr: np.ndarray, indices: np.ndarray, n: int):
    """Greedy BFS graph aggregation (AMG setup); native when available.

    Returns:
        (agg, n_agg) with agg int64 of shape (n,).
    """
    lib = get_lib()
    if lib is None:
        return None  # caller falls back to the Python loop
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    agg = np.empty(int(n), dtype=np.int64)
    n_agg = lib.greedy_aggregate_csr(_ptr_i64(indptr), _ptr_i64(indices),
                                     int(n), _ptr_i64(agg))
    return agg, int(n_agg)

"""ctypes bindings for the native C++ symbolic engine.

The reference solver links native code for its graph/ordering work (the
``amd`` crate + QDLDL's symbolic phase); here the equivalent lives in
``native/symbolic.cpp``, compiled on first use and loaded via ctypes.  A
pure-Python fallback (chordal.symbolic) keeps everything working when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Set, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libclarabel_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True

    src = os.path.join(_NATIVE_DIR, "symbolic.cpp")
    stale = not os.path.exists(_LIB_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-B"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cl_minimum_degree.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
    lib.cl_symbolic_count.argtypes = [ctypes.c_int64, i64p, i64p, i64p, i64p]
    lib.cl_symbolic_pattern.argtypes = [ctypes.c_int64, i64p, i64p, i64p, i64p, i64p]
    lib.cl_postorder.argtypes = [ctypes.c_int64, i64p, i64p]
    if hasattr(lib, "cl_postorder_forest"):
        lib.cl_postorder_forest.argtypes = [ctypes.c_int64, i64p, i64p]
    if hasattr(lib, "cl_amalgamate"):
        lib.cl_amalgamate.argtypes = [
            ctypes.c_int64, i64p, i64p, i64p, i64p, i64p, i64p,
            ctypes.c_int64, ctypes.c_double,
            u8p, i64p, i64p, i64p, i64p, i64p,
        ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def minimum_degree(n: int, adj: Sequence[Set[int]]) -> Optional[np.ndarray]:
    """Native minimum-degree ordering; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ptr = np.zeros(n + 1, np.int64)
    for v in range(n):
        ptr[v + 1] = ptr[v] + len(adj[v])
    idx = np.zeros(int(ptr[-1]), np.int64)
    pos = 0
    for v in range(n):
        for u in sorted(adj[v]):
            idx[pos] = u
            pos += 1
    perm = np.zeros(n, np.int64)
    lib.cl_minimum_degree(n, _p(ptr), _p(idx), _p(perm))
    return perm


def amalgamate(cols_ptr, cols_idx, rows_ptr, rows_idx, parent, post,
               max_cols: int, relax_frac: float):
    """Native relaxed supernode amalgamation (mf_symbolic._amalgamate's
    hot loop); returns (alive, cols_ptr, cols_idx, rows_ptr, rows_idx,
    parent) or None when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "cl_amalgamate"):
        return None
    n_nodes = parent.shape[0]
    cols_ptr = np.ascontiguousarray(cols_ptr, np.int64)
    cols_idx = np.ascontiguousarray(cols_idx, np.int64)
    rows_ptr = np.ascontiguousarray(rows_ptr, np.int64)
    rows_idx = np.ascontiguousarray(rows_idx, np.int64)
    parent = np.ascontiguousarray(parent, np.int64)
    post = np.ascontiguousarray(post, np.int64)
    alive = np.zeros(n_nodes, np.uint8)
    ocp = np.zeros(n_nodes + 1, np.int64)
    oci = np.zeros(cols_idx.shape[0], np.int64)
    orp = np.zeros(n_nodes + 1, np.int64)
    ori = np.zeros(rows_idx.shape[0], np.int64)
    pout = np.zeros(n_nodes, np.int64)
    lib.cl_amalgamate(
        n_nodes, _p(cols_ptr), _p(cols_idx), _p(rows_ptr), _p(rows_idx),
        _p(parent), _p(post), int(max_cols), ctypes.c_double(relax_frac),
        alive.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _p(ocp), _p(oci), _p(orp), _p(ori), _p(pout),
    )
    return alive.astype(bool), ocp, oci, orp, ori, pout


def symbolic_cholesky(
    n: int, lower_cols: Sequence[Set[int]]
) -> Optional[Tuple[List[List[int]], np.ndarray]]:
    """Native symbolic factorization; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    ptr = np.zeros(n + 1, np.int64)
    for v in range(n):
        ptr[v + 1] = ptr[v] + len(lower_cols[v])
    idx = np.zeros(int(ptr[-1]), np.int64)
    pos = 0
    for v in range(n):
        for r in sorted(lower_cols[v]):
            idx[pos] = r
            pos += 1

    parent = np.zeros(n, np.int64)
    lnz = np.zeros(n, np.int64)
    lib.cl_symbolic_count(n, _p(ptr), _p(idx), _p(parent), _p(lnz))

    out_ptr = np.zeros(n + 1, np.int64)
    out_idx = np.zeros(int(lnz.sum()), np.int64)
    lib.cl_symbolic_pattern(n, _p(ptr), _p(idx), _p(parent), _p(out_ptr), _p(out_idx))

    L_cols = [
        out_idx[out_ptr[j] : out_ptr[j + 1]].tolist() for j in range(n)
    ]
    return L_cols, parent

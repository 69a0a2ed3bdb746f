"""Native host decode kernels (C++ via ctypes), built on first use.

Scalar re-expressions of this project's device decoder formulations
(ops/nussinov.py, ops/nw.py) for host-mode solves: the --ipknot DD loop and
the -v 2 verbose loop decode on host every iteration (dd.solve_by_dd_ipknot).
Bit-exactness against both the device kernels and the disclosed reference
mirrors in /oracle is pinned by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _build() -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "src", "dafs_host.cpp")
    out = os.path.join(here, "_dafs_host.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", out],
        check=True,
    )
    return out


def lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        L = ctypes.CDLL(_build())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        L.sparse_nussinov_decode.restype = ctypes.c_float
        L.sparse_nussinov_decode.argtypes = [f32p, ctypes.c_int32, i32p]
        L.sparse_nw_decode.restype = ctypes.c_float
        L.sparse_nw_decode.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32, i64p, i32p]
        _LIB = L
    return _LIB


def sparse_nussinov(sm: np.ndarray):
    sm = np.ascontiguousarray(sm, np.float32)
    L = sm.shape[0]
    ss = np.empty(L, np.int32)
    score = lib().sparse_nussinov_decode(sm, L, ss)
    return float(score), ss.astype(np.int64)


def sparse_nw(sm: np.ndarray, env: np.ndarray):
    sm = np.ascontiguousarray(sm, np.float32)
    L1, L2 = sm.shape
    al = np.empty(L1, np.int32)
    score = lib().sparse_nw_decode(
        sm, L1, L2, np.ascontiguousarray(env, np.int64).reshape(-1), al
    )
    return float(score), al.astype(np.int64)

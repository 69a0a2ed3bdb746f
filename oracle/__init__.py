"""Reference-mirror test oracles (C++ via ctypes), built on first use.

This package is NOT part of the shipped ``dafs_tpu`` framework: it holds the
disclosed line-level mirrors of the reference's sequential decode routines
(src/nussinov.cpp, src/needleman_wunsch.cpp, src/dafs.cpp similarity,
probconsRNA ProbabilisticModel.h) used exclusively by tests/ and bench.py to
pin the TPU kernels and the independently-written production host decoders
(dafs_tpu/native) against the reference's exact float32 semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _build() -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "src", "oracle_host.cpp")
    out = os.path.join(here, "_oracle_host.so")
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
        L.nw_envelope.restype = None
        L.nw_envelope.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_float, i64p]
        L.sparse_nw_decode.restype = ctypes.c_float
        L.sparse_nw_decode.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32, i64p, i32p]
        L.similarity_score.restype = ctypes.c_float
        L.similarity_score.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32]
        L.pairhmm_posterior.restype = ctypes.c_float
        L.pairhmm_posterior.argtypes = [
            i32p, ctypes.c_int32, i32p, ctypes.c_int32,
            f32p, f32p, f32p, f32p, f32p,
        ]
        _LIB = L
    return _LIB


def sparse_nussinov(sm: np.ndarray):
    sm = np.ascontiguousarray(sm, np.float32)
    L = sm.shape[0]
    ss = np.empty(L, np.int32)
    score = lib().sparse_nussinov_decode(sm, L, ss)
    return float(score), ss.astype(np.int64)


def nw_envelope(p: np.ndarray, th: float):
    p = np.ascontiguousarray(p, np.float32)
    L1, L2 = p.shape
    env = np.zeros((L1 + 1, 2), np.int64)
    lib().nw_envelope(p, L1, L2, np.float32(th), env.reshape(-1))
    return env


def sparse_nw(sm: np.ndarray, env: np.ndarray):
    sm = np.ascontiguousarray(sm, np.float32)
    L1, L2 = sm.shape
    al = np.empty(L1, np.int32)
    score = lib().sparse_nw_decode(
        sm, L1, L2, np.ascontiguousarray(env, np.int64).reshape(-1), al
    )
    return float(score), al.astype(np.int64)


def similarity(mp: np.ndarray) -> float:
    mp = np.ascontiguousarray(mp, np.float32)
    return float(lib().similarity_score(mp, mp.shape[0], mp.shape[1]))


def pairhmm_posterior(seq1: str, seq2: str):
    """Scalar single-core ProbCons posterior (reference-mirror C++; measured
    baseline + large-L oracle for the batched TPU kernels).
    Returns (total, post)."""
    from dafs_tpu.models import probcons_params as P

    t = P.log_tables()
    L1, L2 = len(seq1), len(seq2)
    c1 = np.zeros(L1 + 1, np.int32)
    c2 = np.zeros(L2 + 1, np.int32)
    c1[1:] = P.encode(seq1)
    c2[1:] = P.encode(seq2)
    post = np.empty((L1, L2), np.float32)
    total = lib().pairhmm_posterior(
        c1, L1, c2, L2,
        np.ascontiguousarray(t["init"], np.float32),
        np.ascontiguousarray(t["trans"], np.float32).reshape(-1),
        np.ascontiguousarray(t["match"], np.float32).reshape(-1),
        np.ascontiguousarray(t["ins"], np.float32),
        post.reshape(-1),
    )
    return float(total), post

"""Sparse host<->device transfer for thresholded posterior tensors.

The pipeline's large tensors (match/base-pair posteriors, PCT outputs) are
>= 98% exact zeros by construction (every producer applies the reference's
CUTOFF threshold, src/dafs.cpp:19).  Moving them dense is wasteful on any
transport and catastrophic over the axon relay (measured 13 MB/s D2H for a
45 MB tensor); the reference itself never materializes them dense.  These
helpers move only (index, value) pairs of the nonzeros — bit-exact: the
values are untouched f32 and the positions are unique, so the
reconstructed array equals the dense transfer byte-for-byte.

Packing caps are bucketed to powers of two to bound the number of compiled
variants; arrays that are small or too dense fall back to the dense path.
Disable with DAFS_TPU_SPARSE_XFER=0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_MIN_BYTES = 4 << 20  # only worth the extra dispatches for multi-MB arrays


def _enabled() -> bool:
    if os.environ.get("DAFS_TPU_SPARSE_XFER", "1") in ("", "0"):
        return False
    return jax.default_backend() != "cpu"


def _cap_for(nnz: int) -> int:
    cap = 1 << 12
    while cap < nnz:
        cap *= 2
    return cap


@functools.partial(jax.jit, static_argnames=("cap",))
def _pack(xf, *, cap):
    # indices and values pull separately (bitcast-packing them into one f32
    # buffer was rejected: TPU data movement flushes denormal bit patterns,
    # and flat indices can exceed 2**24 so float conversion is not exact)
    size = xf.shape[0]
    (idx,) = jnp.nonzero(xf, size=cap, fill_value=size)
    vals = xf[jnp.minimum(idx, size - 1)]
    return idx.astype(jnp.int32) if size < 2**31 else idx, vals


@functools.partial(jax.jit, static_argnames=("size",))
def _unpack(idx, vals, *, size):
    return jnp.zeros((size,), vals.dtype).at[idx].set(vals, mode="drop")


def pull(x) -> np.ndarray:
    """Device array -> host numpy, sparse-packed when profitable.

    Byte-identical to np.asarray(x) for float32 inputs."""
    nbytes = x.size * x.dtype.itemsize
    if not _enabled() or nbytes < _MIN_BYTES or x.dtype != jnp.float32:
        return np.asarray(x)
    xf = x.reshape(-1)
    nnz = int(jnp.count_nonzero(xf))
    cap = _cap_for(max(nnz, 1))
    if cap * 8 >= nbytes:  # too dense to be worth it
        return np.asarray(x)
    idx, vals = _pack(xf, cap=cap)
    idxh = np.asarray(idx).astype(np.int64)
    valsh = np.asarray(vals)
    out = np.zeros(x.size, np.float32)
    m = idxh < x.size
    out[idxh[m]] = valsh[m]
    return out.reshape(x.shape)


def push(a: np.ndarray):
    """Host numpy -> device array, sparse-packed when profitable.

    The device value equals jnp.asarray(a) exactly."""
    if not _enabled() or a.nbytes < _MIN_BYTES or a.dtype != np.float32:
        return jnp.asarray(a)
    flat = a.reshape(-1)
    idx = np.flatnonzero(flat)
    cap = _cap_for(max(idx.size, 1))
    if cap * 8 >= a.nbytes:
        return jnp.asarray(a)
    idxp = np.full(cap, a.size, np.int64)  # out-of-range -> dropped scatter
    idxp[: idx.size] = idx
    valsp = np.zeros(cap, np.float32)
    valsp[: idx.size] = flat[idx]
    return _unpack(
        jnp.asarray(idxp), jnp.asarray(valsp), size=a.size
    ).reshape(a.shape)

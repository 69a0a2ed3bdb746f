"""Persistent AOT trace cache (jax.export-backed).

JAX's persistent compilation cache only skips XLA *compilation*; every new
process still pays Python tracing + StableHLO lowering for each distinct
input-shape signature (~5s per (length, group-size) shape for the big DP
kernels here).  This module caches the *lowered* artifact too: the first call
at a signature runs `jax.export.export` and writes the serialized module next
to the compile cache; later processes deserialize (~1ms) and jump straight to
the (persistently cached) executable.

The cache key covers: jax version, backend platform, the kernel's module
source hash (so edits invalidate), the static kwargs, and the pytree
structure + shapes/dtypes of the dynamic arguments.  Array *values* (energy
tables, posteriors, ...) are dynamic inputs — they are never baked into the
artifact.

No counterpart in the reference (it is a single C++ process; its "cache" is
the compiled binary).  This is TPU-framework infrastructure.
"""

from __future__ import annotations

import hashlib
import os
import threading

import jax

_mem: dict = {}
_lock = threading.Lock()
_srchash_memo: dict = {}


def compile_cache_dir() -> str:
    """Host-keyed persistent XLA compile-cache path.

    XLA:CPU AOT artifacts embed the build host's CPU feature set and can
    SIGILL/segfault when loaded on a machine with different features (the
    jax cache key does not cover host CPU flags), so the directory is
    fingerprinted by platform + /proc/cpuinfo flags."""
    base = os.environ.get("DAFS_TPU_COMPILE_CACHE", "/tmp/dafs_tpu_jax_cache")
    try:
        import platform as _pl

        # flags alone are not enough: two hosts with identical cpuinfo flag
        # lists can still differ in LLVM-detected target features (observed
        # 2026-08: XLA:CPU AOT artifacts with +prefer-no-scatter/+amx-*
        # variants loading on a host whose flags hashed identically), so the
        # model name and microcode lines join the fingerprint.
        keep = ("flags", "model name", "microcode", "cpu family", "model\t")
        lines = []
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith(keep):
                    lines.append(ln)
                if len(lines) >= 8:
                    break
        fp = hashlib.sha256((_pl.machine() + "".join(lines)).encode()).hexdigest()[:10]
    except Exception:
        fp = "generic"
    return f"{base}_{fp}"


def setup_compile_cache() -> str:
    d = compile_cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    return d


def cache_dir() -> str:
    d = os.environ.get(
        "DAFS_TPU_AOT_CACHE",
        os.path.join(
            jax.config.jax_compilation_cache_dir or "/tmp/dafs_tpu_jax_cache",
            "exports",
        ),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _module_src_hash(modname: str) -> str:
    h = _srchash_memo.get(modname)
    if h is None:
        import sys

        mod = sys.modules.get(modname)
        try:
            with open(mod.__file__, "rb") as f:
                h = hashlib.sha256(f.read()).hexdigest()[:16]
        except Exception:
            h = "nosrc"
        _srchash_memo[modname] = h
    return h


def _package_src_hash() -> str:
    """Hash of every .py source in the dafs_tpu package.

    Traced functions call freely across modules (dd -> nussinov/nw, models ->
    kernels, ...), so per-module hashing under-invalidates: an edit to a
    callee would silently serve the caller's stale export.  Hashing the whole
    package over-invalidates (any edit retraces everything once per shape),
    which is the safe direction."""
    h = _srchash_memo.get("__package__")
    if h is None:
        import dafs_tpu

        root = os.path.dirname(os.path.abspath(dafs_tpu.__file__))
        sha = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    sha.update(p.encode())
                    with open(p, "rb") as f:
                        sha.update(f.read())
        h = sha.hexdigest()[:16]
        _srchash_memo["__package__"] = h
    return h


def _sig_of(tree) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [str(treedef)]
    for x in leaves:
        if hasattr(x, "shape"):
            parts.append(f"{getattr(x, 'dtype', type(x))}{tuple(x.shape)}")
        else:
            parts.append(repr(x))
    return "|".join(parts)


def persistent_jit(fn=None, *, static_argnames=(), deps=(), salt=""):
    """Drop-in replacement for `jax.jit(fn, static_argnames=...)` that routes
    top-level concrete calls through the persistent export cache.

    - Static args MUST be passed as keyword arguments at call sites.
    - Calls with tracer arguments (i.e. from inside another traced function,
      vmap, or scan) fall through to the plain jitted function — the export
      cache only applies at the top-level dispatch boundary.
    - `deps`: extra module names whose source participates in the cache key
      (the fn's own module and dafs_tpu.ops.energy_params always do).
    """
    if fn is None:
        import functools as _ft

        return _ft.partial(
            persistent_jit, static_argnames=static_argnames, deps=deps,
            salt=salt,
        )
    import functools as _ft

    jitted = jax.jit(fn, static_argnames=static_argnames)
    static_set = tuple(static_argnames)
    dep_mods = tuple(deps) + ("dafs_tpu.ops.energy_params",)

    @_ft.wraps(fn)
    def wrapper(*args, **kwargs):
        static = {k: kwargs.pop(k) for k in static_set if k in kwargs}
        leaves = jax.tree_util.tree_leaves((args, kwargs))

        def _no_aot(x):
            # tracers: we're inside another traced computation; multi-device
            # arrays: export would pin/replicate shardings — let pjit handle
            if isinstance(x, jax.core.Tracer):
                return True
            if isinstance(x, jax.Array):
                try:
                    return len(x.sharding.device_set) > 1
                except Exception:
                    return True
            return False

        if os.environ.get("DAFS_TPU_NO_AOT") or any(map(_no_aot, leaves)):
            return jitted(*args, **kwargs, **static)
        dep_salt = salt + "|".join(_module_src_hash(m) for m in dep_mods)
        return cached_call(
            jitted, *args, static=static, salt=dep_salt, **kwargs
        )

    wrapper._jitted = jitted
    return wrapper


def cached_call(fn, *args, static: dict | None = None, salt: str = "", **kwargs):
    """Call jitted `fn(*args, **static)` through the persistent export cache.

    `fn` must be a `jax.jit`-wrapped function whose only non-array inputs are
    the `static` kwargs.  Disable with DAFS_TPU_NO_AOT=1 (falls back to the
    plain jitted call).
    """
    static = static or {}
    if os.environ.get("DAFS_TPU_NO_AOT"):
        return fn(*args, **kwargs, **static)
    name = getattr(fn, "__qualname__", getattr(fn, "__name__", "fn"))
    modname = getattr(fn, "__module__", "?")
    backend = jax.default_backend()
    # Env knobs (kernel ablations, alifold semantics, backend dispatch) are
    # read at TRACE time, so they are part of the artifact's identity; a key
    # without them would serve an artifact traced under different semantics.
    env_knobs = repr(
        sorted(
            (k, v)
            for k, v in os.environ.items()
            if k.startswith("DAFS_TPU_")
            and k not in (
                "DAFS_TPU_AOT_CACHE", "DAFS_TPU_COMPILE_CACHE",
                "DAFS_TPU_TIMING",  # host-side logging only, not traced
            )
        )
    )
    keysrc = "\x00".join(
        [
            jax.__version__,
            backend,
            str(jax.config.jax_default_matmul_precision),
            modname,
            name,
            _package_src_hash(),
            repr(sorted(static.items())),
            _sig_of((args, kwargs)),
            env_knobs,
            salt,
        ]
    )
    key = hashlib.sha256(keysrc.encode()).hexdigest()[:24]
    call = _mem.get(key)
    if call is None:
        with _lock:
            call = _mem.get(key)
            if call is None:
                path = os.path.join(
                    cache_dir(), f"{name.replace('.', '_')}-{key}.jaxexp"
                )
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        exp = jax.export.deserialize(f.read())
                else:
                    if static:
                        import functools

                        bound = jax.jit(functools.partial(fn, **static))
                    else:
                        bound = fn
                    exp = jax.export.export(bound)(*args, **kwargs)
                    data = exp.serialize()
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    os.replace(tmp, path)
                # jit the exported call: exp.call re-traces the module
                # wrapper on EVERY invocation (~0.2-0.7s of host time per
                # call); under jit, repeat calls hit pjit's C++ fast path.
                call = jax.jit(exp.call)
                _mem[key] = call
    return call(*args, **kwargs)

"""Device-mesh sharding of the all-pairs workloads.

The reference runs every sequence pair and every sequence serially on one
core (SURVEY §2.5).  Here the N*(N-1)/2 pair-HMM problems and the N folding
problems shard data-parallel over a 1-D `jax.sharding.Mesh` ("work" axis);
each device computes its shard of padded DP problems with the same wavefront
kernels, and the host assembles results (posteriors stay sharded on device
until thresholding; the tiny similarity matrix is gathered).

Multi-host scaling note: with a mesh spanning hosts, the same code paths
shard across DCN/ICI automatically; collectives appear only in the gather of
per-pair outputs, which XLA lowers to all_gathers along the work axis.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dafs_tpu.models import probcons_params as PP
from dafs_tpu.ops import pairhmm

_FORCE_SINGLE = False


@contextlib.contextmanager
def force_single_device():
    """Run the pipeline as if one device were attached (all `shard when
    device_count > 1` gates see 1).  Used by __graft_entry__.dryrun_multichip
    to prove the sharded run is byte-identical to the single-device run in
    the same process."""
    global _FORCE_SINGLE
    prev = _FORCE_SINGLE
    _FORCE_SINGLE = True
    try:
        yield
    finally:
        _FORCE_SINGLE = prev


def work_device_count() -> int:
    """Device count as seen by the sharding gates (1 under
    force_single_device)."""
    return 1 if _FORCE_SINGLE else jax.device_count()


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), ("work",))


def _round_up(n, m):
    return -(-n // m) * m


def sharded_pair_posteriors(seqs1, seqs2, threshold, mesh: Mesh | None = None):
    """All given sequence pairs, sharded across the mesh's work axis.

    Functionally identical to pairhmm.batch_posteriors; the batch is padded
    to a multiple of the mesh size and each device runs its shard of the
    wavefront scan.
    """
    if not seqs1:
        return []
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    B = len(seqs1)
    Bp = _round_up(max(B, 1), ndev)
    l1max = _round_up(max(len(s) for s in seqs1), 32)
    l2max = _round_up(max(len(s) for s in seqs2), 32)

    codes1 = np.zeros((Bp, l1max + 1), dtype=np.int32)
    codes2 = np.zeros((Bp, l2max + 1), dtype=np.int32)
    len1 = np.ones(Bp, dtype=np.int32)
    len2 = np.ones(Bp, dtype=np.int32)
    for b, s in enumerate(seqs1):
        codes1[b, 1 : len(s) + 1] = PP.encode(s)
        len1[b] = len(s)
    for b, s in enumerate(seqs2):
        codes2[b, 1 : len(s) + 1] = PP.encode(s)
        len2[b] = len(s)

    sharding = NamedSharding(mesh, P("work"))
    put = lambda x: jax.device_put(x, sharding)  # noqa: E731
    post = pairhmm.forward_backward_posterior(
        put(jnp.asarray(codes1)), put(jnp.asarray(len1)),
        put(jnp.asarray(codes2)), put(jnp.asarray(len2)),
        l1max=l1max, l2max=l2max,
    )
    post = np.asarray(post)
    out = []
    for b in range(B):
        p = post[b, : len1[b], : len2[b]].copy()
        p[p <= threshold] = 0.0
        out.append(p)
    return out


def sharded_bp_posteriors(seqs, threshold, bl=True, constraints=None,
                          mesh: Mesh | None = None):
    """Per-sequence McCaskill BP posteriors sharded across the work axis.

    The N folding problems (SURVEY §2.5: the O(N L^3) stage) run as the same
    vmapped gather-free kernel with the batch axis laid out over the mesh."""
    from dafs_tpu.ops import mccaskill

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    sharding = NamedSharding(mesh, P("work"))
    put = lambda x: jax.device_put(x, sharding)  # noqa: E731
    return mccaskill.batch_bp_posteriors_fast(
        seqs, threshold, bl=bl, constraints=constraints, put=put, b_mult=ndev
    )

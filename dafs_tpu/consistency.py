"""Similarity scores and probabilistic consistency transformations (PCT).

TPU-first reformulations of:
- calculate_similarity_score (src/dafs.cpp:713-764): a sparse NW-like DP with
  a path-length counter; here a row-scan with an associative running max and
  vectorized Y-run length reconstruction, vmapped over all sequence pairs.
- relax_matching_probability (src/dafs.cpp:258-324): the 3-way PCT
  p'(x_i,y_j) = sum_z w_z sum_k p(z_k,x_i) p(z_k,y_j) becomes one batched
  matmul chain over the padded (N, N, L, L) posterior tensor — MXU work.
- relax_basepairing_probability (src/dafs.cpp:326-375): likewise
  p'_x = sum_y w_y * M_yx^T B_y M_yx with two matmuls per (x, y).
- relax_fourway_consistency (src/dafs.cpp:377-444): the four-way PCT coupling
  match and pair posteriors (off by default, -f 0.0).

All weights and accumulations are float32, matching reference precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.typedefs import CUTOFF

from dafs_tpu.utils import aot


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


@aot.persistent_jit(static_argnames=("L1", "L2"))
def _similarity_device(p, present, l1, l2, *, L1, L2):
    """dp[L1][L2] and tr[L1][L2] of the similarity DP.

    p: (L1, L2) float32 match posteriors (0 where absent).
    present: (L1, L2) bool, True where the sparse matrix has an entry
      (strictly > threshold in the producer).
    """
    NEGI = jnp.float32(-3e38)

    def row(carry, inp):
        dp_prev, tr_prev = carry  # (L2+1,) of previous DP row
        p_row, ent_row, i = inp   # (L2,), (L2,), scalar
        # candidates from the previous row, for j in [1, L2]
        m_cand = jnp.where(ent_row, dp_prev[:-1] + p_row, NEGI)
        x_cand = dp_prev[1:]
        # priority: entry cols [M, Y, X]; non-entry [Y, X].
        # For the dp *value*, dp[i][j] = max(m, x, dp[i][j-1]) with
        # dp[i][0] = 0; compute via running max.
        b = jnp.maximum(m_cand, x_cand)
        c = jnp.concatenate([jnp.zeros((1,), jnp.float32), b])
        run = jax.lax.associative_scan(jnp.maximum, c)
        dp_row = run  # (L2+1,), dp_row[0] = 0
        left = run[:-1]  # dp[i][j-1]

        # choice per cell j in [1, L2]:
        #   entry: M if dp==m_cand else Y if dp==left else X
        #   non-entry: Y if dp==left else X
        dpj = dp_row[1:]
        is_m = ent_row & (dpj == m_cand)
        is_y = ~is_m & (dpj == left)
        # tr for non-Y cells comes from the previous row
        tr_nonY = jnp.where(is_m, tr_prev[:-1] + 1, tr_prev[1:] + 1)
        # Y-runs: tr[j] = tr[anchor] + (j - anchor), anchor = last non-Y cell
        jj = jnp.arange(1, L2 + 1)
        anchor = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_y, 0, jj)
        )  # 0 means "column 0" (tr=0)
        tr_anchor_vals = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.where(is_y, 0, tr_nonY).astype(jnp.int32)]
        )
        # value at the anchor column (tr of the non-Y cell, or 0 at col 0)
        anchored = tr_anchor_vals[anchor]
        tr_row = jnp.where(is_y, anchored + (jj - anchor), tr_nonY)
        tr_row = jnp.concatenate([jnp.zeros((1,), jnp.int32), tr_row.astype(jnp.int32)])
        return (dp_row, tr_row), (dp_row, tr_row)

    dp0 = jnp.zeros((L2 + 1,), jnp.float32)
    tr0 = jnp.zeros((L2 + 1,), jnp.int32)
    # scan all padded rows, then gather at the true (l1, l2): later rows and
    # columns never influence earlier ones, so padding is exact.
    _, (dps, trs) = jax.lax.scan(row, (dp0, tr0), (p, present, jnp.arange(L1)))
    return dps[l1 - 1, l2], trs[l1 - 1, l2]


def _round_up(n, m):
    return -(-n // m) * m


def similarity(mp: np.ndarray, present: np.ndarray, l1: int, l2: int) -> float:
    """calculate_similarity_score for one pair (dense mp with zeros absent)."""
    P1, P2 = _round_up(l1, 32), _round_up(l2, 32)
    pp = np.zeros((P1, P2), np.float32)
    pp[:l1, :l2] = mp[:l1, :l2]
    ee = np.zeros((P1, P2), bool)
    ee[:l1, :l2] = present[:l1, :l2]
    dp, tr = _similarity_device(
        jnp.asarray(pp), jnp.asarray(ee),
        jnp.int32(l1), jnp.int32(l2), L1=P1, L2=P2,
    )
    return float(np.float32(float(dp) / float(tr)))


_SIM_BATCHED: dict = {}


@jax.jit
def _pack_sim_out(dp, tr):
    # tr counts are small ints -> float32 conversion is exact (bitcast
    # rejected: TPU data movement flushes denormal bit patterns to zero)
    return jnp.concatenate([dp, tr.astype(jnp.float32)])


def _similarity_batched(P1, P2):
    if (P1, P2) not in _SIM_BATCHED:
        def call(p, present, l1, l2):
            return _similarity_device(p, present, l1, l2, L1=P1, L2=P2)

        _SIM_BATCHED[(P1, P2)] = jax.jit(jax.vmap(call))
    return _SIM_BATCHED[(P1, P2)]


def similarity_matrix(mp: np.ndarray, lens: list[int]) -> np.ndarray:
    """All-pairs similarity in ONE vmapped device call.

    mp: (N, N, L, L) dense match posteriors (zeros where absent).  Returns
    the (N, N) matrix with 1.0 on the diagonal (src/dafs.cpp:1811-1819)."""
    N = mp.shape[0]
    pairs = [(i, j) for i in range(N) for j in range(i + 1, N)]
    if not pairs:
        return np.ones((N, N), np.float32)
    P1 = _round_up(max(lens), 32)
    P2 = P1
    B = len(pairs)
    pp = np.zeros((B, P1, P2), np.float32)
    l1 = np.zeros(B, np.int32)
    l2 = np.zeros(B, np.int32)
    for b, (i, j) in enumerate(pairs):
        pp[b, : lens[i], : lens[j]] = mp[i, j, : lens[i], : lens[j]]
        l1[b], l2[b] = lens[i], lens[j]
    from dafs_tpu.utils import sparsexfer as _sx

    # sparse-packed push; the presence mask is recomputed on device (it is
    # exactly pp > 0, so results are unchanged)
    pp_dev = _sx.push(pp)
    dp, tr = aot.cached_call(
        _similarity_batched(P1, P2),
        pp_dev, pp_dev > jnp.float32(0.0), jnp.asarray(l1), jnp.asarray(l2),
        salt=f"similarity_batched P={P1}",
    )
    # one readback for both result vectors (~26 ms round trip each on the
    # async relay); tr converts exactly through float32
    buf = np.asarray(_pack_sim_out(dp, tr))
    dp = buf[: len(pairs)]
    tr = buf[len(pairs) :].astype(np.int32)
    sim = np.ones((N, N), np.float32)
    for b, (i, j) in enumerate(pairs):
        sim[i, j] = sim[j, i] = np.float32(float(dp[b]) / float(tr[b]))
    return sim


# ---------------------------------------------------------------------------
# PCT transforms
# ---------------------------------------------------------------------------


def _pct_weights_match(sim: np.ndarray, x: int, y: int, w_pct: float) -> np.ndarray:
    """Per-z weights for relax_matching_probability (src/dafs.cpp:280-287)."""
    N = sim.shape[0]
    f = np.float32
    w = np.float32(sim[:, x] * sim[:, y])
    if w_pct < 0.0:
        w = np.float32(w * f(1.0 / N))
    else:
        scale = np.full(N, f(w_pct) / f(N - 2) if N > 2 else f(0.0), np.float32)
        scale[x] = f((1.0 - w_pct) / 2)
        scale[y] = f((1.0 - w_pct) / 2)
        w = np.float32(w * scale)
    return w


@aot.persistent_jit
def _relax_mp_scan(mp, xs, ys, W, sum_w):
    """3-way PCT over a pair worklist as ONE lax.scan.

    Program size is O(1) in N (the old formulation unrolled N*(N-1)/2 einsums
    into the program, exploding compile time at family scale); each step keeps
    the exact per-pair einsum, so results are unchanged.  The einsum is a
    single (L, N*L) x (N*L, L) f32 contraction — MXU work.
    """
    def body(carry, inp):
        x, y, w, sw = inp
        mpx = jax.lax.dynamic_index_in_dim(mp, x, axis=1, keepdims=False)
        mpy = jax.lax.dynamic_index_in_dim(mp, y, axis=1, keepdims=False)
        post = jnp.einsum(
            "z,zki,zkj->ij", w, mpx, mpy,
            preferred_element_type=jnp.float32, precision="highest",
        )
        post = (post / sw).astype(jnp.float32)
        post = jnp.where(post <= CUTOFF, 0.0, post)
        return carry, post

    _, out = jax.lax.scan(body, 0, (xs, ys, W, sum_w))
    return out  # (B, L, L)


@aot.persistent_jit
def _relax_bp_scan(bp, mp, xs, W, sum_w):
    """BP PCT over a sequence worklist as ONE lax.scan (O(1) program size)."""
    def body(carry, inp):
        x, w, sw = inp
        mpx = jax.lax.dynamic_index_in_dim(mp, x, axis=1, keepdims=False)
        post = jnp.einsum(
            "y,yki,ykl,ylj->ij", w, mpx, bp, mpx,
            preferred_element_type=jnp.float32, precision="highest",
        )
        post = (post / sw).astype(jnp.float32)
        post = jnp.triu(post, 1)
        post = jnp.where(post <= CUTOFF, 0.0, post)
        return carry, post

    _, out = jax.lax.scan(body, 0, (xs, W, sum_w))
    return out  # (B, L, L)


_SHARDED_PCT: dict = {}


def _sharded_pct(kind: str, mesh):
    """shard_map the PCT scans over the mesh work axis: the worklist splits
    across devices (each runs its chunk of the scan on the replicated
    posterior tensor); outputs are gathered along the work axis."""
    key = (kind, id(mesh))
    if key not in _SHARDED_PCT:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        if kind == "mp":
            fn = shard_map(
                _relax_mp_scan.__wrapped__, mesh=mesh,
                in_specs=(P(), P("work"), P("work"), P("work"), P("work")),
                out_specs=P("work"),
            )
        else:
            fn = shard_map(
                _relax_bp_scan.__wrapped__, mesh=mesh,
                in_specs=(P(), P(), P("work"), P("work"), P("work")),
                out_specs=P("work"),
            )
        _SHARDED_PCT[key] = jax.jit(fn)
    return _SHARDED_PCT[key]


def _maybe_mesh():
    from dafs_tpu.parallel import mesh as pmesh

    if pmesh.work_device_count() > 1:
        return pmesh.make_mesh()
    return None


def relax_matching_probability(
    mp: np.ndarray, sim: np.ndarray, lens: list[int], w_pct_a: float
) -> np.ndarray:
    """3-way PCT over the padded (N, N, L, L) match-posterior tensor.

    mp[x, y] is the dense (L, L) match matrix of pair (x, y) (zeros beyond
    lens, zeros where below cutoff); mp[y, x] must be its transpose and
    mp[x, x] identity.  Returns the transformed tensor with the same
    conventions (entries <= CUTOFF dropped).
    """
    N, _, L, _ = mp.shape
    pairs = [(x, y) for x in range(N - 1) for y in range(x + 1, N)]
    if not pairs:
        return mp.copy()
    mesh = _maybe_mesh()
    ndev = mesh.devices.size if mesh is not None else 1
    B = _round_up(len(pairs), ndev)
    xs = np.zeros(B, np.int32)
    ys = np.zeros(B, np.int32)
    W = np.zeros((B, N), np.float32)
    sum_w = np.ones(B, np.float32)
    for b, (x, y) in enumerate(pairs):
        w = _pct_weights_match(sim, x, y, w_pct_a)
        xs[b], ys[b] = x, y
        W[b] = w
        sum_w[b] = np.float32(np.sum(w, dtype=np.float32))
    from dafs_tpu.utils import sparsexfer as _sx

    # the (N, N, L, L) posterior tensor and the (B, L, L) results are
    # >= 98% exact zeros (CUTOFF-thresholded); move them sparse-packed
    args = (_sx.push(mp), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(W), jnp.asarray(sum_w))
    if mesh is not None:
        posts = _sx.pull(_sharded_pct("mp", mesh)(*args))
    else:
        posts = _sx.pull(_relax_mp_scan(*args))
    out = np.zeros_like(mp)
    for b, (x, y) in enumerate(pairs):
        p = posts[b].copy()
        p[lens[x]:, :] = 0.0
        p[:, lens[y]:] = 0.0
        out[x, y] = p
        out[y, x] = p.T
    for x in range(N):
        out[x, x] = 0.0
        out[x, x][np.arange(lens[x]), np.arange(lens[x])] = 1.0
    return out


def relax_basepairing_probability(
    bp: np.ndarray, mp: np.ndarray, sim: np.ndarray, lens: list[int], w_pct_s: float
) -> np.ndarray:
    """PCT for base-pair posteriors: p'_x = sum_y w_y M_yx^T B_y M_yx."""
    N, L, _ = bp.shape
    f = np.float32
    mesh = _maybe_mesh()
    ndev = mesh.devices.size if mesh is not None else 1
    B = _round_up(N, ndev)
    xs = np.zeros(B, np.int32)
    W = np.zeros((B, N), np.float32)
    sum_w = np.ones(B, np.float32)
    for x in range(N):
        w = np.float32(sim[:, x]).copy()
        if w_pct_s < 0.0:
            w = np.float32(w * f(1.0 / N))
        else:
            scale = np.full(N, f(w_pct_s) / f(N - 1) if N > 1 else f(0.0), np.float32)
            scale[x] = f(1.0 - w_pct_s)
            w = np.float32(w * scale)
        xs[x] = x
        W[x] = w
        sum_w[x] = np.float32(np.sum(w, dtype=np.float32))
    from dafs_tpu.utils import sparsexfer as _sx

    args = (_sx.push(bp), _sx.push(mp), jnp.asarray(xs),
            jnp.asarray(W), jnp.asarray(sum_w))
    if mesh is not None:
        posts = _sx.pull(_sharded_pct("bp", mesh)(*args))
    else:
        posts = _sx.pull(_relax_bp_scan(*args))
    out = posts[:N].copy()
    for x in range(N):
        out[x, lens[x]:, :] = 0.0
        out[x, :, lens[x]:] = 0.0
    return out


def relax_fourway_consistency(
    mp: np.ndarray, bp: np.ndarray, lens: list[int], w_pct_f: float
) -> np.ndarray:
    """Four-way PCT (src/dafs.cpp:377-444), coupling match and pair posteriors.

    posterior[i][k] += (1-w)*p_ik + w * sum_{j,l} p^x_ij p^y_kl p_jl   and the
    symmetric j,l term; implemented as matmul chains per pair.
    """
    N, _, L, _ = mp.shape
    f = np.float32
    out = np.zeros_like(mp)
    for x in range(N - 1):
        for y in range(x + 1, N):
            P = mp[x, y]
            mask = P > 0.0  # contributions only land on existing match entries
            post = np.float32(P * f(1.0 - w_pct_f))
            # term1: posterior[i][k] += sum_{j>i, l>k} bx[i][j] p[j][l] by[k][l]
            post = np.float32(
                post + f(w_pct_f) * mask * (bp[x] @ P @ bp[y].T)
            )
            # term2: posterior[j][l] += sum_{i<j, k<l} bx[i][j] by[k][l] p[i][k]
            post = np.float32(post + f(w_pct_f) * mask * (bp[x].T @ P @ bp[y]))
            post[post <= CUTOFF] = 0.0
            post[lens[x]:, :] = 0.0
            post[:, lens[y]:] = 0.0
            out[x, y] = post
            out[y, x] = post.T
    for x in range(N):
        out[x, x][np.arange(lens[x]), np.arange(lens[x])] = 1.0
    return out

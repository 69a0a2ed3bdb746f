"""Dual-decomposition solver for one progressive-merge step.

Reimplements DAFS::solve_by_dd (src/dafs.cpp:1006-1295) TPU-first: the whole
subgradient loop runs on device as a `jax.lax.while_loop` whose body fuses
two Nussinov decodes, one banded NW decode, violation counting over the
consensus-base-pair candidate list (as gather/scatter-adds over a padded
index array), and the sparse multiplier updates (as masked dense updates —
the reference's SPARSE_UPDATE branch touches exactly the cells our masks
select, so the dense form is semantically identical).

Host-side preparation per merge: candidate enumeration (vectorized numpy
mirror of the 4-nested loop at src/dafs.cpp:1022-1044), the alignment
envelope, and bucket-padding for compile reuse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dafs_tpu.typedefs import CUTOFF
from dafs_tpu.ops import nussinov, nw
from dafs_tpu.utils.log import logger

from dafs_tpu.utils import aot


def _round_up(n, m):
    return -(-n // m) * m


def enumerate_cbp(p_x, p_y, p_z, n1, n2, w, min_th_s, th_a, for_ip=False):
    """Consensus base-pair candidates (src/dafs.cpp:1022-1044).

    Returns (U, 4) int64 array of (i, j, k, l) rows.
    p weighting: DD mode uses (N1*p_x + N2*p_y)/(N1+N2); IP mode plain mean
    (src/dafs.cpp:1032 vs :1336).
    """
    f = np.float32
    xi, xj = np.nonzero(p_x > CUTOFF)
    keep_x = xj > xi
    xi, xj = xi[keep_x], xj[keep_x]
    yk, yl = np.nonzero(p_y > CUTOFF)
    keep_y = yl > yk
    yk, yl = yk[keep_y], yl[keep_y]
    if xi.size == 0 or yk.size == 0:
        return np.zeros((0, 4), dtype=np.int64)

    # cross product (i,j) x (k,l), filtered by the z-conditions
    zi = p_z[xi[:, None], yk[None, :]] > CUTOFF  # p_z[i][k]
    zj = p_z[xj[:, None], yl[None, :]] > CUTOFF  # p_z[j][l]
    mask = zi & zj
    if for_ip:
        p = (p_x[xi[:, None], xj[:, None]] + p_y[yk[None, :], yl[None, :]]) / f(2.0)
    else:
        p = (
            f(n1) * p_x[xi[:, None], xj[:, None]]
            + f(n2) * p_y[yk[None, :], yl[None, :]]
        ) / f(n1 + n2)
    q = (p_z[xi[:, None], yk[None, :]] + p_z[xj[:, None], yl[None, :]]) / f(2.0)
    mask &= (p - f(min_th_s) > 0.0) & (
        f(w) * (p - f(min_th_s)) + (q - f(th_a)) > 0.0
    )
    a, b = np.nonzero(mask)
    # order like the reference loop nest (i asc, j asc, k asc, l asc):
    # rows of the cross product are (i,j) pairs in lexicographic order
    # already; columns (k,l) likewise, and np.nonzero is row-major. ✓
    return np.stack([xi[a], xj[a], yk[b], yl[b]], axis=1).astype(np.int64)


def _dd_core(
    p_x, p_y, p_z, q_x0, q_y0, q_z0,
    in_cx, in_cy, in_cz,
    cbp, cbp_valid,
    env_first, env_last,
    l1, l2, w_x, w_y, th_s0, th_a, eta0, n_cbp4,
    *, L1, L2, U, t_max, update_rule="subgradient", progress_every=0,
):
    ci, cj, ck, cl = cbp[:, 0], cbp[:, 1], cbp[:, 2], cbp[:, 3]
    ii1 = jnp.arange(L1)
    ii2 = jnp.arange(L2)

    # One-hot selector matrices over the candidate list, built ONCE outside
    # the while_loop.  Inside the loop, every gather q[ci, cj] becomes
    # (Pci @ q * Pcj).sum(1) (exactly one nonzero per row -> bitwise equal to
    # the gather) and every scatter-add count becomes an MXU matmul; TPU
    # lowers gather/scatter over U ~ 10^3 indices to serialized loops, which
    # dominated the DD iteration before this change.
    f32 = jnp.float32
    Pci = (ci[:, None] == ii1[None, :]).astype(f32)   # (U, L1)
    Pcj = (cj[:, None] == ii1[None, :]).astype(f32)
    Pck = (ck[:, None] == ii2[None, :]).astype(f32)
    Pcl = (cl[:, None] == ii2[None, :]).astype(f32)
    prec = jax.lax.Precision.HIGHEST

    def _pick(P_r, q, P_c):
        return jnp.sum(
            jnp.dot(P_r, q, precision=prec) * P_c, axis=1
        )

    # the two structure decodes dominate the iteration (~2 ms each of the
    # ~4.3 ms L=320 body); when the padded sizes agree they run as ONE
    # vmapped Pallas dispatch (grid batching amortizes per-launch cost:
    # measured 2x1.26 ms vs 2x2.05 ms at L=320).  vmap executes the
    # identical per-problem computation, so results are bitwise-unchanged.
    stack_xy = L1 == L2 and jax.default_backend() == "tpu"

    def body(state):
        (q_x, q_y, q_z, eta, c, s_prev, _, t, _, _, _, done, opt) = state

        sm_x = w_x * (p_x - th_s0) - q_x
        sm_y = w_y * (p_y - th_s0) - q_y
        if stack_xy:
            s_xy, xy = jax.vmap(
                lambda m, ln: nussinov.decode_traced(m, ln, L=L1)
            )(jnp.stack([sm_x, sm_y]), jnp.stack([l1, l2]))
            s_x, s_y = s_xy[0], s_xy[1]
            x, y = xy[0], xy[1]
        else:
            s_x, x = nussinov.decode_traced(sm_x, l1, L=L1)
            s_y, y = nussinov.decode_traced(sm_y, l2, L=L2)
        sm_z = p_z - th_a + q_z
        s_z, z = nw.decode_traced(sm_z, env_first, env_last, l1, l2, L1=L1, L2=L2)
        s = s_x + s_y + s_z

        # violation counts over consensus candidates (src/dafs.cpp:1103-1117)
        s_w = (
            _pick(Pci, q_x, Pcj) + _pick(Pck, q_y, Pcl)
            - _pick(Pci, q_z, Pck) - _pick(Pcj, q_z, Pcl)
        )
        active = (s_w > 0.0) & cbp_valid
        s = s + jnp.sum(jnp.where(active, s_w, 0.0))
        af = active.astype(f32)
        # counts as one-hot matmuls: exact small-integer sums in f32
        t_x = jnp.dot(Pci.T * af[None, :], Pcj, precision=prec).astype(jnp.int32)
        t_y = jnp.dot(Pck.T * af[None, :], Pcl, precision=prec).astype(jnp.int32)
        t_z = (
            jnp.dot(Pci.T * af[None, :], Pck, precision=prec)
            + jnp.dot(Pcj.T * af[None, :], Pcl, precision=prec)
        ).astype(jnp.int32)

        # multiplier updates (sparse branch src/dafs.cpp:1120-1254, dense form)
        X = ((x[:, None] == ii1[None, :]) & (x >= 0)[:, None]).astype(jnp.int32)
        Y = ((y[:, None] == ii2[None, :]) & (y >= 0)[:, None]).astype(jnp.int32)
        Z = ((z[:, None] == ii2[None, :]) & (z >= 0)[:, None]).astype(jnp.int32)

        dx = (t_x - X).astype(jnp.float32)
        mx = (X > 0) | in_cx
        upd_x = mx & (dx != 0.0)

        dy = (t_y - Y).astype(jnp.float32)
        my = (Y > 0) | in_cy
        upd_y = my & (dy != 0.0)

        dz = (Z - t_z).astype(jnp.float32)
        mz = (Z > 0) | in_cz
        upd_z = mz & (dz != 0.0)

        # per-entry step size (src/dafs.cpp:984-1004: adagrad_update /
        # adam_update, applied only at violated entries)
        if update_rule == "adagrad":
            eps = jnp.float32(1e-6)
            g2_x, g2_y, g2_z = opt[0], opt[1], opt[2]
            g2_x = jnp.where(upd_x, g2_x + dx * dx, g2_x)
            g2_y = jnp.where(upd_y, g2_y + dy * dy, g2_y)
            g2_z = jnp.where(upd_z, g2_z + dz * dz, g2_z)
            step_x = eta0 * dx / jnp.sqrt(g2_x + eps)
            step_y = eta0 * dy / jnp.sqrt(g2_y + eps)
            step_z = eta0 * dz / jnp.sqrt(g2_z + eps)
            opt = (g2_x, g2_y, g2_z, opt[3], opt[4], opt[5])
        elif update_rule == "adam":
            b1, b2 = jnp.float32(0.9), jnp.float32(0.999)
            eps = jnp.float32(1e-8)
            tf = (t + 1).astype(jnp.float32)
            bc1 = 1.0 - b1 ** tf
            bc2 = 1.0 - b2 ** tf

            def adam(m, v, d, upd):
                m = jnp.where(upd, b1 * m + (1.0 - b1) * d, m)
                v = jnp.where(upd, b2 * v + (1.0 - b2) * d * d, v)
                return m, v, eta0 * (m / bc1) / (jnp.sqrt(v / bc2) + eps)

            m_x, v_x, step_x = adam(opt[0], opt[3], dx, upd_x)
            m_y, v_y, step_y = adam(opt[1], opt[4], dy, upd_y)
            m_z, v_z, step_z = adam(opt[2], opt[5], dz, upd_z)
            opt = (m_x, m_y, m_z, v_x, v_y, v_z)
        else:
            step_x, step_y, step_z = eta * dx, eta * dy, eta * dz

        q_x = jnp.where(upd_x, q_x - step_x, q_x)
        q_y = jnp.where(upd_y, q_y - step_y, q_y)
        q_z = jnp.where(mz, jnp.maximum(0.0, q_z - jnp.where(upd_z, step_z, 0.0)), q_z)
        viol_z = ((Z > 0) & (t_z > 1)) | ((Z == 0) & in_cz & (t_z > 0))

        violated = (
            jnp.sum(upd_x.astype(jnp.int32))
            + jnp.sum(upd_y.astype(jnp.int32))
            + jnp.sum(viol_z.astype(jnp.int32))
        )

        done = violated == 0
        if progress_every:
            # per-N-iterations observability on the device while_loop,
            # mirroring the reference's per-iteration debug line
            # (src/dafs.cpp:1273-1276).  Host callback; enabled only via
            # DAFS_TPU_DD_PROGRESS (the default path stays callback-free).
            def _report(tt, ss, vv, ee):
                logger.info(
                    "DD step %d: bound=%.4f violated=%d eta=%.4f",
                    int(tt), float(ss), int(vv), float(ee),
                )

            jax.lax.cond(
                (t % progress_every) == 0,
                lambda: jax.debug.callback(_report, t, s, violated, eta),
                lambda: None,
            )
        # step width (src/dafs.cpp:1283-1288, subgradient only); on break the
        # reference skips the eta update AND keeps the previous s_prev
        if update_rule == "subgradient":
            improve = (s > s_prev) | (t == 0)
            c_new = c + jnp.maximum(0.0, n_cbp4 - violated.astype(jnp.float32)) / n_cbp4
            c = jnp.where(improve & ~done, c_new, c)
            eta = jnp.where(improve & ~done, eta0 / (1.0 + c), eta)
        s_out = jnp.where(done, s_prev, s)

        return (q_x, q_y, q_z, eta, c, s_out, violated, t + 1, x, y, z, done, opt)

    def cond(state):
        done = state[11]
        t = state[7]
        return (t < t_max) & (~done)

    zx = jnp.zeros((L1, L1), jnp.float32)
    zy = jnp.zeros((L2, L2), jnp.float32)
    zz = jnp.zeros((L1, L2), jnp.float32)
    init = (
        q_x0, q_y0, q_z0,
        jnp.float32(eta0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.int32(-1), jnp.int32(0),
        jnp.full((L1,), -1, jnp.int32), jnp.full((L2,), -1, jnp.int32),
        jnp.full((L1,), -1, jnp.int32),
        jnp.asarray(False),
        (zx, zy, zz, zx, zy, zz),
    )
    out = jax.lax.while_loop(cond, body, init)
    (q_x, q_y, q_z, eta, c, s_prev, violated, t, x, y, z, done, _) = out
    return s_prev, t, violated, x, y, z


@aot.persistent_jit(
    static_argnames=("L1", "L2", "U", "t_max", "update_rule", "progress_every")
)
def _dd_device(*args, L1, L2, U, t_max, update_rule="subgradient",
               progress_every=0):
    return _dd_core(*args, L1=L1, L2=L2, U=U, t_max=t_max,
                    update_rule=update_rule, progress_every=progress_every)


@aot.persistent_jit(static_argnames=("L1", "L2", "U", "t_max", "update_rule"))
def _dd_device_batch(*args, L1, L2, U, t_max, update_rule="subgradient"):
    """vmap of the DD while_loop over a batch of independent merges.

    Used by the layered progressive scheduler (pipeline._align): all merges
    whose children are complete solve in ONE dispatch; JAX's while_loop
    batching keeps per-merge early exit semantics (finished elements are
    frozen via select), so each merge computes exactly what the unbatched
    path computes."""
    fn = functools.partial(
        _dd_core, L1=L1, L2=L2, U=U, t_max=t_max, update_rule=update_rule
    )
    return jax.vmap(fn)(*args)


@jax.jit
def _pack_dd_out(s, t, violated, x, y, z):
    """Pack a DD solve's six outputs into one device array so the host pays
    ONE readback round trip (~26 ms on the async relay) instead of six.
    The int32 results are all small (|v| <= t_max or the padded length), so
    float32 conversion is exact; bitcasting was rejected because eager TPU
    data movement flushes denormal bit patterns of small ints to zero."""
    fc = lambda a: a.astype(jnp.float32)  # noqa: E731
    if s.ndim == 0:
        return jnp.concatenate(
            [s[None], fc(t)[None], fc(violated)[None], fc(x), fc(y), fc(z)]
        )
    return jnp.concatenate(
        [s[:, None], fc(t)[:, None], fc(violated)[:, None], fc(x), fc(y), fc(z)],
        axis=1,
    )


def _unpack_dd_out(buf, P1, P2):
    """Host-side inverse of _pack_dd_out (per row / 1-D)."""
    iv = lambda a: a.astype(np.int32)  # noqa: E731
    s = buf[..., 0]
    t = iv(buf[..., 1])
    violated = iv(buf[..., 2])
    x = iv(buf[..., 3 : 3 + P1])
    y = iv(buf[..., 3 + P1 : 3 + P1 + P2])
    z = iv(buf[..., 3 + P1 + P2 : 3 + P1 + P2 + P1])
    return s, t, violated, x, y, z


def _prep_dd_problem(p_x, p_y, p_z, n1, n2, *, w, th_s, th_a, P1, P2, U):
    """Pad one merge's inputs to (P1, P2, U); returns the _dd_core arg tuple
    (minus the scalars shared across a batch)."""
    f = np.float32
    L1, L2 = p_z.shape
    min_th_s = min(th_s)
    cbp = enumerate_cbp(p_x, p_y, p_z, n1, n2, w, min_th_s, th_a)
    env = nw.envelope(p_z, th_a)

    pxp = np.zeros((P1, P1), np.float32)
    pxp[:L1, :L1] = p_x
    pyp = np.zeros((P2, P2), np.float32)
    pyp[:L2, :L2] = p_y
    pzp = np.zeros((P1, P2), np.float32)
    pzp[:L1, :L2] = p_z

    cbp_pad = np.zeros((U, 4), np.int64)
    cbp_pad[: len(cbp)] = cbp
    cbp_valid = np.zeros(U, bool)
    cbp_valid[: len(cbp)] = True

    in_cx = np.zeros((P1, P1), bool)
    in_cy = np.zeros((P2, P2), bool)
    in_cz = np.zeros((P1, P2), bool)
    if len(cbp):
        in_cx[cbp[:, 0], cbp[:, 1]] = True
        in_cy[cbp[:, 2], cbp[:, 3]] = True
        in_cz[cbp[:, 0], cbp[:, 2]] = True
        in_cz[cbp[:, 1], cbp[:, 3]] = True

    envf = np.zeros(P1 + 1, np.int32)
    envl = np.zeros(P1 + 1, np.int32)
    envf[: L1 + 1] = env[:, 0]
    envl[: L1 + 1] = env[:, 1]
    envl[L1 + 1:] = L2

    w_x = f(f(w) * 2 * n1 / (n1 + n2))
    w_y = f(f(w) * 2 * n2 / (n1 + n2))
    return (
        pxp, pyp, pzp, in_cx, in_cy, in_cz, cbp_pad, cbp_valid, envf, envl,
        np.int32(L1), np.int32(L2), w_x, w_y, f(4.0 * max(len(cbp), 1)),
        len(cbp),
    )


def solve_by_dd_batch(problems, *, w, th_s, th_a, eta0, t_max,
                      update_rule="subgradient"):
    """Solve a batch of independent merges in one vmapped device dispatch.

    problems: list of (p_x, p_y, p_z, n1, n2).  All are padded to the batch's
    common (P1, P2, U) buckets.  Returns a list of (s, x, y, z) matching
    solve_by_dd's outputs for each problem.
    """
    if len(problems) == 1:
        p_x, p_y, p_z, n1, n2 = problems[0]
        return [solve_by_dd(p_x, p_y, p_z, n1, n2, w=w, th_s=th_s, th_a=th_a,
                            eta0=eta0, t_max=t_max, update_rule=update_rule)]
    f = np.float32
    P1 = max(_round_up(p[2].shape[0], 32) for p in problems)
    P2 = max(_round_up(p[2].shape[1], 32) for p in problems)
    preps = []
    u_max = 1
    for (p_x, p_y, p_z, n1, n2) in problems:
        min_th_s = min(th_s)
        cbp = enumerate_cbp(p_x, p_y, p_z, n1, n2, w, min_th_s, th_a)
        u_max = max(u_max, len(cbp))
    U = max(_round_up(u_max, 256), 256)
    for (p_x, p_y, p_z, n1, n2) in problems:
        preps.append(_prep_dd_problem(
            p_x, p_y, p_z, n1, n2, w=w, th_s=th_s, th_a=th_a, P1=P1, P2=P2, U=U
        ))
    # bucket the batch axis to the next power of two (pad with copies of the
    # first problem, results discarded) so a deep guide tree reuses a handful
    # of compiled batch shapes instead of one per distinct layer width
    B = len(problems)
    Bp = 1 << (B - 1).bit_length()
    preps += [preps[0]] * (Bp - B)
    logger.debug("DD batch: B=%d (pad %d) P1=%d P2=%d U=%d", B, Bp, P1, P2, U)
    stk = lambda k: jnp.asarray(np.stack([pr[k] for pr in preps]))  # noqa: E731
    zeros = lambda shape: jnp.zeros((Bp,) + shape, jnp.float32)  # noqa: E731
    out_dev = _dd_device_batch(
        stk(0), stk(1), stk(2),
        zeros((P1, P1)), zeros((P2, P2)), zeros((P1, P2)),
        stk(3), stk(4), stk(5), stk(6), stk(7), stk(8), stk(9),
        stk(10), stk(11), stk(12), stk(13),
        jnp.full((Bp,), f(th_s[0])), jnp.full((Bp,), f(th_a)),
        jnp.full((Bp,), f(eta0)), stk(14),
        L1=P1, L2=P2, U=U, t_max=t_max, update_rule=update_rule,
    )
    s, t, violated, x, y, z = _unpack_dd_out(
        np.asarray(_pack_dd_out(*out_dev)), P1, P2
    )
    out = []
    for b, (p_x, p_y, p_z, n1, n2) in enumerate(problems):
        L1, L2 = p_z.shape
        logger.info("Step: %d, Violated: %d", int(t[b]), int(violated[b]))
        out.append((
            float(s[b]),
            x[b, :L1].astype(np.int64),
            y[b, :L2].astype(np.int64),
            z[b, :L1].astype(np.int64),
        ))
    return out


def solve_by_dd(p_x, p_y, p_z, n1, n2, *, w, th_s, th_a, eta0, t_max,
                update_rule="subgradient"):
    """Solve one merge's joint align+fold problem by dual decomposition.

    Args:
      p_x: (L1, L1) averaged base-pair probs of group 1 (dense, cut off).
      p_y: (L2, L2) for group 2.
      p_z: (L1, L2) averaged match probs.
      n1, n2: group sizes.
      th_s: list of fold thresholds (th_s_[0] drives the Nussinov decode;
        min(th_s) gates candidates).
    Returns:
      (s, x, y, z) with int64 vectors (-1 = unpaired/unaligned), mirroring
      solve_by_dd's outputs.
    """
    L1, L2 = p_z.shape
    min_th_s = min(th_s)
    cbp = enumerate_cbp(p_x, p_y, p_z, n1, n2, w, min_th_s, th_a)
    env = nw.envelope(p_z, th_a)
    logger.debug("DD: L1=%d L2=%d |cbp|=%d", L1, L2, len(cbp))

    P1, P2 = _round_up(L1, 32), _round_up(L2, 32)
    U = max(_round_up(max(len(cbp), 1), 256), 256)

    pxp = np.zeros((P1, P1), np.float32)
    pxp[:L1, :L1] = p_x
    pyp = np.zeros((P2, P2), np.float32)
    pyp[:L2, :L2] = p_y
    pzp = np.zeros((P1, P2), np.float32)
    pzp[:L1, :L2] = p_z

    cbp_pad = np.zeros((U, 4), np.int64)
    cbp_pad[: len(cbp)] = cbp
    cbp_valid = np.zeros(U, bool)
    cbp_valid[: len(cbp)] = True

    in_cx = np.zeros((P1, P1), bool)
    in_cy = np.zeros((P2, P2), bool)
    in_cz = np.zeros((P1, P2), bool)
    if len(cbp):
        in_cx[cbp[:, 0], cbp[:, 1]] = True
        in_cy[cbp[:, 2], cbp[:, 3]] = True
        in_cz[cbp[:, 0], cbp[:, 2]] = True
        in_cz[cbp[:, 1], cbp[:, 3]] = True

    envf = np.zeros(P1 + 1, np.int32)
    envl = np.zeros(P1 + 1, np.int32)
    envf[: L1 + 1] = env[:, 0]
    envl[: L1 + 1] = env[:, 1]
    envl[L1 + 1 :] = L2

    f = np.float32
    w_x = f(f(w) * 2 * n1 / (n1 + n2))
    w_y = f(f(w) * 2 * n2 / (n1 + n2))

    import os as _os

    prog = int(_os.environ.get("DAFS_TPU_DD_PROGRESS", "0") or 0)
    # host callbacks don't serialize into the persistent AOT export; use the
    # plain jitted path when progress reporting is on (a debug mode)
    dd_fn = _dd_device._jitted if prog else _dd_device

    out_dev = dd_fn(
        jnp.asarray(pxp), jnp.asarray(pyp), jnp.asarray(pzp),
        jnp.zeros((P1, P1), jnp.float32), jnp.zeros((P2, P2), jnp.float32),
        jnp.zeros((P1, P2), jnp.float32),
        jnp.asarray(in_cx), jnp.asarray(in_cy), jnp.asarray(in_cz),
        jnp.asarray(cbp_pad), jnp.asarray(cbp_valid),
        jnp.asarray(envf), jnp.asarray(envl),
        jnp.int32(L1), jnp.int32(L2),
        w_x, w_y, f(th_s[0]), f(th_a), f(eta0),
        f(4.0 * max(len(cbp), 1)),
        L1=P1, L2=P2, U=U, t_max=t_max, update_rule=update_rule,
        progress_every=prog,
    )
    s, t, violated, x, y, z = _unpack_dd_out(
        np.asarray(_pack_dd_out(*out_dev)), P1, P2
    )
    logger.info("Step: %d, Violated: %d", int(t), int(violated))
    x = x[:L1].astype(np.int64)
    y = y[:L2].astype(np.int64)
    z = z[:L1].astype(np.int64)
    return float(s), x, y, z


def solve_by_dd_ipknot(p_x, p_y, p_z, n1, n2, *, w, th_s, th_a, eta0, t_max,
                       structure_decoder="ipknot", verbose_cb=None,
                       trace_cb=None):
    """Host-loop DD merge solve with a pluggable structure decoder.

    structure_decoder="ipknot": the reference's --ipknot mode uses the
    IPknot ILP *inside* the DD loop (s_decoder_, src/dafs.cpp:1754,
    1091-1092); ILPs run on host, the NW decode stays on device.
    structure_decoder="nussinov": native C++ SparseNussinov decodes — used
    for the -v 2 verbose mode, where verbose_cb(x, y, z) is invoked each
    iteration (output_verbose, src/dafs.cpp:875-894).
    """
    import jax.numpy as jnp

    from dafs_tpu.decoders_ip import ipknot
    from dafs_tpu.ops import nussinov as _  # noqa: F401 (parity of imports)

    f = np.float32
    L1, L2 = p_z.shape
    min_th_s = min(th_s)
    cbp = enumerate_cbp(p_x, p_y, p_z, n1, n2, w, min_th_s, th_a)
    env = nw.envelope(p_z, th_a)
    in_cx = np.zeros((L1, L1), bool)
    in_cy = np.zeros((L2, L2), bool)
    in_cz = np.zeros((L1, L2), bool)
    if len(cbp):
        in_cx[cbp[:, 0], cbp[:, 1]] = True
        in_cy[cbp[:, 2], cbp[:, 3]] = True
        in_cz[cbp[:, 0], cbp[:, 2]] = True
        in_cz[cbp[:, 1], cbp[:, 3]] = True

    q_x = np.zeros((L1, L1), np.float32)
    q_y = np.zeros((L2, L2), np.float32)
    q_z = np.zeros((L1, L2), np.float32)
    w_x = f(f(w) * 2 * n1 / (n1 + n2))
    w_y = f(f(w) * 2 * n2 / (n1 + n2))
    if structure_decoder == "ipknot":
        # persistent HiGHS models: variable/constraint skeleton built once,
        # per-iteration solves only update costs/bounds and warm-start from
        # the previous incumbent (the ILPs across DD iterations differ only
        # in the multiplier matrices).  If no direct HiGHS binding is
        # importable (ipknot._highs_core), degrade to the slower but
        # public-API per-iteration decode path.
        try:
            ipk_x = ipknot.IPknotModel(p_x, th_s, w_x, extra=in_cx)
            ipk_y = ipknot.IPknotModel(p_y, th_s, w_y, extra=in_cy)
        except ImportError:
            logger.warning(
                "no HiGHS binding for persistent IPknot models; "
                "falling back to per-iteration ILP decodes"
            )

            class _DecodeShim:
                def __init__(self, p, wv):
                    self.p, self.wv = p, wv

                def solve(self, q):
                    return ipknot.decode(self.p, th_s, w=self.wv, q=q)

            ipk_x = _DecodeShim(p_x, w_x)
            ipk_y = _DecodeShim(p_y, w_y)
    eta = f(eta0)
    c = f(0.0)
    s_prev = f(0.0)
    x = np.full(L1, -1, np.int64)
    y = np.full(L2, -1, np.int64)
    z = np.full(L1, -1, np.int64)
    violated = 0
    from dafs_tpu import native

    for t in range(t_max):
        if structure_decoder == "ipknot":
            x, _str1, s1 = ipk_x.solve(q_x)
            y, _str2, s2 = ipk_y.solve(q_y)
        else:
            sm_x = np.float32(w_x * (p_x - f(th_s[0])) - q_x)
            s1, x = native.sparse_nussinov(sm_x)
            sm_y = np.float32(w_y * (p_y - f(th_s[0])) - q_y)
            s2, y = native.sparse_nussinov(sm_y)
        # native banded NW (bit-exact mirror of the device decode, and the
        # whole loop stays on host — no per-iteration device dispatch)
        sm_z = np.float32(p_z - f(th_a) + q_z)
        s3, z = native.sparse_nw(sm_z, env)
        z = z.astype(np.int64)
        if verbose_cb is not None:
            verbose_cb(x, y, z)
        s = f(f(s1) + f(s2) + float(s3))

        t_x = np.zeros((L1, L1), np.int64)
        t_y = np.zeros((L2, L2), np.int64)
        t_z = np.zeros((L1, L2), np.int64)
        if len(cbp):
            s_w = np.float32(
                q_x[cbp[:, 0], cbp[:, 1]] + q_y[cbp[:, 2], cbp[:, 3]]
                - q_z[cbp[:, 0], cbp[:, 2]] - q_z[cbp[:, 1], cbp[:, 3]]
            )
            act = s_w > 0.0
            s = f(s + np.sum(s_w[act], dtype=np.float32))
            np.add.at(t_x, (cbp[act, 0], cbp[act, 1]), 1)
            np.add.at(t_y, (cbp[act, 2], cbp[act, 3]), 1)
            np.add.at(t_z, (cbp[act, 0], cbp[act, 2]), 1)
            np.add.at(t_z, (cbp[act, 1], cbp[act, 3]), 1)

        X = np.zeros((L1, L1), np.int64)
        X[np.arange(L1)[x >= 0], x[x >= 0]] = 1
        Y = np.zeros((L2, L2), np.int64)
        Y[np.arange(L2)[y >= 0], y[y >= 0]] = 1
        Z = np.zeros((L1, L2), np.int64)
        Z[np.arange(L1)[z >= 0], z[z >= 0]] = 1

        dx = t_x - X
        ux = ((X > 0) | in_cx) & (dx != 0)
        q_x = np.where(ux, np.float32(q_x - eta * dx.astype(np.float32)), q_x)
        dy = t_y - Y
        uy = ((Y > 0) | in_cy) & (dy != 0)
        q_y = np.where(uy, np.float32(q_y - eta * dy.astype(np.float32)), q_y)
        dz = Z - t_z
        mz = (Z > 0) | in_cz
        q_z = np.where(
            mz, np.maximum(np.float32(0.0), np.float32(q_z - eta * dz.astype(np.float32))), q_z
        )
        vz = ((Z > 0) & (t_z > 1)) | ((Z == 0) & in_cz & (t_z > 0))
        violated = int(ux.sum() + uy.sum() + vz.sum())

        if trace_cb is not None:
            # mirrors the reference's per-iteration debug line
            # (src/dafs.cpp:1273-1276): step t, eta, Lagrangian bound s,
            # violation count
            trace_cb(t, float(s), violated, float(eta))
        if violated == 0:
            break
        if s > s_prev or t == 0:
            denom = 4.0 * max(len(cbp), 1)
            c = f(c + max(0.0, f(4.0 * len(cbp)) - violated) / denom)
            eta = f(eta0 / (1.0 + c))
        s_prev = s

    logger.info("Step: %s, Violated: %d", "ipknot-dd", violated)
    return float(s_prev), x, y, z


def solve_by_ip(p_x, p_y, p_z, n1, n2, *, w, th_s, th_a, eta0=None, t_max=None,
                fix_z=None):
    """Exact joint ILP (DAFS::solve_by_ip, src/dafs.cpp:1297-1497), reached
    with -m 0.  Variables x_ij, y_kl, z_ik, w_ijkl; constraints: at most one
    partner per base, no pseudoknots, no crossing matches, consensus coupling.
    Solved with scipy's HiGHS milp.

    fix_z: optional set of (i, k) cells; when given, every z variable is
    pinned (1 if in the set, 0 otherwise) — diagnostic seam for scoring a
    known matching (tools/merge_diagnose.py)."""
    from scipy import sparse as sp
    from scipy.optimize import LinearConstraint, milp

    f = np.float32
    L1, L2 = p_z.shape
    min_th_s = f(min(th_s))

    zi, zk = np.nonzero(p_z > CUTOFF)
    v_z = {(i, k): t for t, (i, k) in enumerate(zip(zi, zk))}
    obj = [float(f(p_z[i, k] - f(th_a))) for (i, k) in v_z]

    cbp = enumerate_cbp(p_x, p_y, p_z, n1, n2, w, float(min_th_s), th_a, for_ip=True)
    v_x: dict = {}
    v_y: dict = {}
    v_w = []
    nv = len(v_z)
    for (i, j, k, l) in cbp:
        v_w.append((nv, (i, j, k, l)))
        obj.append(0.0)
        nv += 1
        if (i, j) not in v_x:
            v_x[(i, j)] = nv
            obj.append(float(f(f(w) * (p_x[i, j] - min_th_s))))
            nv += 1
        if (k, l) not in v_y:
            v_y[(k, l)] = nv
            obj.append(float(f(f(w) * (p_y[k, l] - min_th_s))))
            nv += 1

    rows, lbs, ubs = [], [], []

    def add(coeffs, lo, hi):
        rows.append(coeffs)
        lbs.append(lo)
        ubs.append(hi)

    # each base pairs at most once (x)
    for i in range(L1):
        cs = [(v, 1.0) for (a, b), v in v_x.items() if a == i or b == i]
        if cs:
            add(cs, -np.inf, 1.0)
    # no pseudoknots in x
    xk = sorted(v_x)
    for ai in range(len(xk)):
        i, j = xk[ai]
        for bi in range(len(xk)):
            k, l = xk[bi]
            if i < k < j < l:
                add([(v_x[(i, j)], 1.0), (v_x[(k, l)], 1.0)], -np.inf, 1.0)
    # same for y
    for k in range(L2):
        cs = [(v, 1.0) for (a, b), v in v_y.items() if a == k or b == k]
        if cs:
            add(cs, -np.inf, 1.0)
    yk2 = sorted(v_y)
    for ai in range(len(yk2)):
        i, j = yk2[ai]
        for bi in range(len(yk2)):
            k, l = yk2[bi]
            if i < k < j < l:
                add([(v_y[(i, j)], 1.0), (v_y[(k, l)], 1.0)], -np.inf, 1.0)
    # each base aligns at most once
    for i in range(L1):
        cs = [(v, 1.0) for (a, b), v in v_z.items() if a == i]
        if cs:
            add(cs, -np.inf, 1.0)
    for k in range(L2):
        cs = [(v, 1.0) for (a, b), v in v_z.items() if b == k]
        if cs:
            add(cs, -np.inf, 1.0)
    # no crossing matches
    zk2 = sorted(v_z)
    for (i, k) in zk2:
        for (j, l) in zk2:
            if j > i and l < k:
                add([(v_z[(i, k)], 1.0), (v_z[(j, l)], 1.0)], -np.inf, 1.0)
    # consensus coupling: x_ij = sum w over cbp with that (i,j); same for y;
    # z_ik >= sum w touching it
    from collections import defaultdict

    by_x = defaultdict(list)
    by_y = defaultdict(list)
    by_z = defaultdict(list)
    for (vw, (i, j, k, l)) in v_w:
        by_x[(i, j)].append(vw)
        by_y[(k, l)].append(vw)
        by_z[(i, k)].append(vw)
        by_z[(j, l)].append(vw)
    for (ij, ws) in by_x.items():
        add([(v_x[ij], 1.0)] + [(vw, -1.0) for vw in ws], 0.0, 0.0)
    for (kl, ws) in by_y.items():
        add([(v_y[kl], 1.0)] + [(vw, -1.0) for vw in ws], 0.0, 0.0)
    for (ik, ws) in by_z.items():
        if ik in v_z:
            add([(v_z[ik], 1.0)] + [(vw, -1.0) for vw in ws], 0.0, np.inf)
    # x/y pairs not touched by any cbp are fixed 0 by the reference's FX rows
    for ij, v in v_x.items():
        if ij not in by_x:
            add([(v, 1.0)], 0.0, 0.0)
    for kl, v in v_y.items():
        if kl not in by_y:
            add([(v, 1.0)], 0.0, 0.0)

    if fix_z is not None:
        for ik, v in v_z.items():
            val = 1.0 if ik in fix_z else 0.0
            add([(v, 1.0)], val, val)

    if nv == 0:
        return (
            0.0,
            np.full(L1, -1, np.int64),
            np.full(L2, -1, np.int64),
            np.full(L1, -1, np.int64),
        )

    data, ri, ci = [], [], []
    for r, coeffs in enumerate(rows):
        for v, c in coeffs:
            ri.append(r)
            ci.append(v)
            data.append(c)
    A = sp.csr_matrix((data, (ri, ci)), shape=(len(rows), nv))
    res = milp(
        c=-np.array(obj),
        constraints=LinearConstraint(A, np.array(lbs), np.array(ubs)),
        integrality=np.ones(nv),
        bounds=(0, 1),
    )
    sol = res.x > 0.5 if res.x is not None else np.zeros(nv, bool)

    x = np.full(L1, -1, np.int64)
    for (i, j), v in v_x.items():
        if sol[v]:
            x[i] = j
    y = np.full(L2, -1, np.int64)
    for (k, l), v in v_y.items():
        if sol[v]:
            y[k] = l
    z = np.full(L1, -1, np.int64)
    for (i, k), v in v_z.items():
        if sol[v]:
            z[i] = k
    s = float(np.dot(np.array(obj), sol.astype(np.float64)))
    return s, x, y, z

"""End-to-end DAFS pipeline: the TPU-native mirror of class DAFS
(src/dafs.cpp:71-153, run at :1781-1889).

Host Python orchestrates (guide tree, projections, output); all heavy
numerics (posterior models, PCT matmuls, similarity DP, the DD subgradient
loop, final structure decode) run on device.
"""

from __future__ import annotations

import dataclasses
import functools
import io
import os

import numpy as np

from dafs_tpu import consistency, dd, guide_tree, projection
from dafs_tpu.fasta import Fasta
from dafs_tpu.typedefs import CUTOFF, AlnRow, gapped_seq
from dafs_tpu.utils.crand import GlibcRand
from dafs_tpu.utils.log import logger

F = np.float32


@dataclasses.dataclass
class Options:
    w: float = 4.0
    eta0: float = 0.5
    t_max: int = 600
    n_refinement: int = 0
    w_pct_a: float = 0.25
    w_pct_s: float = 0.25
    w_pct_f: float = 0.0
    th_a: float = 0.01
    th_s: tuple = (0.2,)
    th_s1: tuple | None = None  # defaults to th_s
    use_alifold: bool = True
    use_bp_update: bool = False
    use_bp_update1: bool = False
    fold_decoder: str = "Nussinov"  # or "IPknot"
    verbose: int = 0
    save_align_aux: str | None = None  # dump MP matrices (reference text format)
    save_fold_aux: str | None = None   # dump BP matrices
    dd_update: str = "subgradient"  # or "adagrad" / "adam" (src/dafs.cpp:67-69)
    dd_host: bool = False  # host-loop DD with native C++ decoders (replay anchor)


class Dafs:
    def __init__(self, align_model, fold_model, opts: Options, alifold_model=None):
        self.a_model = align_model
        self.s_model = fold_model
        self.alifold = alifold_model
        self.o = opts
        if self.o.th_s1 is None:
            self.o.th_s1 = self.o.th_s
        self._rand = GlibcRand()

    # -- decoders ---------------------------------------------------------

    def _decode_structure(self, p: np.ndarray, th_list) -> tuple[np.ndarray, str]:
        """s_decoder1_->decode(p, ss, str): final common structure."""
        if self.o.fold_decoder == "IPknot":
            from dafs_tpu.decoders_ip import ipknot

            ss, sstr, _ = ipknot.decode(p, th_list)
            return ss, sstr
        import jax.numpy as jnp

        from dafs_tpu.ops import nussinov

        L = p.shape[0]
        P = -(-L // 32) * 32
        smp = np.full((P, P), np.float32(0.0 - F(th_list[0])), np.float32)
        smp[:L, :L] = np.float32(p - F(th_list[0]))
        _, ss = nussinov.decode(jnp.asarray(smp), jnp.int32(L), L=P)
        ss = np.asarray(ss)[:L].astype(np.int64)
        s = ["."] * L
        for i in range(L):
            if ss[i] >= 0:
                s[i] = "("
                s[ss[i]] = ")"
        return ss, "".join(s)

    # -- averaging with alifold mix --------------------------------------

    def _avg_bp(self, aln, use_alifold: bool) -> np.ndarray:
        ali = None
        if use_alifold and self.alifold is not None:
            ali = self.alifold.consensus_bp(aln, self.fa)
        return projection.average_basepairing_probability(self.bp, aln, ali)

    def _update_bp(self, p, ss, sstr, aln, use_alifold) -> np.ndarray:
        """Constrained BP re-estimation (src/dafs.cpp:609-711)."""
        L = int(aln[0].mask.shape[0])
        N = len(aln)
        plevel = len(self.o.th_s)
        out = np.zeros((L, L), dtype=np.float32)
        left_brackets = "([{<ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        # collect all (sequence, constraint) re-fold tasks, then run them as
        # one batched kernel launch per length bucket
        tasks: list[tuple[int, np.ndarray, str]] = []
        for row in aln:
            s = row.seq_id
            ls = len(self.fa[s].seq)
            idx = np.nonzero(row.mask)[0]
            rev = np.full(L, -1, dtype=np.int64)
            rev[idx] = np.arange(len(idx))
            for plv in range(plevel):
                con = ["?"] * ls
                for i in range(L):
                    if ss[i] >= 0 and rev[i] >= 0 and rev[ss[i]] >= 0:
                        if sstr[i] == left_brackets[plv]:
                            con[rev[i]] = "("
                            con[rev[ss[i]]] = ")"
                        else:
                            con[rev[i]] = con[rev[ss[i]]] = "."
                tasks.append((s, idx, "".join(con)))
        bps = self.s_model.batch_bp_posteriors(
            [self.fa[s].seq for s, _, _ in tasks],
            constraints=[c for _, _, c in tasks],
        )
        for (s, idx, _), bp in zip(tasks, bps):
            out[np.ix_(idx, idx)] += np.float32(bp / F(N))
        if use_alifold and self.alifold is not None:
            for plv in range(plevel):
                con = ["?"] * L
                for i in range(L):
                    if ss[i] >= 0:
                        if sstr[i] == left_brackets[plv]:
                            con[i] = "("
                            con[ss[i]] = ")"
                        else:
                            con[i] = con[ss[i]] = "."
                ali = self.alifold.consensus_bp(aln, self.fa, "".join(con))
                out += ali
            iu = np.triu_indices(L, 1)
            out[iu] = np.float32(out[iu] / F(2.0))
        out[np.tril_indices(L, 0)] = 0.0
        out[out <= CUTOFF] = 0.0
        return out

    def _output_verbose(self, x, y, z, aln1, aln2):
        """Per-DD-iteration dump (output_verbose, src/dafs.cpp:875-894)."""
        import sys

        aln = projection.project_alignment(aln1, aln2, z)
        xx, yy = projection.project_secondary_structure(x, y, z)

        def brackets(ss):
            s = ["."] * len(ss)
            for i in range(len(ss)):
                if ss[i] >= 0:
                    s[i] = "("
                    s[ss[i]] = ")"
            return "".join(s)

        out = sys.stdout
        for row in aln[: len(aln1)]:
            out.write("> " + self.fa[row.seq_id].name + "\n")
            out.write(gapped_seq(self.fa[row.seq_id].seq, row.mask) + "\n")
        out.write(brackets(xx) + "\n")
        for row in aln[len(aln1):]:
            out.write("> " + self.fa[row.seq_id].name + "\n")
            out.write(gapped_seq(self.fa[row.seq_id].seq, row.mask) + "\n")
        out.write(brackets(yy) + "\n\n")

    # -- merge ------------------------------------------------------------

    def _merge_inputs(self, aln1, aln2):
        """Host prep of one merge: averaged p_x/p_y (with alifold mix and
        optional bp-update) and p_z (src/dafs.cpp:913-934)."""
        p_x = self._avg_bp(aln1, self.o.use_alifold)
        if self.o.use_bp_update:
            ss0, str0 = self._decode_structure(p_x, self.o.th_s)
            p_x = self._update_bp(p_x, ss0, str0, aln1, self.o.use_alifold)
        p_y = self._avg_bp(aln2, self.o.use_alifold)
        if self.o.use_bp_update:
            ss0, str0 = self._decode_structure(p_y, self.o.th_s)
            p_y = self._update_bp(p_y, ss0, str0, aln2, self.o.use_alifold)
        p_z = projection.average_matching_probability(self.mp, aln1, aln2)
        return p_x, p_y, p_z

    @staticmethod
    def _merge_finish(x, y, z, aln1, aln2):
        """Project one solved merge back to (ss, aln) (src/dafs.cpp:944-951)."""
        aln = projection.project_alignment(aln1, aln2, z)
        xx, yy = projection.project_secondary_structure(x, y, z)
        ss = np.where(xx == yy, xx, -1)
        return ss, aln

    def _align_alignments(self, aln1, aln2):
        """One progressive merge (src/dafs.cpp:913-981). Returns (s, ss, aln)."""
        import time as _time

        _t0 = _time.perf_counter()
        p_x, p_y, p_z = self._merge_inputs(aln1, aln2)
        _t1 = _time.perf_counter()

        if self.o.t_max == 0:
            # -m 0: exact joint ILP (src/dafs.cpp:110-115)
            solver = dd.solve_by_ip
        elif self.o.fold_decoder == "IPknot":
            solver = functools.partial(
                dd.solve_by_dd_ipknot,
                verbose_cb=(
                    functools.partial(self._output_verbose, aln1=aln1, aln2=aln2)
                    if self.o.verbose >= 2
                    else None
                ),
            )
        elif self.o.verbose >= 2:
            # -v 2: host loop with per-iteration dumps (src/dafs.cpp:875-894)
            solver = functools.partial(
                dd.solve_by_dd_ipknot,
                structure_decoder="nussinov",
                verbose_cb=functools.partial(
                    self._output_verbose, aln1=aln1, aln2=aln2
                ),
            )
        elif self.o.dd_host:
            # host-loop DD with native decoders: device-kernel-independent
            # (the RF00017 frozen-posterior replay anchor runs this path)
            solver = functools.partial(
                dd.solve_by_dd_ipknot, structure_decoder="nussinov"
            )
        else:
            solver = functools.partial(dd.solve_by_dd, update_rule=self.o.dd_update)
        s, x, y, z = solver(
            p_x, p_y, p_z, len(aln1), len(aln2),
            w=self.o.w, th_s=list(self.o.th_s), th_a=self.o.th_a,
            eta0=self.o.eta0, t_max=self.o.t_max,
        )
        _t2 = _time.perf_counter()
        ss, aln = self._merge_finish(x, y, z, aln1, aln2)
        logger.info(
            "merge N1=%d N2=%d L=%d: avg+alifold %.2fs, solve %.2fs, project %.2fs",
            len(aln1), len(aln2), len(aln[0].mask),
            _t1 - _t0, _t2 - _t1, _time.perf_counter() - _t2,
        )
        return s, ss, aln

    def _can_batch_merges(self) -> bool:
        """The layered batched solver only covers the plain device-DD path;
        ILP / IPknot / verbose host loops keep the recursive schedule."""
        return (
            self.o.t_max > 0
            and self.o.fold_decoder != "IPknot"
            and self.o.verbose < 2
            and not self.o.dd_host
        )

    def _align(self, node: int):
        """Progressive alignment under `node` (src/dafs.cpp:1499-1537).

        The reference recursion is strictly serial; here independent merges
        whose children are both complete are solved together in ONE vmapped
        DD dispatch per layer (wall-clock = depth of the tree, not the number
        of merges), with per-merge results identical to the serial path."""
        score, (l, r) = self.tree[node]
        if l == -1:
            return 0.0, None, [AlnRow(node, np.ones(len(self.fa[node]), dtype=bool))]
        if not self._can_batch_merges():
            _, _, aln1 = self._align(l)
            _, _, aln2 = self._align(r)
            return self._align_alignments(aln1, aln2)

        import time as _time

        # state per completed node: (s, ss, aln)
        state: dict[int, tuple] = {}
        internal = []
        stack = [node]
        while stack:
            n = stack.pop()
            _sc, (a, b) = self.tree[n]
            if a == -1:
                state[n] = (
                    0.0, None,
                    [AlnRow(n, np.ones(len(self.fa[n]), dtype=bool))],
                )
            else:
                internal.append(n)
                stack += [a, b]
        # Prefetch upcoming consensus executables in the background: each
        # distinct group size is a separate (static-NS) alifold executable
        # whose deserialize + first-dispatch costs seconds under a remote
        # runtime, and the serial layer loop would otherwise pay them one
        # by one (measured: ~22s of a 38s cold RF00005 run).  The warm
        # calls skip the pf-scale cache (alifold.consensus_bp _warm=True),
        # so production results are byte-for-byte unaffected.  Disable with
        # DAFS_TPU_PREFETCH=0.
        if (
            internal
            and os.environ.get("DAFS_TPU_PREFETCH", "1") not in ("", "0")
            and hasattr(self.alifold, "warm_shapes")
        ):
            import jax as _jax

            if _jax.default_backend() != "cpu":
                import threading as _th

                def _leafcount(n, _memo={}):
                    a, b = self.tree[n][1]
                    if a == -1:
                        return 1
                    if n not in _memo:
                        _memo[n] = _leafcount(a) + _leafcount(b)
                    return _memo[n]

                sizes = sorted(
                    {_leafcount(c) for n in internal for c in self.tree[n][1]}
                    | {len(self.fa)}
                )
                ncols = max(len(f) for f in self.fa)
                shapes = [(ns, ncols) for ns in sizes]
                # merged alignments grow by a handful of inserted gap
                # columns; when the raw max length sits within 8 of the
                # 32-column bucket boundary, the production consensus calls
                # will likely spill into the NEXT bucket — warm that too so
                # the prefetch compiles the executables actually used
                bucket = -(-ncols // 32) * 32
                if bucket - ncols < 8:
                    shapes += [(ns, bucket + 1) for ns in sizes]
                sample = max((f.seq for f in self.fa), key=len)
                _th.Thread(
                    target=self.alifold.warm_shapes,
                    args=(shapes, sample),
                    daemon=True,
                ).start()
        pending = set(internal)
        while pending:
            layer = [
                n for n in sorted(pending)
                if self.tree[n][1][0] in state and self.tree[n][1][1] in state
            ]
            _t0 = _time.perf_counter()
            alns = [
                (state[self.tree[n][1][0]][2], state[self.tree[n][1][1]][2])
                for n in layer
            ]
            # Per-merge input prep (avg_bp + alifold consensus mix + p_z) is
            # independent across the layer; overlap the host prep and device
            # dispatch latency with threads.  Alifold's pf-scale warm-start
            # cache is snapshotted once per layer (ops/alifold.py
            # sc_cache_frozen) so every thread reads the same warm-start
            # values regardless of scheduling; within a layer the results
            # then match the serial loop up to the retry ladder's f32
            # rounding, which the frozen snapshot makes deterministic.
            # DAFS_TPU_SERIAL_PREP=1 forces the serial loop ('0'/'' = off,
            # matching DAFS_TPU_NS_BUCKETS semantics).  The CPU backend
            # falls back to serial prep: alifold's _CFG_LOCK serializes the
            # dominant cost there anyway (ops/alifold.py).
            import jax as _jax

            serial_env = os.environ.get("DAFS_TPU_SERIAL_PREP", "0") not in ("", "0")
            use_threads = (
                len(alns) > 1 and not serial_env
                and _jax.default_backend() != "cpu"
            )
            if use_threads:
                from concurrent.futures import ThreadPoolExecutor

                from dafs_tpu.ops import alifold as _ali

                with _ali.sc_cache_frozen():
                    with ThreadPoolExecutor(max_workers=min(len(alns), 8)) as ex:
                        prepped = list(
                            ex.map(lambda ab: self._merge_inputs(*ab), alns)
                        )
            else:
                prepped = [self._merge_inputs(a1, a2) for a1, a2 in alns]
            probs = [
                (p_x, p_y, p_z, len(a1), len(a2))
                for (p_x, p_y, p_z), (a1, a2) in zip(prepped, alns)
            ]
            _t1 = _time.perf_counter()
            sols = dd.solve_by_dd_batch(
                probs,
                w=self.o.w, th_s=list(self.o.th_s), th_a=self.o.th_a,
                eta0=self.o.eta0, t_max=self.o.t_max,
                update_rule=self.o.dd_update,
            )
            _t2 = _time.perf_counter()
            for n, (s, x, y, z), (aln1, aln2) in zip(layer, sols, alns):
                ss, aln = self._merge_finish(x, y, z, aln1, aln2)
                state[n] = (s, ss, aln)
                pending.discard(n)
            logger.info(
                "merge layer (%d merges): avg+alifold %.2fs, solve %.2fs, "
                "project %.2fs",
                len(layer), _t1 - _t0, _t2 - _t1, _time.perf_counter() - _t2,
            )
        return state[node]

    def _refine(self, ss, aln):
        """Random bipartition refinement (src/dafs.cpp:1539-1576)."""
        while True:
            group = [[], []]
            for i in range(len(aln)):
                group[self._rand.rand() % 2].append(i)
            if group[0] and group[1]:
                break
        parts = []
        for g in group:
            rows = [aln[i] for i in g]
            masks = np.stack([r.mask for r in rows])
            keep = masks.any(axis=0)
            parts.append([AlnRow(r.seq_id, r.mask[keep]) for r in rows])
        return self._align_alignments(parts[0], parts[1])

    # -- main -------------------------------------------------------------

    def run(self, fa: list[Fasta]) -> str:
        import time as _time

        t0 = _time.perf_counter()

        def _phase(name):
            nonlocal t0
            t1 = _time.perf_counter()
            logger.info("phase %s: %.2fs", name, t1 - t0)
            t0 = t1

        self.fa = fa
        N = len(fa)
        lens = [len(f) for f in fa]
        out = io.StringIO()

        self.bp = self.s_model.all_seqs(fa)
        _phase("fold (per-seq BP posteriors)")
        self.mp = self.a_model.all_pairs(fa)
        _phase("align (all-pairs match posteriors)")

        # checkpoint seam: persist the expensive probability stage in the
        # reference's aux text formats (src/align.cpp:206-228, src/fold.cpp:230-259)
        if self.o.save_fold_aux:
            with open(self.o.save_fold_aux, "w") as fh:
                for x in range(N):
                    fh.write(f"> {x+1}\n")
                    for i in range(lens[x]):
                        js = np.nonzero(self.bp[x, i, : lens[x]])[0]
                        fh.write(str(i + 1))
                        for j in js:
                            fh.write(f" {j+1}:{self.bp[x, i, j]:.9g}")
                        fh.write("\n")
        if self.o.save_align_aux:
            with open(self.o.save_align_aux, "w") as fh:
                for x in range(N - 1):
                    for y in range(x + 1, N):
                        fh.write(f"> {x+1} {y+1}\n")
                        for i in range(lens[x]):
                            ks = np.nonzero(self.mp[x, y, i, : lens[y]])[0]
                            fh.write(str(i + 1))
                            for k in ks:
                                fh.write(f" {k+1}:{self.mp[x, y, i, k]:.9g}")
                            fh.write("\n")

        if self.o.w_pct_f != 0.0:
            self.mp = consistency.relax_fourway_consistency(
                self.mp, self.bp, lens, self.o.w_pct_f
            )

        sim = consistency.similarity_matrix(self.mp, lens)
        _phase("similarity")

        if self.o.w_pct_s != 0.0:
            self.bp = consistency.relax_basepairing_probability(
                self.bp, self.mp, sim, lens, self.o.w_pct_s
            )
        if self.o.w_pct_a != 0.0:
            self.mp = consistency.relax_matching_probability(
                self.mp, sim, lens, self.o.w_pct_a
            )

        _phase("PCT")
        self.tree = guide_tree.build_tree(sim)
        out.write(guide_tree.print_tree(self.tree, [f.name for f in fa]) + "\n")

        s, ss, aln = self._align(len(self.tree) - 1)
        _phase("progressive merges")

        for _ in range(self.o.n_refinement):
            s_new, ss_new, aln_new = self._refine(ss, aln)
            if s_new > s:
                s, ss, aln = s_new, ss_new, aln_new

        # final common structure (src/dafs.cpp:1857-1873); use_alifold1_ is
        # always true in the reference
        p = self._avg_bp(aln, use_alifold=True)
        _phase("final avg_bp (+alifold)")
        if self.o.use_bp_update1:
            ss0, str0 = self._decode_structure(p, self.o.th_s1)
            p = self._update_bp(p, ss0, str0, aln, use_alifold=True)
        ss, sstr = self._decode_structure(p, self.o.th_s1)
        _phase("final decode")

        aln_sorted = sorted(aln, key=lambda r: r.seq_id)
        out.write(">SS_cons\n")
        out.write(sstr + "\n")
        for row in aln_sorted:
            out.write("> " + fa[row.seq_id].name + "\n")
            out.write(gapped_seq(fa[row.seq_id].seq, row.mask) + "\n")
        # structured result for the Python API (dafs_tpu.align_and_fold)
        self.result = dict(
            tree=guide_tree.print_tree(self.tree, [f.name for f in fa]),
            ss_cons=sstr,
            names=[fa[r.seq_id].name for r in aln_sorted],
            rows=[gapped_seq(fa[r.seq_id].seq, r.mask) for r in aln_sorted],
            score=float(s),
        )
        return out.getvalue()

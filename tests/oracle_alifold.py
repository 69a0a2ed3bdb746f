"""Exhaustive-enumeration oracle for the consensus (alifold) partition
function, sharing dafs_tpu's reading of alipfold.c semantics: per-sequence
loop energies with gap-aware sizes, NN(7) types for gapped pairs, covariance
pscore bonus exp(psc/(kT/10*n_seq)), column-based multiloop unpaired costs
(ML_BASE * n_seq per column).
"""

from __future__ import annotations

LAST_Z = None

import numpy as np

from dafs_tpu.ops import energy_params as ep
from dafs_tpu.ops import alifold as af
from tests.oracle_mccaskill import enumerate_structures

TURN = ep.TURN


def exact_consensus_bpp(seqs: list[str], bl: bool = True):
    nseq = len(seqs)
    n = len(seqs[0])
    p = ep.params(bl)
    kT = (ep.TEMP37 + ep.K0) * ep.GASCONST
    # Vienna comparative pf params use kTn = kT * n_seq per sequence, so the
    # per-seq factor product weighs the AVERAGE energy over sequences
    # (get_scaled_alipf_parameters).
    kTn = kT * nseq

    S = np.zeros((nseq, n + 2), dtype=np.int32)
    for si, s in enumerate(seqs):
        S[si, 1 : n + 1] = ep.encode_rna(s.replace("-", "\0"))
    a2s = np.zeros((nseq, n + 2), dtype=np.int32)
    S5 = np.zeros((nseq, n + 2), dtype=np.int32)
    S3 = np.zeros((nseq, n + 2), dtype=np.int32)
    for si in range(nseq):
        cnt, last = 0, 0
        for i in range(1, n + 1):
            S5[si, i] = last
            if S[si, i] > 0:
                cnt += 1
                last = S[si, i]
            a2s[si, i] = cnt
        a2s[si, n + 1 :] = cnt
        nxt = 0
        for i in range(n, 0, -1):
            S3[si, i] = nxt
            if S[si, i] > 0:
                nxt = S[si, i]

    psc = af.make_pscores(S, n)

    def ptype7(si, a, b):
        t = int(ep.BP_PAIR[S[si, a], S[si, b]])
        return 7 if t == 0 else t

    def ungapped(si):
        return S[si][S[si] > 0]

    def hairpin_w(i, j):
        w = 1.0
        for si in range(nseq):
            if a2s[si, i] < 1:
                continue
            u = a2s[si, j - 1] - a2s[si, i]
            if u < 3:
                return 0.0
            tp = ptype7(si, i, j)
            if u <= 30:
                e = int(p["hairpin"][u])
            else:
                e = int(p["hairpin"][30]) + int(p["lxc"] * np.log(u / 30.0))
            ug = ungapped(si)
            p0 = a2s[si, i]
            done = False
            if u == 3:
                if p0 + 4 <= len(ug):
                    sub = "".join("NACGU"[b] for b in ug[p0 - 1 : p0 + 4])
                    if sub in p["triloops"]:
                        e = p["triloops"][sub]
                        done = True
                if not done and tp > 2:
                    e += p["terminal_au"]
                done = True
            elif u == 4 and p0 + 5 <= len(ug):
                sub = "".join("NACGU"[b] for b in ug[p0 - 1 : p0 + 5])
                if sub in p["tetraloops"]:
                    e = p["tetraloops"][sub]
                    done = True
            elif u == 6 and p0 + 7 <= len(ug):
                sub = "".join("NACGU"[b] for b in ug[p0 - 1 : p0 + 7])
                if sub in p["hexaloops"]:
                    e = p["hexaloops"][sub]
                    done = True
            if not done and u != 3:
                e += int(p["mismatchH"][tp, S3[si, i], S5[si, j]])
            w *= np.exp(-e * 10.0 / kTn)
        return w

    def intloop_w(i, j, k, l):
        from tests.oracle_mccaskill import structure_energy  # noqa: F401

        w = 1.0
        for si in range(nseq):
            u1 = max(0, a2s[si, k - 1] - a2s[si, i])
            u2 = max(0, a2s[si, j - 1] - a2s[si, l])
            tp = ptype7(si, i, j)
            tp2 = int(ep.RTYPE[ptype7(si, k, l)])
            si1, sj1, sp1, sq1 = S3[si, i], S5[si, j], S5[si, k], S3[si, l]
            ns_, nl_ = min(u1, u2), max(u1, u2)
            if nl_ == 0:
                e = int(p["stack"][tp, tp2])
            elif ns_ == 0:
                e = int(p["bulge"][nl_]) if nl_ <= 30 else int(p["bulge"][30]) + int(p["lxc"] * np.log(nl_ / 30.0))
                if nl_ == 1:
                    e += int(p["stack"][tp, tp2])
                else:
                    if tp > 2:
                        e += p["terminal_au"]
                    if tp2 > 2:
                        e += p["terminal_au"]
            elif ns_ == 1 and nl_ == 1:
                e = int(p["int11"][tp, tp2, si1, sj1])
            elif ns_ == 1 and nl_ == 2:
                if u1 == 1:
                    e = int(p["int21"][tp, tp2, si1, sq1, sj1])
                else:
                    e = int(p["int21"][tp2, tp, sq1, si1, sp1])
            elif ns_ == 2 and nl_ == 2:
                e = int(p["int22"][tp, tp2, si1, sp1, sq1, sj1])
            elif ns_ == 1:
                e = int(p["internal"][nl_ + 1])
                e += min(p["max_ninio"], (nl_ - ns_) * p["ninio"])
                e += int(p["mismatch1nI"][tp, si1, sj1]) + int(p["mismatch1nI"][tp2, sq1, sp1])
            elif ns_ == 2 and nl_ == 3:
                e = int(p["internal"][5]) + p["ninio"]
                e += int(p["mismatch23I"][tp, si1, sj1]) + int(p["mismatch23I"][tp2, sq1, sp1])
            else:
                u = ns_ + nl_
                e = int(p["internal"][u]) if u <= 30 else int(p["internal"][30]) + int(p["lxc"] * np.log(u / 30.0))
                e += min(p["max_ninio"], (nl_ - ns_) * p["ninio"])
                e += int(p["mismatchI"][tp, si1, sj1]) + int(p["mismatchI"][tp2, sq1, sp1])
            w *= np.exp(-e * 10.0 / kTn)
        return w

    def mlstem_w(i, j, closing):
        w = 1.0
        for si in range(nseq):
            if closing:
                tp = int(ep.RTYPE[ptype7(si, i, j)])
                s5, s3 = S5[si, j], S3[si, i]
            else:
                tp = ptype7(si, i, j)
                s5, s3 = S5[si, i], S3[si, j]
            e = float(ep.pf_smooth(p["mismatchM"][tp, s5, s3])) + p["ml_intern"]
            if tp > 2:
                e += p["terminal_au"]
            w *= np.exp(-e * 10.0 / kTn)
        return w

    def extstem_w(i, j):
        w = 1.0
        for si in range(nseq):
            tp = ptype7(si, i, j)
            e = 0.0
            if i > 1 and j < n:
                e += float(ep.pf_smooth(p["mismatchExt"][tp, S5[si, i], S3[si, j]]))
            elif i > 1:
                e += float(ep.pf_smooth(p["dangle5"][tp, S5[si, i]]))
            elif j < n:
                e += float(ep.pf_smooth(p["dangle3"][tp, S3[si, j]]))
            if tp > 2:
                e += p["terminal_au"]
            w *= np.exp(-e * 10.0 / kTn)
        return w

    # column cost: expMLbase(kTn)^n_seq == exp(-ML_BASE*10/kT)
    mlb_col = np.exp(-p["ml_base"] * 10.0 / kT)
    mlc_all = np.exp(-p["ml_closing"] * 10.0 / kT)

    structures = enumerate_structures(n)
    Z = 0.0
    acc = np.zeros((n + 1, n + 1))
    for st in structures:
        ok = True
        for (a, b) in st:
            if psc[a, b] < af.MINPSCORE:
                ok = False
                break
        if not ok:
            continue
        pair_of = {}
        for (a, b) in st:
            pair_of[a] = b
            pair_of[b] = a

        def children(i, j):
            out = []
            k = i + 1
            while k < j:
                if k in pair_of and pair_of[k] > k:
                    out.append((k, pair_of[k]))
                    k = pair_of[k] + 1
                else:
                    k += 1
            return out

        w = 1.0
        for (a, b) in children(0, n + 1):
            w *= extstem_w(a, b)
        for (i, j) in sorted(st):
            ch = children(i, j)
            if not ch:
                w *= hairpin_w(i, j)
            elif len(ch) == 1:
                w *= intloop_w(i, j, *ch[0])
            else:
                unpaired_cols = (j - i - 1) - sum(l - k + 1 for (k, l) in ch)
                w *= mlc_all * mlb_col ** unpaired_cols
                w *= mlstem_w(i, j, closing=True)
                for (k, l) in ch:
                    w *= mlstem_w(k, l, closing=False)
            w *= np.exp(psc[i, j] * 10.0 / (kT * nseq))
        if w == 0.0:
            continue
        Z += w
        for (a, b) in st:
            acc[a, b] += w
    global LAST_Z
    LAST_Z = Z
    out = np.zeros((n, n))
    for a in range(1, n):
        for b in range(a + 1, n + 1):
            out[a - 1, b - 1] = acc[a, b] / Z
    return out

"""Exhaustive-enumeration partition function oracle.

For tiny sequences, enumerate every nested secondary structure (min hairpin
loop TURN=3), score each with an independent, direct implementation of the
Vienna 2.x loop-decomposition energy model (dangles=2), and compute exact
base-pair probabilities.  Validates the McCaskill recursions end to end
(hairpin specials, interior loop cases, multiloop linear model, exterior
mismatches) against dafs_tpu.ops.mccaskill.
"""

from __future__ import annotations

import functools

import numpy as np

from dafs_tpu.ops import energy_params as ep

TURN = ep.TURN


def enumerate_structures(n: int):
    """All sets of non-crossing pairs over 1..n with j-i > TURN."""

    @functools.lru_cache(maxsize=None)
    def region(i, j):  # structures fully inside [i, j]
        if j - i < TURN + 1:
            return [frozenset()]
        out = []
        # i unpaired
        out.extend(region(i + 1, j))
        # i paired with k
        for k in range(i + TURN + 1, j + 1):
            for inner in region(i + 1, k - 1):
                for rest in region(k + 1, j):
                    out.append(frozenset({(i, k)}) | inner | rest)
        return out

    return region(1, n)


def structure_energy(pairs, s, p, n):
    """Energy (dcal/mol) of one structure under dangles=2 semantics.

    s: (n+2,) base codes 1-based; p: parameter dict from energy_params.params.
    """
    kT = None  # unused; integer energies
    pair_of = {}
    for (a, b) in pairs:
        pair_of[a] = b
        pair_of[b] = a
    plist = sorted(pairs)

    def ptype(a, b):
        return int(ep.BP_PAIR[s[a], s[b]])

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

    def seqstr(i, j):
        return "".join("NACGU"[s[x]] for x in range(i, j + 1))

    def e_hairpin(i, j):
        u = j - i - 1
        tp = ptype(i, j)
        if u <= 30:
            e = int(p["hairpin"][u])
        else:
            e = int(p["hairpin"][30]) + int(p["lxc"] * np.log(u / 30.0))
        if u == 3:
            sub = seqstr(i, i + 4)
            if sub in p["triloops"]:
                return p["triloops"][sub]
            if tp > 2:
                e += p["terminal_au"]
            return e
        if u == 4:
            sub = seqstr(i, i + 5)
            if sub in p["tetraloops"]:
                return p["tetraloops"][sub]
        if u == 6:
            sub = seqstr(i, i + 7)
            if sub in p["hexaloops"]:
                return p["hexaloops"][sub]
        e += int(p["mismatchH"][tp, s[i + 1], s[j - 1]])
        return e

    def e_intloop(i, j, k, l):
        n1, n2 = k - i - 1, j - l - 1
        tp = ptype(i, j)
        tp2 = int(ep.RTYPE[ptype(k, l)])
        si1, sj1, sp1, sq1 = s[i + 1], s[j - 1], s[k - 1], s[l + 1]
        ns, nl = min(n1, n2), max(n1, n2)
        if nl == 0:
            return int(p["stack"][tp, tp2])
        if ns == 0:
            e = int(p["bulge"][nl]) if nl <= 30 else int(p["bulge"][30]) + int(p["lxc"] * np.log(nl / 30.0))
            if nl == 1:
                e += int(p["stack"][tp, tp2])
            else:
                if tp > 2:
                    e += p["terminal_au"]
                if tp2 > 2:
                    e += p["terminal_au"]
            return e
        if ns == 1:
            if nl == 1:
                return int(p["int11"][tp, tp2, si1, sj1])
            if nl == 2:
                if n1 == 1:
                    return int(p["int21"][tp, tp2, si1, sq1, sj1])
                return int(p["int21"][tp2, tp, sq1, si1, sp1])
            e = int(p["internal"][nl + 1]) if nl + 1 <= 30 else int(p["internal"][30]) + int(p["lxc"] * np.log((nl + 1) / 30.0))
            e += min(p["max_ninio"], (nl - ns) * p["ninio"])
            e += int(p["mismatch1nI"][tp, si1, sj1]) + int(p["mismatch1nI"][tp2, sq1, sp1])
            return e
        if ns == 2 and nl == 2:
            return int(p["int22"][tp, tp2, si1, sp1, sq1, sj1])
        if ns == 2 and nl == 3:
            e = int(p["internal"][5]) + p["ninio"]
            e += int(p["mismatch23I"][tp, si1, sj1]) + int(p["mismatch23I"][tp2, sq1, sp1])
            return e
        u = ns + nl
        e = int(p["internal"][u]) if u <= 30 else int(p["internal"][30]) + int(p["lxc"] * np.log(u / 30.0))
        e += min(p["max_ninio"], (nl - ns) * p["ninio"])
        e += int(p["mismatchI"][tp, si1, sj1]) + int(p["mismatchI"][tp2, sq1, sp1])
        return e

    def e_mlstem(tp, s5, s3):
        # pf_smooth applies to the mismatchM term (params.c RESCALE_BF_SMOOTH)
        e = float(ep.pf_smooth(p["mismatchM"][tp, s5, s3])) + p["ml_intern"]
        if tp > 2:
            e += p["terminal_au"]
        return e

    def e_extstem(i, j):
        tp = ptype(i, j)
        e = 0.0
        if i > 1 and j < n:
            e += float(ep.pf_smooth(p["mismatchExt"][tp, s[i - 1], s[j + 1]]))
        elif i > 1:
            e += float(ep.pf_smooth(p["dangle5"][tp, s[i - 1]]))
        elif j < n:
            e += float(ep.pf_smooth(p["dangle3"][tp, s[j + 1]]))
        if tp > 2:
            e += p["terminal_au"]
        return e

    E = 0
    # exterior stems
    for (a, b) in children(0, n + 1):
        E += e_extstem(a, b)
    # loops
    for (i, j) in plist:
        ch = children(i, j)
        if not ch:
            E += e_hairpin(i, j)
        elif len(ch) == 1:
            (k, l) = ch[0]
            E += e_intloop(i, j, k, l)
        else:
            unpaired = (j - i - 1) - sum(l - k + 1 for (k, l) in ch)
            E += p["ml_closing"] + p["ml_base"] * unpaired
            E += e_mlstem(int(ep.RTYPE[ptype(i, j)]), s[j - 1], s[i + 1])
            for (k, l) in ch:
                E += e_mlstem(ptype(k, l), s[k - 1], s[l + 1])
    return E


def exact_bpp(seq: str, bl: bool = True):
    """Exact base-pair probability matrix by enumeration (0-based output)."""
    n = len(seq)
    p = ep.params(bl)
    s = np.zeros(n + 2, dtype=np.int32)
    s[1 : n + 1] = ep.encode_rna(seq)
    kT = (ep.TEMP37 + ep.K0) * ep.GASCONST

    structures = enumerate_structures(n)
    Z = 0.0
    acc = np.zeros((n + 1, n + 1))
    for st in structures:
        if any(ep.BP_PAIR[s[a], s[b]] == 0 for (a, b) in st):
            continue
        E = structure_energy(st, s, p, n)
        w = np.exp(-E * 10.0 / kT)
        Z += w
        for (a, b) in st:
            acc[a, b] += w
    out = np.zeros((n, n))
    for a in range(1, n):
        for b in range(a + 1, n + 1):
            out[a - 1, b - 1] = acc[a, b] / Z
    return out

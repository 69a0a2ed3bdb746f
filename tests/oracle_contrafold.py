"""Exhaustive-enumeration oracle for the CONTRAfold v2 log-linear model.

Scores every nested structure (complementary pairs, min hairpin length 0)
by direct loop decomposition with the same parameter tables, then computes
exact pair posteriors.  Validates dafs_tpu.ops.contrafold end to end.
"""

from __future__ import annotations

import functools

import numpy as np

from dafs_tpu.ops import contrafold_params as CF


def enumerate_structures(n, allow):
    @functools.lru_cache(maxsize=None)
    def region(i, j):
        if i > j:
            return [frozenset()]
        out = list(region(i + 1, j))
        for k in range(i + 1, j + 1):
            if allow[i, k]:
                for inner in region(i + 1, k - 1):
                    for rest in region(k + 1, j):
                        out.append(frozenset({(i, k)}) | inner | rest)
        return out

    return region(1, n)


def structure_score(pairs, s, t, n):
    pair_of = {}
    for (a, b) in pairs:
        pair_of[a] = b
        pair_of[b] = a

    def children(lo, hi):
        out = []
        k = lo
        while k <= hi:
            if k in pair_of and pair_of[k] > k:
                out.append((k, pair_of[k]))
                k = pair_of[k] + 1
            else:
                k += 1
        return out

    def JA(i, j):
        # score for junction at (i, j) with pair (i, j+1); i may be n, j may be 0
        v = t["helix_closing"][s[i], s[j + 1]]
        if i < n:
            v += t["dangle_left"][s[i], s[j + 1], s[i + 1]]
        if j > 0:
            v += t["dangle_right"][s[i], s[j + 1], s[j]]
        return v

    def JB(i, j):
        return (
            t["helix_closing"][s[i], s[j + 1]]
            + t["terminal_mismatch"][s[i], s[j + 1], s[i + 1], s[j]]
        )

    total = 0.0
    # exterior
    ext = children(1, n)
    ext_paired_cols = set()
    for (a, b) in ext:
        ext_paired_cols.update(range(a, b + 1))
        total += t["external_paired"] + t["base_pair"][s[a], s[b]] + JA(b, a - 1)
    total += t["external_unpaired"] * (n - len(ext_paired_cols))

    for (a, b) in sorted(pairs):
        ch = children(a + 1, b - 1)
        i, j = a, b - 1  # FC cell
        if not ch:
            total += JB(i, j) + t["hairpin_len"][min(j - i, 30)]
        elif len(ch) == 1:
            c, d = ch[0]
            l1 = c - 1 - i
            l2 = j - d
            if l1 == 0 and l2 == 0:
                total += t["base_pair"][s[c], s[d]] + t["helix_stacking"][
                    s[i], s[j + 1], s[i + 1], s[j]
                ]
            else:
                total += (
                    t["single"][l1, l2]
                    + t["base_pair"][s[c], s[d]]
                    + JB(i, j)
                    + JB(d, c - 1)
                )
                if l1 == 0 and l2 == 1:
                    total += t["bulge_0x1"][s[j]]
                if l1 == 1 and l2 == 0:
                    total += t["bulge_0x1"][s[i + 1]]
                if l1 == 1 and l2 == 1:
                    total += t["internal_1x1"][s[i + 1], s[j]]
        else:
            unpaired = (b - a - 1) - sum(d - c + 1 for (c, d) in ch)
            total += (
                JA(i, j)
                + t["multi_base"]
                + t["multi_paired"]
                + t["multi_unpaired"] * unpaired
            )
            for (c, d) in ch:
                total += (
                    t["multi_paired"]
                    + t["base_pair"][s[c], s[d]]
                    + JA(d, c - 1)
                )
    return float(total)


def exact_bpp(seq: str):
    t = {k: np.asarray(v, np.float64) for k, v in CF.tables().items()}
    n = len(seq)
    s = np.full(n + 2, 4, dtype=np.int32)
    s[1 : n + 1] = CF.encode(seq)
    allow = CF.COMPLEMENTARY[s[:, None], s[None, :]]

    structures = enumerate_structures(n, allow)
    ws = np.array([structure_score(st, s, t, n) for st in structures])
    m = ws.max()
    w = np.exp(ws - m)
    Z = w.sum()
    out = np.zeros((n, n))
    for st, wi in zip(structures, w):
        for (a, b) in st:
            out[a - 1, b - 1] += wi
    return out / Z

"""IPknot pseudoknotted structure decoder (src/ipknot.cpp:39-377).

Pseudoknotted common secondary structure as an ILP over P bracket levels:
per-level pair variables for positive-scoring pairs, one-partner-per-base,
level-internal planarity, each level-t pair must cross a lower-level pair,
and stacking ("no isolated pairs") constraints.  The reference links
GLPK/Gurobi/CPLEX (src/ip.cpp); here the same ILP is solved with scipy's
HiGHS `milp` on host — there is no TPU ILP, and this stage is tiny next to
the posterior/DD work.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse
from scipy.optimize import LinearConstraint, milp

LEFT = "([{<ABCDEFGHIJKLMNOPQRSTUVWXYZ"
RIGHT = ")]}>abcdefghijklmnopqrstuvwxyz"


def _variables(p: np.ndarray, th: list[float], w: float | None, q: np.ndarray | None):
    """Enumerate per-level variables with weights (make_objective,
    src/ipknot.cpp:81-136); returns (vars, weights) where vars[k] = (lv, i, j)."""
    L = p.shape[0]
    f = np.float32
    out = []
    wts = []
    for j in range(1, L):
        for i in range(j - 1, -1, -1):
            for lv in range(len(th)):
                if w is None:
                    s = f(p[i, j] - f(th[lv]))
                else:
                    s = f(f(w) * (p[i, j] - f(th[lv])) - (q[i, j] if q is not None else 0.0))
                if s > 0.0:
                    out.append((lv, i, j))
                    wts.append(float(s))
    return out, wts


def decompose_plevel(ss: np.ndarray) -> np.ndarray:
    """Re-derive bracket levels by greedy graph coloring (src/ipknot.cpp:295-356).

    Vertices are base pairs (indexed by left base); two pairs are adjacent iff
    they cross.  Vertices are colored greedily in descending-degree order with
    the smallest unused color, then colors are renumbered in descending order
    of pair count per color.  Only left-end positions receive a level (the
    reference leaves right ends at -1 after decomposition).
    """
    L = len(ss)
    g: list[list[int]] = [[] for _ in range(L)]
    for i in range(L):
        j = int(ss[i])
        if j < 0 or j <= i:
            continue
        for k in range(i + 1, L):
            l = int(ss[k])
            if l < 0 or l <= k:
                continue
            if k < j < l:
                g[i].append(k)
                g[k].append(i)
    verts = [i for i in range(L) if int(ss[i]) > i]
    verts.sort(key=lambda x: -len(g[x]))

    c = np.full(L, -1, dtype=np.int64)
    max_color = 0
    for i in verts:
        used = sorted({int(c[k]) for k in g[i] if c[k] >= 0})
        col = 0
        while col < len(used) and used[col] == col:
            col += 1
        c[i] = col
        max_color = max(max_color, col)

    count = np.zeros(max_color + 1, dtype=np.int64)
    for i in range(L):
        if c[i] >= 0:
            count[c[i]] += 1
    idx = sorted(range(len(count)), key=lambda x: -int(count[x]))
    rev = np.zeros(len(idx), dtype=np.int64)
    for r, x in enumerate(idx):
        rev[x] = r
    plevel = np.full(L, -1, dtype=np.int64)
    for i in range(L):
        if c[i] >= 0:
            plevel[i] = rev[c[i]]
    return plevel


def decode(p: np.ndarray, th, w=None, q=None, levelwise: bool = True):
    """Returns (ss, bracket string). p: (L, L) averaged BP matrix.

    levelwise=True (reference default, src/ipknot.cpp:43): per-level planarity
    and must-cross-lower constraints keep each bracket level planar.
    levelwise=False: those constraints are dropped (src/ipknot.cpp:160) and
    bracket levels are recomputed by greedy graph coloring (decompose_plevel).
    """
    L = p.shape[0]
    P = len(th)
    th = list(th)
    vars_, wts = _variables(p, th, w, q)
    nv = len(vars_)
    if nv == 0:
        return np.full(L, -1, dtype=np.int64), "." * L, 0.0

    by_level: list[list[tuple[int, int, int]]] = [[] for _ in range(P)]
    for k, (lv, i, j) in enumerate(vars_):
        by_level[lv].append((k, i, j))

    rows = []
    lb = []
    ub = []

    def add_row(coeffs, lo, hi):
        rows.append(coeffs)
        lb.append(lo)
        ub.append(hi)

    # constraint 1: each base pairs at most once across levels
    partners = [[] for _ in range(L)]
    for k, (lv, i, j) in enumerate(vars_):
        partners[i].append(k)
        partners[j].append(k)
    for i in range(L):
        if partners[i]:
            add_row([(k, 1.0) for k in partners[i]], -np.inf, 1.0)

    if levelwise:
        # constraint 2: level-internal planarity (crossing pairs exclusive)
        for lv in range(P):
            lvl = by_level[lv]
            for a in range(len(lvl)):
                k1, i1, j1 = lvl[a]
                for b in range(a + 1, len(lvl)):
                    k2, i2, j2 = lvl[b]
                    if (i1 < i2 < j1 < j2) or (i2 < i1 < j2 < j1):
                        add_row([(k1, 1.0), (k2, 1.0)], -np.inf, 1.0)

        # constraint 3: each level-lv pair must be crossed by some pair at
        # each lower level (src/ipknot.cpp:181-206)
        for lv in range(1, P):
            for (k, kk, ll) in by_level[lv]:
                for plv in range(lv):
                    coeffs = [(k, -1.0)]
                    for (k2, i, j) in by_level[plv]:
                        if (i < kk < j < ll) or (kk < i < ll < j):
                            coeffs.append((k2, 1.0))
                    add_row(coeffs, 0.0, np.inf)

    # stacking constraints: no isolated pairs (src/ipknot.cpp:209-246)
    for lv in range(P):
        lvl = by_level[lv]
        up = [[] for _ in range(L)]   # variables with right end at i
        down = [[] for _ in range(L)]  # variables with left end at i
        for (k, i, j) in lvl:
            down[i].append(k)
            up[j].append(k)
        for i in range(L):
            if up[i]:
                coeffs = [(k, -1.0) for k in up[i]]
                if i > 0:
                    coeffs += [(k, 1.0) for k in up[i - 1]]
                if i + 1 < L:
                    coeffs += [(k, 1.0) for k in up[i + 1]]
                add_row(coeffs, 0.0, np.inf)
            if down[i]:
                coeffs = [(k, -1.0) for k in down[i]]
                if i > 0:
                    coeffs += [(k, 1.0) for k in down[i - 1]]
                if i + 1 < L:
                    coeffs += [(k, 1.0) for k in down[i + 1]]
                add_row(coeffs, 0.0, np.inf)

    data, ri, ci = [], [], []
    for r, coeffs in enumerate(rows):
        for k, c in coeffs:
            ri.append(r)
            ci.append(k)
            data.append(c)
    A = sparse.csr_matrix((data, (ri, ci)), shape=(len(rows), nv))

    res = milp(
        c=-np.array(wts),  # maximize
        constraints=LinearConstraint(A, np.array(lb), np.array(ub)),
        integrality=np.ones(nv),
        bounds=(0, 1),
    )
    if res.x is None:
        return np.full(L, -1, dtype=np.int64), "." * L, 0.0
    sol = res.x > 0.5
    score = float(np.dot(np.array(wts), sol.astype(np.float64)))

    ss = np.full(L, -1, dtype=np.int64)
    plevel = np.full(L, -1, dtype=np.int64)
    for lv in range(P):
        for (k, i, j) in by_level[lv]:
            if sol[k]:
                ss[i] = j
                plevel[i] = plevel[j] = lv
    if not levelwise:
        plevel = decompose_plevel(ss)
    s = ["."] * L
    for i in range(L):
        j = ss[i]
        if j >= 0 and i < j and plevel[i] < len(LEFT):
            s[i] = LEFT[plevel[i]]
            s[j] = RIGHT[plevel[i]]
    return ss, "".join(s), score

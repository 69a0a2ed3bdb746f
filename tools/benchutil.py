"""Shared helpers for the bench harnesses (bench.py, tools/alifold_bench.py)."""

from __future__ import annotations


def spread_gap_aln(rows, ncols=None):
    """Pad `rows` to a common width by inserting the deficit as gap runs of
    <= 3 at evenly spaced cuts — the realistic merged-alignment gap shape
    (small alifold B-group support bound BCUT), as opposed to trailing-run
    padding (the BCUT=31 worst case)."""
    if ncols is None:
        ncols = max(map(len, rows))
    out = []
    for s in rows:
        deficit = ncols - len(s)
        nruns = -(-deficit // 3) if deficit else 0
        cuts = [len(s) * (k + 1) // (nruns + 1) for k in range(nruns)]
        row, prev, rem = [], 0, deficit
        for c in cuts:
            row.append(s[prev:c])
            g = min(3, rem)
            row.append("-" * g)
            rem -= g
            prev = c
        row.append(s[prev:])
        out.append("".join(row))
    assert all(len(r) == ncols for r in out), [len(r) for r in out]
    return out

"""Replay every RF00005 progressive merge against the README golden output.

Each guide-tree merge is given golden-restricted INPUTS (see
tests/golden_rf00005.py), so merges are tested in isolation: a match means
our avg-BP + alifold mix + DD solve + projection reproduce the reference's
merge exactly on that node.  6 of 9 merges (incl. the root) are exact today;
nodes 12/15/17 deviate via fold-side ensemble weights (STATUS.md,
"Fold-parity investigation").  This test locks BOTH sets: a kernel change
that silently breaks an exact merge fails here, and fixing a deviating node
fails too (update EXPECT_MATCH — that's a parity milestone worth noticing).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.golden_rf00005 import restrict, setup_engine

# guide-tree internal nodes -> whether the replay reproduces the golden merge
EXPECT_MATCH = {
    10: True,
    11: True,
    12: False,  # M68929 + X00360: shifted anticodon registration
    13: True,
    14: True,
    15: False,  # K00228 + AC009395
    16: True,
    17: False,  # {J04815,J01390,M20972} vs {K00228,AC009395}
    18: True,   # root
}


@pytest.fixture(scope="module")
def engine():
    return setup_engine()


@pytest.mark.slow
@pytest.mark.parametrize("node", sorted(EXPECT_MATCH))
def test_golden_merge_replay(engine, node):
    from dafs_tpu.pipeline import AlnRow

    eng, fa, rows_by_id, leaves = engine
    _score, (l, r) = eng.tree[node]
    ids1, ids2 = leaves[l], leaves[r]
    g1 = restrict(rows_by_id, ids1)
    g2 = restrict(rows_by_id, ids2)
    aln1 = [AlnRow(i, g1[i]) for i in ids1]
    aln2 = [AlnRow(i, g2[i]) for i in ids2]
    _s, _ss, aln = eng._align_alignments(aln1, aln2)

    gm = restrict(rows_by_id, ids1 + ids2)
    ours = {row.seq_id: row.mask for row in aln}
    match = all(
        len(ours[i]) == len(gm[i]) and (ours[i] == gm[i]).all() for i in gm
    )
    assert match == EXPECT_MATCH[node], (
        f"node {node}: replay {'matched' if match else 'deviated'} but "
        f"expected {'match' if EXPECT_MATCH[node] else 'deviation'} "
        f"(cols ours={len(aln[0].mask)} golden={len(next(iter(gm.values())))})"
    )


def test_guide_tree_topology_is_golden(engine):
    """The tree drives everything; lock its merge structure explicitly."""
    eng, fa, _rows, leaves = engine
    assert {n: sorted(v) for n, v in leaves.items() if n >= len(fa)} == {
        10: [0, 5],
        11: [1, 9],
        12: [6, 7],
        13: [1, 8, 9],
        14: [0, 4, 5],
        15: [2, 3],
        16: [1, 6, 7, 8, 9],
        17: [0, 2, 3, 4, 5],
        18: list(range(10)),
    }

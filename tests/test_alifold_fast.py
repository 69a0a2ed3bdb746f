"""Gather-free alifold kernel vs the oracle-locked reference kernel."""

import numpy as np
import pytest

from dafs_tpu.ops import alifold


CASES = [
    # gapless
    ["GGGAAACCC", "GGCAAAGCC", "GGGAAACCC"],
    # gapped: different gap patterns exercise per-seq loop sizes
    ["GGGC-AAAGCCC", "GG-CAAA-GCCC", "GGGCAA--GCCC"],
    # longer, bulges/interior loops across seqs
    [
        "GGCGCGAAAGCGAAUAGCGCC-",
        "GG-GCGAAAGC--AUAGC-CCA",
        "GGCGC-AAAGCGAAUAG-GCCU",
    ],
    # two sequences, big gap block
    ["GGGGAAAACCCC----", "GGGG----AAAACCCC"],
]


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("bl", [True, False])
def test_fast_matches_reference_kernel(case, bl):
    seqs = CASES[case]
    slow = alifold.consensus_bp(seqs, 0.0, bl=bl, fast=False)
    fast = alifold.consensus_bp(seqs, 0.0, bl=bl, fast=True)
    np.testing.assert_allclose(fast, slow, rtol=2e-4, atol=1e-6)


def test_fast_with_constraint():
    seqs = ["GGGC-AAAGCCC", "GG-CAAA-GCCC"]
    con = "(((x....x)))"
    slow = alifold.consensus_bp(seqs, 0.0, constraint=con, fast=False)
    fast = alifold.consensus_bp(seqs, 0.0, constraint=con, fast=True)
    np.testing.assert_allclose(fast, slow, rtol=2e-4, atol=1e-6)

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


@pytest.mark.slow
def test_ns_bucketing_neutral(monkeypatch):
    """NS-bucketing (NS>10 pads to the next power of two with neutral rows)
    matches the exact-NS call to reduction-tree reassociation level (~1 ulp:
    pad rows multiply by exactly 1.0, but the wider prod-over-NS tree pairs
    the real factors differently)."""
    import numpy as np

    from dafs_tpu.ops import alifold

    rng = np.random.default_rng(5)
    base = "GGGCAACGACGUUCGUCGAAACCCGGAUCC"
    rows = []
    for s in range(10):
        row = list(base)
        for k in rng.integers(0, len(base), 3):
            row[k] = "-" if rng.random() < 0.4 else str(rng.choice(list("ACGU")))
        rows.append("".join(row))

    monkeypatch.setenv("DAFS_TPU_NS_BUCKETS", "0")
    exact = np.asarray(alifold.consensus_bp(rows, 0.0))
    monkeypatch.setenv("DAFS_TPU_NS_BUCKETS", "1")
    alifold._EXP_CACHE.clear()
    bucketed = np.asarray(alifold.consensus_bp(rows, 0.0))
    np.testing.assert_allclose(bucketed, exact, rtol=1e-6, atol=1e-7)
    assert ((exact > 0) == (bucketed > 0)).all()


def test_bcut_bitwise_equals_full_block(monkeypatch):
    """The B-group support cut (BCUT) must be bitwise-invisible: skipped
    cells are host-proven exact zeros, so the output with the computed cut
    equals the full 31x31 evaluation bit for bit — on a gappy alignment
    whose windows exercise loop sizes around the bound."""
    from dafs_tpu.ops import alifold

    aln = [
        "GGGCAACGACGG--UUCGUCG--AAACCC",
        "GGGCAACG--GGCAUUCG--GCAAACCC-",
        "GGGCA--GACGGCAUU--UCGGCAAACC-",
    ]
    monkeypatch.delenv("DAFS_TPU_BCUT", raising=False)
    cut = alifold.consensus_bp(aln, 0.0)
    monkeypatch.setenv("DAFS_TPU_BCUT", "31")
    full = alifold.consensus_bp(aln, 0.0)
    assert (cut == full).all()
    assert cut.max() > 0.1  # non-degenerate case

"""End-to-end pipeline smoke test with injected (AUX) posteriors.

Uses the reference's aux-file seam (src/align.cpp:204, src/fold.cpp:230) to
run the full driver — similarity, PCT, guide tree, progressive DD merges,
final decode, output — without any probability model.
"""

import textwrap

import numpy as np
import pytest

from dafs_tpu import pipeline
from dafs_tpu.fasta import Fasta
from dafs_tpu.models import align_models, fold_models


@pytest.fixture
def tiny_family(tmp_path):
    seqs = [
        Fasta("seq1", "GGGAAACCC"),
        Fasta("seq2", "GGGAAACCC"),
        Fasta("seq3", "GGCAAAGCC"),
    ]
    # mp: near-identity matches for all pairs
    mp_lines = []
    for x in range(3):
        for y in range(x + 1, 3):
            mp_lines.append(f"> {x+1} {y+1}")
            for i in range(9):
                mp_lines.append(f"{i+1} {i+1}:0.95")
    (tmp_path / "mp.aux").write_text("\n".join(mp_lines) + "\n")
    # bp: a 3-bp stem (1,9),(2,8),(3,7) in 1-based
    bp_lines = []
    for x in range(3):
        bp_lines.append(f"> {x+1}")
        for i, j in [(1, 9), (2, 8), (3, 7)]:
            bp_lines.append(f"{i} {j}:0.8")
    (tmp_path / "bp.aux").write_text("\n".join(bp_lines) + "\n")
    return seqs, str(tmp_path / "mp.aux"), str(tmp_path / "bp.aux")


def test_pipeline_end_to_end_aux(tiny_family):
    seqs, mp_path, bp_path = tiny_family
    a_model = align_models.AUXAlign(mp_path, 0.01)
    s_model = fold_models.AUXFold(bp_path, 0.01)
    opts = pipeline.Options(use_alifold=False)
    d = pipeline.Dafs(a_model, s_model, opts, alifold_model=None)
    out = d.run(seqs)
    lines = out.strip().split("\n")

    # line 0: guide tree s-expression over all names
    assert lines[0].startswith("[ ")
    for s in seqs:
        assert s.name in lines[0]
    # then SS_cons + structure + 3 aligned rows
    assert lines[1] == ">SS_cons"
    sstr = lines[2]
    assert sstr.count("(") == sstr.count(")") == 3
    names = [lines[3 + 2 * i] for i in range(3)]
    assert names == ["> seq1", "> seq2", "> seq3"]
    rows = [lines[4 + 2 * i] for i in range(3)]
    assert len({len(r) for r in rows}) == 1
    assert len(rows[0]) == len(sstr)
    # identical sequences, near-identity matches: ungapped alignment
    assert rows[0] == "GGGAAACCC"


def test_pipeline_guide_tree_only(tiny_family):
    seqs, mp_path, bp_path = tiny_family
    a_model = align_models.AUXAlign(mp_path, 0.01)
    s_model = fold_models.AUXFold(bp_path, 0.01)
    opts = pipeline.Options(use_alifold=False, w_pct_a=0.0, w_pct_s=0.0)
    d = pipeline.Dafs(a_model, s_model, opts, alifold_model=None)
    out = d.run(seqs)
    # all three pairwise similarities tie at 0.95; the reference's priority
    # queue breaks ties toward the LARGER index pair, so (seq2, seq3) merges
    # first (C++ pair comparison in std::priority_queue, src/dafs.cpp:468-472)
    tree_line = out.split("\n")[0]
    assert tree_line == "[ 0.9025 seq1 [ 0.95 seq2 seq3 ] ]"


def test_save_aux_roundtrip(tiny_family, tmp_path):
    """--save-*-aux dumps reload bit-identically through the AUX models."""
    seqs, mp_path, bp_path = tiny_family
    a_model = align_models.AUXAlign(mp_path, 0.01)
    s_model = fold_models.AUXFold(bp_path, 0.01)
    save_mp = str(tmp_path / "saved_mp.aux")
    save_bp = str(tmp_path / "saved_bp.aux")
    opts = pipeline.Options(
        use_alifold=False, save_align_aux=save_mp, save_fold_aux=save_bp
    )
    d = pipeline.Dafs(a_model, s_model, opts, alifold_model=None)
    out1 = d.run(seqs)

    # the dump is the RAW posterior stage (run() then PCT-relaxes self.mp/bp
    # in place), so compare against a fresh model's output
    a2 = align_models.AUXAlign(save_mp, 0.01)
    s2 = fold_models.AUXFold(save_bp, 0.01)
    np.testing.assert_array_equal(a2.all_pairs(seqs), a_model.all_pairs(seqs))
    np.testing.assert_array_equal(s2.all_seqs(seqs), s_model.all_seqs(seqs))

    d2 = pipeline.Dafs(a2, s2, pipeline.Options(use_alifold=False),
                       alifold_model=None)
    assert d2.run(seqs) == out1

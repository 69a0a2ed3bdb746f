"""ViennaRNA v2.0 parameter-file loader (dafs_tpu/ops/param_file.py)."""

import textwrap

import numpy as np
import pytest

from dafs_tpu.ops import energy_params as ep
from dafs_tpu.ops import param_file


def _write(tmp_path, body: str) -> str:
    p = tmp_path / "test.par"
    p.write_text("## RNAfold parameter file v2.0\n" + textwrap.dedent(body))
    return str(p)


def test_rejects_wrong_header(tmp_path):
    p = tmp_path / "bad.par"
    p.write_text("# stack\n1 2 3\n")
    with pytest.raises(ValueError, match="v2.0"):
        param_file.load_param_file(str(p))


def test_stack_and_scalars(tmp_path):
    stack_vals = np.arange(49).reshape(7, 7) * 10 - 240
    rows = "\n".join(" ".join(str(v) for v in r) for r in stack_vals)
    path = _write(tmp_path, f"""
    # stack
    /*  CG    GC    GU    UG    AU    UA    NN  */
    {rows}
    # ML_params
    /* cu cu_dH cc cc_dH ci ci_dH */
    0 0 340 0 40 0
    # NINIO
    60 320 300
    # Misc
    /* DuplexInit DuplexInit_dH TerminalAU TerminalAU_dH */
    410 360 50 370
    """)
    over = param_file.load_param_file(path)
    assert over["ml_base"] == 0 and over["ml_closing"] == 340
    assert over["ml_intern"] == 40
    assert over["ninio"] == 60 and over["max_ninio"] == 300
    assert over["terminal_au"] == 50
    np.testing.assert_array_equal(over["stack"][1:8, 1:8], stack_vals)
    # row/col 0 (no-pair) keeps the built-in values
    base = ep.params()
    np.testing.assert_array_equal(over["stack"][0], np.asarray(base["stack"])[0])


def test_inf_and_loop_lengths(tmp_path):
    vals = ["INF"] * 3 + [str(540 + i) for i in range(28)]
    path = _write(tmp_path, f"""
    # hairpin
    {' '.join(vals)}
    """)
    over = param_file.load_param_file(path)
    assert over["hairpin"][0] == ep.INF
    assert over["hairpin"][3] == 540 and over["hairpin"][30] == 567


def test_special_loops_and_mismatch(tmp_path):
    mm = np.zeros((7, 5, 5), np.int64)
    mm[0, 1, 1] = -150  # CG block, A/A
    flat = " ".join(str(v) for v in mm.reshape(-1))
    path = _write(tmp_path, f"""
    # mismatch_hairpin
    {flat}
    # Tetraloops
    CGAAAG -160 200
    CUUCGG -190 220
    """)
    over = param_file.load_param_file(path)
    assert over["mismatchH"][1, 1, 1] == -150
    assert over["tetraloops"] == {"CGAAAG": -160, "CUUCGG": -190}


def test_section_size_validation(tmp_path):
    path = _write(tmp_path, """
    # stack
    1 2 3
    """)
    with pytest.raises(ValueError, match="stack"):
        param_file.load_param_file(path)


def test_overrides_change_fold(tmp_path):
    """Applying a parameter file must actually change the fold posterior."""
    from dafs_tpu.ops import mccaskill

    seq = "GGGCAACGACGUUCGUCGAAACCC"
    base_bp = mccaskill.batch_bp_posteriors([seq], 0.01)[0]
    # forbid every generic hairpin (special tri/tetra/hexa loops REPLACE the
    # hairpin+mismatch energy in Vienna's E_Hairpin, so motif hairpins
    # survive) -> the pairing ensemble collapses sharply
    path = _write(tmp_path, f"""
    # hairpin
    {' '.join(['INF'] * 31)}
    """)
    try:
        param_file.apply_param_file(path)
        new_bp = mccaskill.batch_bp_posteriors([seq], 0.01)[0]
    finally:
        ep.set_param_overrides({})
    assert float(base_bp.sum()) > 2.0
    assert float(new_bp.sum()) < 0.5 * float(base_bp.sum())

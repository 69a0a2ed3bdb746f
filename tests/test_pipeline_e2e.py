"""End-to-end pipeline smoke test on a tiny synthetic family (CPU backend).

Covers the full default path (pair-HMM -> McCaskill -> PCT -> tree ->
progressive DD merges with the alifold mix -> final Nussinov decode) and the
output format of DAFS::output (src/dafs.cpp:1578-1601)."""

import re

import numpy as np
import pytest

from dafs_tpu import cli


@pytest.fixture(scope="module")
def tiny_fa(tmp_path_factory):
    p = tmp_path_factory.mktemp("fa") / "tiny.fa"
    # three related hairpins (shared stem, varied loops)
    p.write_text(
        ">a\nGGGCGCAAGCCU\n"
        ">b\nGGGCGCUUGCCU\n"
        ">c\nGGACGCAAGCCU\n"
    )
    return str(p)


def test_default_pipeline_tiny(tiny_fa, capsys):
    rc = cli.main([tiny_fa])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    # guide tree s-expression
    assert out[0].startswith("[ ") and out[0].count("[") == out[0].count("]")
    assert out[1] == ">SS_cons"
    ss = out[2]
    assert re.fullmatch(r"[().]+", ss)
    assert ss.count("(") == ss.count(")")
    # gapped alignment: names sorted, rows same width as SS_cons
    names = [l[2:] for l in out[3::2]]
    assert names == sorted(names) == ["a", "b", "c"]
    rows = out[4::2]
    assert all(len(r) == len(ss) for r in rows)
    # ungapped rows reproduce the input sequences
    assert rows[0].replace("-", "") == "GGGCGCAAGCCU"


def test_pipeline_refinement_and_ipknot(tiny_fa, capsys):
    rc = cli.main(["-r", "2", tiny_fa])
    assert rc == 0
    out1 = capsys.readouterr().out
    assert ">SS_cons" in out1

    rc = cli.main(["--ipknot", tiny_fa])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert ">SS_cons" in out2


def test_python_api(tiny_fa):
    import dafs_tpu

    res = dafs_tpu.align_and_fold(tiny_fa)
    assert res.ss_cons.count("(") == res.ss_cons.count(")") > 0
    assert res.names == ["a", "b", "c"]
    assert all(len(r) == len(res.ss_cons) for r in res.rows)
    # raw-string input with custom options
    res2 = dafs_tpu.align_and_fold(
        ["GGGCGCAAGCCU", "GGGCGCUUGCCU"], t_max=50, n_refinement=0
    )
    assert res2.names == ["seq1", "seq2"]
    assert str(res2).count("\n") >= 6


def test_single_sequence_input(tmp_path, capsys):
    """N=1: no pairs, trivial tree, fold-only structure (reference behavior)."""
    p = tmp_path / "one.fa"
    p.write_text(">a\nGGGCGCAAGCCU\n")
    rc = cli.main([str(p)])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[-4] == ">SS_cons"
    assert out[-2] == "> a"
    assert out[-1] == "GGGCGCAAGCCU"


def test_version_flag(capsys):
    # reference parity: `dafs --version` prints and exits 0
    # (src/dafs.cpp:1655-1659)
    with pytest.raises(SystemExit) as e:
        cli.main(["--version"])
    assert e.value.code == 0
    assert capsys.readouterr().out.strip() == "DAFS version 0.0.4"


def test_verbose_dump_format(tiny_fa, capsys):
    """-v 2 pins the per-DD-iteration dump to output_verbose's format
    (src/dafs.cpp:875-894): group-1 rows, x bracket line, group-2 rows,
    y bracket line, blank line — every iteration, before the final output."""
    rc = cli.main(["-v", "2", tiny_fa])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    # the final output begins at the guide-tree s-expression line
    tree_at = next(i for i, l in enumerate(out) if l.startswith("[ "))
    dump = out[:tree_at]
    assert dump, "no per-iteration dumps before the final output"
    i = 0
    blocks = 0
    while i < len(dump):
        # one block: (">" name / gapped row) x n1, brackets, same for
        # group 2, then an empty line
        width = None
        for _g in range(2):
            nrows = 0
            while i < len(dump) and dump[i].startswith("> "):
                row = dump[i + 1]
                if width is None:
                    width = len(row)
                assert len(row) == width
                assert re.fullmatch(r"[ACGUacgu-]+", row)
                i += 2
                nrows += 1
            assert nrows >= 1
            br = dump[i]
            assert re.fullmatch(r"[().]*", br) and len(br) == width
            assert br.count("(") == br.count(")")
            i += 1
        assert dump[i] == ""
        i += 1
        blocks += 1
    assert blocks >= 1

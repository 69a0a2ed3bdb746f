#!/usr/bin/env python
"""Probe which reconstructed Turner-2004 tables the RF00005 output depends on.

The default (`-s Boltzmann`) parameter set is BL* for every table that
copy_boltzmann_parameters overrides (reference src/boltzmann_param.c:6010-6026)
plus four Turner-2004 tables it does NOT override: mismatchExt / mismatchM
(= 5'+3' dangle sums), mismatch1nI and mismatch23I, along with the special
tri/hexaloop bonuses and lxc.  Those four are reconstructed from the published
parameter set (no ViennaRNA build exists here), and they are the suspected
source of the remaining gap-placement deviation vs the README golden output.

This tool runs the full default pipeline once per table perturbation and
reports how the SS_cons / alignment move, against the golden README output.

Usage: python tools/table_sensitivity.py [variant ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = "/root/reference/README.md"
FASTA = "/root/reference/examples/RF00005:0.fa"


def load_golden():
    """Parse the README Example block: tree, SS_cons, rows by name."""
    lines = open(GOLDEN_PATH).read().splitlines()
    # example block is tab-indented, starting at the "% dafs" command line
    block = [l[1:] for l in lines if l.startswith("\t")]
    start = next(i for i, l in enumerate(block) if l.startswith("% dafs"))
    block = block[start:]
    tree = block[1]
    assert block[2] == ">SS_cons"
    ss = block[3]
    rows = {}
    i = 4
    while i + 1 < len(block) and block[i].startswith("> "):
        rows[block[i][2:]] = block[i + 1]
        i += 2
    return tree, ss, rows


def variants():
    from dafs_tpu.ops import energy_params as ep

    z3 = np.zeros_like(ep.MISMATCH_EXT_T04)
    m23_plain = np.zeros_like(ep.MISMATCH_23I_T04)
    for t in (3, 4, 5, 6, 7):
        m23_plain[t] = 70
    return {
        "base": {},
        "mmExt_zero": {"mismatchExt": z3},
        "mmM_zero": {"mismatchM": z3},
        "mm1n_zero": {"mismatch1nI": z3},
        "mm23_zero": {"mismatch23I": z3},
        "mm23_no_bonus": {"mismatch23I": m23_plain},
        "no_special_hp": {"triloops": {}, "hexaloops": {}},
        "lxc_zero": {"lxc": 0.0},
    }


def main() -> None:
    import jax

    from dafs_tpu.utils.aot import setup_compile_cache; setup_compile_cache()
    import dafs_tpu
    from dafs_tpu.ops import energy_params as ep

    tree_g, ss_g, rows_g = load_golden()
    want = variants()
    names = sys.argv[1:] or list(want)
    for name in names:
        ep.set_param_overrides(want[name])
        t0 = time.perf_counter()
        res = dafs_tpu.align_and_fold(FASTA)
        dt = time.perf_counter() - t0
        n_match = sum(rows_g.get(n) == r for n, r in zip(res.names, res.rows))
        print(
            f"[{name:14s}] {dt:6.1f}s cols={len(res.ss_cons):3d} "
            f"tree={'OK ' if res.tree == tree_g else 'DIFF'} "
            f"ss={'OK ' if res.ss_cons == ss_g else 'DIFF'} "
            f"rows={n_match}/{len(rows_g)}"
        )
        print(f"    ss: {res.ss_cons}")
        sys.stdout.flush()
    ep.set_param_overrides({})
    print(f"golden: {ss_g}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Extract the Andronescu et al. (RNA 2010) BL* energy parameter tables.

The reference bundles these published parameters (origin:
http://www.cs.ubc.ca/labs/beta/Projects/RNA-Params/data/parameters_BLstar_Vienna.txt)
as C arrays in src/boltzmann_param.c.  This script parses the numeric data
out of that file into dafs_tpu/ops/data/bl_star_params.npz so the TPU build
carries the parameters as data, not transcribed source.

Table layouts follow ViennaRNA conventions (NBPAIRS=7 pair types ordered
CG GC GU UG AU UA NN; 5 bases ordered N A C G U; energies in dcal/mol).

Run:  python tools/extract_bl_params.py /root/reference/src/boltzmann_param.c
"""

from __future__ import annotations

import re
import sys

import numpy as np

INF = 10000000
NST = 0
DEF = -50


def parse_arrays(text: str) -> dict[str, list[int]]:
    arrays = {}
    for m in re.finditer(
        r"static\s+int\s+(\w+)\[\]\s*=\s*\{(.*?)\};", text, re.S
    ):
        name, body = m.group(1), m.group(2)
        body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
        vals = []
        for tok in body.replace("\n", " ").split(","):
            tok = tok.strip()
            if not tok:
                continue
            if tok == "INF":
                vals.append(INF)
            elif tok == "NST":
                vals.append(NST)
            elif tok == "DEF":
                vals.append(DEF)
            else:
                vals.append(int(tok))
        arrays[name] = vals
    return arrays


def parse_tetraloops(text: str):
    m = re.search(r"tetraloops_a\[\]\s*=\s*\{(.*?)\};", text, re.S)
    seqs, es = [], []
    for sm in re.finditer(r'\{"(\w+)",\s*(-?\d+)\}', m.group(1)):
        seqs.append(sm.group(1))
        es.append(int(sm.group(2)))
    return seqs, es


def main(src: str, dst: str) -> None:
    text = open(src).read()
    a = parse_arrays(text)
    NB = 7  # NBPAIRS

    def mat(name, shape):
        v = np.array(a[name], dtype=np.int32)
        assert v.size == int(np.prod(shape)), (name, v.size, shape)
        return v.reshape(shape)

    out = {}
    # copy_* fill [1..NBPAIRS] from dense source arrays (boltzmann_param.c:5908+)
    stack = np.full((NB + 1, NB + 1), INF, np.int32)
    stack[1:, 1:] = mat("stack37a", (NB, NB))
    out["stack37"] = stack

    for cname, src_name in [
        ("mismatchH37", "mismatchH37a"),
        ("mismatchI37", "mismatchI37a"),
    ]:
        t = np.zeros((NB + 1, 5, 5), np.int32)
        t[1:] = mat(src_name, (NB, 5, 5))
        out[cname] = t

    for cname, src_name in [("dangle5_37", "dangle5_37a"), ("dangle3_37", "dangle3_37a")]:
        out[cname] = mat(src_name, (NB + 1, 5))

    i11 = np.zeros((NB + 1, NB + 1, 5, 5), np.int32)
    i11[1:, 1:] = mat("int11_37a", (NB, NB, 5, 5))
    out["int11_37"] = i11
    i21 = np.zeros((NB + 1, NB + 1, 5, 5, 5), np.int32)
    i21[1:, 1:] = mat("int21_37a", (NB, NB, 5, 5, 5))
    out["int21_37"] = i21
    i22 = np.zeros((NB + 1, NB + 1, 5, 5, 5, 5), np.int32)
    i22[1:, 1:, 1:, 1:, 1:, 1:] = mat("int22_37a", (NB, NB, 4, 4, 4, 4))
    out["int22_37"] = i22

    out["hairpin37"] = mat("hairpin37a", (31,))
    out["bulge37"] = mat("bulge37a", (31,))
    out["internal_loop37"] = mat("internal_loop37a", (31,))
    ml = a["MLparams_a"]
    out["ML_BASE37"], out["ML_closing37"], out["ML_intern37"], out["TerminalAU37"] = (
        np.int32(ml[0]), np.int32(ml[1]), np.int32(ml[2]), np.int32(ml[3])
    )
    out["ninio37"], out["MAX_NINIO"] = np.int32(a["ninio_a"][0]), np.int32(a["ninio_a"][1])
    seqs, es = parse_tetraloops(text)
    out["tetraloop_seqs"] = np.array(seqs)
    out["tetraloop37"] = np.array(es, np.int32)

    np.savez_compressed(dst, **out)
    print(f"wrote {dst}: {sorted(out)}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src/boltzmann_param.c"
    dst = sys.argv[2] if len(sys.argv) > 2 else "dafs_tpu/ops/data/bl_star_params.npz"
    main(src, dst)

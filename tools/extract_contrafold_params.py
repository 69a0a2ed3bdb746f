#!/usr/bin/env python
"""Extract the 708 published CONTRAfold v2 parameters.

Parses the `value, // name` lines of contrafold/Defaults.ipp
(GetDefaultComplementaryValues — the weights shipped with CONTRAfold 2.0,
Do et al. 2006) into dafs_tpu/ops/data/contrafold_params.npz as a
name -> float mapping.
"""

from __future__ import annotations

import re
import sys

import numpy as np


def main(src: str, dst: str) -> None:
    text = open(src).read()
    m = re.search(
        r"GetDefaultComplementaryValues\(\)\s*\{\s*RealT values\[\]\s*=\s*\{(.*?)\};",
        text,
        re.S,
    )
    body = m.group(1)
    names = []
    values = []
    for line in body.splitlines():
        mm = re.match(r"\s*(-?[\d.]+),?\s*//\s*(\S+)", line)
        if mm:
            values.append(float(mm.group(1)))
            names.append(mm.group(2))
    assert len(names) == 708, len(names)
    np.savez_compressed(
        dst, names=np.array(names), values=np.array(values, dtype=np.float64)
    )
    print(f"wrote {dst}: {len(names)} parameters")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src/contrafold/Defaults.ipp"
    dst = sys.argv[2] if len(sys.argv) > 2 else "dafs_tpu/ops/data/contrafold_params.npz"
    main(src, dst)

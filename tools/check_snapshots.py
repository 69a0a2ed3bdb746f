#!/usr/bin/env python
"""Regression guard: run the default pipeline on the bundled examples (on
whatever backend is active) and diff against the recorded TPU snapshots.

Usage: python tools/check_snapshots.py [--update]

The snapshots under tests/snapshots/ are full stdout captures from the real
TPU chip; numeric drift on other backends is expected in the guide-tree
digits, so the comparison reports per-line diffs instead of failing hard
unless --strict is given.
"""

import argparse
import io
import os
import subprocess
import sys

CASES = [
    ("/root/reference/examples/RF00005:0.fa", "tests/snapshots/rf00005_default_tpu.txt"),
    ("/root/reference/examples/RF00017:4.fa", "tests/snapshots/rf00017_default_tpu.txt"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = 0
    for fa, snap in CASES:
        out = subprocess.run(
            [sys.executable, "-m", "dafs_tpu.cli", fa],
            capture_output=True, text=True, cwd=root, check=True,
        ).stdout
        path = os.path.join(root, snap)
        if args.update:
            with open(path, "w") as fh:
                fh.write(out)
            print(f"updated {snap}")
            continue
        want = open(path).read()
        if out == want:
            print(f"OK {snap}")
        else:
            print(f"DIFFERS {snap}:")
            for a, b in zip(want.splitlines(), out.splitlines()):
                if a != b:
                    print(f"  - {a[:100]}")
                    print(f"  + {b[:100]}")
            if args.strict:
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())

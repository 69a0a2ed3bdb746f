"""Folding models: producers of base-pair probability matrices.

Mirrors src/fold.{h,cpp}: per-sequence dense upper-triangular BP posterior
matrices thresholded at `th` (strictly greater kept).  Constrained variants
re-fold under a structure constraint string ('('/')' forced pair, '.' forced
unpaired, '?' free) for the bp-update mechanism (src/dafs.cpp:609-711).
"""

from __future__ import annotations

import numpy as np

from dafs_tpu.fasta import Fasta


class FoldModel:
    def __init__(self, th: float):
        self.th = th

    def bp_posterior(self, seq: str) -> np.ndarray:
        raise NotImplementedError

    def bp_posterior_constrained(self, seq: str, constraint: str) -> np.ndarray:
        raise NotImplementedError

    def all_seqs(self, fa: list[Fasta]) -> np.ndarray:
        """(N, L, L) padded tensor of BP posteriors (upper triangle)."""
        N = len(fa)
        L = max(len(f) for f in fa)
        bp = np.zeros((N, L, L), dtype=np.float32)
        posts = self.batch_bp_posteriors([f.seq for f in fa])
        for i, p in enumerate(posts):
            bp[i, : p.shape[0], : p.shape[1]] = p
        return bp

    def batch_bp_posteriors(self, seqs, constraints=None) -> list[np.ndarray]:
        if constraints is None:
            return [self.bp_posterior(s) for s in seqs]
        return [
            self.bp_posterior_constrained(s, c) for s, c in zip(seqs, constraints)
        ]


class RNAfold(FoldModel):
    """McCaskill partition function with Vienna 2.x semantics; `bl=True`
    applies the Andronescu BL* parameter overrides (default -s Boltzmann,
    src/fold.cpp:70-76)."""

    def __init__(self, bl: bool, th: float):
        super().__init__(th)
        self.bl = bl

    def batch_bp_posteriors(self, seqs, constraints=None):
        from dafs_tpu.ops import mccaskill
        from dafs_tpu.parallel import mesh

        if mesh.work_device_count() > 1:
            return mesh.sharded_bp_posteriors(
                seqs, self.th, bl=self.bl, constraints=constraints
            )
        return mccaskill.batch_bp_posteriors(
            seqs, self.th, bl=self.bl, constraints=constraints
        )

    def bp_posterior(self, seq):
        return self.batch_bp_posteriors([seq])[0]

    def bp_posterior_constrained(self, seq, constraint):
        from dafs_tpu.ops import mccaskill

        return mccaskill.batch_bp_posteriors(
            [seq], self.th, bl=self.bl, constraints=[constraint]
        )[0]


class CONTRAfold(FoldModel):
    """CONTRAfold v2 log-linear model (-s CONTRAfold)."""

    def batch_bp_posteriors(self, seqs, constraints=None):
        from dafs_tpu.ops import contrafold

        return contrafold.batch_bp_posteriors(seqs, self.th, constraints=constraints)

    def bp_posterior(self, seq):
        return self.batch_bp_posteriors([seq])[0]

    def bp_posterior_constrained(self, seq, constraint):
        from dafs_tpu.ops import contrafold

        return contrafold.batch_bp_posteriors([seq], self.th, constraints=[constraint])[0]


class AUXFold(FoldModel):
    """Load precomputed BP matrices from the reference's text format
    (`> x` header then 1-based `i j:p ...` rows; src/fold.cpp:230-278)."""

    def __init__(self, path: str, th: float):
        super().__init__(th)
        self.path = path

    def all_seqs(self, fa: list[Fasta]) -> np.ndarray:
        N = len(fa)
        L = max(len(f) for f in fa)
        bp = np.zeros((N, L, L), dtype=np.float32)
        x = None
        with open(self.path) as fh:
            for line in fh:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == ">":
                    x = int(parts[1]) - 1
                else:
                    i = int(parts[0]) - 1
                    for tok in parts[1:]:
                        j, p = tok.split(":")
                        bp[x, i, int(j) - 1] = float(p)
        return bp

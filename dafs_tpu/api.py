"""High-level Python API.

>>> import dafs_tpu
>>> res = dafs_tpu.align_and_fold(["GGGCGCAAGCCU", "GGGCGCUUGCCU"])
>>> res.ss_cons
'((((....))))'

Mirrors the CLI defaults (the reference `dafs` defaults,
src/dafs.cpp:1607-1643); keyword arguments override `pipeline.Options`
fields (w, t_max, th_a, th_s, align_model, fold_model, ...).
"""

from __future__ import annotations

import dataclasses

from dafs_tpu.fasta import Fasta


@dataclasses.dataclass
class Result:
    """Structured output of one align-and-fold run."""

    tree: str            # guide tree s-expression (reference format)
    ss_cons: str         # common secondary structure, bracket string
    names: list[str]     # sequence names, sorted by input order
    rows: list[str]      # gapped sequences, aligned columns
    score: float         # final joint objective value

    def __str__(self) -> str:
        lines = [self.tree, ">SS_cons", self.ss_cons]
        for n, r in zip(self.names, self.rows):
            lines += ["> " + n, r]
        return "\n".join(lines) + "\n"


def align_and_fold(
    seqs,
    names=None,
    *,
    align_model: str = "ProbCons",
    fold_model: str = "Boltzmann",
    use_alifold: bool = True,
    **options,
) -> Result:
    """Align and fold a set of RNA sequences (the full default pipeline).

    Args:
      seqs: list of RNA strings, list of Fasta records, or a FASTA path.
      names: optional names (defaults to seq1..seqN for raw strings).
      align_model: "ProbCons" or "CONTRAlign".
      fold_model: "Boltzmann", "Vienna" or "CONTRAfold".
      **options: overrides for pipeline.Options fields (w, t_max, eta0,
        n_refinement, th_a, th_s, th_s1, w_pct_a, w_pct_s, w_pct_f,
        fold_decoder, use_bp_update, use_bp_update1, ...).
    """
    from dafs_tpu import pipeline
    from dafs_tpu.fasta import load_fasta
    from dafs_tpu.models import align_models, fold_models
    from dafs_tpu.typedefs import CUTOFF

    if isinstance(seqs, str):
        fa = load_fasta(seqs)
    elif seqs and isinstance(seqs[0], Fasta):
        fa = list(seqs)
    else:
        if names is None:
            names = [f"seq{i+1}" for i in range(len(seqs))]
        fa = [Fasta(n, s) for n, s in zip(names, seqs)]

    opts = pipeline.Options(**options)
    a_model = (
        align_models.CONTRAlign(opts.th_a)
        if align_model == "CONTRAlign"
        else align_models.ProbCons(opts.th_a)
    )
    if fold_model == "CONTRAfold":
        s_model = fold_models.CONTRAfold(CUTOFF)
    else:
        s_model = fold_models.RNAfold(fold_model == "Boltzmann", CUTOFF)
    opts = dataclasses.replace(opts, use_alifold=use_alifold)
    from dafs_tpu.ops import alifold as alifold_ops

    ali = alifold_ops.Alifold(0.0, bl=fold_model == "Boltzmann")
    d = pipeline.Dafs(a_model, s_model, opts, alifold_model=ali)
    d.run(fa)
    return Result(**d.result)

"""DAFS-TPU: TPU-native simultaneous aligning and folding of RNA sequences.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of DAFS
(Sato et al., Bioinformatics 28(24):3218-3224, 2012; reference C++ at
/root/reference): simultaneous multiple alignment and common secondary
structure prediction by dual decomposition, built TPU-first:

- batched anti-diagonal wavefront DP kernels (pair-HMM, pair-CRF,
  McCaskill/CONTRAfold inside-outside) over padded tensors,
- the subgradient (dual decomposition) loop as on-device fused decodes,
- all-pairs workloads sharded over a `jax.sharding.Mesh`,
- host-side orchestration (guide tree, projections, output) in Python,
- IPknot pseudoknot decoding via a host ILP solver.
"""

__version__ = "0.1.0"

from dafs_tpu.fasta import Fasta, load_fasta  # noqa: F401
from dafs_tpu.api import Result, align_and_fold  # noqa: F401

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

import os as _os

if not _os.environ.get("DAFS_TPU_NO_PRECISION_OVERRIDE"):
    # The kernels contract f32 energy/probability tables through one-hot
    # einsums; at DEFAULT precision TPU MXU dots round the table values to
    # bfloat16 (~4e-3 relative), which is above the ~1e-3 level where the
    # decoded alignment provably moves (see README "Known deviations").
    # Force exact-f32 dots everywhere; kernels that are perf-critical opt
    # into lower precision explicitly if ever safe.
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")

from dafs_tpu.fasta import Fasta, load_fasta  # noqa: F401
from dafs_tpu.api import Result, align_and_fold  # noqa: F401

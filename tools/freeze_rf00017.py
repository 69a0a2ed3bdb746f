#!/usr/bin/env python
"""Freeze the RF00017 anchor: posteriors + alifold outputs + replay output.

RF00017 (10 SRP RNAs, 294-303 nt) is BASELINE.md correctness anchor 2, but
several of its DD merges hit the 600-iteration cap without converging
(mirroring the reference's own `-m 600` cap), so the decoded output is
sensitive to f32 reduction order and cannot be locked against device-kernel
refactors directly.  This tool records a kernel-independent replay anchor:

  1. the full probability stage (mp/bp after PCT) as dense f32 arrays,
  2. every alifold consensus_bp output the progressive phase requests
     (keyed by call order; inputs hashed for validation),
  3. the final output text of the host-loop DD replay (native C++ decoders),
  4. per-merge convergence diagnostics (iterations, violations).

tests/test_rf00017_replay.py replays step 3 from these arrays: pure host
math + frozen device outputs, bit-stable under any kernel change.

Usage: python tools/freeze_rf00017.py [out.npz]
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FASTA = "/root/reference/examples/RF00017:4.fa"
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "snapshots", "rf00017_replay.npz",
)


def aln_key(aln, constraint=None) -> str:
    h = hashlib.sha256()
    for row in aln:
        h.update(str(row.seq_id).encode())
        h.update(np.asarray(row.mask, np.uint8).tobytes())
    if constraint:
        h.update(constraint.encode())
    return h.hexdigest()[:16]


def main() -> None:
    import jax

    from dafs_tpu.utils.aot import setup_compile_cache; setup_compile_cache()
    from dafs_tpu import fasta, pipeline
    from dafs_tpu.models import align_models, fold_models
    from dafs_tpu.ops import alifold as alifold_ops
    from dafs_tpu.typedefs import CUTOFF

    fa = fasta.load_fasta(FASTA)
    opts = pipeline.Options(dd_host=True)
    ali = alifold_ops.Alifold(0.0, bl=True)

    calls = []

    class RecordingAlifold:
        def consensus_bp(self, aln, fa_, constraint=None):
            out = ali.consensus_bp(aln, fa_, constraint) if constraint \
                else ali.consensus_bp(aln, fa_)
            calls.append((aln_key(aln, constraint), np.asarray(out, np.float32)))
            return out

    eng = pipeline.Dafs(
        align_models.ProbCons(opts.th_a),
        fold_models.RNAfold(True, CUTOFF),
        opts,
        alifold_model=RecordingAlifold(),
    )
    from dafs_tpu import consistency

    sim_box = {}
    orig_sim = consistency.similarity_matrix

    def record_sim(mp, lens):
        sim_box["sim"] = orig_sim(mp, lens)
        return sim_box["sim"]

    consistency.similarity_matrix = record_sim
    try:
        out_text = eng.run(fa)
    finally:
        consistency.similarity_matrix = orig_sim

    payload = {
        "mp": np.asarray(eng.mp, np.float32),
        "bp": np.asarray(eng.bp, np.float32),
        "sim": np.asarray(sim_box["sim"], np.float32),
        "lens": np.array([len(f) for f in fa], np.int64),
        "names": np.array([f.name for f in fa]),
        "seqs": np.array([f.seq for f in fa]),
        "output": np.array(out_text),
        "n_ali_calls": np.array(len(calls)),
    }
    for i, (key, arr) in enumerate(calls):
        payload[f"ali_key_{i}"] = np.array(key)
        payload[f"ali_out_{i}"] = arr
    np.savez_compressed(OUT, **payload)
    print(f"saved {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB, "
          f"{len(calls)} alifold calls)")
    sys.stdout.write(out_text)


if __name__ == "__main__":
    main()

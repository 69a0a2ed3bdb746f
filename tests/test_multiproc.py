"""Multi-process (DCN-style) execution of the sharded stages.

SURVEY §2.5 / §5 "distributed communication backend": the posterior + PCT +
similarity stages run under jax.distributed with separate OS processes and
gloo cross-process collectives — the same mechanism that stitches per-host
meshes over DCN on a TPU pod — and must be bitwise-identical to the
single-process path (deterministic f32 reductions).  tools/multiproc.py is
the driver; see MULTIPROC_r03.json for a recorded run."""

import json
import os
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "multiproc.py")


@pytest.mark.slow
def test_two_process_bitwise_equal():
    env = dict(os.environ)
    # children set their own JAX_PLATFORMS/XLA_FLAGS; drop conftest's so the
    # parent's settings don't leak a conflicting device count
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, TOOL, "--nprocs", "2", "--local-devices", "2"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["ok"]
    assert res["processes"] == 2 and res["global_devices"] == 4
    assert res["bitwise_equal_pairhmm"]
    assert res["bitwise_equal_pct_mp"]
    assert res["bitwise_equal_pct_bp"]

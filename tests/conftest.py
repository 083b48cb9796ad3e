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

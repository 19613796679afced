import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware.  XLA_FLAGS must be set before backends initialize.
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers a tunneled TPU backend and
# overrides JAX_PLATFORMS; pin the platform through the config API, which
# wins regardless of import order.  Running tests against the remote TPU
# would execute eagerly op-by-op over the network.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"

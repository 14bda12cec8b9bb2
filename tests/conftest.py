"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

All tests run on CPU with 8 virtual devices so multi-chip sharding logic
(jax.sharding.Mesh / shard_map) is exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel) before we
# run; the config update below overrides it for the test process.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test configuration: force the CPU backend with 8 virtual devices and f64.

Tests validate numerics against f64 oracles and multi-chip sharding against a
virtual 8-device mesh (the driver separately dry-runs the multi-chip path);
real-TPU execution is covered by bench.py.
"""

import os

# neutralize the axon TPU plugin and force a fake 8-device CPU platform
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# sitecustomize may have imported jax (registering the axon TPU plugin)
# before this conftest runs, latching JAX_PLATFORMS=axon — override the live
# config, not just the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

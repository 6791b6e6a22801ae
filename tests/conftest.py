"""Test harness: force an 8-device virtual CPU platform so sharding and
collectives are exercised without TPU hardware.

Note: the environment's axon TPU plugin registers itself at interpreter
start and programmatically overrides JAX_PLATFORMS, so we must also
force the platform through jax.config, not just the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test harness: force an 8-device virtual CPU platform so sharding and
collectives are exercised without TPU hardware.

Note: the environment's axon TPU plugin registers itself at interpreter
start and programmatically overrides JAX_PLATFORMS, so we must also
force the platform through jax.config, not just the env var.
"""

import os
import pathlib

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# silence the XLA:CPU AOT loader's machine-feature LOG(ERROR) spam when
# persistent-cache entries built with prefer-no-scatter/gather hints
# (XLA-internal pseudo-features, not ISA bits) are reloaded
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is compile-dominated on the
# single-core CPU harness (measured 37s -> 14s on the fused window
# kernel), so warm reruns cut wall time roughly in half.
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

"""traffic_env_tpu: a TPU-native multi-intersection traffic-light RL
framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``samanklesaria/traffic-env``: an Intelligent-Driver-Model grid-road
simulator with ring-buffer roads and fake-leader traffic lights,
batched over thousands of lockstep env instances under ``jit``/``vmap``
and sharded over TPU meshes, feeding on-device RL learners (double
dueling DQN, DRQN, batched A3C, policy gradient, CEM) plus scripted
baselines.
"""

import os as _os

# The fused Pallas light-period kernel keeps ~31 MB of ring-buffer
# blocks resident in VMEM per core; libtpu's default 16 MB scoped-vmem
# budget rejects it at compile time.  Must be set before the TPU
# backend initializes (jax initializes lazily, so package import time
# is early enough).
_v = _os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem_limit" not in _v:
    _os.environ["LIBTPU_INIT_ARGS"] = \
        (_v + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

def _enable_compile_cache():
    """Persistent XLA compilation cache for every driver (bench,
    learning_curve, profiler, traffic_test).  The benchmark programs
    are compile-heavy (the fused Pallas window kernel alone is tens of
    seconds on the chip); caching makes repeat runs start in seconds.
    Opt out with TRAFFIC_ENV_TPU_NO_CACHE=1 (tests set their own)."""
    if _os.environ.get("TRAFFIC_ENV_TPU_NO_CACHE"):
        return
    import pathlib

    import jax
    if jax.config.jax_compilation_cache_dir:
        return  # caller (e.g. tests/conftest.py) already chose one
    # Repo checkout: keep the cache next to the package so bench /
    # tests / drivers share warm entries.  Installed package (parent
    # may be site-packages, possibly read-only or shared): fall back
    # to a per-user cache dir instead of warning-and-disabling.
    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    try:
        cache.mkdir(parents=True, exist_ok=True)
        probe = cache / ".writable"
        probe.touch()
        probe.unlink()
    except OSError:
        cache = pathlib.Path(
            _os.environ.get("XDG_CACHE_HOME",
                            pathlib.Path.home() / ".cache")
        ) / "traffic_env_tpu" / "jax"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


_enable_compile_cache()

from .config import Config, parse_flags
from .topology import GridRoad

__version__ = "0.1.0"
__all__ = ["Config", "GridRoad", "parse_flags", "__version__"]

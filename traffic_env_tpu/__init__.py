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

from .config import Config, parse_flags
from .topology import GridRoad

__version__ = "0.1.0"
__all__ = ["Config", "GridRoad", "parse_flags", "__version__"]

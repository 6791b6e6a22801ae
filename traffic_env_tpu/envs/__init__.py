from .structs import SimState, SpawnSchedule, init_state
from .core import SimFns, make_sim, ring_inc
from .batch import batch_last, init_batched_state
from .spawn import ScheduleStream, build_schedule, build_batched_schedule
from .env import EnvFns, EnvState, make_env, localize_reward

__all__ = ["SimState", "SpawnSchedule", "init_state", "SimFns", "make_sim",
           "ring_inc", "batch_last", "init_batched_state", "build_schedule",
           "build_batched_schedule", "ScheduleStream", "EnvFns", "EnvState", "make_env",
           "localize_reward"]

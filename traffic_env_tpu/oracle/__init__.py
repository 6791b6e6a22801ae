from .sim import (ARCHETYPES, CAPACITY, EPS, NPARAMS, OVERFLOW_PENALTY,
                  PASSING_REWARD, THRESH, YELLOW_TICKS, OracleSim,
                  PoissonSpawner, RegularSpawner, idm_update, ring_next,
                  X, V, L, A, DELTA, V0, B, T, S0, W)

__all__ = [
    "ARCHETYPES", "CAPACITY", "EPS", "NPARAMS", "OVERFLOW_PENALTY",
    "PASSING_REWARD", "THRESH", "YELLOW_TICKS", "OracleSim",
    "PoissonSpawner", "RegularSpawner", "idm_update", "ring_next",
    "X", "V", "L", "A", "DELTA", "V0", "B", "T", "S0", "W",
]

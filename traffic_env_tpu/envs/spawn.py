"""Arrival streams.

Two spawn sources feed the simulator:

* **Host schedule** (parity mode): the exact reference RNG call order —
  ``RandomState.exponential`` inter-arrival gaps, a throwaway
  ``randint`` archetype draw, ``choice(entrypoints)`` per car
  (traffic_env.py:159-176, 274-283) — is replayed on the host with real
  NumPy MT19937 and materialized as fixed-shape arrays indexed by the
  persistent ``global_tick``.  This sidesteps reproducing MT19937 on
  device while remaining bit-exact by construction.

* **On-device stream** (throughput mode): the same rounded-exponential
  renewal process is drawn from the env's own threefry key inside the
  jitted tick, so thousands of envs spawn independently with zero host
  traffic.  Statistically equivalent, not bit-identical.
"""

from __future__ import annotations

import numpy as np

from ..config import Config
from ..oracle.sim import PoissonSpawner, RegularSpawner
from ..topology import GridRoad
from .structs import SpawnSchedule


def build_schedule(topo: GridRoad, cfg: Config, seed, ticks: int,
                   max_per_tick: int | None = None) -> SpawnSchedule:
    """Materialize ``ticks`` worth of the arrival stream for one env.

    Uses the oracle's spawner classes directly, so the RandomState
    consumption order is identical to the reference by construction.
    """
    rand = np.random.RandomState(seed)
    spawner_cls = PoissonSpawner if cfg.poisson else RegularSpawner
    spawner = spawner_cls(rand, cfg.cars_per_sec, cfg.rate)
    counts = np.zeros(ticks, dtype=np.int32)
    rows: list[list[int]] = []
    for t in range(ticks):
        arrivals = spawner.tick(topo.entrypoints)
        counts[t] = len(arrivals)
        rows.append([road for road, _ in arrivals])
    k = max(int(counts.max()), 1)
    if max_per_tick is not None:
        assert k <= max_per_tick, (
            f"schedule burst {k} exceeds max_per_tick={max_per_tick}")
        k = max_per_tick
    roads = np.zeros((ticks, k), dtype=np.int32)
    for t, row in enumerate(rows):
        roads[t, :len(row)] = row
    return SpawnSchedule(counts=counts, roads=roads)


def build_batched_schedule(topo: GridRoad, cfg: Config, seeds,
                           ticks: int, max_per_tick: int = 16) -> SpawnSchedule:
    """Independent schedules for a batch of envs, stacked on a trailing
    batch axis (matching the simulator's batch-last layout)."""
    scheds = [build_schedule(topo, cfg, s, ticks, max_per_tick) for s in seeds]
    return SpawnSchedule(
        counts=np.stack([s.counts for s in scheds], axis=-1),
        roads=np.stack([s.roads for s in scheds], axis=-1),
    )

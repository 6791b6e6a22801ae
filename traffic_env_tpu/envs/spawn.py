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

from collections import deque
from itertools import islice

import numpy as np

from ..config import Config
from ..oracle.sim import PoissonSpawner, RegularSpawner
from ..topology import GridRoad
from .structs import SpawnSchedule


def build_schedule(topo: GridRoad, cfg: Config, seed, ticks: int,
                   max_per_tick: int | None = None,
                   archetypes: np.ndarray | None = None) -> SpawnSchedule:
    """Materialize ``ticks`` worth of the arrival stream for one env.

    Uses the oracle's spawner classes directly, so the RandomState
    consumption order is identical to the reference by construction.
    With a k>1 ``archetypes`` table the per-car randint draw is recorded
    in ``aidx`` (None for the shipped single-archetype table).
    """
    rand = np.random.RandomState(seed)
    spawner_cls = PoissonSpawner if cfg.poisson else RegularSpawner
    spawner = spawner_cls(rand, cfg.cars_per_sec, cfg.rate, archetypes)
    multi = spawner.arch.shape[0] > 1
    counts = np.zeros(ticks, dtype=np.int32)
    rows: list[list[tuple[int, int]]] = []
    for t in range(ticks):
        arrivals = spawner.tick(topo.entrypoints)
        counts[t] = len(arrivals)
        rows.append([(road, ai) for road, _, ai in arrivals])
    k = max(int(counts.max()), 1)
    if max_per_tick is not None:
        assert k <= max_per_tick, (
            f"schedule burst {k} exceeds max_per_tick={max_per_tick}")
        k = max_per_tick
    roads = np.zeros((ticks, k), dtype=np.int32)
    aidx = np.zeros((ticks, k), dtype=np.int32) if multi else None
    for t, row in enumerate(rows):
        roads[t, :len(row)] = [r for r, _ in row]
        if multi:
            aidx[t, :len(row)] = [a for _, a in row]
    return SpawnSchedule(counts=counts, roads=roads, base=np.int32(0),
                         aidx=aidx)


def build_batched_schedule(topo: GridRoad, cfg: Config, seeds,
                           ticks: int, max_per_tick: int = 16,
                           archetypes: np.ndarray | None = None
                           ) -> SpawnSchedule:
    """Independent schedules for a batch of envs, stacked on a trailing
    batch axis (matching the simulator's batch-last layout)."""
    scheds = [build_schedule(topo, cfg, s, ticks, max_per_tick, archetypes)
              for s in seeds]
    return SpawnSchedule(
        counts=np.stack([s.counts for s in scheds], axis=-1),
        roads=np.stack([s.roads for s in scheds], axis=-1),
        base=np.zeros(len(scheds), np.int32),
        aidx=(None if scheds[0].aidx is None else
              np.stack([s.aidx for s in scheds], axis=-1)),
    )


class ScheduleStream:
    """O(chunk) generator of the whole-run arrival stream.

    The reference draws arrivals from one persistent ``RandomState`` per
    env for the entire run (traffic_env.py:159-176, 250-253); a
    bit-exact soak therefore needs the *whole-run* stream, which used to
    be materialized up front (O(run) host+device memory).  This stream
    instead keeps one oracle spawner per env — with its live MT19937 —
    plus a rolling buffer of not-yet-consumed ticks, and
    :meth:`window` materializes a fixed-shape :class:`SpawnSchedule`
    chunk covering ``[gtick_i, gtick_i + chunk)`` for each env.

    Chunk shapes are constant across calls, so rebinding a fresh window
    into the (jitted) train step never retraces.  Requested ticks must
    be monotonically non-decreasing per env (re-reading the current
    window is fine — validation rollouts that are later discarded
    re-request the same base).  Generation from tick 0 is deterministic
    in the seeds, so a fresh stream after ``--restore`` fast-forwards by
    regenerating (O(run) time once, O(chunk) memory).
    """

    def __init__(self, topo: GridRoad, cfg: Config, seeds,
                 chunk_ticks: int, max_per_tick: int = 8,
                 archetypes: np.ndarray | None = None):
        self.topo = topo
        self.chunk = int(chunk_ticks)
        self.k = int(max_per_tick)
        spawner_cls = PoissonSpawner if cfg.poisson else RegularSpawner
        self._sp = [spawner_cls(np.random.RandomState(s),
                                cfg.cars_per_sec, cfg.rate, archetypes)
                    for s in seeds]
        self.multi = self._sp[0].arch.shape[0] > 1 if self._sp else False
        n = len(self._sp)
        self._next = np.zeros(n, np.int64)   # first ungenerated tick
        self._base = np.zeros(n, np.int64)   # absolute tick of buf[0]
        self._buf: list[deque] = [deque() for _ in range(n)]
        # overrun detection only applies once a window has been served;
        # the first request may fast-forward arbitrarily (restore)
        self._served = np.zeros(n, bool)

    @property
    def n_envs(self) -> int:
        return len(self._sp)

    def window(self, gticks) -> SpawnSchedule:
        """Materialize the chunk ``[gtick_i, gtick_i + chunk)`` per env
        (trailing batch axis, ``base=gticks``)."""
        gticks = np.atleast_1d(np.asarray(gticks, np.int64))
        B = len(self._sp)
        assert gticks.shape == (B,), gticks.shape
        counts = np.zeros((self.chunk, B), np.int32)
        roads = np.zeros((self.chunk, self.k, B), np.int32)
        aidx = (np.zeros((self.chunk, self.k, B), np.int32)
                if self.multi else None)
        for i in range(B):
            g = int(gticks[i])
            if g < self._base[i]:
                raise ValueError(
                    f"env {i}: schedule tick {g} already consumed "
                    f"(stream at {int(self._base[i])}); the stream is "
                    "forward-only — rebuild it to rewind")
            if self._served[i] and g > self._base[i] + self.chunk:
                # on-device indexing clamps at the window edge, so a
                # segment that outran its chunk silently replayed the
                # final tick — corrupt data, fail loudly
                raise RuntimeError(
                    f"env {i}: tick {g} is past the previous window "
                    f"[{int(self._base[i])}, "
                    f"{int(self._base[i]) + self.chunk}); a host-loop "
                    "segment consumed more ticks than chunk_ticks — "
                    "refresh more often or enlarge the chunk")
            while self._base[i] < g:
                if self._buf[i]:
                    self._buf[i].popleft()
                else:
                    # fast-forward past never-materialized ticks: the
                    # spawner must still be *consumed* per tick so the
                    # MT19937 stream stays aligned with the reference
                    self._sp[i].tick(self.topo.entrypoints)
                    self._next[i] += 1
                self._base[i] += 1
            while self._next[i] < g + self.chunk:
                arrivals = self._sp[i].tick(self.topo.entrypoints)
                if len(arrivals) > self.k:
                    raise AssertionError(
                        f"schedule burst {len(arrivals)} exceeds "
                        f"max_per_tick={self.k}")
                self._buf[i].append([(road, ai)
                                     for road, _, ai in arrivals])
                self._next[i] += 1
            self._served[i] = True
            for t, row in enumerate(islice(self._buf[i], self.chunk)):
                counts[t, i] = len(row)
                roads[t, :len(row), i] = [r for r, _ in row]
                if aidx is not None:
                    aidx[t, :len(row), i] = [a for _, a in row]
        return SpawnSchedule(counts=counts, roads=roads,
                             base=gticks.astype(np.int32), aidx=aidx)

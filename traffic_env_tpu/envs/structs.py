"""Simulator state pytrees.

The whole simulator state for one env instance is a flat pytree of
fixed-shape arrays, so it can be carried through ``lax.scan``, batched
with ``vmap`` (batch axis appended *last* so the env-batch dimension
lands on the TPU's 128-wide vector lanes), donated through jitted train
steps, and sharded over a device mesh.

Slot layout: the reference keeps CAPACITY=20 slots per road and
reserves index 0 as a mirror of index -1 so the IDM can read contiguous
slices (reference README.md:23).  The JAX core instead stores the
RING = 19 usable slots and performs leader lookup as a circular roll —
mathematically identical (JAX slot s corresponds to reference slot
s+1), with no mirror bookkeeping.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..constants import NPARAMS, RING, X
from ..topology import GridRoad


@struct.dataclass
class SimState:
    """Per-env simulator state (see module docstring for slot layout)."""
    cars: jnp.ndarray        # f32[R, NPARAMS, RING] car parameter blocks
    leading: jnp.ndarray     # i32[R] ring index of the fake-leader slot
    lastcar: jnp.ndarray     # i32[R] ring index of the most recent car
    phase: jnp.ndarray       # i32[I] current light phase per intersection
    elapsed: jnp.ndarray     # i32[I] ticks since last phase change
    passed: jnp.ndarray      # i32[Rt] cars through the intersection this tick
    detected: jnp.ndarray    # i32[Rt] cars within 10m of the stop line (stale-capable)
    waiting: jnp.ndarray     # i32[Rt] accumulated stopped-car counts
    passed_dst: jnp.ndarray  # bool[I] any passing since last remi reward
    rewards: jnp.ndarray     # f32[I] per-intersection reward accumulator
    steps: jnp.ndarray       # i32[] per-episode tick counter (resets)
    global_tick: jnp.ndarray  # i32[] monotonic tick cursor (persists across resets)
    spawn_gap: jnp.ndarray   # i32[] remaining empty ticks in the arrival stream
    key: jnp.ndarray         # u32[2] raw threefry key data (raw so the state
                             # pytree stays selectable/vmappable uniformly)
    done: jnp.ndarray        # bool[] overflow flag
    # validate-mode telemetry: histogram (in ticks) of completed trip
    # durations for cars leaving the map (reference advance_hack,
    # traffic_env.py:137-157 records (tick - w_spawn)/2 seconds).  None
    # outside validate mode; accumulates monotonically (drain by
    # differencing), so reset keeps the pytree structure stable.
    trip_hist: jnp.ndarray | None = None


@struct.dataclass
class SpawnSchedule:
    """Host-precomputed arrival stream (bit-exact parity mode).

    Indexed by ``SimState.global_tick - base`` so the stream persists
    across episode resets exactly like the reference's generator
    (traffic_env.py:250-253).  ``base`` is the absolute tick of row 0:
    0 for whole-run schedules; the chunk offset when a ScheduleStream
    (spawn.py) materializes the stream in O(chunk) windows."""
    counts: jnp.ndarray      # i32[T] cars arriving at each tick
    roads: jnp.ndarray       # i32[T, K] entry road ids (row-padded with 0)
    base: jnp.ndarray | int = 0   # absolute tick of row 0 (per-env when batched)
    # archetype index per arrival (the reference's randint draw,
    # traffic_env.py:164).  None when the table has one archetype —
    # every consumer then compiles archetype-0 parameters.
    aidx: jnp.ndarray | None = None   # i32[T, K] or None


def init_state(topo: GridRoad, key) -> SimState:
    """A fresh, empty state (pre-reset).  ``key`` may be a typed PRNG
    key or raw uint32[2] key data."""
    import jax

    if hasattr(key, "dtype") and jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    R, Rt, I = topo.roads, topo.train_roads, topo.intersections
    cars = np.zeros((R, NPARAMS, RING), dtype=np.float32)
    cars[:, X, 0] = np.inf
    return SimState(
        cars=jnp.asarray(cars),
        leading=jnp.zeros(R, jnp.int32),
        lastcar=jnp.zeros(R, jnp.int32),
        phase=jnp.zeros(I, jnp.int32),
        elapsed=jnp.zeros(I, jnp.int32),
        passed=jnp.zeros(Rt, jnp.int32),
        detected=jnp.zeros(Rt, jnp.int32),
        waiting=jnp.zeros(Rt, jnp.int32),
        passed_dst=jnp.zeros(I, bool),
        rewards=jnp.zeros(I, jnp.float32),
        steps=jnp.int32(0),
        global_tick=jnp.int32(0),
        spawn_gap=jnp.int32(-1),   # -1: no gap drawn yet (lazy, like the ref)
        key=jnp.asarray(key, jnp.uint32),
        done=jnp.asarray(False),
    )

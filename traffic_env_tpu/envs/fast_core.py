"""The dense TPU simulator core: the throughput path.

Same trajectory semantics as envs/core.py (and therefore the NumPy
oracle) but engineered for the TPU memory system.  All code here is
written unbatched and batched with ``vmap`` (trailing batch axis); the
design rules are about what vmap turns each op into:

* **No dynamic scatters/gathers.**  XLA lowers vmapped per-lane dynamic
  scatter/gather to serialized loops on TPU (measured: the gather-based
  hand-off ran at 0.03M ticks/s vs 3M for the elementwise IDM).  Every
  update here is a masked plane select with one-hot masks from
  ring-distance arithmetic; every per-road scalar extraction is a
  masked reduction over the 19-slot axis; every per-intersection
  scoring accumulation is a one-hot reduction over the 48-road axis
  (exact: rewards are multiples of 0.5/10, associativity-safe).
* **Compact car state.**  Every car shares the single reference
  archetype (traffic_env.py:35-43), so only x / v / w (position, speed,
  spawn tick) vary per car; the seven other IDM parameters are compiled
  constants.  The fake-leader car differs (l = v = 0): its slot is ring
  distance 0, so the first follower (distance 1) selects l=0 by mask —
  bit-identical values, one third the memory traffic.
* **Single-pass hand-off.**  The crossing *prefix* of each road's queue
  (cars past the road end, front-first, as the reference's while-loop
  pops them) transfers at once: pointers advance by the prefix count,
  chained spawn-position clamps run as short scalar recurrences over
  (roads,) values, pops/pushes are two masked plane writes.
  Order-equivalent to the reference's road-ordered loop because each
  road has a unique feeder (GridRoad in-degree <= 1) and a transferred
  car can never re-cross in the same tick (max displacement/tick <<
  road length); full-buffer ties follow the feeder-index rule.

Bit-exactness: the float op sequence per car is identical to the
oracle's (same FMA-contraction guards as envs/core.py), so this core
passes the same exact-trajectory tests (tests/test_fast_core.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..constants import (ARCHETYPES, DETECT_RANGE, EPS, OVERFLOW_PENALTY,
                         PASSING_REWARD, RING, THRESH, YELLOW_TICKS,
                         X, V, L, A, DELTA, V0, B, T, S0, W)
from ..topology import GridRoad
from .core import SimFns
from .structs import SimState, SpawnSchedule

I32 = jnp.int32
F32 = jnp.float32
INF = jnp.float32(np.inf)
FMAX = np.finfo(np.float32).max
CX, CV, CW = 0, 1, 2  # compact car rows

# Archetype-0 constants of the shipped table (traffic_env.py:35-43);
# the kernel path imports these.  make_sim_fast takes an ``archetypes``
# table and compiles per-car one-hot parameter selects when it has more
# than one row (the reference's extension point, traffic_env.py:32-43).
AR = ARCHETYPES[0]
C_V0, C_A, C_B = np.float32(AR[V0]), np.float32(AR[A]), np.float32(AR[B])
C_T, C_S0, C_L = np.float32(AR[T]), np.float32(AR[S0]), np.float32(AR[L])
C_SPAWN_V, C_SPAWN_X = np.float32(AR[V]), np.float32(AR[X])
assert float(AR[DELTA]) == 4.0
CAI = 3  # archetype-index car row, present only for k>1 tables


def n_car_rows(archetypes=None) -> int:
    """Compact rows: x/v/w, plus the archetype index for k>1 tables."""
    k = (ARCHETYPES if archetypes is None else archetypes).shape[0]
    return 4 if k > 1 else 3


def nn_(p):
    """max(p, 0) — blocks XLA's FMA contraction on nonneg products."""
    return jnp.maximum(p, F32(0))


def fin_(p):
    """Finite clamp — blocks FMA contraction on signed products."""
    return jax.lax.clamp(F32(-FMAX), p, F32(FMAX))


def init_state_compact(topo: GridRoad, key, n_trip_bins: int = 0,
                       rows: int = 3) -> SimState:
    """Compact-state twin of structs.init_state (cars rows: x, v, w,
    plus the archetype index when ``rows`` is 4).  ``n_trip_bins > 0``
    attaches the validate-mode trip-time histogram (reference
    advance_hack telemetry)."""
    if hasattr(key, "dtype") and jax.dtypes.issubdtype(
            key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    R, Rt, I = topo.roads, topo.train_roads, topo.intersections
    cars = np.zeros((R, rows, RING), dtype=np.float32)
    cars[:, CX, 0] = np.inf
    return SimState(
        cars=jnp.asarray(cars),
        leading=jnp.zeros(R, I32), lastcar=jnp.zeros(R, I32),
        phase=jnp.zeros(I, I32), elapsed=jnp.zeros(I, I32),
        passed=jnp.zeros(Rt, I32), detected=jnp.zeros(Rt, I32),
        waiting=jnp.zeros(Rt, I32),
        passed_dst=jnp.zeros(I, bool), rewards=jnp.zeros(I, jnp.float32),
        steps=jnp.int32(0), global_tick=jnp.int32(0),
        spawn_gap=jnp.int32(-1), spawn_backlog=jnp.int32(0),
        key=jnp.asarray(key, jnp.uint32),
        done=jnp.asarray(False),
        trip_hist=(jnp.zeros(n_trip_bins, I32) if n_trip_bins else None))


def make_sim_fast(topo: GridRoad, cfg: Config,
                  on_device_spawns: bool = True,
                  max_spawns_per_tick: int = 8,
                  max_crossings_per_tick: int = 4,
                  archetypes: np.ndarray | None = None) -> SimFns:
    R, Rt, I = topo.roads, topo.train_roads, topo.intersections
    S = RING

    # Archetype table.  k == 1 (the shipped table) compiles the seven
    # non-(x,v,w) params to constants; k > 1 adds a per-car index row
    # (CAI) and selects params with one-hot where-chains — elementwise,
    # so vmap keeps every op a plane op (no gathers).
    arch_np = (ARCHETYPES if archetypes is None
               else np.asarray(archetypes, np.float32))
    k_arch = arch_np.shape[0]
    multi = k_arch > 1
    NROWS = 4 if multi else 3
    assert np.all(arch_np[:, DELTA] == 4.0), \
        "fast core requires delta == 4 in every archetype (two-squaring " \
        "free-flow term; see oracle.sim.idm_update)"
    A0 = arch_np[0]
    C_V0, C_A, C_B = (np.float32(A0[V0]), np.float32(A0[A]),
                      np.float32(A0[B]))
    C_T, C_S0, C_L = (np.float32(A0[T]), np.float32(A0[S0]),
                      np.float32(A0[L]))
    C_SPAWN_V, C_SPAWN_X = np.float32(A0[V]), np.float32(A0[X])

    def sel_p(ai, col):
        """Per-car param from the archetype-index plane/vector ``ai``:
        one-hot where-chain over the k compiled constants."""
        out = jnp.full(jnp.shape(ai), np.float32(arch_np[0, col]), F32)
        for j in range(1, k_arch):
            out = jnp.where(ai == F32(j), np.float32(arch_np[j, col]), out)
        return out
    length = np.float32(topo.length)
    rate = np.float32(cfg.rate)
    lam = np.float32(1.0 / (cfg.cars_per_sec * cfg.rate))
    Kc = max_crossings_per_tick
    Ks = max_spawns_per_tick

    dest_t = topo.dest[:Rt]
    pg_t = topo.phase_group[:Rt]
    nxt_t = topo.nxt[:Rt]
    prev = topo.prev
    prev_c = np.maximum(prev, 0)
    has_feeder = prev >= 0
    feeder_first = has_feeder & (prev < np.arange(R))
    is_train = np.arange(R) < Rt
    entry = topo.entrypoints
    E = len(entry)

    slots = jnp.arange(S)[None, :]                 # (1, S)
    # one-hot scoring matrices: (I, R) / (I, Rt) / (I, E)
    dest1h = (topo.dest[None, :] == np.arange(I)[:, None])
    dest1h_t = dest1h[:, :Rt]
    dest1h_e = dest1h[:, entry]

    def seg_add(rewards, per_road, onehot):
        """rewards[i] += sum over roads with dest i (one-hot reduce;
        exact for the multiple-of-0.5 reward increments)."""
        return rewards + jnp.sum(jnp.where(jnp.asarray(onehot),
                                           per_road[None, :], F32(0)),
                                 axis=1)

    def dist_from(idx):
        """(R, S) ring distance of every slot from per-road index."""
        return (slots - idx[:, None]) % S

    def pick(plane, mask):
        """Extract one value per road from a (R, S) plane: max over the
        masked slot (exactly one slot is selected; -inf elsewhere)."""
        return jnp.max(jnp.where(mask, plane, -INF), axis=1)

    # ------------------------------------------------------------------
    # lights (traffic_env.py:80-94)
    # ------------------------------------------------------------------
    def update_lights(cars, leading, lastcar, phase, elapsed):
        x = cars[:, CX]
        red_or_yellow = ((pg_t == phase[dest_t])
                         | (elapsed[dest_t] < YELLOW_TICKS))
        last_mask = dist_from(lastcar) == 0          # (R, S)
        next_x = pick(x[nxt_t], last_mask[nxt_t])    # (Rt,)
        next_empty = leading[nxt_t] == lastcar[nxt_t]
        fake_x = jnp.where(red_or_yellow, length,
                           jnp.where(next_empty, INF, next_x + length))
        fake_full = jnp.concatenate([fake_x, jnp.zeros(R - Rt, F32)])
        write = (dist_from(leading) == 0) & jnp.asarray(is_train)[:, None]
        return cars.at[:, CX].set(
            jnp.where(write, fake_full[:, None], x))

    # ------------------------------------------------------------------
    # IDM integration (traffic_env.py:50-62, 187-212), compact
    # ------------------------------------------------------------------
    def integrate(cars, leading, lastcar, waiting, detected, one):
        x, v = cars[:, CX], cars[:, CV]
        ld_x = jnp.roll(x, 1, axis=1)
        ld_v = jnp.roll(v, 1, axis=1)
        d = dist_from(leading)
        ncars = (lastcar - leading) % S
        mask = (d >= 1) & (d <= ncars[:, None])

        if multi:
            # per-car params from the index row; the leader's length
            # rides the same roll as ld_x/ld_v.  Fake leader has l = 0.
            ai = cars[:, CAI]
            p_a, p_b = sel_p(ai, A), sel_p(ai, B)
            p_t, p_s0, p_v0 = sel_p(ai, T), sel_p(ai, S0), sel_p(ai, V0)
            ld_l = jnp.where(d == 1, F32(0),
                             jnp.roll(sel_p(ai, L), 1, axis=1))
            # ``one`` guards as in the k == 1 branch: the selects fold
            # to constants per branch, and a runtime multiply stops XLA
            # strength-reducing the divisions
            den = (2 * jnp.sqrt(p_a * p_b)) * one
            v0 = p_v0 * one
        else:
            # fake leader has l = 0; every real leader is the archetype
            ld_l = jnp.where(d == 1, F32(0), C_L)
            # ``one`` is a runtime 1.0: multiplying the constant
            # divisors by it stops XLA from strength-reducing
            # division-by-constant into reciprocal multiplication
            # (1-2 ULP off the oracle's division).
            den = (2 * jnp.sqrt(C_A * C_B)) * one
            v0 = C_V0 * one
            p_a, p_t, p_s0 = C_A, C_T, C_S0
        desired = p_s0 + jnp.maximum(
            F32(0), nn_(v * p_t) + v * (v - ld_v) / den)
        gap = ld_x - x - ld_l
        free_flow = nn_(jnp.square(jnp.square(v / v0)))
        dv = p_a * (1 - free_flow - nn_(jnp.square(desired / (gap + EPS))))
        dvr = dv * rate
        dx = nn_(rate * v) + fin_(F32(0.5) * dvr * rate)
        new_x = jnp.where(mask, x + nn_((dx > 0) * dx), x)
        new_v = jnp.where(mask, jnp.maximum(F32(0), v + fin_(dvr)), v)
        cars = cars.at[:, CX].set(new_x).at[:, CV].set(new_v)

        wrapped = (leading > lastcar)[:, None]
        in_second = wrapped & (slots <= lastcar[:, None])
        metric = jnp.where(in_second, new_x, new_v)  # ref bug kept: x-test
        wait_inc = jnp.sum(mask & (metric < THRESH), axis=1, dtype=I32)[:Rt]
        det_cnt = jnp.sum(mask & (new_x > length - DETECT_RANGE), axis=1,
                          dtype=I32)[:Rt]
        occupied = (ncars > 0)[:Rt]
        waiting = waiting + jnp.where(occupied, wait_inc, 0)
        detected = jnp.where(occupied, det_cnt, detected)
        decel_cnt = jnp.sum(mask & (dvr < 0), axis=1, dtype=I32)[:Rt] \
            if cfg.decel_penalty else None
        return cars, waiting, detected, decel_cnt

    def _apply_decel(rewards, cnt, one):
        """Latent DECEL_PENALTY shaping (traffic_env.py:196-198,204-205).
        k/10 is non-dyadic so add ORDER is part of the bit contract:
        one f32 add per direction block, ascending — per rewards slot
        this equals the oracle's ascending-road sequential loop.  (The
        one-hot seg_add reduce cannot be used here: its reduction
        order is not the oracle's.)"""
        assert np.array_equal(np.asarray(dest_t),
                              np.tile(np.arange(I), 4))
        for d4 in range(4):
            blk = jax.lax.slice_in_dim(cnt, d4 * I, (d4 + 1) * I)
            rewards = rewards + blk.astype(F32) / (F32(10) * one)
        return rewards

    # ------------------------------------------------------------------
    # hand-off (traffic_env.py:96-157), dense single pass
    # ------------------------------------------------------------------
    def advance(cars, leading, lastcar, passed, rewards, passed_dst,
                trip_hist, steps):
        x, v, w = cars[:, CX], cars[:, CV], cars[:, CW]
        d = dist_from(leading)
        ncars = (lastcar - leading) % S
        follower = (d >= 1) & (d <= ncars[:, None])
        beyond = follower & (x > length)

        # crossing prefix per road (front-first, as the while loop pops)
        run = None
        prefix = []
        for k in range(1, Kc + 1):
            ck = jnp.any(beyond & (d == k), axis=1)
            run = ck if run is None else run & ck
            prefix.append(run)
        count = sum(p.astype(I32) for p in prefix)          # (R,)

        # k-th crosser's rows
        x_k = [pick(x, d == k) - length for k in range(1, Kc + 1)]
        v_k = [pick(v, d == k) for k in range(1, Kc + 1)]
        w_k = [pick(w, d == k) for k in range(1, Kc + 1)]
        if multi:
            aip = cars[:, CAI]
            ai_k = [pick(aip, d == k) for k in range(1, Kc + 1)]

        if trip_hist is not None:
            # cars crossing the end of an exit road leave the map:
            # record trip duration in ticks (advance_hack records
            # (tick - w_spawn)/2 seconds; seconds = ticks * rate)
            nb = trip_hist.shape[0]
            bins = jnp.arange(nb, dtype=I32)
            exit_m = jnp.asarray(~np.asarray(is_train))
            for k in range(Kc):
                crossed = prefix[k] & exit_m                   # (R,)
                trip = jnp.clip(
                    steps - jnp.nan_to_num(
                        w_k[k], posinf=0.0, neginf=0.0).astype(I32),
                    0, nb - 1)
                add = jnp.sum(((bins[:, None] == trip[None, :])
                               & crossed[None, :]).astype(I32), axis=1)
                trip_hist = trip_hist + add

        # pops: vacated slots [1..count] inherit the fake-leader rows
        lead_mask = d == 0
        fake_rows = jnp.stack(
            [pick(cars[:, r], lead_mask) for r in range(NROWS)], axis=1)
        pop_mask = (d >= 1) & (d <= count[:, None])
        cars = jnp.where(pop_mask[:, None], fake_rows[:, :, None], cars)
        new_leading = (leading + count) % S

        # receiving side (static feeder map; exit-road crossers vanish)
        thr = count * jnp.asarray(is_train, I32)
        count_in = jnp.where(jnp.asarray(has_feeder), thr[prev_c], 0)
        cap_lead = jnp.where(jnp.asarray(feeder_first), leading, new_leading)
        free = (cap_lead - 1 - lastcar) % S
        accepted = jnp.minimum(count_in, free)
        n_overflow = count_in - accepted
        overflow = jnp.any(n_overflow > 0)
        rewards = seg_add(
            rewards, -OVERFLOW_PENALTY * n_overflow.astype(F32), dest1h)

        # chained clamp of incoming positions against the receiver tail
        # (add_car, traffic_env.py:100-103: the floor subtracts the
        # TAIL car's l and s0; each accepted crosser becomes the tail)
        tail_x = pick(x, dist_from(lastcar) == 0)
        occ_for_tail = jnp.where(jnp.asarray(feeder_first),
                                 leading != lastcar,
                                 new_leading != lastcar)
        # two separate subtractions, matching the oracle's
        # ``tail[X] - tail[L] - tail[S0]`` rounding order exactly.
        # ``one_s`` is a runtime 1.0: with compiled-constant l/s0 (the
        # k == 1 path) XLA folds (x - 4) - 1 into x - 5 — one ULP off
        # the oracle's two-step chain — unless the first operand is
        # runtime.
        one_s = jnp.where(steps >= 0, F32(1), F32(2))
        if multi:
            tail_ai = pick(aip, dist_from(lastcar) == 0)
            tail_f = tail_x - sel_p(tail_ai, L) - sel_p(tail_ai, S0)
        else:
            tail_f = tail_x - C_L * one_s - C_S0
        floor = jnp.where(occ_for_tail, tail_f, INF)
        xs_in, vs_in, ws_in, ais_in = [], [], [], []
        for k in range(Kc):
            xk = jnp.minimum(x_k[k][prev_c], floor)
            xs_in.append(xk)
            vs_in.append(v_k[k][prev_c])
            ws_in.append(w_k[k][prev_c])
            if multi:
                aik = ai_k[k][prev_c]
                ais_in.append(aik)
                floor = xk - sel_p(aik, L) - sel_p(aik, S0)
            else:
                floor = xk - C_L * one_s - C_S0

        # pushes: slots at distance [1..accepted] behind the tail
        dl = dist_from(lastcar)
        push_mask = (dl >= 1) & (dl <= accepted[:, None])
        xp = jnp.zeros_like(x)
        vp = jnp.zeros_like(x)
        wp = jnp.zeros_like(x)
        ap = jnp.zeros_like(x) if multi else None
        for k in range(Kc):
            m = dl == (k + 1)
            xp = jnp.where(m, xs_in[k][:, None], xp)
            vp = jnp.where(m, vs_in[k][:, None], vp)
            wp = jnp.where(m, ws_in[k][:, None], wp)
            if multi:
                ap = jnp.where(m, ais_in[k][:, None], ap)
        rows = [xp, vp, wp] + ([ap] if multi else [])
        cars = jnp.where(push_mask[:, None],
                         jnp.stack(rows, axis=1), cars)
        new_lastcar = (lastcar + accepted) % S

        # scoring (traffic_env.py:127-129)
        passed = passed + thr[:Rt]
        pd = passed_dst | jnp.any(
            jnp.where(jnp.asarray(dest1h_t), (thr[:Rt] > 0)[None, :],
                      False), axis=1)
        if float(PASSING_REWARD) != 0.0:
            rewards = seg_add(rewards, PASSING_REWARD * thr.astype(F32),
                              dest1h)
        return (cars, new_leading, new_lastcar, passed, rewards, pd,
                overflow, trip_hist)

    # ------------------------------------------------------------------
    # spawning, dense over the entry-road block
    # ------------------------------------------------------------------
    entry_index = np.zeros(R, np.int32)
    entry_index[entry] = np.arange(E)

    def _spawn_common(cars, leading, lastcar, rewards, steps_f,
                      road_1h, n_spawn, ai_row=None):
        """Insert up to Ks cars this tick.  ``road_1h``: (Ks, E) bool
        one-hot over entry roads per attempt; ``n_spawn``: i32 count;
        ``ai_row``: i32 (Ks,) archetype index per attempt (k>1 only)."""
        ce = cars[entry]                             # (E, NROWS, S) static
        xe = ce[:, CX]
        lead_e, last_e = leading[entry], lastcar[entry]
        d_last = (slots - last_e[:, None]) % S
        tail_x = jnp.max(jnp.where(d_last == 0, xe, -INF), axis=1)
        has_tail = ((last_e - lead_e) % S) > 0
        # runtime 1.0: stops XLA folding the constant (x - l) - s0
        # chain into x - (l + s0) (one ULP off the oracle)
        one_s = jnp.where(steps_f >= 0, F32(1), F32(2))
        if multi:
            aie = ce[:, CAI]
            tail_ai = jnp.max(jnp.where(d_last == 0, aie, -INF), axis=1)
            tail_f = tail_x - sel_p(tail_ai, L) - sel_p(tail_ai, S0)
        else:
            tail_f = tail_x - C_L * one_s - C_S0
        floor_e = jnp.where(has_tail, tail_f, INF)
        free_e = (lead_e - 1 - last_e) % S

        placed = jnp.zeros(E, I32)
        overflow = jnp.asarray(False)
        xvals, accepted, ai_f = [], [], []
        for j in range(Ks):
            attempt = road_1h[j] & (j < n_spawn)        # (E,) bool
            full = placed >= free_e
            ok = attempt & ~full
            if multi:
                aij = ai_row[j].astype(F32)
                ai_f.append(aij)
                xj = jnp.minimum(sel_p(aij, X), floor_e)
                next_floor = xj - sel_p(aij, L) - sel_p(aij, S0)
            else:
                xj = jnp.minimum(C_SPAWN_X, floor_e)
                next_floor = xj - C_L * one_s - C_S0
            xvals.append(xj)
            accepted.append(ok)
            floor_e = jnp.where(ok, next_floor, floor_e)
            ovf_j = attempt & full
            overflow = overflow | jnp.any(ovf_j)
            rewards = seg_add(rewards,
                              jnp.where(ovf_j, -OVERFLOW_PENALTY, F32(0)),
                              dest1h_e)
            placed = placed + ok.astype(I32)

        xplane = jnp.zeros_like(xe)
        vplane = (None if not multi
                  else jnp.zeros_like(xe))
        aiplane = jnp.zeros_like(xe) if multi else None
        for j in range(Ks):
            pos = sum(a.astype(I32) for a in accepted[:j + 1])  # (E,)
            m = (d_last == pos[:, None]) & accepted[j][:, None]
            xplane = jnp.where(m, xvals[j][:, None], xplane)
            if multi:
                vplane = jnp.where(m, sel_p(ai_f[j], V), vplane)
                aiplane = jnp.where(m, ai_f[j], aiplane)
        pm = (d_last >= 1) & (d_last <= placed[:, None])
        rows = [xplane,
                vplane if multi else jnp.full_like(xplane, C_SPAWN_V),
                jnp.full_like(xplane, steps_f)]
        if multi:
            rows.append(aiplane)
        newrows = jnp.stack(rows, axis=1)
        ce = jnp.where(pm[:, None], newrows, ce)
        cars = cars.at[entry].set(ce)
        lastcar = lastcar.at[entry].set((last_e + placed) % S)
        return cars, lastcar, rewards, overflow

    # regular-mode constants (traffic_env.py:166-176): a batch of
    # ceil(cars_per_tick) cars every round(1/cars_per_tick) ticks
    # (every tick when the interval rounds to zero)
    cars_per_tick = float(cfg.cars_per_sec * cfg.rate)
    reg_tpc = int(round(1.0 / cars_per_tick)) if cars_per_tick else 0
    reg_batch = int(np.ceil(cars_per_tick))
    if on_device_spawns and not cfg.poisson and reg_batch > Ks:
        # regular mode has no deferral queue (batches are deterministic)
        # — refuse a silently-lossy cap instead of dropping cars
        raise ValueError(
            f"regular-mode batch {reg_batch} exceeds max_spawns_per_tick"
            f"={Ks}; raise the cap to at least the batch size")

    # Device-spawn cap discipline (SURVEY §7 hard part (c)): arrival
    # GENERATION (the rounded-exponential renewal chain, which must
    # consume one gap unit per tick exactly like the reference's drain
    # loop, traffic_env.py:274-283) is decoupled from PLACEMENT (the
    # expensive car-plane writes, capped at Ks/tick).  Generated
    # arrivals beyond the cap queue in SimState.spawn_backlog and place
    # on following ticks — a timing-only deferral that preserves the
    # long-run rate whenever the mean rate is under Ks/tick.  Without
    # the queue, a saturated tick stalls the renewal clock (no gap unit
    # consumed) and the rate silently sags — ~23% at a binding cap,
    # measured in tests/test_spawn_cap.py, which now pins the capped
    # device rate to the oracle's.  Generation itself unrolls
    # Kg >= max(Ks, 8) slots/tick (scalar ops, nearly free), so its own
    # saturation needs a >Kg same-tick burst: P ~ 1e-8 at benchmark
    # rates.
    Kg = max(Ks, 8)

    def spawn_device(state: SimState, _sched):
        key = jax.random.wrap_key_data(state.key)
        gap = state.spawn_gap
        backlog = state.spawn_backlog
        road_rows, ais, n = [], [], jnp.int32(0)
        if cfg.poisson:
            key, k0 = jax.random.split(key)
            gap = jnp.where(
                gap < 0,
                jnp.round(jax.random.exponential(k0, dtype=F32) * lam)
                .astype(I32), gap)
            # generation: emit while the pending gap is zero
            # (same split sequence as core._spawn_on_device so fast
            # and exact stay bit-identical on-device)
            for _ in range(Kg):
                key, kg = jax.random.split(key)
                en = gap == 0
                backlog = backlog + en.astype(I32)
                new_gap = jnp.round(
                    jax.random.exponential(kg, dtype=F32) * lam).astype(I32)
                gap = jnp.where(en, new_gap, gap)
            gap = gap - (gap > 0)   # the empty tick ending the drain
            # placement: up to Ks queued arrivals get entry roads
            n = jnp.minimum(backlog, Ks)
            backlog = backlog - n
            for _ in range(Ks):
                key, k1 = jax.random.split(key)
                ridx = jax.random.randint(k1, (), 0, E)
                road_rows.append(jnp.arange(E) == ridx)
                if multi:
                    key, k3 = jax.random.split(key)
                    ais.append(jax.random.randint(k3, (), 0, k_arch))
        else:
            due = ((state.global_tick % reg_tpc) == 0) if reg_tpc                 else jnp.asarray(True)
            for j in range(min(reg_batch, Ks)):
                key, k1 = jax.random.split(key)
                ridx = jax.random.randint(k1, (), 0, E)
                road_rows.append(jnp.arange(E) == ridx)
                ais.append(jnp.int32(0))   # regular: archetypes[0] only
                n = n + due.astype(I32)
            for _ in range(Ks - len(road_rows)):
                road_rows.append(jnp.zeros(E, bool))
                ais.append(jnp.int32(0))
        cars, lastcar, rewards, ovf = _spawn_common(
            state.cars, state.leading, state.lastcar, state.rewards,
            state.steps.astype(F32), jnp.stack(road_rows), n,
            jnp.stack(ais) if multi else None)
        return state.replace(cars=cars, lastcar=lastcar, rewards=rewards,
                             key=jax.random.key_data(key),
                             spawn_gap=gap, spawn_backlog=backlog), ovf

    def spawn_schedule(state: SimState, sched: SpawnSchedule):
        t = state.global_tick - sched.base
        count = jnp.minimum(sched.counts[t], Ks)
        roads_row = sched.roads[t]                      # (K,)
        k = sched.roads.shape[-1]
        eidx = jnp.asarray(entry_index)[roads_row]
        rows = [jnp.arange(E) == eidx[j] for j in range(min(k, Ks))]
        rows += [jnp.zeros(E, bool)] * (Ks - len(rows))
        ai_row = None
        if multi:
            assert sched.aidx is not None, \
                "k>1 archetypes need schedule aidx (spawn.build_schedule)"
            arow = sched.aidx[t]
            ai_row = jnp.stack(
                [arow[j] if j < k else jnp.int32(0) for j in range(Ks)])
        cars, lastcar, rewards, ovf = _spawn_common(
            state.cars, state.leading, state.lastcar, state.rewards,
            state.steps.astype(F32), jnp.stack(rows), count, ai_row)
        return state.replace(cars=cars, lastcar=lastcar,
                             rewards=rewards), ovf

    _spawn = spawn_device if on_device_spawns else spawn_schedule

    # ------------------------------------------------------------------
    # tick / reset / views (same surface as envs.core.make_sim)
    # ------------------------------------------------------------------
    def tick(state: SimState, action,
             sched: Optional[SpawnSchedule] = None) -> SimState:
        action = jnp.asarray(action).astype(I32)
        if cfg.learn_switch:
            change = action
            phase = jnp.logical_xor(state.phase, action).astype(I32)
        else:
            change = jnp.logical_xor(state.phase, action).astype(I32)
            phase = action
        elapsed = (state.elapsed + 1) * (change == 0)
        state = state.replace(phase=phase, elapsed=elapsed,
                              rewards=jnp.zeros_like(state.rewards),
                              passed=jnp.zeros_like(state.passed))
        state, ovf_spawn = _spawn(state, sched)
        cars = update_lights(state.cars, state.leading, state.lastcar,
                             phase, elapsed)
        one = jnp.where(state.steps >= 0, F32(1), F32(2))
        cars, waiting, detected, decel_cnt = integrate(
            cars, state.leading, state.lastcar, state.waiting,
            state.detected, one)
        if cfg.decel_penalty:
            # before advance's contributions (reference move_cars ->
            # advance order)
            state = state.replace(
                rewards=_apply_decel(state.rewards, decel_cnt, one))
        (cars, leading, lastcar, passed, rewards, passed_dst, ovf,
         trip_hist) = \
            advance(cars, state.leading, state.lastcar, state.passed,
                    state.rewards, state.passed_dst,
                    state.trip_hist, state.steps)
        return state.replace(
            cars=cars, leading=leading, lastcar=lastcar, passed=passed,
            rewards=rewards, passed_dst=passed_dst, waiting=waiting,
            detected=detected, steps=state.steps + 1,
            global_tick=state.global_tick + 1,
            done=ovf_spawn | ovf, trip_hist=trip_hist)

    def reset(state: SimState, phase=None) -> SimState:
        key = state.key
        if phase is None:
            tkey, sub = jax.random.split(jax.random.wrap_key_data(key))
            key = jax.random.key_data(tkey)
            phase = jax.random.randint(sub, (I,), 0, 2, dtype=I32)
        cars = state.cars.at[:, :, 0].set(F32(0)).at[:, CX, 0].set(INF)
        return state.replace(
            cars=cars,
            leading=jnp.zeros_like(state.leading),
            lastcar=jnp.zeros_like(state.lastcar),
            phase=jnp.asarray(phase).astype(I32),
            elapsed=jnp.zeros_like(state.elapsed),
            passed=jnp.zeros_like(state.passed),
            waiting=jnp.zeros_like(state.waiting),
            passed_dst=jnp.zeros_like(state.passed_dst),
            rewards=jnp.zeros_like(state.rewards),
            steps=jnp.int32(0), key=key, done=jnp.asarray(False))

    def init_phase(key):
        return jax.random.randint(key, (I,), 0, 2, dtype=I32)

    def obs(state: SimState):
        return jnp.concatenate([state.passed, state.detected, state.phase,
                                state.elapsed]).astype(I32)

    def remi(state: SimState):
        green = pg_t != state.phase[dest_t]
        waited = state.waiting > 0
        pd = state.passed_dst[dest_t]
        minus = waited & ~green & ~pd
        plus = pd & green & ~waited
        contrib = jnp.where(minus, F32(-0.5),
                            jnp.where(plus, F32(0.5), F32(0)))
        rewards = seg_add(jnp.zeros(I, F32), contrib, dest1h_t)
        state = state.replace(waiting=jnp.zeros_like(state.waiting),
                              passed_dst=jnp.zeros_like(state.passed_dst),
                              rewards=rewards)
        return state, rewards

    def cars_per_road(state: SimState):
        return (state.lastcar - state.leading) % S

    def cars_on_roads(state: SimState):
        per_dir = cars_per_road(state)[:Rt].reshape(4, topo.m, topo.n)
        return jnp.transpose(per_dir, (1, 2, 0))

    return SimFns(tick=tick, reset=reset, obs=obs, remi=remi,
                  cars_per_road=cars_per_road, cars_on_roads=cars_on_roads,
                  init_phase=init_phase)

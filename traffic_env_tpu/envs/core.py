"""The jitted simulator core.

``make_sim(topo, cfg)`` builds a set of pure functions closed over the
static topology (baked into the XLA program as constants):

* ``tick(state, action[, schedule]) -> state`` — one IDM simulation
  tick: phase bookkeeping, car spawning, fake-leader light update, the
  fully vectorized IDM integration over every (road, slot) pair, and
  the road-ordered hand-off of cars that crossed their road end.
* ``reset(state, phase) -> state`` — episode reset preserving the
  arrival stream, stale detectors, and PRNG state.
* ``obs(state)`` / ``remi(state)`` / ``cars_per_road(state)`` — views.

Everything is float32/int32 with static shapes; a batch axis may be
appended *last* on every leaf via ``jax.vmap(fn, in_axes=-1,
out_axes=-1)`` so that the env batch occupies TPU vector lanes (see
batch.py).

Semantics follow the NumPy oracle (traffic_env_tpu.oracle.sim), which
in turn documents each reference behavior it reproduces.  Design notes:

* The reference integrates each road's cars with per-road array slices
  plus a mirror slot so slices stay contiguous (traffic_env.py:187-212).
  All reads complete before writes, so the update is synchronous; here
  it becomes a single masked elementwise program over the full
  ``(roads, slots)`` plane with leaders obtained by a circular roll —
  the natural shape for the TPU VPU, and bit-identical because the math
  per car is unchanged.
* The hand-off loop must run in road-index order to reproduce reference
  trajectories exactly (chained transfers + overflow edge cases,
  traffic_env.py:116-135); it is a ``fori_loop`` over roads with a
  bounded inner ``while_loop``.  Only the IDM math is wide; the
  hand-off is scalar bookkeeping, and under ``vmap`` every step of it
  is vectorized across the env batch.  A faster relaxed-order variant
  lives in ``fast.py``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..constants import (ARCHETYPES, DETECT_RANGE, EPS, NPARAMS,
                         OVERFLOW_PENALTY, PASSING_REWARD, RING, THRESH,
                         YELLOW_TICKS, X, V, L, A, DELTA, V0, B, T, S0, W)
from ..topology import GridRoad
from .structs import SimState, SpawnSchedule

I32 = jnp.int32
F32 = jnp.float32
INF = jnp.float32(np.inf)


def ring_inc(i):
    """Ring successor modulo RING (reference ``wrap``, traffic_env.py:46-47,
    shifted to the mirror-free 0..RING-1 layout)."""
    j = i + 1
    return jnp.where(j >= RING, 0, j)


class SimFns(NamedTuple):
    tick: callable
    reset: callable
    obs: callable
    remi: callable
    cars_per_road: callable
    cars_on_roads: callable
    init_phase: callable


def make_sim(topo: GridRoad, cfg: Config, on_device_spawns: bool = True,
             max_spawns_per_tick: int = 8, handoff: str = "exact",
             max_crossings_per_tick: int = 3,
             _bench_phases: frozenset | None = None,
             archetypes: np.ndarray | None = None) -> SimFns:
    """``handoff`` selects the car-transfer kernel:

    * ``"exact"`` — road-index-ordered fori/while nest, bit-exact vs
      the oracle in every edge case (the parity fixture).
    * ``"parallel"`` — all roads transfer simultaneously in
      ``max_crossings_per_tick`` vectorized rounds, exploiting
      GridRoad's in-degree <= 1 (every road has a unique feeder).  This
      is the TPU throughput path: provably identical to "exact" except
      when a transfer lands on an exactly-full buffer in the same tick
      another car leaves it (an overflow tie; the episode ends either
      way).  Equivalence is enforced by tests/test_fast_handoff.py.
    """
    R, Rt, I = topo.roads, topo.train_roads, topo.intersections
    length = np.float32(topo.length)
    rate = np.float32(cfg.rate)
    lam = np.float32(1.0 / (cfg.cars_per_sec * cfg.rate))

    # Static topology constants baked into the program.
    dest = topo.dest                       # i32[R], -1 on exit roads
    dest_t = topo.dest[:Rt]                # i32[Rt]
    pg_t = topo.phase_group[:Rt]           # i32[Rt]
    nxt = topo.nxt                         # i32[R]
    nxt_t = topo.nxt[:Rt]                  # i32[Rt], always >= 0
    entrypoints = topo.entrypoints         # i32[E]
    train_ids = np.arange(Rt)
    arch_np = (ARCHETYPES if archetypes is None
               else np.asarray(archetypes, np.float32))
    k_arch = arch_np.shape[0]
    # delta == 4 for every archetype: the IDM below uses two explicit
    # squarings (IEEE-exact) instead of pow(); see _integrate
    assert np.all(arch_np[:, DELTA] == 4.0), \
        "exact core requires delta == 4 in every archetype"
    arch_tab = jnp.asarray(arch_np)                    # (k, NPARAMS)
    archetype = arch_tab[0]

    # ------------------------------------------------------------------
    # add_car: masked ring-buffer push (traffic_env.py:96-114)
    # ------------------------------------------------------------------
    def _add_car(cars, leading, lastcar, rewards, road, car, enabled):
        last = lastcar[road]
        lead = leading[road]
        slot = ring_inc(last)
        tail = cars[road, :, last]
        tail_floor = jnp.where(last != lead, tail[X] - tail[L] - tail[S0], INF)
        full = slot == lead
        do = enabled & ~full
        car = car.at[X].set(jnp.minimum(car[X], tail_floor))
        cars = cars.at[road, :, slot].set(
            jnp.where(do, car, cars[road, :, slot]))
        lastcar = lastcar.at[road].set(jnp.where(do, slot, last))
        d = jnp.asarray(dest)[road]
        pen = enabled & full & (d >= 0)
        rewards = rewards.at[jnp.maximum(d, 0)].add(
            jnp.where(pen, -OVERFLOW_PENALTY, F32(0)))
        return cars, lastcar, rewards, enabled & full

    # ------------------------------------------------------------------
    # spawning
    # ------------------------------------------------------------------
    def _spawn_from_schedule(state: SimState, sched: SpawnSchedule):
        cars, leading, lastcar, rewards = (state.cars, state.leading,
                                           state.lastcar, state.rewards)
        t = state.global_tick - sched.base
        count = sched.counts[t]
        roads_row = sched.roads[t]
        car0 = archetype.at[W].set(state.steps.astype(F32))
        if k_arch > 1:
            assert sched.aidx is not None, \
                "k>1 archetypes need schedule aidx (spawn.build_schedule)"
            aidx_row = sched.aidx[t]
        overflow = jnp.asarray(False)
        k = sched.roads.shape[-1]
        for j in range(k):
            en = j < count
            car = (car0 if k_arch == 1 else
                   arch_tab[aidx_row[j]].at[W].set(state.steps.astype(F32)))
            cars, lastcar, rewards, ovf = _add_car(
                cars, leading, lastcar, rewards, roads_row[j], car, en)
            overflow |= ovf
        return state.replace(cars=cars, lastcar=lastcar, rewards=rewards,
                             key=state.key), overflow

    _Kg = max(max_spawns_per_tick, 8)   # generation slots (see fast_core)

    def _spawn_on_device(state: SimState, _sched):
        """Rounded-exponential renewal process drawn from the env key.

        Mirrors the generator protocol: emit arrivals while the pending
        gap is zero (redrawing a gap after each), then consume one
        empty tick (traffic_env.py:159-164, 274-283).  Generation feeds
        ``spawn_backlog``; placement drains at most
        ``max_spawns_per_tick`` queued arrivals per tick, so a burst
        beyond the cap is deferred, never dropped, and the renewal
        clock keeps running (fast_core.spawn_device has the full cap
        discipline note; the threefry split sequence here must stay
        bit-identical to its)."""
        cars, leading, lastcar, rewards = (state.cars, state.leading,
                                           state.lastcar, state.rewards)
        key = jax.random.wrap_key_data(state.key)
        gap = state.spawn_gap
        backlog = state.spawn_backlog
        car0 = archetype.at[W].set(state.steps.astype(F32))
        overflow = jnp.asarray(False)
        # Lazily draw the first gap, like the reference generator.
        key, sub = jax.random.split(key)
        gap = jnp.where(
            gap < 0,
            jnp.round(jax.random.exponential(sub, dtype=F32) * lam).astype(I32),
            gap)
        for _ in range(_Kg):
            key, kg = jax.random.split(key)
            en = gap == 0
            backlog = backlog + en.astype(I32)
            new_gap = jnp.round(
                jax.random.exponential(kg, dtype=F32) * lam).astype(I32)
            gap = jnp.where(en, new_gap, gap)
        gap = gap - (gap > 0)  # the empty tick that ends this round
        n = jnp.minimum(backlog, max_spawns_per_tick)
        backlog = backlog - n
        for j in range(max_spawns_per_tick):
            key, k1 = jax.random.split(key)
            en = j < n
            road = jnp.asarray(entrypoints)[
                jax.random.randint(k1, (), 0, len(entrypoints))]
            if k_arch == 1:
                car = car0
            else:
                # per-car archetype draw (traffic_env.py:164); a second
                # subkey only in the k>1 table so the k==1 threefry
                # sequence — and its cross-core parity — is unchanged
                key, k3 = jax.random.split(key)
                ai = jax.random.randint(k3, (), 0, k_arch)
                car = arch_tab[ai].at[W].set(state.steps.astype(F32))
            cars, lastcar, rewards, ovf = _add_car(
                cars, leading, lastcar, rewards, road, car, en)
            overflow |= ovf
        return state.replace(cars=cars, lastcar=lastcar, rewards=rewards,
                             key=jax.random.key_data(key),
                             spawn_gap=gap, spawn_backlog=backlog), overflow

    _spawn = _spawn_on_device if on_device_spawns else _spawn_from_schedule

    # ------------------------------------------------------------------
    # lights: write each training road's fake-leader x
    # (traffic_env.py:80-94)
    # ------------------------------------------------------------------
    def _update_lights(cars, leading, lastcar, phase, elapsed):
        red_or_yellow = ((pg_t == phase[dest_t])
                         | (elapsed[dest_t] < YELLOW_TICKS))
        next_lead = leading[nxt_t]
        next_last = lastcar[nxt_t]
        next_empty = next_lead == next_last
        next_x = cars[nxt_t, X, next_last] + length
        fake_x = jnp.where(red_or_yellow, length,
                           jnp.where(next_empty, INF, next_x))
        return cars.at[train_ids, X, leading[:Rt]].set(fake_x)

    # ------------------------------------------------------------------
    # IDM integration over the whole (roads, slots) plane
    # (traffic_env.py:50-62, 187-212)
    # ------------------------------------------------------------------
    def _integrate(cars, leading, lastcar, waiting, detected):
        x, v = cars[:, X, :], cars[:, V, :]
        ld_x = jnp.roll(x, 1, axis=-1)
        ld_v = jnp.roll(v, 1, axis=-1)
        ld_l = jnp.roll(cars[:, L, :], 1, axis=-1)

        slots = jnp.arange(RING)[None, :]
        dist = (slots - leading[:, None]) % RING
        ncars = (lastcar - leading) % RING
        mask = (dist >= 1) & (dist <= ncars[:, None])

        a, b = cars[:, A, :], cars[:, B, :]
        t, s0 = cars[:, T, :], cars[:, S0, :]
        v0 = cars[:, V0, :]

        # Bit-exactness note: XLA's MLIR emitters canonicalize
        # mul-feeding-add/sub chains into fused FMAs, which changes
        # rounding vs the oracle's plain IEEE ops.  Every product that
        # feeds an add/sub is therefore routed through an identity the
        # compiler cannot fold away: max(p, 0) for provably-nonnegative
        # products, a finite clamp for signed ones (trajectory-identical
        # — the clamped +-inf cases are gated off identically by the
        # dx>0 / max(0, v) guards on both sides).
        nn = lambda p: jnp.maximum(p, F32(0))          # p >= 0 by construction
        fin = lambda p: jax.lax.clamp(F32(np.finfo(np.float32).min), p,
                                      F32(np.finfo(np.float32).max))
        desired = s0 + jnp.maximum(
            F32(0), nn(v * t) + v * (v - ld_v) / (2 * jnp.sqrt(a * b)))
        gap = ld_x - x - ld_l
        # delta == 4 for every archetype: two explicit squarings instead
        # of pow() so the op sequence is IEEE-exact and matches the
        # oracle bit-for-bit (see oracle.sim.idm_update).
        free_flow = nn(jnp.square(jnp.square(v / v0)))
        dv = a * (1 - free_flow - nn(jnp.square(desired / (gap + EPS))))
        dvr = dv * rate
        dx = nn(rate * v) + fin(F32(0.5) * dvr * rate)
        # The oracle adds (dx>0)*dx unconditionally (+0.0 when parked),
        # which matters for -0.0 positions; mirror that exactly.
        new_x = jnp.where(mask, x + nn((dx > 0) * dx), x)
        new_v = jnp.where(mask, jnp.maximum(F32(0), v + fin(dvr)), v)
        cars = cars.at[:, X, :].set(new_x).at[:, V, :].set(new_v)

        # Waiting metric: speed for contiguous segments; for a wrapped
        # buffer the second segment compares POSITION against THRESH —
        # a reference bug kept for parity (traffic_env.py:210).
        wrapped = (leading > lastcar)[:, None]
        in_second_seg = wrapped & (slots <= lastcar[:, None])
        metric = jnp.where(in_second_seg, new_x, new_v)
        wait_inc = jnp.sum(mask & (metric < THRESH), axis=-1,
                           dtype=I32)[:Rt]
        det_cnt = jnp.sum(mask & (new_x > length - DETECT_RANGE), axis=-1,
                          dtype=I32)[:Rt]
        occupied = (ncars > 0)[:Rt]
        waiting = waiting + jnp.where(occupied, wait_inc, 0)
        # Empty roads keep their stale detector value (traffic_env.py:194).
        detected = jnp.where(occupied, det_cnt, detected)
        decel_cnt = jnp.sum(mask & (dvr < 0), axis=-1, dtype=I32)[:Rt] \
            if cfg.decel_penalty else None
        return cars, waiting, detected, decel_cnt

    def _apply_decel(rewards, cnt, one):
        """Latent DECEL_PENALTY shaping (traffic_env.py:196-198,204-205):
        rewards[dest] += count(dvr<0)/10, one f32 add per road in
        ascending road order.  k/10 is non-dyadic, so the order of the
        adds is part of the bit-exact contract: train road dir*I + i
        has dest i, so folding the (4, I) direction blocks in ascending
        direction order reproduces the oracle's sequential loop per
        rewards slot.  ``one`` is a runtime 1.0: multiplying the
        constant divisor by it stops XLA from strength-reducing the
        division into a reciprocal multiply (1 ULP off the oracle's
        true division)."""
        assert np.array_equal(dest_t, np.tile(np.arange(I), 4))
        for d4 in range(4):
            blk = jax.lax.slice_in_dim(cnt, d4 * I, (d4 + 1) * I)
            rewards = rewards + blk.astype(F32) / (F32(10) * one)
        return rewards

    # ------------------------------------------------------------------
    # hand-off: exact road-index-ordered transfer (traffic_env.py:116-135)
    # ------------------------------------------------------------------
    nxt_c = jnp.asarray(nxt)
    dest_c = jnp.asarray(dest)

    def _advance(cars, leading, lastcar, passed, rewards, passed_dst):
        def road_body(e, carry):
            cars, leading, lastcar, passed, rewards, passed_dst, overflow = carry

            def cond(c):
                cars, leading, lastcar, *_ = c
                front = ring_inc(leading[e])
                return (leading[e] != lastcar[e]) & (cars[e, X, front] > length)

            def body(c):
                cars, leading, lastcar, passed, rewards, passed_dst, overflow = c
                front = ring_inc(leading[e])
                nr = nxt_c[e]
                d = dest_c[e]
                through = nr >= 0           # crossing an intersection
                car = cars[e, :, front]
                car = car.at[X].add(jnp.where(through, -length, F32(0)))
                passed = passed.at[jnp.minimum(e, Rt - 1)].add(
                    jnp.where(through, 1, 0))
                dd = jnp.maximum(d, 0)
                passed_dst = passed_dst.at[dd].set(passed_dst[dd] | through)
                rewards = rewards.at[dd].add(
                    jnp.where(through, PASSING_REWARD, F32(0)))
                cars, lastcar, rewards, ovf = _add_car(
                    cars, leading, lastcar, rewards, jnp.maximum(nr, 0),
                    car, through)
                # Vacated slot inherits the fake-leader params.
                cars = cars.at[e, :, front].set(cars[e, :, leading[e]])
                leading = leading.at[e].set(front)
                return (cars, leading, lastcar, passed, rewards, passed_dst,
                        overflow | ovf)

            return jax.lax.while_loop(cond, body, carry)

        init = (cars, leading, lastcar, passed, rewards, passed_dst,
                jnp.asarray(False))
        out = jax.lax.fori_loop(0, R, road_body, init)
        return out

    # ------------------------------------------------------------------
    # hand-off, parallel: all roads at once, K vectorized rounds
    # ------------------------------------------------------------------
    prev = topo.prev                       # i32[R], -1 where no feeder
    prev_c = np.maximum(prev, 0)           # clamped gather index
    has_feeder = prev >= 0
    # Sequential-order tiebreak: if a road's feeder has a lower index,
    # the reference pushes into it BEFORE it pops its own crosser.
    feeder_first = has_feeder & (prev < np.arange(R))
    is_train_road = np.arange(R) < Rt
    road_ids = np.arange(R)

    def _advance_parallel(cars, leading, lastcar, passed, rewards,
                          passed_dst):
        overflow = jnp.asarray(False)
        for _ in range(max_crossings_per_tick):
            front = ring_inc(leading)                      # i32[R]
            occupied = leading != lastcar
            front_x = cars[road_ids, X, front]
            cross = occupied & (front_x > length)          # bool[R]

            # Receiving side: each road's unique feeder (static map).
            inc = jnp.asarray(has_feeder) & cross[prev_c]  # bool[R]
            car_in = cars[prev_c, :, front[prev_c]]        # f32[R, P]
            car_in = car_in.at[:, X].add(-length)

            # Push slot + overflow (add_car semantics, traffic_env.py:96-114)
            slot = ring_inc(lastcar)
            new_leading = jnp.where(cross, front, leading)
            lead_for_full = jnp.where(jnp.asarray(feeder_first),
                                      leading, new_leading)
            full = slot == lead_for_full
            do_push = inc & ~full
            ovf = inc & full
            overflow |= jnp.any(ovf)
            rewards = rewards.at[jnp.maximum(dest_c, 0)].add(
                jnp.where(ovf & (dest_c >= 0), -OVERFLOW_PENALTY, F32(0)))

            # Tail clamp against the receiver's current last car.  A
            # feeder-processed-first receiver sees its pre-pop tail
            # state, otherwise post-pop (matches sequential order).
            occ_for_tail = jnp.where(jnp.asarray(feeder_first), occupied,
                                     new_leading != lastcar)
            tail = cars[road_ids, :, lastcar]
            tail_floor = jnp.where(occ_for_tail, tail[:, X] - tail[:, L]
                                   - tail[:, S0], INF)
            car_in = car_in.at[:, X].set(
                jnp.minimum(car_in[:, X], tail_floor))

            # Crossing bookkeeping (only intersection roads score).
            through = cross & (nxt_c >= 0)
            passed = passed + jnp.where(through[:Rt], 1, 0)
            dd = jnp.maximum(dest_c, 0)
            passed_dst = (passed_dst.astype(I32).at[dd].max(
                through.astype(I32))).astype(bool)
            rewards = rewards.at[dd].add(
                jnp.where(through, PASSING_REWARD, F32(0)))

            # Writes: push at the tail slot, then vacate the old front
            # with fake-leader params.  Slots are provably disjoint.
            old_at_slot = cars[road_ids, :, slot]
            cars = cars.at[road_ids, :, slot].set(
                jnp.where(do_push[:, None], car_in, old_at_slot))
            lastcar = jnp.where(do_push, slot, lastcar)
            fake = cars[road_ids, :, leading]
            old_at_front = cars[road_ids, :, front]
            cars = cars.at[road_ids, :, front].set(
                jnp.where(cross[:, None], fake, old_at_front))
            leading = new_leading
        return cars, leading, lastcar, passed, rewards, passed_dst, overflow

    # ------------------------------------------------------------------
    # the public tick (traffic_env.py:224-248)
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
        ph = _bench_phases
        ovf_spawn = jnp.asarray(False)
        if ph is None or "spawn" in ph:
            state, ovf_spawn = _spawn(state, sched)
        cars = state.cars
        if ph is None or "lights" in ph:
            cars = _update_lights(cars, state.leading, state.lastcar,
                                  phase, elapsed)
        waiting, detected = state.waiting, state.detected
        if ph is None or "idm" in ph:
            cars, waiting, detected, decel_cnt = _integrate(
                cars, state.leading, state.lastcar, waiting, detected)
            if cfg.decel_penalty:
                # decel shaping lands BEFORE advance's contributions,
                # matching the reference's move_cars -> advance order
                one = jnp.where(state.steps >= 0, F32(1), F32(2))
                state = state.replace(
                    rewards=_apply_decel(state.rewards, decel_cnt, one))
        if ph is None or "advance" in ph:
            advance_fn = _advance if handoff == "exact" else _advance_parallel
            (cars, leading, lastcar, passed, rewards, passed_dst,
             ovf_adv) = advance_fn(cars, state.leading, state.lastcar,
                                   state.passed, state.rewards,
                                   state.passed_dst)
        else:
            leading, lastcar = state.leading, state.lastcar
            passed, rewards = state.passed, state.rewards
            passed_dst, ovf_adv = state.passed_dst, jnp.asarray(False)
        return state.replace(
            cars=cars, leading=leading, lastcar=lastcar, passed=passed,
            rewards=rewards, passed_dst=passed_dst, waiting=waiting,
            detected=detected, steps=state.steps + 1,
            global_tick=state.global_tick + 1,
            done=ovf_spawn | ovf_adv)

    # ------------------------------------------------------------------
    # reset: empty the roads, keep the arrival stream + stale detectors
    # (traffic_env.py:259-272)
    # ------------------------------------------------------------------
    def reset(state: SimState, phase=None) -> SimState:
        key = state.key
        if phase is None:
            tkey, sub = jax.random.split(jax.random.wrap_key_data(key))
            key = jax.random.key_data(tkey)
            phase = jax.random.randint(sub, (I,), 0, 2, dtype=I32)
        cars = state.cars.at[:, :, 0].set(F32(0)).at[:, X, 0].set(INF)
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
            steps=jnp.int32(0),
            key=key,
            done=jnp.asarray(False))

    def init_phase(key):
        return jax.random.randint(key, (I,), 0, 2, dtype=I32)

    # ------------------------------------------------------------------
    # observation / reward views
    # ------------------------------------------------------------------
    def obs(state: SimState):
        """int32[2*Rt+2*I]: passed | detected | phase | elapsed
        (traffic_env.py:372-376)."""
        return jnp.concatenate([state.passed, state.detected, state.phase,
                                state.elapsed]).astype(I32)

    def remi(state: SimState):
        """The remi reward; clears waiting and passed_dst
        (traffic_env.py:64-78)."""
        green = pg_t != state.phase[dest_t]
        waited = state.waiting > 0
        pd = state.passed_dst[dest_t]
        minus = waited & ~green & ~pd
        plus = pd & green & ~waited
        contrib = jnp.where(minus, F32(-0.5),
                            jnp.where(plus, F32(0.5), F32(0)))
        rewards = jnp.zeros(I, F32).at[dest_t].add(contrib)
        state = state.replace(waiting=jnp.zeros_like(state.waiting),
                              passed_dst=jnp.zeros_like(state.passed_dst),
                              rewards=rewards)
        return state, rewards

    def cars_per_road(state: SimState):
        """(lastcar - leading) mod RING (traffic_env.py:214-218)."""
        return (state.lastcar - state.leading) % RING

    def cars_on_roads(state: SimState):
        """(m, n, 4) occupancy for the greedy baselines
        (traffic_env.py:255-257)."""
        per_dir = cars_per_road(state)[:Rt].reshape(4, topo.m, topo.n)
        return jnp.transpose(per_dir, (1, 2, 0))

    return SimFns(tick=tick, reset=reset, obs=obs, remi=remi,
                  cars_per_road=cars_per_road, cars_on_roads=cars_on_roads,
                  init_phase=init_phase)

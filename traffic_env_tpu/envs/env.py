"""The functional traffic environment: simulator core + wrapper algebra.

The reference composes gym wrappers around the simulator
(traffic_test.py:78-91): an action-repeat "Repeater" holding each
action for one light period with window-aggregated observations, then
optional Warmup / Remi / Localize / Squish / History shaping.  Here the
whole stack is a pair of pure functions over an ``EnvState`` pytree:

    step(state, action[, sched]) -> (state, obs, reward, done, info)
    reset(state[, sched, phase, actions]) -> (state, obs)

so one agent step is a single XLA program containing the full
``light_iterations``-tick ``lax.scan``, vmap-able over the env batch
and shardable over a mesh.

Wrapper-order semantics preserved from the reference: Warmup and the
Repeater's reset action run *inside* Remi, so waiting/passed_dst
accumulated during them leak into the first shaped reward
(traffic_test.py:84-86); history prefill steps run *outside* and do
consume remi rewards.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import Config
from ..constants import RING
from ..spaces import GSpace
from ..topology import GridRoad
from .core import make_sim
from .structs import SimState, init_state

F32 = jnp.float32
I32 = jnp.int32


@struct.dataclass
class EnvState:
    sim: SimState
    history: jnp.ndarray  # f32[history, obs_dim] rolling window (history>=1)
    # Exact-mode arrival window (SpawnSchedule chunk, spawn.py
    # ScheduleStream): carried IN the state so it flows through jitted
    # scans as a traced argument — a closure-bound schedule would be
    # baked into the jaxpr as an O(run) constant and retrace on every
    # refresh.  None outside --exact (and when a schedule is passed
    # explicitly, as the parity tests do).
    sched: object = None


def _select(pred, new, old):
    """Pytree select (pred scalar bool): freeze finished lanes."""
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), new, old)


def _ordered_mean(vec, n: int):
    """Left-to-right float32 mean over a static-length axis, with the
    division defined as a reciprocal multiply.

    Defines the summation order explicitly so the oracle (NumPy) and
    the XLA build round identically; np.mean's pairwise order is an
    implementation detail we do not inherit, and XLA strength-reduces
    constant division to reciprocal multiplication anyway."""
    s = vec[0]
    for j in range(1, n):
        s = s + vec[j]
    return s * F32(1.0 / n)


def localize_reward(rew, weight: int, n: int):
    """Reward mixing: ((w-1)*r_self + sum(r)) * (1/n) * (1/w) per
    intersection, written as the reference's diag construction
    (traffic_test.py:66-69) with ordered summation."""
    # fin() blocks XLA's mul+add->FMA contraction (identity on the
    # always-finite reward range; see the core's bit-exactness note).
    fin = lambda p: jax.lax.clamp(F32(np.finfo(np.float32).min), p,
                                  F32(np.finfo(np.float32).max))
    d = fin(jnp.diag(rew) * F32(weight - 1))
    m = d + rew[None, :]
    s = m[:, 0]
    for j in range(1, n):
        s = s + m[:, j]
    # fin() between the two reciprocal multiplies: XLA folds x*c1*c2
    # into x*(c1*c2), which rounds differently.
    return fin(s * F32(1.0 / n)) * F32(1.0 / weight)


class EnvFns(NamedTuple):
    init: callable
    reset: callable
    step: callable
    step_autoreset: callable
    step_autoreset_lazy: callable
    observation_space: GSpace
    action_space: GSpace
    reward_size: int
    obs_dim: int
    sim_fns: object
    # history-free throughput variant of step_autoreset_lazy: returns
    # the raw window obs and passes EnvState.history through untouched
    # (the learner keeps the frame stack in its replay ring instead —
    # algorithms/replay.py FrameReplay.last_stack)
    step_autoreset_lazy_noh: callable = None
    # --render_ticks: lazy step that also stacks each intermediate
    # tick's SimState (render-path only)
    step_autoreset_lazy_ticks: callable = None


def make_env(topo: GridRoad, cfg: Config, on_device_spawns: bool = True,
             max_spawns_per_tick: int = 8, core: str = "exact",
             archetypes=None) -> EnvFns:
    """``core``: "exact" (gather-based oracle-parity kernels),
    "parallel" (gather-based, relaxed-order hand-off) or "fast" (the
    dense compact TPU core; see fast_core.py).  ``archetypes``: optional
    k-row car-parameter table (the reference's extension point,
    traffic_env.py:32-43); defaults to the shipped single archetype."""
    if core == "fast":
        from .fast_core import (init_state_compact, make_sim_fast,
                                n_car_rows)
        fns = make_sim_fast(topo, cfg, on_device_spawns=on_device_spawns,
                            max_spawns_per_tick=max_spawns_per_tick,
                            archetypes=archetypes)
        # validate mode attaches the trip-time histogram accumulator
        n_tb = (cfg.episode_ticks + 2) if cfg.mode == "validate" else 0
        rows = n_car_rows(archetypes)
        init_sim = lambda key: init_state_compact(topo, key,
                                                  n_trip_bins=n_tb,
                                                  rows=rows)
    else:
        fns = make_sim(topo, cfg, on_device_spawns=on_device_spawns,
                       max_spawns_per_tick=max_spawns_per_tick,
                       handoff=core, archetypes=archetypes)
        init_sim = lambda key: init_state(topo, key)
    Rt, I = topo.train_roads, topo.intersections
    obs_dim = 2 * Rt + I + (Rt if cfg.occupancy_obs else 0)
    k_hist = max(int(cfg.history), 1)
    reward_size = 1 if cfg.squish_rewards else I
    validate = cfg.mode == "validate"

    action_space = GSpace([I], 2)
    observation_space = (GSpace([k_hist, obs_dim], np.float32(1), F32)
                         if k_hist > 1 else
                         GSpace([obs_dim], np.float32(1), F32))

    # ------------------------------------------------------------------
    def repeater_step(sim: SimState, action, sched, emit_ticks=False):
        """One light period (traffic_test.py:37-56): hold the action for
        light_iterations ticks; sum passed, keep last detected, collapse
        elapsed to a signed normalized scalar; stop ticking at done.
        ``emit_ticks`` additionally stacks every intermediate tick's
        sim (--render_ticks, the reference's per-tick pyglet animation
        at traffic_env.py:285-359)."""
        action = jnp.asarray(action).astype(I32)
        light_secs = None
        if validate:
            change = jnp.logical_xor(sim.phase, action).astype(I32)
            light_secs = ((sim.elapsed + 1) * change).astype(F32) / 2

        def body(carry, _):
            sim, done, acc_passed, tot_rew = carry
            nxt = fns.tick(sim, action, sched)
            live = ~done
            sim = _select(live, nxt, sim)
            acc_passed = acc_passed + jnp.where(live, nxt.passed, 0)
            tot_rew = tot_rew + jnp.where(live, nxt.rewards, F32(0))
            done = done | (live & nxt.done)
            return (sim, done, acc_passed, tot_rew), \
                (sim if emit_ticks else None)

        # the done-carry starts from the STICKY state flag: a lane that
        # finished a previous window stays frozen until an external
        # reset (stepping a done env is undefined in the reference —
        # the gym loop always resets first; freezing keeps every core
        # and the Pallas kernel bit-identical on that path)
        init = (sim, sim.done, jnp.zeros(Rt, I32), jnp.zeros(I, F32))
        (sim, done, acc_passed, tot_rew), ticks = jax.lax.scan(
            body, init, None, length=cfg.light_iterations)
        mult = (2 * sim.phase - 1).astype(F32)
        parts = [
            acc_passed.astype(F32),
            sim.detected.astype(F32),
            sim.elapsed.astype(F32) * F32(0.01) * mult,
        ]
        if cfg.occupancy_obs:
            # --occupancy_obs extension: normalized cars-per-road for
            # the training roads (the greedy baseline's decision
            # signal, traffic_env.py:214-218 / greedy.py:16), appended
            # after the reference observation
            occ = ((sim.lastcar - sim.leading) % RING)[:Rt]
            parts.append(occ.astype(F32) * F32(1.0 / (RING - 1)))
        obs = jnp.concatenate(parts)
        return sim, obs, tot_rew, done, light_secs, ticks

    def shaped_step(sim: SimState, action, sched, emit_ticks=False):
        """Repeater + Remi/Localize/Squish shaping (traffic_test.py:84-88)."""
        sim, obs, rew, done, light_secs, ticks = repeater_step(
            sim, action, sched, emit_ticks)
        if cfg.remi:
            sim, rew = fns.remi(sim)
        if cfg.local_weight > 1:
            rew = localize_reward(rew, cfg.local_weight, I)
        if cfg.squish_rewards:
            # reward_size=1: a length-1 vector, not a scalar, so the
            # fast and pallas paths produce identically-shaped rewards
            rew = _ordered_mean(rew, I)[None]
        return sim, obs, rew, done, light_secs, ticks

    # ------------------------------------------------------------------
    def step(state: EnvState, action, sched=None):
        sched = state.sched if sched is None else sched
        sim, obs, rew, done, light_secs, _ = shaped_step(
            state.sim, action, sched)
        if k_hist > 1:
            history = jnp.roll(state.history, -1, axis=0).at[-1].set(obs)
            out = history
        else:
            history = obs[None]
            out = obs
        info = {"light_times": light_secs} if validate else None
        return EnvState(sim=sim, history=history,
                        sched=state.sched), out, rew, done, info

    def reset(state: EnvState, sched=None, phase=None, actions=None):
        """Full stack reset.  ``phase`` and ``actions`` (the random
        action stream for repeater-reset / warmup / history-prefill, in
        that order) may be host-provided for parity tests; otherwise
        they are drawn from the env's own PRNG key."""
        n_actions = 1 + cfg.warmup_lights + (k_hist - 1 if k_hist > 1 else 0)
        sched = state.sched if sched is None else sched
        sim = state.sim
        if actions is None:
            key, k1, k2 = jax.random.split(
                jax.random.wrap_key_data(sim.key), 3)
            sim = sim.replace(key=jax.random.key_data(key))
            if phase is None:
                phase = jax.random.randint(k1, (I,), 0, 2, dtype=I32)
            actions = jax.random.randint(k2, (n_actions, I), 0, 2, dtype=I32)
        else:
            actions = jnp.asarray(actions).astype(I32)
        sim = fns.reset(sim, phase)
        # Repeater reset action + warmup run inside Remi: raw repeater
        # steps, no reward shaping consumed.  Scanned, not unrolled, to
        # keep compile time flat in warmup/history depth.
        sim, obs, _, _, _, _ = repeater_step(sim, actions[0], sched)
        if cfg.warmup_lights > 0:
            def wbody(sim, a):
                sim, obs, _, _, _, _ = repeater_step(sim, a, sched)
                return sim, obs
            sim, w_obs = jax.lax.scan(
                wbody, sim, actions[1:1 + cfg.warmup_lights])
            obs = w_obs[-1]
        if k_hist > 1:
            def hbody(sim, a):
                sim, obs, _, _, _, _ = shaped_step(sim, a, sched)
                return sim, obs
            sim, rows = jax.lax.scan(
                hbody, sim, actions[1 + cfg.warmup_lights:])
            history = jnp.concatenate([obs[None], rows], axis=0)
            return EnvState(sim=sim, history=history,
                            sched=state.sched), history
        history = obs[None]
        return EnvState(sim=sim, history=history, sched=state.sched), obs

    def step_autoreset(state: EnvState, action, sched=None):
        """Batched-training step: finished envs are reset in place (the
        arrival stream and PRNG persist, like the reference's episode
        loop calling env.reset())."""
        new_state, obs, rew, done, info = step(state, action, sched)
        reset_state, reset_obs = reset(new_state, sched)
        # select sim/history only: both branches carry the identical
        # sched chunk, and where()-copying it would dominate the step
        out_state = new_state.replace(
            sim=_select(done, reset_state.sim, new_state.sim),
            history=jnp.where(done, reset_state.history,
                              new_state.history))
        obs = jnp.where(done, reset_obs, obs)
        return out_state, obs, rew, done, info

    def step_autoreset_lazy(state: EnvState, action, sched=None):
        """Throughput-mode auto-reset: lanes that finished last window
        get a fresh (empty, rephased) simulator before this window runs,
        and the policy's own action drives the first window — skipping
        the reference's extra random-action reset window.  Semantically
        a standard batched-RL reset approximation; use step_autoreset
        for reference-exact reset windows."""
        sched = state.sched if sched is None else sched
        return step(state.replace(sim=_lazy_reset_sim(state, sched)),
                    action, sched)

    def _lazy_reset_sim(state, sched):
        """Fresh (empty, rephased) sim for done lanes.  In schedule
        (--exact) mode the reset phase comes from the same
        deterministic tick-hash the Pallas kernel's in-kernel lazy
        reset uses, so trajectories are bit-identical across cores and
        the PRNG key is never consumed (the host arrival stream is the
        only randomness in exact mode)."""
        sim = state.sim
        if sched is not None:
            from ..ops.pallas_window import lazy_reset_phase
            ph = lazy_reset_phase(sim.global_tick[None], I)[:, 0]
            fresh = fns.reset(sim, ph)
        else:
            fresh = fns.reset(sim)
        return _select(sim.done, fresh, sim)

    def step_autoreset_lazy_noh(state: EnvState, action, sched=None):
        """step_autoreset_lazy without the history roll: returns the
        raw window obs; ``state.history`` passes through untouched (no
        HBM write).  The throughput-training path — the learner keeps
        the rolling frame stack in its replay ring
        (algorithms/replay.py FrameReplay.last_stack) so the k-frame
        roll write disappears from the hot loop."""
        sched = state.sched if sched is None else sched
        sim = _lazy_reset_sim(state, sched)
        sim, obs, rew, done, light_secs, _ = shaped_step(sim, action,
                                                         sched)
        info = {"light_times": light_secs} if validate else None
        return (state.replace(sim=sim), obs, rew, done, info)

    def step_autoreset_lazy_ticks(state: EnvState, action, sched=None):
        """--render_ticks support: the lazy step, additionally
        returning every intermediate tick's SimState stacked on a
        leading axis (the reference animates each simulator tick,
        traffic_env.py:285-359).  Render-path only — the tick stack
        costs W full SimStates of memory."""
        sched = state.sched if sched is None else sched
        sim = _lazy_reset_sim(state, sched)
        sim, obs, rew, done, light_secs, ticks = shaped_step(
            sim, action, sched, emit_ticks=True)
        if k_hist > 1:
            history = jnp.roll(state.history, -1, axis=0).at[-1].set(obs)
            out = history
        else:
            history = obs[None]
            out = obs
        info = {"light_times": light_secs} if validate else None
        return (EnvState(sim=sim, history=history, sched=state.sched),
                out, rew, done, info, ticks)

    def init(key) -> EnvState:
        sim = init_sim(key)
        hist = jnp.zeros((k_hist, obs_dim), F32)
        return EnvState(sim=sim, history=hist)

    return EnvFns(init=init, reset=reset, step=step,
                  step_autoreset=step_autoreset,
                  step_autoreset_lazy=step_autoreset_lazy,
                  step_autoreset_lazy_noh=step_autoreset_lazy_noh,
                  step_autoreset_lazy_ticks=step_autoreset_lazy_ticks,
                  observation_space=observation_space,
                  action_space=action_space, reward_size=reward_size,
                  obs_dim=obs_dim, sim_fns=fns)

"""Batched lockstep rollouts.

Thousands of env instances step in lockstep inside a single jitted
``lax.scan``: the policy produces an action batch, the vmapped env
(batch axis *last*, on TPU vector lanes) advances one light period (10
simulator ticks), finished envs auto-reset in place.  This is the
throughput configuration of the benchmark (BASELINE.md config 3) and
the actor loop of every learner.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..topology import GridRoad
from .batch import batch_last, init_batched_state
from .env import EnvState, make_env
from .structs import init_state


class BatchedEnv(NamedTuple):
    env: object            # the single-instance EnvFns
    n_envs: int
    init: callable         # key -> batched EnvState
    reset: callable        # (state[, sched]) -> (state, obs)
    step: callable         # (state, action[, sched]) -> (state, obs, r, d, info)
    step_autoreset: callable
    step_autoreset_lazy: callable
    n_intersections: int
    mesh: object = None    # jax.sharding.Mesh when --mesh_shape is set
    sched_stream: object = None  # spawn.ScheduleStream in --exact mode
    # history-free lazy step (raw window obs, EnvState.history
    # untouched): the qlearn hot loop reconstructs stacks from its
    # replay ring instead of paying the k-frame roll write every step
    step_autoreset_lazy_noh: callable = None
    # --render_ticks: lazy step also returning the per-tick SimState
    # stack; fast-core path only (the fused kernel has no per-tick HBM
    # visibility), render-time only
    step_autoreset_lazy_ticks: callable = None


def make_batched_env(topo: GridRoad, cfg: Config, n_envs: int,
                     on_device_spawns: bool = True,
                     max_spawns_per_tick: int | None = None,
                     core: str = "fast", archetypes=None,
                     **pallas_kw) -> BatchedEnv:
    if core == "pallas":
        return make_pallas_batched_env(
            topo, cfg, n_envs, on_device_spawns=on_device_spawns,
            max_spawns_per_tick=max_spawns_per_tick,
            archetypes=archetypes, **pallas_kw)
    if max_spawns_per_tick is None:
        max_spawns_per_tick = 8
    env = make_env(topo, cfg, on_device_spawns=on_device_spawns,
                   max_spawns_per_tick=max_spawns_per_tick, core=core,
                   archetypes=archetypes)

    def init(key):
        keys = jax.random.split(key, n_envs)
        sims = jax.vmap(lambda k: env.init(k).sim, in_axes=0,
                        out_axes=-1)(keys)
        hist = jnp.zeros((*env.observation_space.shape, n_envs)
                         if len(env.observation_space.shape) == 2
                         else (1, env.obs_dim, n_envs), jnp.float32)
        return EnvState(sim=sims, history=hist)

    def _vm(fn, has_sched):
        if has_sched:
            def wrapped(state, *args):
                *rest, sched = args
                return jax.vmap(lambda s, *a: fn(s, *a, sched),
                                in_axes=-1, out_axes=-1)(state, *rest)
            return wrapped
        return jax.vmap(fn, in_axes=-1, out_axes=-1)

    def reset(state, sched=None):
        if sched is not None:
            return jax.vmap(lambda s, c: env.reset(s, c),
                            in_axes=-1, out_axes=-1)(state, sched)
        return jax.vmap(lambda s: env.reset(s), in_axes=-1,
                        out_axes=-1)(state)

    def step(state, action, sched=None):
        if sched is not None:
            return jax.vmap(env.step, in_axes=-1, out_axes=-1)(
                state, action, sched)
        return jax.vmap(lambda s, a: env.step(s, a),
                        in_axes=-1, out_axes=-1)(state, action)

    def step_autoreset(state, action, sched=None):
        if sched is not None:
            return jax.vmap(env.step_autoreset, in_axes=-1, out_axes=-1)(
                state, action, sched)
        return jax.vmap(lambda s, a: env.step_autoreset(s, a),
                        in_axes=-1, out_axes=-1)(state, action)

    def step_autoreset_lazy(state, action, sched=None):
        if sched is not None:
            return jax.vmap(env.step_autoreset_lazy, in_axes=-1,
                            out_axes=-1)(state, action, sched)
        return jax.vmap(lambda s, a: env.step_autoreset_lazy(s, a),
                        in_axes=-1, out_axes=-1)(state, action)

    def step_autoreset_lazy_noh(state, action, sched=None):
        if sched is not None:
            return jax.vmap(env.step_autoreset_lazy_noh, in_axes=-1,
                            out_axes=-1)(state, action, sched)
        return jax.vmap(lambda s, a: env.step_autoreset_lazy_noh(s, a),
                        in_axes=-1, out_axes=-1)(state, action)

    def step_autoreset_lazy_ticks(state, action, sched=None):
        if sched is not None:
            return jax.vmap(env.step_autoreset_lazy_ticks, in_axes=-1,
                            out_axes=-1)(state, action, sched)
        return jax.vmap(lambda s, a: env.step_autoreset_lazy_ticks(s, a),
                        in_axes=-1, out_axes=-1)(state, action)

    return BatchedEnv(env=env, n_envs=n_envs, init=init, reset=reset,
                      step=step, step_autoreset=step_autoreset,
                      step_autoreset_lazy=step_autoreset_lazy,
                      step_autoreset_lazy_noh=step_autoreset_lazy_noh,
                      step_autoreset_lazy_ticks=step_autoreset_lazy_ticks,
                      n_intersections=topo.intersections)


def make_pallas_batched_env(topo: GridRoad, cfg: Config, n_envs: int,
                            on_device_spawns: bool = True,
                            max_spawns_per_tick: int | None = None,
                            block_envs: int | None = None,
                            interpret: bool = False,
                            mesh=None, archetypes=None) -> BatchedEnv:
    """BatchedEnv whose agent step is ONE fused Pallas kernel call per
    light period (ops/pallas_window.py): the whole 10-tick window for a
    block of envs runs in VMEM, with lazy auto-reset folded in.  Reward
    shaping (Remi/Localize/Squish, traffic_test.py:59-76) and history
    stacking run in XLA on the tiny (I, B)/(obs, B) aggregates.

    Requires ``n_envs % block_envs == 0`` (and block_envs a multiple of
    128 on real TPUs — Mosaic lane constraint)."""
    from ..ops.pallas_window import make_repeater_window
    from .fast_core import make_sim_fast
    from .env import localize_reward, _ordered_mean

    if max_spawns_per_tick is None:
        # on-device arrivals past the cap are deferred to the next tick
        # by the gap chain (never dropped), so a tight cap only shifts
        # rare >=5-arrivals-per-tick bursts; schedule mode must match
        # the host-side row cap
        max_spawns_per_tick = 4 if on_device_spawns else 8
    if block_envs is None:
        # VMEM scales with roads x block lanes: the 3x3 sweet spot
        # (block 256, ~48 roads) overflows the 64 MiB scoped limit on
        # larger grids, so halve the block until the car planes fit
        block_envs = 256
        while block_envs > 128 and \
                topo.roads * block_envs > 48 * 256:
            block_envs //= 2
    if n_envs % block_envs:
        # shrink to the largest 128-multiple block that divides the
        # batch (Mosaic needs lane-dim multiples of 128)
        fit = next((b for b in range(min(block_envs, n_envs), 0, -128)
                    if n_envs % b == 0 and b % 128 == 0), None)
        if fit is None:
            raise ValueError(
                f"n_envs={n_envs} not divisible by block_envs="
                f"{block_envs} and no 128-multiple block fits; "
                f"use a batch that is a multiple of 128")
        block_envs = fit
    # the XLA fast-core env supplies init/reset/strict-autoreset (cold
    # paths); the kernel replaces its step
    xbenv = make_batched_env(topo, cfg, n_envs,
                             on_device_spawns=on_device_spawns,
                             max_spawns_per_tick=max_spawns_per_tick,
                             core="fast", archetypes=archetypes)
    fast = xbenv.env.sim_fns
    Rt, I = topo.train_roads, topo.intersections
    k_hist = max(int(cfg.history), 1)
    validate = cfg.mode == "validate"
    kw = dict(on_device_spawns=on_device_spawns,
              max_spawns_per_tick=max_spawns_per_tick,
              block_envs=block_envs, interpret=interpret,
              archetypes=archetypes)
    rep = make_repeater_window(topo, cfg, autoreset=False, **kw)
    rep_lazy = make_repeater_window(topo, cfg, autoreset=True, **kw)

    if mesh is not None:
        # Multi-chip: a pallas_call is opaque to the XLA partitioner,
        # so the kernel is mapped over the mesh's dp axis explicitly —
        # each device runs the fused window on its local env shard
        # (batch is the trailing axis of every leaf); collectives are
        # only needed by the learner (psum over grads), not the env.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dp = mesh.shape["dp"]
        if (n_envs // n_dp) % block_envs:
            raise ValueError(
                f"per-device batch {n_envs // n_dp} not divisible by "
                f"block_envs={block_envs}")

        def batch_spec(tree):
            return jax.tree.map(
                lambda l: P(*([None] * (l.ndim - 1) + ["dp"])), tree)

        def shard_kern(kern):
            def stepped(sim, action, sched=None):
                args = (sim, action) + ((sched,) if sched is not None
                                        else ())
                in_specs = (batch_spec(sim), P(None, "dp")) + \
                    ((batch_spec(sched),) if sched is not None else ())

                def body2(*a):
                    # light_secs is None outside validate mode; replace
                    # with a zero array so shard_map sees a static pytree
                    sim, obs, rew, done, ls = kern(*a)
                    if ls is None:
                        ls = jnp.zeros((0,) + done.shape[-1:], jnp.float32)
                    return sim, obs, rew, done, ls
                out_specs = (batch_spec(args[0]), P(None, "dp"),
                             P(None, "dp"), P("dp"), P(None, "dp"))
                sim, obs, rew, done, ls = shard_map(
                    body2, mesh=mesh, in_specs=in_specs,
                    out_specs=out_specs, check_vma=False)(*args)
                return sim, obs, rew, done, (ls if validate else None)
            return stepped

        rep = shard_kern(rep)
        rep_lazy = shard_kern(rep_lazy)
    remi_b = jax.vmap(fast.remi, in_axes=-1, out_axes=-1)
    loc_b = jax.vmap(lambda r: localize_reward(r, cfg.local_weight, I),
                     in_axes=-1, out_axes=-1)
    squish_b = jax.vmap(lambda r: _ordered_mean(r, I),
                        in_axes=-1, out_axes=-1)

    def shaped(state: EnvState, action, sched, kern, noh=False):
        sim, obs, rew, done, light_secs = kern(state.sim, action, sched)
        if cfg.occupancy_obs:
            # --occupancy_obs extension (see envs/env.py repeater_step):
            # appended outside the kernel from the returned ring indices
            from ..constants import RING
            occ = ((sim.lastcar - sim.leading) % RING)[:Rt]
            obs = jnp.concatenate(
                [obs, occ.astype(jnp.float32)
                 * jnp.float32(1.0 / (RING - 1))])
        if cfg.remi:
            sim, rew = remi_b(sim)
        if cfg.local_weight > 1:
            rew = loc_b(rew)
        if cfg.squish_rewards:
            rew = squish_b(rew)[None]
        info = {"light_times": light_secs} if validate else None
        if noh:
            # history-free throughput step: raw window obs out, the
            # history buffer passes through untouched (no roll write)
            return (state.replace(sim=sim), obs, rew, done, info)
        if k_hist > 1:
            history = jnp.roll(state.history, -1, axis=0).at[-1].set(obs)
            out = history
        else:
            history = obs[None]
            out = obs
        return EnvState(sim=sim, history=history,
                        sched=state.sched), out, rew, done, info

    def step(state, action, sched=None):
        sched = state.sched if sched is None else sched
        return shaped(state, action, sched, rep)

    def step_autoreset_lazy(state, action, sched=None):
        sched = state.sched if sched is None else sched
        return shaped(state, action, sched, rep_lazy)

    def step_autoreset_lazy_noh(state, action, sched=None):
        sched = state.sched if sched is None else sched
        return shaped(state, action, sched, rep_lazy, noh=True)

    def step_autoreset(state, action, sched=None):
        """Strict reference autoreset: finished envs are replaced by a
        freshly reset env (reset window + warmup + history prefill via
        the XLA core) after the step."""
        new_state, obs, rew, done, info = step(state, action, sched)
        reset_state, reset_obs = xbenv.reset(new_state, sched) \
            if sched is not None else xbenv.reset(new_state)
        sel = lambda a, b: jnp.where(done, a, b)
        # sim/history only: both branches carry the identical sched
        out_state = new_state.replace(
            sim=jax.tree.map(sel, reset_state.sim, new_state.sim),
            history=sel(reset_state.history, new_state.history))
        obs = jnp.where(done, reset_obs, obs)
        return out_state, obs, rew, done, info

    return BatchedEnv(env=xbenv.env, n_envs=n_envs, init=xbenv.init,
                      reset=xbenv.reset, step=step,
                      step_autoreset=step_autoreset,
                      step_autoreset_lazy=step_autoreset_lazy,
                      step_autoreset_lazy_noh=step_autoreset_lazy_noh,
                      n_intersections=topo.intersections, mesh=mesh)


def random_rollout(benv: BatchedEnv, state: EnvState, key,
                   n_agent_steps: int):
    """Scan a random policy over the batch; returns (state, key,
    mean reward trace, done counts).  One agent step = one light period
    = cfg.light_iterations simulator ticks per env."""
    I, B = benv.n_intersections, benv.n_envs

    def body(carry, _):
        state, key = carry
        key, k = jax.random.split(key)
        action = jax.random.randint(k, (I, B), 0, 2, dtype=jnp.int32)
        state, obs, rew, done, _ = benv.step_autoreset_lazy(state, action)
        return (state, key), (jnp.mean(rew), jnp.sum(done))

    (state, key), (rews, dones) = jax.lax.scan(
        body, (state, key), None, length=n_agent_steps)
    return state, key, rews, dones


def bind_schedule(benv: BatchedEnv, sched) -> BatchedEnv:
    """Close a host-precomputed SpawnSchedule over every step/reset fn,
    so schedule-driven (bit-exact parity) envs present the same
    no-schedule call surface as on-device-spawn envs."""
    return benv._replace(
        reset=lambda state, s=None: benv.reset(state, s if s is not None
                                               else sched),
        step=lambda st, a, s=None: benv.step(st, a, s if s is not None
                                             else sched),
        step_autoreset=lambda st, a, s=None: benv.step_autoreset(
            st, a, s if s is not None else sched),
        step_autoreset_lazy=lambda st, a, s=None: benv.step_autoreset_lazy(
            st, a, s if s is not None else sched),
    )

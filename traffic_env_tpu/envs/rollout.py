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


def make_batched_env(topo: GridRoad, cfg: Config, n_envs: int,
                     on_device_spawns: bool = True,
                     max_spawns_per_tick: int = 8,
                     core: str = "fast") -> BatchedEnv:
    env = make_env(topo, cfg, on_device_spawns=on_device_spawns,
                   max_spawns_per_tick=max_spawns_per_tick, core=core)

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

    return BatchedEnv(env=env, n_envs=n_envs, init=init, reset=reset,
                      step=step, step_autoreset=step_autoreset,
                      step_autoreset_lazy=step_autoreset_lazy,
                      n_intersections=topo.intersections)


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

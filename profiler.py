#!/usr/bin/env python
"""Profiling harness (reference profiler.py:8-26).

The reference cProfiles 50 random-action episodes of the host-loop
simulator.  Here the whole episode batch runs on device, so the TPU
equivalents are (a) a wall-clock steps/s sweep over the available env
cores and (b) an XLA/jax.profiler trace you can open in TensorBoard
or Perfetto::

    python profiler.py                     # timing sweep, 50 episodes
    python profiler.py --trace=/tmp/prof   # also dump a profiler trace
    python profiler.py --core=fast --num_envs=1024
    python profiler.py --trainer=qlearn    # training throughput
                                           # (learner in the loop)
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

import traffic_env_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS)
from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs.rollout import make_batched_env, random_rollout
from traffic_env_tpu.topology import GridRoad


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--episodes", type=int, default=50)
    p.add_argument("--core", type=str, default="auto")
    p.add_argument("--trace", type=str, default="",
                   help="directory for a jax.profiler trace")
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--trainer", type=str, default="",
                   help="measure end-to-end training throughput for this "
                        "learner (act+env+replay+SGD in one jitted "
                        "episode) instead of random rollouts")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.trainer:
        profile_training(args)
        return

    topo = GridRoad(3, 3, 250.0)
    cfg = Config(history=1, trainer="random",
                 num_envs=args.num_envs).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    core = args.core
    if core == "auto":
        # positive TPU check (matches common.build_env)
        on_tpu = jax.default_backend() == "tpu" or \
            jax.devices()[0].platform in ("tpu", "axon")
        core = "pallas" if on_tpu and args.num_envs % 128 == 0 else "fast"

    benv = make_batched_env(topo, cfg, args.num_envs, core=core)
    state = benv.init(jax.random.key(0))
    state, _ = benv.reset(state)
    episode = jax.jit(lambda st, k: random_rollout(
        benv, st, k, cfg.episode_len))
    key = jax.random.key(1)

    # compile + warm
    state, key, rews, dones = episode(state, key)
    float(jnp.sum(rews))

    def run(n):
        nonlocal state, key
        t0 = time.perf_counter()
        for _ in range(n):
            state, key, rews, dones = episode(state, key)
        float(jnp.sum(rews) + jnp.sum(dones))  # host fetch = real sync
        return time.perf_counter() - t0

    if args.trace:
        with jax.profiler.trace(args.trace):
            run(2)
        print(f"trace written to {args.trace}")

    dt = run(args.episodes)
    ticks = args.episodes * cfg.episode_ticks * args.num_envs
    print(json.dumps({
        "core": core,
        "episodes": args.episodes,
        "num_envs": args.num_envs,
        "wall_s": round(dt, 3),
        "env_steps_per_sec": round(ticks / dt, 1),
        "episodes_per_sec": round(args.episodes * args.num_envs / dt, 2),
    }))


def profile_training(args):
    """End-to-end training throughput: one jitted episode = act + env
    tick + replay insert + SGD, repeated.  Works for any learner
    exposing ``make_state`` (qlearn, qrnn, a3c, polgrad_rnn)."""
    import importlib

    import traffic_env_tpu  # noqa: F401
    from traffic_env_tpu.config import Config

    mod = importlib.import_module(
        f"traffic_env_tpu.algorithms.{args.trainer}")
    cfg = Config(trainer=args.trainer, num_envs=args.num_envs).derive()
    ctx, ts = mod.make_state(cfg)

    def fetch(stats):   # host fetch = real device sync (see bench.py)
        return float(sum(jnp.sum(x)
                         for x in jax.tree_util.tree_leaves(stats)))

    ts, stats = ctx.run_episode(ts)   # compile + warm
    fetch(stats)
    if args.trace:
        with jax.profiler.trace(args.trace):
            ts, stats = ctx.run_episode(ts)
            fetch(stats)
        print(f"trace written to {args.trace}")
    t0 = time.perf_counter()
    for _ in range(args.episodes):
        ts, stats = ctx.run_episode(ts)
    fetch(stats)
    dt = time.perf_counter() - t0
    ticks = args.episodes * cfg.episode_ticks * cfg.num_envs
    print(json.dumps({
        "trainer": args.trainer,
        "episodes": args.episodes,
        "num_envs": cfg.num_envs,
        "wall_s": round(dt, 3),
        "train_env_steps_per_sec": round(ticks / dt, 1),
        "episodes_per_sec": round(args.episodes * cfg.num_envs / dt, 2),
    }))


if __name__ == "__main__":
    main()

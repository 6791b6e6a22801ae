"""Scripted baseline controllers (reference algorithms/{random,const0,
const1,fixed,greedy,spacedgreedy}.py) — the comparison policies learned
controllers must beat.

Each baseline is a pure jitted policy function over the batched env; a
shared runner streams per-episode reward stats like the reference's
print_running_stats loop.  The greedy family reads the per-direction
occupancy grid (``cars_on_roads``) and opens the direction pair with
more cars: ``phase = (occupancy . [1,1,-1,-1]) < 0`` (greedy.py:16),
held for ``spacing`` agent steps.  ``spacedgreedy`` is the same policy
with its own reward accounting (spacedgreedy.py; its run(env_f, _)
arity bug is not ported).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .common import build_env
from ..utils.stats import forever, print_running_stats, write_data

F32 = jnp.float32
I32 = jnp.int32


def make_policies(cfg: Config, benv, topo):
    I = benv.n_intersections
    B = benv.n_envs
    cars_on_roads = benv.env.sim_fns.cars_on_roads
    weights = jnp.asarray([1, 1, -1, -1], F32)

    def random_policy(t, key, env_state, held):
        return jax.random.randint(key, (I, B), 0, 2, dtype=I32), held

    def const0(t, key, env_state, held):
        return jnp.zeros((I, B), I32), held

    def const1(t, key, env_state, held):
        return jnp.ones((I, B), I32), held

    def fixed(t, key, env_state, held):
        """Square wave with period 2*spacing (fixed.py:6-7)."""
        phase = ((t % (cfg.spacing * 2)) >= cfg.spacing).astype(I32)
        return jnp.broadcast_to(phase, (I, B)), held

    def greedy(t, key, env_state, held):
        """Every ``spacing`` steps, open the fuller direction pair
        (greedy.py:12-16)."""
        occ = jax.vmap(cars_on_roads, in_axes=-1, out_axes=-1)(
            env_state.sim).astype(F32)              # (m, n, 4, B)
        scores = jnp.einsum("mndb,d->mnb", occ, weights)
        fresh = (scores < 0).astype(I32).reshape(I, B)
        pick = (t % cfg.spacing) == 0
        a = jnp.where(pick, fresh, held)
        return a, a

    return {"random": random_policy, "const0": const0, "const1": const1,
            "fixed": fixed, "greedy": greedy, "spacedgreedy": greedy}


def episode_runner(cfg: Config, benv, policy):
    """One batched episode -> the reference's episode-reward scalar.
    In validate mode also stacks per-step light times (Repeater info,
    traffic_test.py:41-47)."""
    validate = cfg.mode == "validate"

    @jax.jit
    def run_one(env_state, key):
        env_state, obs = benv.reset(env_state)
        I, B = benv.n_intersections, benv.n_envs
        held0 = jnp.zeros((I, B), I32)

        def body(c, t):
            env_state, key, held, total, n1, n0 = c
            key, k = jax.random.split(key)
            a, held = policy(t, k, env_state, held)
            env_state, obs, rew, done, info = benv.step_autoreset_lazy(
                env_state, a)
            disc = cfg.gamma ** t.astype(F32) if cfg.print_discounted else 1.0
            total = total + jnp.mean(rew) * disc
            n1 = n1 + jnp.sum(a)
            n0 = n0 + a.size - jnp.sum(a)
            ys = info["light_times"] if validate else None
            return (env_state, key, held, total, n1, n0), ys

        (env_state, key, _, total, n1, n0), lt = jax.lax.scan(
            body, (env_state, key, held0, F32(0), jnp.int32(0),
                   jnp.int32(0)), jnp.arange(cfg.episode_len))
        if cfg.print_avg:
            if cfg.gamma == 1:
                total = total / cfg.episode_len
            else:
                total = total / ((cfg.gamma ** cfg.episode_len - 1)
                                 / (cfg.gamma - 1))
        unfinished = jnp.sum(jax.vmap(
            benv.env.sim_fns.cars_per_road, in_axes=-1,
            out_axes=-1)(env_state.sim)) / benv.n_envs
        return env_state, key, total, n1, n0, unfinished, lt

    return run_one


def run(cfg: Config, trainer: str | None = None):
    """Stream per-episode stats until interrupted (or total_episodes)."""
    name = trainer or cfg.trainer
    # greedy family must see raw phases (learn_switch off; greedy.py:8)
    if name in ("random", "fixed", "greedy", "spacedgreedy"):
        cfg = cfg.replace(learn_switch=False)
    topo, cfg, benv = build_env(cfg)
    policy = make_policies(cfg, benv, topo)[name]
    runner = episode_runner(cfg, benv, policy)
    state = {"env": benv.init(jax.random.key(cfg.seed)),
             "key": jax.random.key(cfg.seed + 1)}
    if benv.mesh is not None:
        from ..parallel import shard_env_state
        state["env"] = shard_env_state(benv.mesh, state["env"])

    if cfg.render:
        # host-side rendering (reference traffic_env.py:285-359 via the
        # --render hook): one episode stepped from Python, one frame
        # per agent step for env lane 0, then the normal stats loop
        import os
        from ..render import EpisodeRenderer, TermRenderer
        rend = TermRenderer(
            topo, rate_s=cfg.rate / 2 if cfg.render_ticks else 0.25) \
            if cfg.render_live else \
            EpisodeRenderer(topo, os.path.join(cfg.logdir, "render"))
        env, key = state["env"], state["key"]
        env, _ = benv.reset(env)
        held = jnp.zeros((benv.n_intersections, benv.n_envs), I32)
        ticks_mode = cfg.render_ticks
        rbenv = benv
        if ticks_mode and benv.step_autoreset_lazy_ticks is None:
            # per-tick frames need the XLA fast core (the fused kernel
            # has no per-tick HBM visibility)
            from ..envs.rollout import make_batched_env
            rbenv = make_batched_env(topo, cfg, benv.n_envs, core="fast")
        step_j = jax.jit(rbenv.step_autoreset_lazy_ticks if ticks_mode
                         else rbenv.step_autoreset_lazy)
        for t in range(cfg.episode_len):
            key, k = jax.random.split(key)
            a, held = policy(jnp.int32(t), k, env, held)
            if ticks_mode:
                env, obs, rew, done, _, ticks = step_j(env, a)
                rend.add_ticks(ticks)
            else:
                env, obs, rew, done, _ = step_j(env, a)
                rend.add(env.sim)
        gif = rend.finish(duration_ms=50 if ticks_mode else 250)
        print(f"rendered {len(rend.frames)} frames to {rend.outdir}"
              + (f" ({gif})" if gif else ""))
        state["env"], state["key"] = env, key

    def one_episode():
        th0 = (np.asarray(state["env"].sim.trip_hist)
               if cfg.mode == "validate"
               and state["env"].sim.trip_hist is not None else None)
        env, key, total, n1, n0, unfinished, lt = runner(state["env"],
                                                         state["key"])
        state["env"], state["key"] = env, key
        info = None
        if cfg.mode == "validate":
            tot = max(int(n1) + int(n0), 1)
            lt = np.asarray(lt)
            trip_times: list = []
            if th0 is not None:
                # histogram delta for this episode: bin b = trip of b
                # ticks = b * rate seconds (advance_hack's /2)
                counts = (np.asarray(env.sim.trip_hist) - th0)
                counts = counts.sum(axis=tuple(range(1, counts.ndim)))
                trip_times = np.repeat(
                    np.arange(len(counts)) * cfg.rate, counts).tolist()
            info = {"onep": int(n1) / tot, "zerop": int(n0) / tot,
                    "light_times": lt[lt != 0].tolist(),
                    "trip_times": trip_times,
                    "unfinished": float(unfinished)}
        return float(total), info

    data = print_running_stats(
        forever(one_episode),
        max_iterations=cfg.total_episodes)
    if cfg.interactive:
        return data
    if cfg.mode == "validate":
        import os
        os.makedirs(cfg.logdir, exist_ok=True)
        write_data(cfg, *data, outdir=cfg.logdir)
    return data

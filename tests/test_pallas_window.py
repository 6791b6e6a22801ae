"""The fused Pallas light-period kernel must reproduce the oracle's
Repeater windows bit-for-bit (interpreter mode on CPU; schedule-driven
spawns; 8 envs with independent streams)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import build_batched_schedule
from traffic_env_tpu.envs.fast_core import init_state_compact
from traffic_env_tpu.oracle.stack import OracleEnv
from traffic_env_tpu.ops.pallas_window import make_repeater_window
from traffic_env_tpu.topology import GridRoad

B = 8


def setup(m=3, n=3, length=250.0, **kw):
    topo = GridRoad(m, n, length)
    cfg = Config(grid_m=m, grid_n=n, road_length=length, **kw).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    return topo, cfg


def batched_sim(topo, seeds):
    keys = jax.random.split(jax.random.key(0), len(seeds))
    return jax.vmap(lambda k: init_state_compact(topo, k),
                    in_axes=0, out_axes=-1)(keys)


def test_window_matches_oracle_repeater():
    topo, cfg = setup()
    steps = 30
    seeds = list(range(40, 40 + B))
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, (steps + 2) * cfg.light_iterations, 8))
    oracles = [OracleEnv(topo, cfg, seed=s) for s in seeds]
    rng = np.random.RandomState(9)
    phases = rng.randint(2, size=(B, 9)).astype(np.int32)
    for o, ph in zip(oracles, phases):
        o.sim.reset(phase=ph)
    sim = batched_sim(topo, seeds)
    # reset each env with its phase
    from traffic_env_tpu.envs.fast_core import make_sim_fast
    fns = make_sim_fast(topo, cfg, on_device_spawns=False)
    sim = jax.vmap(fns.reset, in_axes=(-1, 0), out_axes=-1)(
        sim, jnp.asarray(phases))

    rep = make_repeater_window(topo, cfg, on_device_spawns=False,
                               block_envs=B, interpret=True)
    step = jax.jit(lambda s, a: rep(s, a, sched))

    resets = 0
    for t in range(steps):
        acts = rng.randint(2, size=(B, 9)).astype(np.int32)
        sim, obs, rew, done, _ = step(sim, jnp.asarray(acts).T)
        obs = np.asarray(obs)
        rew = np.asarray(rew)
        done = np.asarray(done)
        for b, o in enumerate(oracles):
            obs_o, rew_o, done_o, _ = o._repeater_step(acts[b])
            np.testing.assert_array_equal(
                obs_o, obs[:, b], err_msg=f"obs env {b} step {t}")
            np.testing.assert_array_equal(
                rew_o, rew[:, b], err_msg=f"rew env {b} step {t}")
            assert done_o == bool(done[b]), f"done env {b} step {t}"
        if done.any():
            # finished lanes stay frozen until an external reset — reset
            # everything (both sides) like the training loop would
            resets += 1
            phases = rng.randint(2, size=(B, 9)).astype(np.int32)
            for o, ph in zip(oracles, phases):
                o.sim.reset(phase=ph)
            sim = jax.vmap(fns.reset, in_axes=(-1, 0), out_axes=-1)(
                sim, jnp.asarray(phases))
    assert resets >= 1  # the scenario exercises overflow + reset


def test_window_freezes_done_lanes():
    """Overflowing lanes freeze mid-window and stay done; live lanes
    keep exact trajectories."""
    topo, cfg = setup(m=1, n=1, length=40.0, local_cars_per_sec=0.8)
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    steps = 25
    seeds = list(range(B))
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, (steps + 2) * cfg.light_iterations, 16))
    oracles = [OracleEnv(topo, cfg, seed=s) for s in seeds]
    for o in oracles:
        o.sim.reset(phase=np.zeros(1, np.int32))
    from traffic_env_tpu.envs.fast_core import make_sim_fast
    fns = make_sim_fast(topo, cfg, on_device_spawns=False,
                        max_spawns_per_tick=16)
    sim = batched_sim(topo, seeds)
    sim = jax.vmap(fns.reset, in_axes=(-1, 0), out_axes=-1)(
        sim, jnp.zeros((B, 1), jnp.int32))
    rep = make_repeater_window(topo, cfg, on_device_spawns=False,
                               max_spawns_per_tick=16,
                               block_envs=B, interpret=True)
    step = jax.jit(lambda s, a: rep(s, a, sched))
    frozen = [False] * B
    a = np.zeros((B, 1), np.int32)  # all red -> guaranteed overflow
    for t in range(steps):
        sim, obs, rew, done, _ = step(sim, jnp.asarray(a).T)
        done = np.asarray(done)
        for b, o in enumerate(oracles):
            if frozen[b]:
                assert done[b]  # stays done until an external reset
                continue
            obs_o, rew_o, done_o, _ = o._repeater_step(a[b])
            np.testing.assert_array_equal(obs_o, np.asarray(obs)[:, b],
                                          err_msg=f"env {b} step {t}")
            assert done_o == bool(done[b])
            frozen[b] = done_o
    assert any(frozen)

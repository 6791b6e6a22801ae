"""Equivalence of the parallel (TPU throughput) hand-off kernel with the
exact road-ordered one, and therefore with the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import build_schedule, init_state, make_sim
from traffic_env_tpu.topology import GridRoad


def run(fns, st, actions, sched):
    @jax.jit
    def rollout(st, actions):
        def body(s, a):
            s = fns.tick(s, a, sched)
            return s, (fns.obs(s), s.rewards, s.done)
        return jax.lax.scan(body, st, actions)
    return rollout(st, jnp.asarray(actions))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_parallel_matches_exact(seed):
    topo = GridRoad(3, 3, 250.0)
    cfg = Config().derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    ticks = 500
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, seed, ticks))
    rng = np.random.RandomState(200 + seed)
    phase0 = rng.randint(2, size=9).astype(np.int32)
    actions = rng.randint(2, size=(ticks // 10 + 1, 9)).astype(np.int32)
    actions = actions[np.arange(ticks) // 10]

    outs = {}
    for mode in ("exact", "parallel"):
        fns = make_sim(topo, cfg, on_device_spawns=False, handoff=mode)
        st = fns.reset(init_state(topo, jax.random.key(0)), phase0)
        st_f, (obs, rew, done) = run(fns, st, actions, sched)
        outs[mode] = (np.asarray(obs), np.asarray(rew), np.asarray(done),
                      np.asarray(st_f.cars), np.asarray(st_f.leading),
                      np.asarray(st_f.lastcar))

    done_e = outs["exact"][2]
    # compare up to (and including) the first done tick
    end = int(np.argmax(done_e)) + 1 if done_e.any() else ticks
    for a, b, name in zip(outs["exact"], outs["parallel"],
                          ("obs", "rew", "done", "cars", "leading",
                           "lastcar")):
        if name in ("cars", "leading", "lastcar"):
            if not done_e.any():
                np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_array_equal(a[:end], b[:end], err_msg=name)


def test_parallel_heavy_congestion():
    """Dense spawns + all-red forces queue buildup, wrapping buffers,
    and multi-car crossings on green waves."""
    topo = GridRoad(2, 2, 120.0)
    cfg = Config(grid_m=2, grid_n=2, road_length=120.0,
                 local_cars_per_sec=0.3).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    ticks = 400
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 9, ticks))
    rng = np.random.RandomState(3)
    phase0 = rng.randint(2, size=4).astype(np.int32)
    # long red phases then sudden green: releases whole queues at once
    acts = np.zeros((ticks, 4), np.int32)
    for t in range(ticks):
        acts[t] = (t // 25) % 2
    outs = {}
    for mode in ("exact", "parallel"):
        fns = make_sim(topo, cfg, on_device_spawns=False, handoff=mode)
        st = fns.reset(init_state(topo, jax.random.key(0)), phase0)
        _, (obs, rew, done) = run(fns, st, acts, sched)
        outs[mode] = (np.asarray(obs), np.asarray(rew), np.asarray(done))
    done_e = outs["exact"][2]
    end = int(np.argmax(done_e)) + 1 if done_e.any() else ticks
    assert end > 100
    for a, b, name in zip(outs["exact"], outs["parallel"],
                          ("obs", "rew", "done")):
        np.testing.assert_array_equal(a[:end], b[:end], err_msg=name)

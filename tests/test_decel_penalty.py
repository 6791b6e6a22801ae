"""The reference's latent DECEL_PENALTY shaping (traffic_env.py:20,
196-198,204-207): every tick ADDS count(dv*rate < 0)/10 per training
road to that road's dest reward (a latent bonus — the reference code
adds).  k/10 is non-dyadic, so the per-road add ORDER is part of the
bit contract; all cores must agree with the oracle's ascending-road
sequential loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import build_batched_schedule, build_schedule
from traffic_env_tpu.envs.core import make_sim
from traffic_env_tpu.envs.structs import init_state
from traffic_env_tpu.envs.fast_core import (init_state_compact,
                                            make_sim_fast)
from traffic_env_tpu.oracle import OracleSim
from traffic_env_tpu.oracle.stack import OracleEnv
from traffic_env_tpu.ops.pallas_window import make_repeater_window
from traffic_env_tpu.topology import GridRoad


def setup(m, n, length, **kw):
    topo = GridRoad(m, n, length)
    cfg = Config(grid_m=m, grid_n=n, road_length=length,
                 decel_penalty=True, remi=False, **kw).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    return topo, cfg


def _tick_parity(fns, init_st, topo, cfg, seed, ticks=300):
    oracle = OracleSim(topo, cfg, seed=seed)
    sched = jax.tree.map(jnp.asarray,
                         build_schedule(topo, cfg, seed, ticks))
    rng = np.random.RandomState(50 + seed)
    phase0 = rng.randint(2, size=topo.intersections).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_st, phase0)
    acts = rng.randint(2, size=(ticks // 10 + 1, topo.intersections))
    acts = acts[np.arange(ticks) // 10].astype(np.int32)

    @jax.jit
    def rollout(st, a):
        def body(s, a_t):
            s = fns.tick(s, a_t, sched)
            return s, (fns.obs(s), s.rewards, s.done)
        return jax.lax.scan(body, st, a)

    _, (obs_tr, rew_tr, done_tr) = rollout(st, jnp.asarray(acts))
    obs_tr, rew_tr, done_tr = map(np.asarray, (obs_tr, rew_tr, done_tr))
    saw_decel = False
    for t in range(ticks):
        obs_o, rew_o, done_o, _ = oracle.step(acts[t])
        np.testing.assert_array_equal(obs_o, obs_tr[t],
                                      err_msg=f"obs @ tick {t}")
        np.testing.assert_array_equal(rew_o, rew_tr[t],
                                      err_msg=f"reward @ tick {t}")
        assert done_o == bool(done_tr[t]), f"done @ tick {t}"
        # a non-dyadic positive reward proves the decel path fired
        saw_decel = saw_decel or bool(
            np.any((rew_o > 0) & (rew_o != np.round(rew_o * 2) / 2)))
        if done_o:
            break
    assert saw_decel, "scenario never produced a decelerating car"


def test_decel_exact_core_matches_oracle():
    topo, cfg = setup(1, 2, 100.0, local_cars_per_sec=0.25)
    fns = make_sim(topo, cfg, on_device_spawns=False)
    _tick_parity(fns, init_state(topo, jax.random.key(0)), topo, cfg, 3)


def test_decel_fast_core_matches_oracle():
    topo, cfg = setup(2, 2, 120.0, local_cars_per_sec=0.25)
    fns = make_sim_fast(topo, cfg, on_device_spawns=False)
    _tick_parity(fns, init_state_compact(topo, jax.random.key(0)),
                 topo, cfg, 5)


@pytest.mark.slow   # interpreter battery; decel semantics are covered quick by the
# exact/fast-core oracle twins above
def test_decel_pallas_window_matches_oracle():
    """Window-level parity: the fused kernel's per-tick decel fold and
    per-tick reward accumulation must match the oracle Repeater sums
    bit-for-bit (non-dyadic increments make accumulation order
    observable)."""
    B = 4
    topo, cfg = setup(2, 2, 120.0, local_cars_per_sec=0.25)
    steps = 25
    seeds = list(range(70, 70 + B))
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, (steps + 2) * cfg.light_iterations, 8))
    oracles = [OracleEnv(topo, cfg, seed=s) for s in seeds]
    rng = np.random.RandomState(11)
    I = topo.intersections
    phases = rng.randint(2, size=(B, I)).astype(np.int32)
    for o, ph in zip(oracles, phases):
        o.sim.reset(phase=ph)
    fns = make_sim_fast(topo, cfg, on_device_spawns=False)
    keys = jax.random.split(jax.random.key(0), B)
    sim = jax.vmap(lambda k: init_state_compact(topo, k),
                   in_axes=0, out_axes=-1)(keys)
    sim = jax.vmap(fns.reset, in_axes=(-1, 0), out_axes=-1)(
        sim, jnp.asarray(phases))
    rep = make_repeater_window(topo, cfg, on_device_spawns=False,
                               block_envs=B, interpret=True)
    step = jax.jit(lambda s, a: rep(s, a, sched))
    saw_decel = False
    for t in range(steps):
        acts = rng.randint(2, size=(B, I)).astype(np.int32)
        sim, obs, rew, done, _ = step(sim, jnp.asarray(acts).T)
        obs, rew, done = map(np.asarray, (obs, rew, done))
        for b, o in enumerate(oracles):
            obs_o, rew_o, done_o, _ = o._repeater_step(acts[b])
            np.testing.assert_array_equal(
                obs_o, obs[:, b], err_msg=f"obs env {b} step {t}")
            np.testing.assert_array_equal(
                rew_o, rew[:, b], err_msg=f"rew env {b} step {t}")
            assert done_o == bool(done[b]), f"done env {b} step {t}"
            saw_decel = saw_decel or bool(
                np.any(rew_o != np.round(rew_o * 2) / 2))
        if done.any():
            phases = rng.randint(2, size=(B, I)).astype(np.int32)
            for o, ph in zip(oracles, phases):
                o.sim.reset(phase=ph)
            sim = jax.vmap(fns.reset, in_axes=(-1, 0), out_axes=-1)(
                sim, jnp.asarray(phases))
    assert saw_decel


def test_decel_off_is_default_and_unchanged():
    """decel_penalty defaults off; the flag's wiring must not perturb
    the default path (rewards stay multiples of 0.5/10)."""
    topo = GridRoad(1, 2, 100.0)
    cfg = Config(grid_m=1, grid_n=2, road_length=100.0,
                 remi=False).derive()
    assert not cfg.decel_penalty
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    fns = make_sim_fast(topo, cfg, on_device_spawns=False)
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 0, 200))
    st = fns.reset(init_state_compact(topo, jax.random.key(0)),
                   np.zeros(2, np.int32))
    rews = []
    for t in range(200):
        st = fns.tick(st, np.zeros(2, np.int32), sched)
        rews.append(np.asarray(st.rewards))
    r = np.stack(rews)
    np.testing.assert_array_equal(r, np.round(r * 2) / 2)

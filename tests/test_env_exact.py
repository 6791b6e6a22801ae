"""Bit-exactness of the jitted JAX core against the NumPy oracle.

Every observation element (int32), reward vector (float32), and done
flag must match exactly, tick for tick, on the CPU backend — including
the overflow tick and across episode resets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import (build_schedule, init_state, make_sim)
from traffic_env_tpu.oracle import OracleSim
from traffic_env_tpu.topology import GridRoad


def setup(m, n, length, seed, **kw):
    topo = GridRoad(m, n, length)
    cfg = Config(grid_m=m, grid_n=n, road_length=length, **kw).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    oracle = OracleSim(topo, cfg, seed=seed)
    fns = make_sim(topo, cfg, on_device_spawns=False)
    return topo, cfg, oracle, fns


def jitted_rollout(fns, sched):
    @jax.jit
    def rollout(st, actions):
        def body(s, a):
            s = fns.tick(s, a, sched)
            return s, (fns.obs(s), s.rewards, s.done)
        return jax.lax.scan(body, st, actions)
    return rollout


def compare(oracle, fns, st, actions, sched, stop_on_done=True):
    """Run both sims over the same per-tick action sequence; assert
    bitwise equality.  Returns (ticks run, final jax state)."""
    rollout = jitted_rollout(fns, sched)
    st_f, (obs_tr, rew_tr, done_tr) = rollout(st, jnp.asarray(actions))
    obs_tr = np.asarray(obs_tr)
    rew_tr = np.asarray(rew_tr)
    done_tr = np.asarray(done_tr)
    for t in range(len(actions)):
        obs_o, rew_o, done_o, _ = oracle.step(actions[t])
        np.testing.assert_array_equal(obs_o, obs_tr[t], err_msg=f"obs @ tick {t}")
        np.testing.assert_array_equal(rew_o, rew_tr[t], err_msg=f"reward @ tick {t}")
        assert done_o == bool(done_tr[t]), f"done @ tick {t}"
        if done_o and stop_on_done:
            return t + 1, st_f, t
    return len(actions), st_f, None


def held_actions(rng, n_ticks, n_int, hold=10):
    a = rng.randint(2, size=(n_ticks // hold + 1, n_int)).astype(np.int32)
    return a[np.arange(n_ticks) // hold]


@pytest.mark.parametrize("m,n,length,seed", [
    (1, 1, 100.0, 0),
    (2, 2, 150.0, 1),
    (3, 3, 250.0, 7),
])
def test_exact_random_policy(m, n, length, seed):
    topo, cfg, oracle, fns = setup(m, n, length, seed)
    ticks = 400
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, seed, ticks))
    rng = np.random.RandomState(100 + seed)
    phase0 = rng.randint(2, size=topo.intersections).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state(topo, jax.random.key(0)), phase0)
    actions = held_actions(rng, ticks, topo.intersections)
    ran, *_ = compare(oracle, fns, st, actions, sched)
    assert ran > 50  # a meaningful stretch before any overflow


def test_exact_learn_switch():
    topo, cfg, oracle, fns = setup(2, 2, 200.0, 3, learn_switch=True)
    ticks = 300
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 3, ticks))
    rng = np.random.RandomState(5)
    phase0 = rng.randint(2, size=4).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state(topo, jax.random.key(0)), phase0)
    # sparse switching actions
    actions = (rng.random_sample((ticks, 4)) < 0.05).astype(np.int32)
    compare(oracle, fns, st, actions, sched)


def test_exact_regular_spawner():
    topo, cfg, oracle, fns = setup(2, 2, 200.0, 9, poisson=False)
    ticks = 200
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 9, ticks))
    rng = np.random.RandomState(2)
    phase0 = np.zeros(4, np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state(topo, jax.random.key(0)), phase0)
    actions = held_actions(rng, ticks, 4)
    compare(oracle, fns, st, actions, sched)


def test_exact_across_reset():
    """Episode ends (fixed horizon), both reset, stream continues."""
    topo, cfg, oracle, fns = setup(3, 3, 250.0, 21)
    seg = 120
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 21, 3 * seg))
    rng = np.random.RandomState(4)
    st = fns.reset(init_state(topo, jax.random.key(0)),
                   np.zeros(9, np.int32))
    oracle.reset(phase=np.zeros(9, np.int32))
    for episode in range(3):
        phase0 = rng.randint(2, size=9).astype(np.int32)
        oracle.reset(phase=phase0)
        st = fns.reset(st, phase0)
        actions = held_actions(rng, seg, 9)
        _, st, done_at = compare(oracle, fns, st, actions, sched,
                                 stop_on_done=False)
    # the stream advanced 3*seg ticks on both sides
    assert int(st.global_tick) == 3 * seg


def test_exact_one_entry_side():
    topo, cfg, oracle, fns = setup(3, 3, 250.0, 13, entry="one")
    topo.set_entry_mask(0b1110)
    cfg = derive_spawn_rate(cfg, topo.open_sides(0b1110))
    oracle = OracleSim(topo, cfg, seed=13)
    fns = make_sim(topo, cfg, on_device_spawns=False)
    ticks = 300
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 13, ticks))
    rng = np.random.RandomState(6)
    phase0 = rng.randint(2, size=9).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state(topo, jax.random.key(0)), phase0)
    actions = held_actions(rng, ticks, 9)
    compare(oracle, fns, st, actions, sched)


def test_exact_long_horizon_with_resets():
    """A full default episode length (1200 ticks) several times over,
    resetting whenever either sim reports done."""
    topo, cfg, oracle, fns = setup(3, 3, 250.0, 31)
    total = 2400
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 31, total))
    rng = np.random.RandomState(8)
    st = init_state(topo, jax.random.key(0))
    tick = jax.jit(lambda s, a: fns.tick(s, a, sched))
    phase0 = rng.randint(2, size=9).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(st, phase0)
    actions = held_actions(rng, total, 9)
    resets = 0
    for t in range(total):
        obs_o, rew_o, done_o, _ = oracle.step(actions[t])
        st = tick(st, actions[t])
        np.testing.assert_array_equal(obs_o, np.asarray(fns.obs(st)),
                                      err_msg=f"obs @ tick {t}")
        np.testing.assert_array_equal(rew_o, np.asarray(st.rewards),
                                      err_msg=f"reward @ tick {t}")
        assert done_o == bool(st.done), f"done @ tick {t}"
        if done_o:
            resets += 1
            phase = rng.randint(2, size=9).astype(np.int32)
            oracle.reset(phase=phase)
            st = fns.reset(st, phase)
    assert resets >= 1  # random policy overflows at least once


def test_float_state_bit_exact():
    """Car x/v float32 state matches bit-for-bit on occupied slots."""
    topo, cfg, oracle, fns = setup(3, 3, 250.0, 7)
    ticks = 200
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 7, ticks))
    rng = np.random.RandomState(107)
    phase0 = rng.randint(2, size=9).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state(topo, jax.random.key(0)), phase0)
    actions = held_actions(rng, ticks, 9)
    rollout = jitted_rollout(fns, sched)
    st, _ = rollout(st, jnp.asarray(actions))
    for t in range(ticks):
        _, _, done, _ = oracle.step(actions[t])
        assert not done
    xo = oracle.cars[:, :2, 1:]          # oracle slots 1..19
    xj = np.asarray(st.cars[:, :2, :])   # jax slots 0..18
    occ = np.zeros((topo.roads, 19), dtype=bool)
    lead, last = oracle.leading, oracle.lastcar
    for e in range(topo.roads):
        ncars = (last[e] - lead[e]) % 19
        s = lead[e]
        for _ in range(ncars):
            s = 1 if s + 1 >= 20 else s + 1
            occ[e, s - 1] = True
    assert occ.sum() > 20
    np.testing.assert_array_equal(xo[:, 0][occ], xj[:, 0][occ])  # x bit-exact
    np.testing.assert_array_equal(xo[:, 1][occ], xj[:, 1][occ])  # v bit-exact

"""Bit-exactness of the dense compact TPU core (envs/fast_core.py)
against the NumPy oracle — the same battery the gather core passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import build_schedule
from traffic_env_tpu.envs.fast_core import init_state_compact, make_sim_fast
from traffic_env_tpu.oracle import OracleSim
from traffic_env_tpu.topology import GridRoad


def setup(m, n, length, seed, **kw):
    topo = GridRoad(m, n, length)
    cfg = Config(grid_m=m, grid_n=n, road_length=length, **kw).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    oracle = OracleSim(topo, cfg, seed=seed)
    fns = make_sim_fast(topo, cfg, on_device_spawns=False)
    return topo, cfg, oracle, fns


def held_actions(rng, n_ticks, n_int, hold=10):
    a = rng.randint(2, size=(n_ticks // hold + 1, n_int)).astype(np.int32)
    return a[np.arange(n_ticks) // hold]


def compare(topo, oracle, fns, st, actions, sched):
    @jax.jit
    def rollout(st, acts):
        def body(s, a):
            s = fns.tick(s, a, sched)
            return s, (fns.obs(s), s.rewards, s.done)
        return jax.lax.scan(body, st, acts)

    st_f, (obs_tr, rew_tr, done_tr) = rollout(st, jnp.asarray(actions))
    obs_tr, rew_tr, done_tr = map(np.asarray, (obs_tr, rew_tr, done_tr))
    for t in range(len(actions)):
        obs_o, rew_o, done_o, _ = oracle.step(actions[t])
        np.testing.assert_array_equal(obs_o, obs_tr[t],
                                      err_msg=f"obs @ tick {t}")
        np.testing.assert_array_equal(rew_o, rew_tr[t],
                                      err_msg=f"reward @ tick {t}")
        assert done_o == bool(done_tr[t]), f"done @ tick {t}"
        if done_o:
            return t + 1, st_f
    return len(actions), st_f


@pytest.mark.parametrize("m,n,length,seed", [
    (1, 1, 100.0, 0),
    (2, 2, 150.0, 1),
    (3, 3, 250.0, 7),
])
def test_fast_exact_random_policy(m, n, length, seed):
    topo, cfg, oracle, fns = setup(m, n, length, seed)
    ticks = 400
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, seed, ticks))
    rng = np.random.RandomState(100 + seed)
    phase0 = rng.randint(2, size=topo.intersections).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state_compact(topo, jax.random.key(0)), phase0)
    actions = held_actions(rng, ticks, topo.intersections)
    ran, _ = compare(topo, oracle, fns, st, actions, sched)
    assert ran > 50


def test_fast_exact_congestion():
    """Queues, wrapped ring buffers, multi-car green-wave crossings."""
    topo, cfg, oracle, fns = setup(2, 2, 120.0, 3, local_cars_per_sec=0.3)
    ticks = 400
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 3, ticks))
    acts = np.zeros((ticks, 4), np.int32)
    for t in range(ticks):
        acts[t] = (t // 25) % 2
    phase0 = np.zeros(4, np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state_compact(topo, jax.random.key(0)), phase0)
    compare(topo, oracle, fns, st, acts, sched)


def test_fast_exact_long_horizon_with_resets():
    topo, cfg, oracle, fns = setup(3, 3, 250.0, 31)
    total = 2400
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 31, total))
    rng = np.random.RandomState(8)
    st = init_state_compact(topo, jax.random.key(0))
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
    assert resets >= 1


def test_fast_learn_switch():
    topo, cfg, oracle, fns = setup(2, 2, 200.0, 3, learn_switch=True)
    ticks = 300
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 3, ticks))
    rng = np.random.RandomState(5)
    phase0 = rng.randint(2, size=4).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state_compact(topo, jax.random.key(0)), phase0)
    actions = (rng.random_sample((ticks, 4)) < 0.05).astype(np.int32)
    compare(topo, oracle, fns, st, actions, sched)


def _queue_cars_oracle(o, e):
    """(x, v) per car in queue order (oracle 20-slot mirror layout)."""
    out, p = [], int(o.leading[e])
    while p != int(o.lastcar[e]):
        p = p + 1 if p < 19 else 1
        out.append((float(o.cars[e, 0, p]), float(o.cars[e, 1, p])))
    return out


def _queue_cars_fast(st, e):
    """(x, v) per car in queue order (fast 19-slot mirror-free ring)."""
    x = np.asarray(st.cars)[e, 0]
    v = np.asarray(st.cars)[e, 1]
    lf, sf = int(np.asarray(st.leading)[e]), int(np.asarray(st.lastcar)[e])
    out, p = [], lf
    while p != sf:
        p = (p + 1) % x.shape[0]
        out.append((float(x[p]), float(v[p])))
    return out


def test_fast_car_planes_bitexact():
    """Every car's (x, v) must match the oracle bit-for-bit in queue
    order, every tick — obs-level parity alone cannot see ULP drift in
    queued cars (integer detector counts mask it; caught for real by
    the decel-penalty reward, whose dv<0 test exposes dvr ULPs).
    Regression for the constant-fold bug where XLA turned the spawn /
    hand-off clamp chain (x - l) - s0 into x - (l + s0)."""
    topo, cfg, oracle, fns = setup(2, 2, 120.0, 7, local_cars_per_sec=0.25)
    ticks = 500
    sched = jax.tree.map(jnp.asarray, build_schedule(topo, cfg, 7, ticks))
    rng = np.random.RandomState(71)
    phase0 = rng.randint(2, size=4).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(init_state_compact(topo, jax.random.key(0)), phase0)
    tick = jax.jit(lambda s, a: fns.tick(s, a, sched))
    actions = held_actions(rng, ticks, 4)
    clamped = False
    for t in range(ticks):
        obs_o, rew_o, done_o, _ = oracle.step(actions[t])
        st = tick(st, actions[t])
        for e in range(topo.roads):
            co = _queue_cars_oracle(oracle, e)
            cf = _queue_cars_fast(st, e)
            assert co == cf, f"road {e} tick {t}: {co} != {cf}"
            clamped = clamped or any(x < 0 for x, _ in co)
        if done_o:
            phase0 = rng.randint(2, size=4).astype(np.int32)
            oracle.reset(phase=phase0)
            st = fns.reset(st, phase0)
    assert clamped, "scenario never exercised the spawn clamp chain"

"""Multi-archetype car tables through every core (k > 1 spawning).

The reference samples each spawned car's parameters uniformly from an
extensible archetype table (traffic_env.py:32-43; the ``randint`` draw
at :164).  The oracle carries full per-car parameter rows; the compact
fast core and the Pallas kernel instead carry an archetype-index row
and select parameters with one-hot where-chains.  These tests pin a
2-row table (car + slow long truck) bit-exact across oracle == fast ==
exact == Pallas(interpret), both schedule-driven and with the
on-device per-car index draw.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu import constants as C
from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import build_schedule, build_batched_schedule
from traffic_env_tpu.envs.core import make_sim
from traffic_env_tpu.envs.fast_core import (init_state_compact,
                                            make_sim_fast, n_car_rows)
from traffic_env_tpu.envs.structs import init_state
from traffic_env_tpu.oracle import OracleSim
from traffic_env_tpu.topology import GridRoad

B = 8


def two_archetypes():
    """Row 0: the shipped car.  Row 1: a slow 7 m truck with softer
    acceleration and bigger gaps (delta stays 4: the cores' two-squaring
    free-flow term requires it)."""
    t = np.zeros((2, C.NPARAMS), np.float32)
    t[0] = C.ARCHETYPES[0]
    t[1, C.V] = 8.0
    t[1, C.A] = 2.0
    t[1, C.DELTA] = 4.0
    t[1, C.V0] = 9.5
    t[1, C.L] = 7.0
    t[1, C.B] = 4.0
    t[1, C.T] = 2.5
    t[1, C.S0] = 2.0
    return t


def setup(m, n, length, **kw):
    topo = GridRoad(m, n, length)
    cfg = Config(grid_m=m, grid_n=n, road_length=length, **kw).derive()
    return topo, derive_spawn_rate(cfg, topo.open_sides(0))


def held_actions(rng, n_ticks, n_int, hold=10):
    a = rng.randint(2, size=(n_ticks // hold + 1, n_int)).astype(np.int32)
    return a[np.arange(n_ticks) // hold]


def drive_vs_oracle(topo, cfg, oracle, fns, st, actions, sched,
                    reset_rng=None):
    tick = jax.jit(lambda s, a: fns.tick(s, a, sched))
    resets = 0
    for t in range(len(actions)):
        obs_o, rew_o, done_o, _ = oracle.step(actions[t])
        st = tick(st, actions[t])
        np.testing.assert_array_equal(obs_o, np.asarray(fns.obs(st)),
                                      err_msg=f"obs @ tick {t}")
        np.testing.assert_array_equal(rew_o, np.asarray(st.rewards),
                                      err_msg=f"reward @ tick {t}")
        assert done_o == bool(st.done), f"done @ tick {t}"
        if done_o:
            if reset_rng is None:
                break
            resets += 1
            phase = reset_rng.randint(
                2, size=topo.intersections).astype(np.int32)
            oracle.reset(phase=phase)
            st = fns.reset(st, phase)
    return resets


def test_schedule_records_archetype_draws():
    topo, cfg = setup(2, 2, 150.0)
    tab = two_archetypes()
    sched = build_schedule(topo, cfg, 5, 600, archetypes=tab)
    assert sched.aidx is not None
    drawn = sched.aidx[sched.roads > -1]
    # both archetypes must actually appear in the stream
    mask = np.repeat(np.arange(sched.roads.shape[1])[None, :],
                     600, 0) < sched.counts[:, None]
    picks = sched.aidx[mask]
    assert set(np.unique(picks)) == {0, 1}
    # k == 1 stays index-free (no aidx arrays in the benchmark path)
    assert build_schedule(topo, cfg, 5, 100).aidx is None


@pytest.mark.parametrize("core", ["fast", "exact"])
def test_multi_archetype_matches_oracle(core):
    """Schedule-driven k=2 trajectories: oracle == fast/exact core,
    bit-for-bit, across congestion, hand-offs and resets."""
    topo, cfg = setup(2, 2, 120.0, local_cars_per_sec=0.25)
    tab = two_archetypes()
    ticks = 700
    sched_np = build_schedule(topo, cfg, 11, ticks, archetypes=tab)
    sched = jax.tree.map(jnp.asarray, sched_np)
    oracle = OracleSim(topo, cfg, seed=11, archetypes=tab)
    if core == "fast":
        fns = make_sim_fast(topo, cfg, on_device_spawns=False,
                            archetypes=tab)
        st0 = init_state_compact(topo, jax.random.key(0),
                                 rows=n_car_rows(tab))
    else:
        fns = make_sim(topo, cfg, on_device_spawns=False, archetypes=tab)
        st0 = init_state(topo, jax.random.key(0))
    rng = np.random.RandomState(42)
    phase0 = rng.randint(2, size=topo.intersections).astype(np.int32)
    oracle.reset(phase=phase0)
    st = fns.reset(st0, phase0)
    actions = held_actions(rng, ticks, topo.intersections)
    drive_vs_oracle(topo, cfg, oracle, fns, st, actions, sched,
                    reset_rng=np.random.RandomState(9))
    # the stream must have actually mixed archetypes
    mask = (np.arange(sched_np.roads.shape[1])[None, :]
            < sched_np.counts[:, None])
    assert set(np.unique(sched_np.aidx[mask])) == {0, 1}


def test_multi_archetype_on_device_fast_matches_exact():
    """On-device threefry spawning with the per-car archetype draw:
    the fast core's split sequence must mirror the exact core's, so
    both produce bit-identical trajectories from the same key."""
    topo, cfg = setup(1, 2, 100.0)
    tab = two_archetypes()
    f_fast = make_sim_fast(topo, cfg, on_device_spawns=True,
                           archetypes=tab)
    f_ex = make_sim(topo, cfg, on_device_spawns=True, archetypes=tab)
    key = jax.random.key(3)
    phase0 = jnp.zeros(topo.intersections, jnp.int32)
    sa = f_fast.reset(init_state_compact(topo, key,
                                         rows=n_car_rows(tab)), phase0)
    sb = f_ex.reset(init_state(topo, key), phase0)
    rng = np.random.RandomState(0)
    acts = held_actions(rng, 300, topo.intersections)
    ta = jax.jit(lambda s, a: f_fast.tick(s, a, None))
    tb = jax.jit(lambda s, a: f_ex.tick(s, a, None))
    ai_seen = set()
    for t in range(len(acts)):
        sa, sb = ta(sa, acts[t]), tb(sb, acts[t])
        np.testing.assert_array_equal(
            np.asarray(f_fast.obs(sa)), np.asarray(f_ex.obs(sb)),
            err_msg=f"obs @ tick {t}")
        np.testing.assert_array_equal(np.asarray(sa.rewards),
                                      np.asarray(sb.rewards))
        assert bool(sa.done) == bool(sb.done)
        d = (np.asarray(sa.lastcar) - np.asarray(sa.leading)) % C.RING
        ai = np.asarray(sa.cars[:, 3])
        for r in range(topo.roads):
            for k in range(1, d[r] + 1):
                ai_seen.add(int(ai[r, (np.asarray(sa.leading)[r] + k)
                                 % C.RING]))
        if bool(sa.done):
            sa = f_fast.reset(sa)
            # keep keys aligned: exact reset draws phase from its own
            # key the same way
            sb = f_ex.reset(sb)
            np.testing.assert_array_equal(np.asarray(sa.phase),
                                          np.asarray(sb.phase))
    assert ai_seen >= {0, 1}   # both archetypes were actually on-road


@pytest.mark.slow   # full-episode interpreter battery; quick tier keeps the archetype
# oracle==exact==fast chain and the generic fast==pallas battery
def test_multi_archetype_pallas_matches_fast():
    """The fused kernel with the archetype-index plane: schedule-driven
    k=2 windows (spawns, IDM, hand-offs, lazy resets) bit-equal to the
    XLA fast core."""
    from traffic_env_tpu.envs.rollout import make_batched_env

    topo, cfg = setup(2, 2, 120.0, history=2, local_cars_per_sec=0.25)
    tab = two_archetypes()
    steps = 16
    seeds = list(range(20, 20 + B))
    n_win = steps + cfg.history + 6
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, n_win * cfg.light_iterations, 8,
        archetypes=tab))
    kw = dict(on_device_spawns=False, max_spawns_per_tick=8,
              archetypes=tab)
    fast = make_batched_env(topo, cfg, B, core="fast", **kw)
    pal = make_batched_env(topo, cfg, B, core="pallas", block_envs=B,
                           interpret=True, **kw)
    sf = fast.init(jax.random.key(5))
    sp = jax.tree.map(lambda a: a, sf)
    sf, of = fast.reset(sf, sched)
    sp, op = pal.reset(sp, sched)
    np.testing.assert_array_equal(np.asarray(of), np.asarray(op))
    rng = np.random.RandomState(3)
    f_step = jax.jit(lambda s, a: fast.step_autoreset_lazy(s, a, sched))
    p_step = jax.jit(lambda s, a: pal.step_autoreset_lazy(s, a, sched))
    I = topo.intersections
    for t in range(steps):
        a = jnp.asarray(rng.randint(2, size=(I, B)).astype(np.int32))
        sf, of, rf, df, _ = f_step(sf, a)
        sp, op, rp, dp, _ = p_step(sp, a)
        np.testing.assert_array_equal(np.asarray(of), np.asarray(op),
                                      err_msg=f"obs step {t}")
        np.testing.assert_array_equal(np.asarray(rf), np.asarray(rp),
                                      err_msg=f"rew step {t}")
        np.testing.assert_array_equal(np.asarray(df), np.asarray(dp))
    # final full-state parity incl. the archetype-index plane
    for fld in ("cars", "leading", "lastcar", "phase", "elapsed",
                "waiting", "detected", "passed_dst", "global_tick"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sf.sim, fld)),
            np.asarray(getattr(sp.sim, fld)), err_msg=fld)

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


@pytest.mark.slow   # oracle==pallas is implied transitively by the quick oracle==fast
# (test_fast_core) and fast==pallas (test_pallas_benv_matches_fast_benv)
# chains; the direct battery stays in the full suite
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


def test_pallas_benv_matches_fast_benv():
    """The full shaped step (Repeater+Remi) through the Pallas batched
    env must be bit-identical to the XLA fast-core batched env in
    schedule-driven mode."""
    from traffic_env_tpu.envs.rollout import make_batched_env
    topo, cfg = setup()
    steps = 12
    seeds = list(range(8))
    # reset alone consumes 1 + (history-1) windows of the schedule
    n_win = steps + cfg.history + 4
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, n_win * cfg.light_iterations, 8))
    kw = dict(on_device_spawns=False)
    fast = make_batched_env(topo, cfg, B, core="fast", **kw)
    pal = make_batched_env(topo, cfg, B, core="pallas", block_envs=B,
                           interpret=True, **kw)
    sf = fast.init(jax.random.key(5))
    sp = jax.tree.map(lambda a: a, sf)
    sf, of = fast.reset(sf, sched)
    sp, op = pal.reset(sp, sched)
    np.testing.assert_array_equal(np.asarray(of), np.asarray(op))
    rng = np.random.RandomState(3)
    f_step = jax.jit(lambda s, a: fast.step(s, a, sched))
    p_step = jax.jit(lambda s, a: pal.step(s, a, sched))
    for t in range(steps):
        a = jnp.asarray(rng.randint(2, size=(9, B)).astype(np.int32))
        sf, of, rf, df, _ = f_step(sf, a)
        sp, op, rp, dp, _ = p_step(sp, a)
        np.testing.assert_array_equal(np.asarray(of), np.asarray(op),
                                      err_msg=f"obs step {t}")
        np.testing.assert_array_equal(np.asarray(rf), np.asarray(rp),
                                      err_msg=f"rew step {t}")
        np.testing.assert_array_equal(np.asarray(df), np.asarray(dp))


def test_inkernel_autoreset_matches_external_reset():
    """autoreset=True (in-kernel lazy reset of done lanes) must equal
    the non-autoreset kernel followed by an external fast-core reset
    (phase=0, matching the schedule-driven kernel's deterministic
    reset phase)."""
    from traffic_env_tpu.envs.fast_core import make_sim_fast
    topo, cfg = setup(m=1, n=1, length=40.0, local_cars_per_sec=0.8)
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    steps = 25
    seeds = list(range(B))
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, (steps + 2) * cfg.light_iterations, 16))
    fns = make_sim_fast(topo, cfg, on_device_spawns=False,
                        max_spawns_per_tick=16)
    kw = dict(on_device_spawns=False, max_spawns_per_tick=16,
              block_envs=B, interpret=True)
    rep_a = make_repeater_window(topo, cfg, autoreset=True, **kw)
    rep_b = make_repeater_window(topo, cfg, autoreset=False, **kw)

    def mk():
        sim = batched_sim(topo, seeds)
        return jax.vmap(fns.reset, in_axes=(-1, 0), out_axes=-1)(
            sim, jnp.zeros((B, 1), jnp.int32))
    sa, sb = mk(), mk()
    step_a = jax.jit(lambda s, a: rep_a(s, a, sched))
    step_b = jax.jit(lambda s, a: rep_b(s, a, sched))
    from traffic_env_tpu.ops.pallas_window import lazy_reset_phase

    def reset_like_kernel(st):
        # the kernel's schedule-mode lazy reset draws a deterministic
        # hash phase from each lane's frozen global tick
        ph = lazy_reset_phase(st.global_tick, 1)      # (1, B)
        return jax.vmap(fns.reset, in_axes=(-1, 0), out_axes=-1)(
            st, jnp.transpose(ph))
    reset_b = jax.jit(reset_like_kernel)
    n_resets = 0
    a = jnp.zeros((1, B), jnp.int32)
    for t in range(steps):
        sa, oa, ra, da, _ = step_a(sa, a)
        # external lazy reset for the B-side (before its next window)
        sb, ob, rb, db, _ = step_b(sb, a)
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob),
                                      err_msg=f"obs step {t}")
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
        np.testing.assert_array_equal(np.asarray(da), np.asarray(db))
        if bool(np.asarray(db).any()):
            n_resets += 1
            fresh = reset_b(sb)
            sel = lambda f, o: jnp.where(sb.done, f, o)
            sb = jax.tree.map(sel, fresh, sb)
    assert n_resets >= 1


@pytest.mark.slow   # validate-telemetry parity battery; compiled on-chip equivalent runs
# in the parity_tpu.py gate (PARITY_TPU.json)
def test_pallas_validate_trip_hist_matches_fast():
    """Validate-mode telemetry through the Pallas path: the kernel's
    exit-pop event stream, scattered into the trip histogram outside
    the kernel, must reproduce the fast core's in-XLA trip_hist (and
    the per-step light_times must match)."""
    from traffic_env_tpu.envs.rollout import make_batched_env
    topo, cfg = setup(mode="validate")
    steps = 14
    seeds = list(range(8))
    n_win = steps + cfg.history + 4
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, n_win * cfg.light_iterations, 8))
    kw = dict(on_device_spawns=False)
    fast = make_batched_env(topo, cfg, B, core="fast", **kw)
    pal = make_batched_env(topo, cfg, B, core="pallas", block_envs=B,
                           interpret=True, **kw)
    sf = fast.init(jax.random.key(5))
    sp = jax.tree.map(lambda a: a, sf)
    assert sf.sim.trip_hist is not None
    sf, _ = fast.reset(sf, sched)
    sp, _ = pal.reset(sp, sched)
    rng = np.random.RandomState(3)
    f_step = jax.jit(lambda s, a: fast.step(s, a, sched))
    p_step = jax.jit(lambda s, a: pal.step(s, a, sched))
    for t in range(steps):
        a = jnp.asarray(rng.randint(2, size=(9, B)).astype(np.int32))
        sf, of, rf, df, inf_f = f_step(sf, a)
        sp, op, rp, dp, inf_p = p_step(sp, a)
        np.testing.assert_array_equal(np.asarray(of), np.asarray(op))
        np.testing.assert_array_equal(
            np.asarray(inf_f["light_times"]),
            np.asarray(inf_p["light_times"]), err_msg=f"lt step {t}")
        np.testing.assert_array_equal(
            np.asarray(sf.sim.trip_hist), np.asarray(sp.sim.trip_hist),
            err_msg=f"trip_hist step {t}")
    assert int(np.asarray(sf.sim.trip_hist).sum()) > 0


@pytest.mark.slow   # full-episode extension battery; occupancy math is also covered
# quick by the fast-core path in test_fast_core/test_wrappers
def test_occupancy_obs_extension_parity():
    """--occupancy_obs appends normalized per-road occupancy to the
    observation; the Pallas path (appended outside the kernel) must be
    bit-identical to the fast core's in-step append, and the tail must
    equal cars_per_road/18."""
    from traffic_env_tpu.envs.rollout import make_batched_env
    topo, cfg = setup(occupancy_obs=True)
    seeds = list(range(8))
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, 16 * cfg.light_iterations, 8))
    kw = dict(on_device_spawns=False)
    fast = make_batched_env(topo, cfg, B, core="fast", **kw)
    pal = make_batched_env(topo, cfg, B, core="pallas", block_envs=B,
                           interpret=True, **kw)
    assert fast.env.obs_dim == 2 * 36 + 9 + 36
    sf = fast.init(jax.random.key(5))
    sp = jax.tree.map(lambda a: a, sf)
    sf, of = fast.reset(sf, sched)
    sp, op = pal.reset(sp, sched)
    np.testing.assert_array_equal(np.asarray(of), np.asarray(op))
    rng = np.random.RandomState(3)
    f_step = jax.jit(lambda s, a: fast.step(s, a, sched))
    p_step = jax.jit(lambda s, a: pal.step(s, a, sched))
    for t in range(10):
        a = jnp.asarray(rng.randint(2, size=(9, B)).astype(np.int32))
        sf, of, rf, df, _ = f_step(sf, a)
        sp, op, rp, dp, _ = p_step(sp, a)
        np.testing.assert_array_equal(np.asarray(of), np.asarray(op),
                                      err_msg=f"obs step {t}")
        occ = (np.asarray(sf.sim.lastcar) - np.asarray(sf.sim.leading)) \
            % 19
        newest = np.asarray(of)[-1]      # obs is a history stack
        np.testing.assert_allclose(
            newest[-36:], occ[:36].astype(np.float32) / 18.0)
    assert int(occ.sum()) > 0

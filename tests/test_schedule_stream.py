"""Chunked exact-mode arrival streams (spawn.ScheduleStream).

The reference's spawner is one persistent per-env MT19937 generator for
the whole run (traffic_env.py:159-176, 250-253).  --exact replays it in
O(chunk) windows carried inside EnvState.sched, so bit-reproducible
soaks neither materialize the whole-run schedule nor fall off the
throughput (Pallas) core.  These tests pin: window == monolithic
schedule, the forward-only/overrun guards, chunked-stream Pallas ==
monolithic-schedule fast core bit-for-bit, and the full train loop
running under --exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import ScheduleStream, build_batched_schedule
from traffic_env_tpu.topology import GridRoad

B = 8


def setup(m=3, n=3, length=250.0, **kw):
    topo = GridRoad(m, n, length)
    cfg = Config(grid_m=m, grid_n=n, road_length=length, **kw).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    return topo, cfg


def test_stream_windows_match_monolithic_schedule():
    """Every chunk the stream serves must be the corresponding slice of
    the whole-run schedule built from the same seeds."""
    topo, cfg = setup()
    seeds = list(range(11, 11 + B))
    total = 400
    chunk = 64
    mono = build_batched_schedule(topo, cfg, seeds, total, 8)
    stream = ScheduleStream(topo, cfg, seeds, chunk, max_per_tick=8)
    rng = np.random.RandomState(0)
    bases = np.zeros(B, np.int64)
    for _ in range(12):
        win = stream.window(bases)
        np.testing.assert_array_equal(np.asarray(win.base),
                                      bases.astype(np.int32))
        for i in range(B):
            lo = int(bases[i])
            np.testing.assert_array_equal(
                win.counts[:, i], mono.counts[lo:lo + chunk, i])
            np.testing.assert_array_equal(
                win.roads[:, :, i], mono.roads[lo:lo + chunk, :, i])
        # advance each env by an independent amount <= chunk
        # (re-requesting the same base — advance 0 — must also work)
        bases = bases + rng.randint(0, chunk + 1, size=B)
        if bases.max() + chunk > total:
            break


def test_stream_forward_only_and_overrun_guards():
    topo, cfg = setup(m=1, n=2, length=100.0)
    stream = ScheduleStream(topo, cfg, [3, 4], 32, max_per_tick=8)
    stream.window(np.asarray([10, 0]))
    with pytest.raises(ValueError, match="forward-only"):
        stream.window(np.asarray([9, 0]))      # rewind env 0
    # jumping past the previously served window means the simulation
    # read clamped (wrong) rows — must fail loudly, not silently replay
    with pytest.raises(RuntimeError, match="past the previous window"):
        stream.window(np.asarray([10, 33]))    # env 1 overran its chunk


@pytest.mark.slow   # full-episode interpreter battery; chunked-stream window algebra is
# covered quick by test_stream_windows_match_monolithic_schedule
def test_exact_chunked_pallas_matches_monolithic_fast():
    """The throughput path under --exact: Pallas kernel fed by O(chunk)
    stream windows (refreshed mid-run) must reproduce the XLA fast core
    fed by the monolithic whole-run schedule, bit-for-bit."""
    from traffic_env_tpu.algorithms.common import (attach_schedule_stream,
                                                   refresh_env_schedule)
    from traffic_env_tpu.envs.rollout import make_batched_env

    topo, cfg = setup(history=3)
    steps = 12
    seeds = list(range(B))
    W = cfg.light_iterations
    n_win = steps + cfg.history + 6
    mono = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, n_win * W, 8))
    kw = dict(on_device_spawns=False, max_spawns_per_tick=8)
    fast = make_batched_env(topo, cfg, B, core="fast", **kw)
    pal = make_batched_env(topo, cfg, B, core="pallas", block_envs=B,
                           interpret=True, **kw)
    # chunk covers the reset prefill (1 + history-1 windows) and leaves
    # a couple of windows of headroom; refreshed every agent step
    chunk = (cfg.history + 4) * W
    stream = ScheduleStream(topo, cfg, seeds, chunk, max_per_tick=8)
    pal = attach_schedule_stream(pal, stream)

    sf = fast.init(jax.random.key(5))
    sp = pal.init(jax.random.key(5))
    sf, of = fast.reset(sf, mono)
    sp, op = pal.reset(sp)                 # schedule comes from sp.sched
    np.testing.assert_array_equal(np.asarray(of), np.asarray(op))
    rng = np.random.RandomState(3)
    f_step = jax.jit(lambda s, a: fast.step_autoreset_lazy(s, a, mono))
    p_step = jax.jit(pal.step_autoreset_lazy)
    for t in range(steps):
        sp = refresh_env_schedule(pal, sp)
        a = jnp.asarray(rng.randint(2, size=(9, B)).astype(np.int32))
        sf, of, rf, df, _ = f_step(sf, a)
        sp, op, rp, dp, _ = p_step(sp, a)
        np.testing.assert_array_equal(np.asarray(of), np.asarray(op),
                                      err_msg=f"obs step {t}")
        np.testing.assert_array_equal(np.asarray(rf), np.asarray(rp),
                                      err_msg=f"rew step {t}")
        np.testing.assert_array_equal(np.asarray(df), np.asarray(dp))
    # the run must actually have crossed a chunk boundary for the
    # refresh path to have been exercised
    assert int(np.asarray(jax.device_get(sp.sim.global_tick)).max()) \
        > chunk


@pytest.mark.slow
def test_exact_train_loop_smoke(tmp_path):
    """qlearn trains end-to-end under --exact: the ScheduleStream is
    refreshed at every host-loop iteration (including validation) and
    no segment overruns its chunk."""
    from traffic_env_tpu.algorithms import run_alg

    cfg = Config(trainer="qlearn", exact=True, seed=3,
                 grid_m=1, grid_n=2, road_length=80.0, num_envs=4,
                 episode_secs=60, light_secs=5, total_episodes=3,
                 validate_rate=2, summary_rate=1, save_rate=100,
                 batch_size=8, start_eps=500, annealing_episodes=2,
                 buffer_size=32, logdir=str(tmp_path / "exact_q"),
                 ).derive()
    ts = run_alg(cfg)
    assert int(ts.episode) >= 3

"""Multi-device sharding: env batch on a dp mesh axis, learner gradients
all-reduced by the partitioner, dp x mp mesh compile+execute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs.rollout import make_batched_env, random_rollout
from traffic_env_tpu.parallel import (batch_sharding, make_mesh, replicated,
                                      shard_env_state, shard_params)
from traffic_env_tpu.topology import GridRoad

needs_multi = pytest.mark.skipif(jax.device_count() < 8,
                                 reason="needs 8 virtual devices")


@needs_multi
def test_sharded_rollout_matches_single_device():
    topo = GridRoad(2, 2, 150.0)
    cfg = Config(grid_m=2, grid_n=2, road_length=150.0).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    B = 32
    benv = make_batched_env(topo, cfg, B)
    state = benv.init(jax.random.key(0))
    state, _ = jax.jit(benv.reset)(state)
    roll = jax.jit(lambda st, k: random_rollout(benv, st, k, 6))

    _, _, rews_single, dones_single = roll(state, jax.random.key(1))

    mesh = make_mesh("", jax.devices()[:8])
    state_sh = shard_env_state(mesh, state)
    # verify actual placement: trailing axis sharded over 8 devices
    cars_sharding = state_sh.sim.cars.sharding
    assert cars_sharding.num_devices if hasattr(cars_sharding, "num_devices") \
        else len(cars_sharding.device_set) == 8
    _, _, rews_sh, dones_sh = roll(state_sh, jax.random.key(1))
    np.testing.assert_allclose(np.asarray(rews_single),
                               np.asarray(rews_sh), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dones_single),
                                  np.asarray(dones_sh))


@needs_multi
@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@needs_multi
@pytest.mark.slow
def test_qlearn_training_dp_sharded_step():
    """A full qlearn episode with the env batch sharded on dp: params
    stay replicated (the partitioner all-reduces gradients)."""
    from traffic_env_tpu.algorithms import qlearn
    cfg = Config(grid_m=1, grid_n=2, road_length=60.0, num_envs=16,
                 episode_secs=20, light_secs=5, buffer_size=16,
                 batch_size=4, logdir="/tmp/shard_qlearn", seed=0).derive()
    ctx, ts = qlearn.make_state(cfg)
    mesh = make_mesh("4,2", jax.devices()[:8])
    with mesh:
        ts = ts.replace(env=shard_env_state(mesh, ts.env),
                        obs=shard_env_state(mesh, ts.obs),
                        params_main=shard_params(mesh, ts.params_main, "mp"),
                        params_chooser=shard_params(mesh, ts.params_chooser,
                                                    "mp"),
                        params_target=shard_params(mesh, ts.params_target,
                                                   "mp"))
        ts, stats = ctx.run_episode(ts)
        jax.block_until_ready(stats)
    assert np.isfinite(float(stats[0]))


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 9, 2)


@needs_multi
@pytest.mark.slow   # interpreter kernel under shard_map (heaviest sharding case); quick
# tier keeps fast-core sharded==unsharded parity
def test_pallas_env_under_mesh():
    """The fused window kernel composes with a dp mesh via shard_map:
    sharded rollout == unsharded rollout bit-for-bit (interpreter mode
    on virtual CPU devices)."""
    from traffic_env_tpu.envs import build_batched_schedule
    from traffic_env_tpu.envs.rollout import make_pallas_batched_env

    topo = GridRoad(2, 2, 150.0)
    cfg = Config(grid_m=2, grid_n=2, road_length=150.0,
                 history=1).derive().replace(history=1)
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    B = 16
    # schedule mode: the in-kernel TPU PRNG primitive has no CPU
    # lowering under shard_map; spawn streams come from the host
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, list(range(B)), 8 * cfg.light_iterations, 8))
    kw = dict(block_envs=2, interpret=True, on_device_spawns=False)
    benv = make_pallas_batched_env(topo, cfg, B, **kw)
    state = benv.init(jax.random.key(0))
    state, _ = jax.jit(benv.reset)(state, sched)
    a = jnp.zeros((4, B), jnp.int32)
    s1, o1, r1, d1, _ = jax.jit(benv.step)(state, a, sched)

    mesh = make_mesh("", jax.devices()[:8])
    benv_m = make_pallas_batched_env(topo, cfg, B, mesh=mesh, **kw)
    state_m = shard_env_state(mesh, state)
    s2, o2, r2, d2, _ = jax.jit(benv_m.step)(state_m, a, sched)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


@needs_multi
@pytest.mark.slow
@pytest.mark.parametrize("trainer", ["qlearn", "a3c"])
def test_cli_mesh_training_matches_unsharded(trainer, tmp_path):
    """--mesh_shape=8 through the production path (build_env mesh ->
    shard_train_state) must train the same program as a single device:
    episode stats and post-episode parameters agree up to partitioned
    reduction order."""
    import importlib
    mod = importlib.import_module(f"traffic_env_tpu.algorithms.{trainer}")
    base = dict(trainer=trainer, grid_m=1, grid_n=2, road_length=60.0,
                num_envs=16, episode_secs=40, light_secs=5,
                buffer_size=32, batch_size=8, seed=0,
                logdir=str(tmp_path / trainer))
    ctx1, ts1 = mod.make_state(Config(**base).derive())
    ts1, stats1 = ctx1.run_episode(ts1)
    ctx2, ts2 = mod.make_state(Config(mesh_shape="8", **base).derive())
    assert ctx2.benv.mesh is not None
    ts2, stats2 = ctx2.run_episode(ts2)
    s1 = jax.tree_util.tree_leaves(stats1)
    s2 = jax.tree_util.tree_leaves(stats2)
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    p1 = getattr(ts1, "params_main", None) or ts1.params
    p2 = getattr(ts2, "params_main", None) or ts2.params
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


@needs_multi
@pytest.mark.slow
def test_cli_mesh_qrnn_and_pg_train(tmp_path):
    """qrnn + polgrad_rnn also train over the CLI-built mesh."""
    import importlib
    for trainer in ("qrnn", "polgrad_rnn"):
        mod = importlib.import_module(
            f"traffic_env_tpu.algorithms.{trainer}")
        cfg = Config(trainer=trainer, mesh_shape="8", grid_m=1, grid_n=2,
                     road_length=60.0, num_envs=16, episode_secs=20,
                     light_secs=5, buffer_size=16, batch_size=4, seed=0,
                     logdir=str(tmp_path / trainer)).derive()
        ctx, ts = mod.make_state(cfg)
        assert ctx.benv.mesh is not None
        ts, stats = ctx.run_episode(ts)
        assert np.isfinite(
            float(jnp.mean(jax.tree_util.tree_leaves(stats)[0])))

"""The qlearn throughput act path: replay-ring stacks == env history.

The hot loop acts on FrameReplay.last_stack() and steps the env
history-free (step_autoreset_lazy_noh), eliminating the k-frame roll
write.  This must be a pure memory-layout change: actions, env
trajectories, rewards and replay contents stay bit-identical to the
legacy env-history path (whose roll rides through lazy resets exactly
like the ring does)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from traffic_env_tpu.algorithms import qlearn
from traffic_env_tpu.config import Config


def test_ring_act_path_matches_env_history_path(tmp_path):
    cfg = Config(trainer="qlearn", grid_m=1, grid_n=2, road_length=80.0,
                 num_envs=6, episode_secs=150, light_secs=5, seed=4,
                 # buffer big enough that the ready gate never fires:
                 # the comparison is the pure acting/stepping path
                 buffer_size=100000, batch_size=4,
                 logdir=str(tmp_path / "q")).derive()
    assert cfg.history > 1
    ctx, ts = qlearn.make_state(cfg)
    assert ctx.benv.step_autoreset_lazy_noh is not None

    # legacy context: same benv minus the noh step, so make_fns falls
    # back to acting on the env-maintained history stack
    benv_legacy = ctx.benv._replace(step_autoreset_lazy_noh=None)
    _, _, run_legacy, _, _ = qlearn.make_fns(cfg, benv_legacy)

    ts_new, stats_new = ctx.run_episode(ts)
    ts_old, stats_old = run_legacy(ts)

    np.testing.assert_array_equal(np.asarray(stats_new[0]),
                                  np.asarray(stats_old[0]))  # mean rew
    # identical env trajectories, bit for bit
    for f in dataclasses.fields(ts_new.env.sim):
        a = getattr(ts_new.env.sim, f.name)
        b = getattr(ts_old.env.sim, f.name)
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"sim.{f.name}")
    # identical replay contents (frames/actions/rewards/cursor)
    for name in ("frames", "a", "r", "nd"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ts_new.replay, name)),
            np.asarray(getattr(ts_old.replay, name)), err_msg=name)
    assert int(ts_new.replay.cursor) == int(ts_old.replay.cursor)
    # the new path must have actually crossed a lazy reset or run long
    # enough that the ring wrapped through its prefill
    assert int(ts_new.step) * 1 >= cfg.history

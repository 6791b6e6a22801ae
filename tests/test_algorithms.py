"""Algorithm smoke + learning fixtures.

Every trainer must run end-to-end on tiny shapes; qlearn must actually
*learn* on the CartPole fixture (the reference's algorithm-correctness
strategy, cartpole-test.py / SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config
from traffic_env_tpu.algorithms import run_alg

BASE = dict(num_envs=4, episode_secs=60, light_secs=5, total_episodes=2,
            seed=0, summary_rate=1, validate_rate=2, save_rate=100,
            batch_size=4, buffer_size=32)


@pytest.mark.parametrize("trainer", ["qlearn", "a3c", "polgrad_rnn", "qrnn"])
def test_trainer_smoke(trainer, tmp_path):
    cfg = Config(trainer=trainer, logdir=str(tmp_path / trainer),
                 **BASE).derive()
    run_alg(cfg)
    assert os.path.exists(tmp_path / trainer / "settings.json")
    assert os.path.exists(tmp_path / trainer / "metrics.jsonl")


@pytest.mark.parametrize("trainer", ["random", "const0", "const1", "fixed",
                                     "greedy", "spacedgreedy"])
def test_baseline_smoke(trainer, tmp_path):
    cfg = Config(trainer=trainer, logdir=str(tmp_path / trainer),
                 **BASE).derive()
    data = run_alg(cfg.replace(interactive=True))
    assert isinstance(data, tuple)


def test_a3c_conv_gru_smoke(tmp_path):
    cfg = Config(trainer="a3c", conv_gru=True, logdir=str(tmp_path / "cg"),
                 **BASE).derive()
    run_alg(cfg)


def test_checkpoint_restore_roundtrip(tmp_path):
    from traffic_env_tpu.algorithms import qlearn
    logdir = str(tmp_path / "q")
    cfg = Config(trainer="qlearn", logdir=logdir, **BASE).derive()
    ts = run_alg(cfg)
    # restore continues from the saved state + settings snapshot
    cfg2 = Config(trainer="qlearn", logdir=logdir, restore=True,
                  total_episodes=3).derive()
    ts2 = run_alg(cfg2)
    assert int(ts2.episode) >= 3


def test_qlearn_learns_cartpole(tmp_path):
    """Learning fixture: greedy CartPole return must improve well above
    the random-policy baseline (~20 steps/episode)."""
    from traffic_env_tpu.algorithms import qlearn
    cfg = Config(trainer="qlearn", env_name="cartpole", num_envs=32,
                 buffer_size=2048, batch_size=64, learning_rate=1e-3,
                 gamma=0.99, start_eps=1.0, end_eps=0.05,
                 annealing_episodes=30, target_update_rate=50,
                 print_discounted=False, logdir=str(tmp_path / "cp"),
                 seed=3).derive().replace(history=1, episode_len=200)
    ctx, ts = qlearn.make_state(cfg)
    first = float(ctx.greedy_episode(ts)[0])
    for _ in range(40):
        ts, _ = ctx.run_episode(ts)
    final = float(ctx.greedy_episode(ts)[0])
    # undiscounted greedy return summed over 200 steps of mean reward:
    # random ~ 0.1-0.2 fraction alive; trained should be > 2x better
    assert final > max(2 * first, first + 20), (first, final)


def test_cem_improves(tmp_path):
    from traffic_env_tpu.algorithms import cem
    cfg = Config(trainer="cem", grid_m=1, grid_n=1, road_length=100.0,
                 episode_secs=60, total_episodes=3,
                 logdir=str(tmp_path / "cem"), seed=0).derive()
    th, means = cem.run(cfg)
    assert th.ndim == 2 and th.shape[1] == 1  # (obs_dim, intersections)
    assert len(means) == 3


def test_qlearn_learns_traffic(tmp_path):
    """Learning-curve regression vs the scripted baselines (SURVEY §4):
    trained greedy return on a 1x2 grid must clearly beat the
    untrained policy (random-ish) — the reference's validation story
    ("learned policies are validated by beating these", README.md:4)."""
    from traffic_env_tpu.algorithms import qlearn
    cfg = Config(trainer="qlearn", grid_m=1, grid_n=2, road_length=100.0,
                 num_envs=32, episode_secs=300, light_secs=5,
                 buffer_size=2048, batch_size=64, learning_rate=5e-4,
                 start_eps=0.8, end_eps=0.05, annealing_episodes=25,
                 target_update_rate=30, summary_rate=1000,
                 validate_rate=1000, save_rate=100000,
                 logdir=str(tmp_path / "lq"), seed=1).derive()
    ctx, ts = qlearn.make_state(cfg)
    first = float(ctx.greedy_episode(ts)[0])
    for _ in range(40):
        ts, _ = ctx.run_episode(ts)
    final = float(ctx.greedy_episode(ts)[0])
    # measured on this workload: random baseline ~1.24, fixed ~1.23,
    # scripted greedy ~2.84; an untrained argmax policy lands anywhere
    # in [0.8, 2.0].  Trained must improve decisively AND clear the
    # random/fixed baselines by a wide margin.
    assert final > first + 0.5, (first, final)
    assert final > 2.0, (first, final)

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


@pytest.mark.parametrize("trainer", [
    "qlearn",   # flagship end-to-end run_alg smoke stays quick; the
                # other trainers' logic is covered quick by their unit
                # tests and their full smokes run in the slow tier
    pytest.param("a3c", marks=pytest.mark.slow),
    pytest.param("polgrad_rnn", marks=pytest.mark.slow),
    pytest.param("qrnn", marks=pytest.mark.slow)])
def test_trainer_smoke(trainer, tmp_path):
    cfg = Config(trainer=trainer, logdir=str(tmp_path / trainer),
                 **BASE).derive()
    run_alg(cfg)
    assert os.path.exists(tmp_path / trainer / "settings.json")
    assert os.path.exists(tmp_path / trainer / "metrics.jsonl")


@pytest.mark.parametrize("trainer", [
    "greedy",
    pytest.param("random", marks=pytest.mark.slow),
    pytest.param("const0", marks=pytest.mark.slow),
    pytest.param("const1", marks=pytest.mark.slow),
    pytest.param("fixed", marks=pytest.mark.slow),
    pytest.param("spacedgreedy", marks=pytest.mark.slow)])
def test_baseline_smoke(trainer, tmp_path):
    cfg = Config(trainer=trainer, logdir=str(tmp_path / trainer),
                 **BASE).derive()
    data = run_alg(cfg.replace(interactive=True))
    assert isinstance(data, tuple)


@pytest.mark.slow
def test_a3c_conv_gru_smoke(tmp_path):
    cfg = Config(trainer="a3c", conv_gru=True, logdir=str(tmp_path / "cg"),
                 **BASE).derive()
    run_alg(cfg)


@pytest.mark.slow
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


@pytest.mark.slow
def test_qlearn_learns_cartpole(tmp_path):
    """Learning fixture: greedy CartPole return must improve well above
    the random-policy baseline (~20 steps/episode).  Evaluated as the
    BEST periodic validation, matching the reference's best-checkpoint
    validation story (qlearn.py:129-136 keeps best.ckpt on records) —
    DQN greedy returns oscillate late in training, so a single
    endpoint sample is noise."""
    from traffic_env_tpu.algorithms import qlearn
    cfg = Config(trainer="qlearn", env_name="cartpole", num_envs=32,
                 buffer_size=2048, batch_size=64, learning_rate=1e-3,
                 gamma=0.99, start_eps=1.0, end_eps=0.05,
                 annealing_episodes=30, target_update_rate=50,
                 print_discounted=False, logdir=str(tmp_path / "cp"),
                 seed=3).derive().replace(history=1, episode_len=200)
    ctx, ts = qlearn.make_state(cfg)
    first = float(ctx.greedy_episode(ts)[0])
    best = first
    for i in range(40):
        ts, _ = ctx.run_episode(ts)
        if (i + 1) % 10 == 0:
            best = max(best, float(ctx.greedy_episode(ts)[0]))
    # undiscounted greedy return summed over 200 steps of mean reward:
    # random ~ 0.1-0.2 fraction alive; trained should be > 2x better
    assert best > max(2 * first, first + 20), (first, best)


def test_cem_improves(tmp_path):
    from traffic_env_tpu.algorithms import cem
    cfg = Config(trainer="cem", grid_m=1, grid_n=1, road_length=100.0,
                 episode_secs=60, total_episodes=3,
                 logdir=str(tmp_path / "cem"), seed=0).derive()
    th, means = cem.run(cfg)
    assert th.ndim == 2 and th.shape[1] == 1  # (obs_dim, intersections)
    assert len(means) == 3


@pytest.mark.slow
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


@pytest.mark.slow
def test_qlearn_single_agent(tmp_path):
    """--single_agent (UnGSpaceWrapper semantics): qlearn trains one
    2^I-way head whose integer choice decodes to env phase bits."""
    cfg = Config(trainer="qlearn", single_agent=True, grid_m=1, grid_n=2,
                 road_length=100.0, logdir=str(tmp_path / "sa"),
                 **BASE).derive()
    ts = run_alg(cfg)
    # one head, 2^2 = 4 choices on the 1x2 grid
    assert ts.replay.a.shape[-1] == 1
    assert int(np.asarray(ts.replay.a).max()) <= 3
    q_kernel = jax.tree_util.tree_leaves(ts.params_main)[-1]
    assert 4 in q_kernel.shape  # output layer sized 1 head x 4 choices


def test_single_agent_rejected_for_sigmoid_learners(tmp_path):
    cfg = Config(trainer="a3c", single_agent=True,
                 logdir=str(tmp_path / "x"), **BASE).derive()
    with pytest.raises(ValueError, match="single_agent"):
        run_alg(cfg)


@pytest.mark.slow
def test_learner_validate_telemetry_and_render(tmp_path):
    """--trainer=qlearn --mode=validate must emit per-step light_times
    (collected inside the greedy scan) and trip-time telemetry, and
    --render must draw the learned policy's episode (VERDICT round-1
    gaps 4 and 5)."""
    logdir = str(tmp_path / "vt")
    cfg = Config(trainer="qlearn", logdir=logdir, **BASE).derive()
    run_alg(cfg)
    cfg2 = Config(trainer="qlearn", logdir=logdir, restore=True,
                  render=True, total_episodes=2,
                  interactive=True, **{k: v for k, v in BASE.items()
                                       if k != "total_episodes"}).derive()
    assert cfg2.mode == "validate"      # --render forces validate
    light_times, trip_times, unfinished = run_alg(cfg2)
    assert len(light_times) > 0
    assert len(unfinished) == 2
    render_dir = os.path.join(logdir, "render")
    assert os.path.isdir(render_dir) and len(os.listdir(render_dir)) > 0


def test_checkpoint_replay_schema_migration(tmp_path):
    """Legacy checkpoint layouts must restore instead of failing on the
    structure diff: (a) qrnn episode replays that stored one ``idx``
    counter migrate to filled/cursor; (b) old per-transition qlearn
    replays are incompatible with the per-step frame ring, so replay
    restores EMPTY while every learned field restores."""
    import dataclasses
    from traffic_env_tpu.algorithms import qlearn, qrnn
    from traffic_env_tpu.utils.checkpoint import Checkpointer
    kw = dict(grid_m=1, grid_n=2, road_length=60.0,
              **{k: v for k, v in BASE.items() if k != "total_episodes"})

    # (a) qrnn: idx -> filled/cursor on the episode store
    logdir = str(tmp_path / "mig_qrnn")
    os.makedirs(logdir)
    cfg = Config(trainer="qrnn", logdir=logdir, **kw).derive()
    ctx, ts = qrnn.make_state(cfg)
    ts = ts.replace(step=jnp.int32(55))
    old_state = dataclasses.asdict(ts)
    rep = old_state["replay"]
    rep["idx"] = jnp.int32(rep["s"].shape[0] + 5)   # 5 past capacity
    del rep["filled"], rep["cursor"]
    ck = Checkpointer(logdir)
    ck.save(old_state)
    restored = ck.restore(ts)
    assert int(restored.step) == 55
    n = ts.replay.size
    assert int(restored.replay.filled) == n          # min(n+5, n)
    assert int(restored.replay.cursor) == 5          # (n+5) % n
    np.testing.assert_array_equal(np.asarray(restored.replay.s),
                                  np.asarray(ts.replay.s))

    # (b) qlearn: legacy (s, a, r, nd, s1, idx) transition ring ->
    # fresh FrameReplay, learned state intact
    logdir2 = str(tmp_path / "mig_qlearn")
    os.makedirs(logdir2)
    cfg2 = Config(trainer="qlearn", logdir=logdir2, **kw).derive()
    ctx2, ts2 = qlearn.make_state(cfg2)
    ts2 = ts2.replace(step=jnp.int32(77), rho=jnp.float32(0.25))
    old2 = dataclasses.asdict(ts2)
    obs_dim = ts2.replay.frames.shape[-1]
    old2["replay"] = {
        "s": jnp.zeros((100, 20, obs_dim)), "a": jnp.zeros((100, 2),
                                                           jnp.int32),
        "r": jnp.zeros((100, 2)), "nd": jnp.zeros((100,)),
        "s1": jnp.zeros((100, 20, obs_dim)), "idx": jnp.int32(137),
    }
    ck2 = Checkpointer(logdir2)
    ck2.save(old2)
    with pytest.warns(UserWarning, match="legacy transition-replay"):
        restored2 = ck2.restore(ts2)
    assert int(restored2.step) == 77
    assert float(restored2.rho) == 0.25
    # fresh ring = the template's make_state ring: only the reset-time
    # history prefill rows (never sampleable as transitions), no
    # legacy transitions carried over
    assert int(restored2.replay.filled) == int(ts2.replay.filled)
    assert int(restored2.replay.filled) <= cfg2.history
    np.testing.assert_array_equal(np.asarray(restored2.replay.frames),
                                  np.asarray(ts2.replay.frames))
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored2.params_main)[0]),
        np.asarray(jax.tree_util.tree_leaves(ts2.params_main)[0]))


def test_a3c_loss_replay_exact_across_mid_window_resets(tmp_path):
    """The a3c loss must replay the window GRU with the SAME
    done-masked carries the rollout used: with a done at step k, the
    loss equals a two-segment replay (segment [0..k] from the window
    carry, segment [k+1..] from a zero carry)."""
    from traffic_env_tpu.algorithms import a3c
    cfg = Config(trainer="a3c", logdir=str(tmp_path / "a"), grid_m=1,
                 grid_n=2, road_length=60.0, **BASE).derive()
    ctx, ts = a3c.make_state(cfg)
    rng = np.random.RandomState(0)
    T, B = 6, ctx.benv.n_envs
    I = ctx.benv.n_intersections
    obs_dim = int(np.prod(ctx.benv.env.observation_space.shape))
    obs = jnp.asarray(rng.randn(T, B, obs_dim).astype(np.float32))
    act = jnp.asarray(rng.randint(2, size=(T, B, I)).astype(np.float32))
    adv = jnp.asarray(rng.randn(T, B, I).astype(np.float32))
    ret = jnp.asarray(rng.randn(T, B, I).astype(np.float32))
    k = 2
    done = jnp.zeros((T, B), bool).at[k, :].set(True)   # all envs reset
    carry0 = jnp.asarray(rng.randn(B, ctx.net.hidden).astype(np.float32))
    loss1, _ = ctx.loss_fn(ts.params, obs, act, adv, ret, done, carry0)

    # reference computation: two independent flax-RNN segment replays
    def segment(o_seg, c0):
        scores, values, _ = ctx.net.apply(
            ts.params, jnp.moveaxis(o_seg, 0, 1), c0)
        return (jnp.moveaxis(scores, 0, 1), jnp.moveaxis(values, 0, 1))
    s1, v1 = segment(obs[:k + 1], carry0)
    s2, v2 = segment(obs[k + 1:], jnp.zeros_like(carry0))
    scores = jnp.concatenate([s1, s2], axis=0)
    values = jnp.concatenate([v1, v2], axis=0)
    import optax
    ce = optax.sigmoid_binary_cross_entropy(scores, act)
    policy_loss = jnp.mean(jnp.sum(adv * ce, axis=-1))
    value_loss = 0.5 * jnp.mean(jnp.sum(jnp.square(ret - values), -1))
    from traffic_env_tpu.algorithms.exploration import entropy
    ref = 0.5 * value_loss + policy_loss \
        - 0.001 * entropy(jax.nn.sigmoid(scores))
    np.testing.assert_allclose(float(loss1), float(ref), rtol=1e-6)


def test_qrnn_variable_length_traces(tmp_path):
    """qrnn must store REAL episode lengths (first done per lane), so
    early-overflow episodes mask their tail out of sampled traces."""
    from traffic_env_tpu.algorithms import qrnn
    # dense spawns on a tiny grid force early overflows
    cfg = Config(trainer="qrnn", grid_m=1, grid_n=1, road_length=40.0,
                 local_cars_per_sec=1.5, num_envs=8, episode_secs=120,
                 light_secs=5, buffer_size=8, batch_size=4,
                 logdir=str(tmp_path / "ql"), seed=0).derive()
    ctx, ts = qrnn.make_state(cfg)
    ts, _ = ctx.run_episode(ts)
    lens = np.asarray(ts.replay.lens)[:int(ts.replay.filled)]
    assert (lens >= 1).all() and (lens <= cfg.episode_len).all()
    assert (lens < cfg.episode_len).any(), lens   # early overflow seen


@pytest.mark.slow   # four full training-graph compiles for a
# flag-liveness check; the norm_adv math itself is trace-time trivial
@pytest.mark.parametrize("trainer", ["a3c", "polgrad_rnn"])
def test_norm_adv_changes_update(trainer, tmp_path):
    """--norm_adv standardizes the policy-gradient signal per update
    window (advantages for a3c; avg-mode REINFORCE returns for
    polgrad_rnn — the reference only standardizes in discounted mode,
    polgrad_rnn.py:32-35).  The knob must be live: one training episode
    from identical initial state produces different params, and both
    paths stay finite."""
    from traffic_env_tpu.algorithms import a3c, polgrad_rnn
    mod = {"a3c": a3c, "polgrad_rnn": polgrad_rnn}[trainer]
    # polgrad accumulates grads over batch_size episodes before the
    # Adam apply — batch_size=1 so one episode visibly moves params
    kw = dict(BASE, total_episodes=1, batch_size=1)
    leaves = {}
    for na in (False, True):
        cfg = Config(trainer=trainer, norm_adv=na,
                     logdir=str(tmp_path / f"{trainer}{na}"),
                     **kw).derive()
        assert cfg.use_avg or trainer == "a3c"
        ctx, ts = mod.make_state(cfg)
        ts, _ = ctx.run_episode(ts)
        flat = jnp.concatenate([jnp.ravel(x) for x in
                                jax.tree.leaves(ts.params)])
        assert bool(jnp.isfinite(flat).all())
        leaves[na] = np.asarray(flat)
    assert not np.array_equal(leaves[False], leaves[True])

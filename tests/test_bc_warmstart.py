"""Behavior-cloning warm start for a3c (--bc_episodes).

The BC expert is the scripted greedy baseline with its ``t % spacing``
gate forced open (a spacing-1 greedy scores the same as the spacing-3
baseline but is a pure function of the observable state, which is what
supervised imitation needs).  During the first ``bc_episodes`` episodes
the rollout behaves with the expert and the policy loss is sigmoid-CE
on the expert's actions; afterwards the standard A2C path resumes
unchanged (the default bc_episodes=0 path is gated at trace time).

Reference role: the reference's baselines exist "for comparison"
(README.md:4); imitation is an extension, like --occupancy_obs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config
from traffic_env_tpu.algorithms import a3c
from traffic_env_tpu.algorithms.baselines import (episode_runner,
                                                  make_policies)
from traffic_env_tpu.algorithms.common import build_env


def _cfg(**kw):
    base = dict(trainer="a3c", grid_m=1, grid_n=2, num_envs=8,
                batch_size=5, seed=3, logdir="/tmp/bc_test")
    base.update(kw)
    return Config(**base).derive()


def test_bc_rollout_follows_expert():
    """During the BC phase the env trajectory is EXACTLY what stepping
    with the scripted (spacing-1) greedy expert produces."""
    cfg = _cfg(bc_episodes=10)
    ctx, ts = a3c.make_state(cfg)
    ts2, _ = ctx.run_window(ts)

    # replay: step the same env with the expert policy externally
    topo, cfg2, benv = build_env(cfg)
    greedy = make_policies(cfg2, ctx.benv, topo)["greedy"]
    env = ts.env
    key = jax.random.key(123)   # greedy ignores the key
    for _ in range(cfg.batch_size):
        a_raw, _ = greedy(jnp.int32(0), key, env, env.sim.phase)
        env, _, _, _, _ = ctx.benv.step_autoreset_lazy(env, a_raw)

    for name in ("phase", "elapsed", "leading", "lastcar", "cars"):
        a = np.asarray(getattr(ts2.env.sim, name))
        b = np.asarray(getattr(env.sim, name))
        assert np.array_equal(a, b), f"sim.{name} diverged from expert"


def test_bc_gated_rollout_follows_spacing_expert():
    """With bc_gated the BC trajectory matches stepping with the ACTUAL
    scripted baseline: re-pick at t % spacing == 0, hold the phase
    between picks."""
    cfg = _cfg(bc_episodes=10, bc_gated=True, spacing=3, batch_size=7)
    ctx, ts = a3c.make_state(cfg)
    ts2, _ = ctx.run_window(ts)

    topo, cfg2, benv = build_env(cfg)
    greedy = make_policies(cfg2, ctx.benv, topo)["greedy"]
    env = ts.env
    key = jax.random.key(123)
    held = env.sim.phase
    for t in range(cfg.batch_size):
        a_raw, held = greedy(jnp.int32(t), key, env, env.sim.phase)
        env, _, _, _, _ = ctx.benv.step_autoreset_lazy(env, a_raw)

    for name in ("phase", "elapsed", "leading", "lastcar", "cars"):
        a = np.asarray(getattr(ts2.env.sim, name))
        b = np.asarray(getattr(env.sim, name))
        assert np.array_equal(a, b), f"sim.{name} diverged from expert"


def test_bc_phase_ends_at_bc_episodes():
    """Past bc_episodes the rollout stops following the expert (the
    trajectory diverges from pure expert stepping)."""
    cfg = _cfg(bc_episodes=1, start_eps=0.8, end_eps=0.8)
    ctx, ts = a3c.make_state(cfg)
    ts = ts.replace(episode=jnp.int32(5))   # past the BC phase
    ts2, _ = ctx.run_window(ts)

    topo, cfg2, benv = build_env(cfg)
    greedy = make_policies(cfg2, ctx.benv, topo)["greedy"]
    env = ts.env
    key = jax.random.key(123)
    for _ in range(cfg.batch_size):
        a_raw, _ = greedy(jnp.int32(0), key, env, env.sim.phase)
        env, _, _, _, _ = ctx.benv.step_autoreset_lazy(env, a_raw)

    diverged = any(
        not np.array_equal(np.asarray(getattr(ts2.env.sim, n)),
                           np.asarray(getattr(env.sim, n)))
        for n in ("phase", "cars"))
    assert diverged, "post-BC rollout still mirrors the expert"


@pytest.mark.slow
def test_bc_reaches_scripted_greedy():
    """Supervised imitation alone brings greedy validation to >=85% of
    the scripted greedy baseline on the 1x2 workload."""
    cfg = _cfg(num_envs=64, batch_size=30, bc_episodes=1000,
               learning_rate=1e-3, occupancy_obs=True,
               start_eps=0.05, end_eps=0.05, seed=0)
    ctx, ts = a3c.make_state(cfg)

    topo, cfg2, benv = build_env(cfg)
    runner = episode_runner(cfg2, benv, make_policies(cfg2, benv,
                                                      topo)["greedy"])
    env = benv.init(jax.random.key(cfg.seed))
    key = jax.random.key(cfg.seed + 1)
    totals = []
    for _ in range(3):
        env, key, total, *_ = runner(env, key)
        totals.append(float(total))
    greedy_ref = sum(totals) / len(totals)

    for _ in range(50):
        ts, _ = ctx.run_episode(ts)
    val = float(ctx.greedy_episode(ts)[0])
    assert val >= 0.85 * greedy_ref, (val, greedy_ref)


@pytest.mark.slow   # two extra a3c graph compiles; gate/rollout semantics stay quick
def test_bc_anchor_inactive_during_bc_phase():
    """During the BC phase the anchor weight is gated to zero: one
    window from identical state yields bit-identical params with
    bc_anchor=0 and bc_anchor=0.5 (the BC policy loss already IS
    unit-weight expert CE)."""
    ctx0, ts0 = a3c.make_state(_cfg(bc_episodes=10))
    ctx1, ts1 = a3c.make_state(_cfg(bc_episodes=10, bc_anchor=0.5))
    ts0, _ = ctx0.run_window(ts0)
    ts1, _ = ctx1.run_window(ts1)
    leaves0 = jax.tree.leaves(ts0.params)
    leaves1 = jax.tree.leaves(ts1.params)
    for a, b in zip(leaves0, leaves1):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow   # two extra a3c graph compiles; gate/rollout semantics stay quick
def test_bc_anchor_active_after_bc_phase():
    """Past bc_episodes the anchor adds expert-CE pressure: params
    after one window differ from the unanchored run, and a heavily
    anchored fine-tune keeps the policy closer to the expert's
    decisions than an unanchored one."""
    mk = lambda anchor: a3c.make_state(
        _cfg(bc_episodes=1, bc_anchor=anchor, start_eps=0.1,
             end_eps=0.1, occupancy_obs=True))
    (ctx0, ts0), (ctx1, ts1) = mk(0.0), mk(8.0)
    ts0 = ts0.replace(episode=jnp.int32(5))
    ts1 = ts1.replace(episode=jnp.int32(5))
    for _ in range(6):
        ts0, _ = ctx0.run_window(ts0)
        ts1, _ = ctx1.run_window(ts1)
    diff = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts0.params),
                        jax.tree.leaves(ts1.params)))
    assert diff, "bc_anchor>0 did not change the fine-tune update"


def test_bc_expert_qlearn_distills_teacher_argmax(tmp_path):
    """--bc_expert=qlearn: during the BC phase the env trajectory is
    EXACTLY what stepping with the teacher checkpoint's double-DQN
    argmax policy produces (policy distillation; the teacher net reads
    the same batch-first flattened obs the a3c learner computes)."""
    from traffic_env_tpu.algorithms import qlearn
    from traffic_env_tpu.models import QNet
    from traffic_env_tpu.utils.checkpoint import Checkpointer

    tcfg = Config(trainer="qlearn", grid_m=1, grid_n=2, num_envs=8,
                  buffer_size=64, batch_size=4, seed=3,
                  logdir=str(tmp_path)).derive()
    assert tcfg.history == 20        # qlearn derivation
    tctx, tts = qlearn.make_state(tcfg)
    ck = Checkpointer(str(tmp_path))
    ck.save(tts)

    cfg = _cfg(bc_episodes=10, history=20, bc_expert="qlearn",
               bc_expert_ckpt=str(tmp_path))
    assert cfg.history == 20
    ctx, ts = a3c.make_state(cfg)
    ts2, _ = ctx.run_window(ts)

    qnet = QNet(n_actions=ctx.benv.n_intersections)
    env, obs = ts.env, ts.obs
    B = ctx.benv.n_envs
    for _ in range(cfg.batch_size):
        obs_bf = jnp.moveaxis(obs, -1, 0).reshape(B, -1)
        q = qnet.apply(tts.params_main, obs_bf)
        a = jnp.argmax(q, axis=-1).astype(jnp.int32)
        env, obs, _, _, _ = ctx.benv.step_autoreset_lazy(
            env, jnp.moveaxis(a, 0, -1))

    for name in ("phase", "elapsed", "leading", "lastcar", "cars"):
        x = np.asarray(getattr(ts2.env.sim, name))
        y = np.asarray(getattr(env.sim, name))
        assert np.array_equal(x, y), f"sim.{name} diverged from teacher"


def test_bc_anchor_gate_masks_positive_advantage():
    """--bc_anchor_gated drops the expert-CE anchor exactly at entries
    with advantage > 0: with all-nonpositive advantages the gated and
    ungated losses are bit-identical; flipping entries positive strictly
    lowers the gated loss relative to ungated (those entries' anchor CE
    is removed) while the ungated anchor contribution is unchanged."""
    ctx_u, ts = a3c.make_state(_cfg(bc_anchor=1.0))
    ctx_g, _ = a3c.make_state(_cfg(bc_anchor=1.0, bc_anchor_gated=True))
    T, B = ts.key, None  # silence lints
    cfg = ctx_u.cfg
    T, B, I = cfg.batch_size, ctx_u.benv.n_envs, ctx_u.benv.n_intersections
    feats = int(np.prod(ctx_u.benv.env.observation_space.shape))
    k = jax.random.key(7)
    ks = jax.random.split(k, 4)
    obs = jax.random.normal(ks[0], (T, B, feats), jnp.float32)
    act = jax.random.bernoulli(ks[1], 0.5, (T, B, I)).astype(jnp.float32)
    expert = 1.0 - act   # maximally disagreeing expert: anchor CE > 0
    ret = jax.random.normal(ks[2], (T, B, I), jnp.float32)
    done = jnp.zeros((T, B), bool)
    carry0 = jnp.zeros((B, ctx_u.net.hidden), jnp.float32)
    w = jnp.float32(1.0)

    adv_neg = -jnp.abs(jax.random.normal(ks[3], (T, B, I), jnp.float32))
    args = (obs, act, adv_neg, ret, done, carry0, expert, w)
    lu, _ = ctx_u.loss_fn(ts.params, *args)
    lg, _ = ctx_g.loss_fn(ts.params, *args)
    assert float(lu) == float(lg), "gate fired on nonpositive advantage"

    adv_mix = adv_neg.at[0].set(1.0)   # step 0 entries now positive
    args = (obs, act, adv_mix, ret, done, carry0, expert, w)
    lu, _ = ctx_u.loss_fn(ts.params, *args)
    lg, _ = ctx_g.loss_fn(ts.params, *args)
    assert float(lg) < float(lu), "gate did not remove anchor CE"


def test_grad_summary_histograms():
    """--grad_summary emits the reference's histogram names (scores,
    probs, obs_grad{i}, state_grad{i}; a3c.py:41-46, util.py:13,85)."""
    cfg = _cfg(grad_summary=True)
    ctx, ts = a3c.make_state(cfg)

    class Rec:
        def __init__(self):
            self.names = []

        def histogram(self, name, values, step):
            self.names.append(name)
            assert np.asarray(values).size > 0

    rec = Rec()
    a3c._grad_summaries(ctx, ts, rec, 0)
    I = ctx.benv.n_intersections
    expect = {"scores", "probs"} | {f"obs_grad{i}" for i in range(I)} \
        | {f"state_grad{i}" for i in range(I)}
    assert set(rec.names) == expect


def test_convgru_history_frames_become_channel_groups():
    """--conv_gru with --history=k: the flattened obs is k frame-major
    frames (EnvState.history, oldest first) and the conv-GRU net must
    parse each frame into its own channel group — gate kernels take
    hidden + k*13 (occupancy) input channels, and the flat layout the
    net assumes matches the env's actual history stacking.  This is the
    obs pipeline the qlearn-teacher distillation pairs with on config 5
    (Config.bc_expert)."""
    from traffic_env_tpu.models import ConvGRUA3CNet

    k = 4
    cfg = _cfg(conv_gru=True, history=k, occupancy_obs=True,
               batch_size=5)
    ctx, ts = a3c.make_state(cfg)

    # layout assumption: flat_bf frame j == history frame j
    B = ctx.benv.n_envs
    obs = np.asarray(ts.obs)                      # (k, obs_dim, B)
    assert obs.shape[0] == k
    flat = np.moveaxis(obs, -1, 0).reshape(B, -1)
    d = obs.shape[1]
    for j in range(k):
        assert np.array_equal(flat[:, j * d:(j + 1) * d], obs[j].T)

    # channel-group width: every gate conv consumes hidden + k*13
    v = ctx.benv.n_intersections
    assert d == 13 * v
    gates = ts.params["params"]["ConvGRUCell_0"]
    hc = ConvGRUA3CNet.hidden_channels
    assert gates["update_gate"]["kernel"].shape[-2] == hc + k * 13
    assert gates["candidate"]["kernel"].shape[-2] == hc + k * 13

    # end-to-end: one training window runs and keeps finite params
    ts2, (loss, *_) = ctx.run_window(ts)
    assert np.isfinite(float(loss))


def test_polgrad_bc_rollout_follows_expert():
    """polgrad_rnn --bc_episodes: during the BC phase the env
    trajectory is EXACTLY what stepping with the scripted (spacing-1)
    greedy expert from the same reset produces, and past bc_episodes
    the rollout diverges from pure expert stepping."""
    from traffic_env_tpu.algorithms import polgrad_rnn

    cfg = Config(trainer="polgrad_rnn", grid_m=1, grid_n=2, num_envs=8,
                 batch_size=2, episode_secs=60, seed=3,
                 bc_episodes=10, logdir="/tmp/pg_bc_test").derive()
    ctx, ts = polgrad_rnn.make_state(cfg)
    ts2, _ = ctx.run_episode(ts)

    topo, cfg2, benv = build_env(cfg)
    greedy = make_policies(cfg2, ctx.benv, topo)["greedy"]
    env, _ = ctx.benv.reset(ts.env)
    key = jax.random.key(123)   # greedy ignores the key
    for _ in range(cfg.episode_len):
        a_raw, _ = greedy(jnp.int32(0), key, env, env.sim.phase)
        env, _, _, _, _ = ctx.benv.step_autoreset_lazy(env, a_raw)

    for name in ("phase", "elapsed", "leading", "lastcar", "cars"):
        a = np.asarray(getattr(ts2.env.sim, name))
        b = np.asarray(getattr(env.sim, name))
        assert np.array_equal(a, b), f"sim.{name} diverged from expert"

    # past the BC phase the policy acts on its own
    ts3 = ts.replace(episode=jnp.int32(50))
    ts4, _ = ctx.run_episode(ts3)
    env, _ = ctx.benv.reset(ts3.env)
    for _ in range(cfg.episode_len):
        a_raw, _ = greedy(jnp.int32(0), key, env, env.sim.phase)
        env, _, _, _, _ = ctx.benv.step_autoreset_lazy(env, a_raw)
    diverged = any(
        not np.array_equal(np.asarray(getattr(ts4.env.sim, n)),
                           np.asarray(getattr(env.sim, n)))
        for n in ("phase", "cars"))
    assert diverged, "post-BC rollout still mirrors the expert"

"""Batched advantage actor-critic (reference a3c.py).

The reference runs 4 Python threads, each stepping one env and applying
gradients Hogwild-style into a shared variable store (a3c.py:47-48,
66-97).  The TPU-native equivalent is synchronous batched A2C: the env
batch *is* the worker pool, n-step rollouts are collected in lockstep
under one jit, and a single gradient step per rollout window replaces
the racy per-worker applies — same expected gradient, deterministic.
Under a device mesh the batch is sharded on the data axis and gradients
are all-reduced with psum (see parallel/), which is the collectives
replacement for the shared-memory parameter server (SURVEY.md §2.4).

Semantics ported: GRU(160) trunk with sigmoid Bernoulli action heads
and a vector value head (a3c.py:8-24), n-step = batch_size rollout
windows with bootstrap (a3c.py:121-133), GAE with lam*gamma discounting
and rewards scaled by 1/100 (a3c.py:100-107,126), loss = 0.5*value +
policy - 0.001*entropy with global-norm-40 clip (a3c.py:32-40), and the
known reference defects (undefined ``step``, mis-called ``discount``,
truncated if at a3c.py:86-89) replaced by the intended semantics per
SURVEY.md §2.3.  GAE and the GRU carry are cut at auto-reset episode
boundaries, and the loss replays the window with the SAME done-masked
carries the rollout used (exact — tests/test_algorithms.py asserts
rollout-vs-loss hidden-state agreement across mid-window resets).
``--conv_gru`` swaps in the grid-shaped ConvGRU policy
(the reference shipped its ConvGRUCell unused; config 5 of BASELINE.md
names it).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models import A3CNet, ConvGRUA3CNet
from ..ops import gae
from .common import (build_env, handle_modes, make_expert_action,
                     refresh_schedule, validation_hook)
from .exploration import anneal, sigmoid_decision, sigmoid_greedy

F32 = jnp.float32
I32 = jnp.int32


@struct.dataclass
class A3CTS:
    params: Any
    opt_state: Any
    env: Any
    obs: jnp.ndarray       # trailing-batch obs
    gru: jnp.ndarray       # (B, hidden) or grid carry
    step: jnp.ndarray
    episode: jnp.ndarray
    key: jnp.ndarray


class A3CCtx(NamedTuple):
    benv: Any
    net: Any
    run_window: Any
    run_episode: Any
    greedy_episode: Any
    cfg: Config
    loss_fn: Any = None    # exposed for the exact-replay test


def make_fns(cfg: Config, benv, topo):
    I = benv.n_intersections
    B = benv.n_envs
    if cfg.conv_gru:
        net = ConvGRUA3CNet(m=topo.m, n=topo.n)
        gru0 = lambda: jnp.zeros((B, topo.m, topo.n, net.hidden_channels), F32)
    else:
        net = A3CNet(n_actions=I, reward_size=benv.env.reward_size)
        gru0 = lambda: jnp.zeros((B, net.hidden), F32)
    if cfg.bc_episodes and cfg.finetune_lr:
        # step-count boundary of the BC phase (optimizer updates are
        # one per rollout window)
        bc_windows = cfg.bc_episodes * max(1, cfg.episode_len
                                           // cfg.batch_size)
        lr = optax.piecewise_constant_schedule(
            cfg.learning_rate,
            {bc_windows: cfg.finetune_lr / cfg.learning_rate})
    else:
        lr = cfg.learning_rate
    tx = optax.chain(optax.clip_by_global_norm(40.0),
                     optax.adam(lr))

    def flat_bf(obs):
        """trailing-batch obs (possibly history-stacked) -> (B, feats)"""
        return jnp.moveaxis(obs, -1, 0).reshape(B, -1)

    def forward(params, obs, carry):
        """One step: obs (B, feats) -> scores (B, I), value, carry."""
        scores, value, carry = net.apply(params, obs[:, None, :], carry)
        return scores[:, 0], value[:, 0], carry

    expert_action = make_expert_action(cfg, benv, topo)
    want_expert = expert_action is not None

    def rollout(params, env, obs, carry, key, eps, greedy=False,
                bc=None, t0=None):
        def body(c, t):
            env, obs, carry, key = c
            key, k = jax.random.split(key)
            obs_bf = flat_bf(obs)
            scores, value, carry2 = forward(params, obs_bf, carry)
            a = sigmoid_greedy(scores) if greedy else \
                sigmoid_decision(k, scores, eps, cfg.exploration)
            ea = expert_action(t, k, env, obs_bf) if want_expert else None
            if cfg.bc_episodes:
                a = jnp.where(bc, ea, a)
            env, obs1, rew, done, _ = benv.step_autoreset_lazy(
                env, jnp.moveaxis(a, 0, -1))
            # GRU carry resets at auto-reset boundaries (the reference
            # threads state_in per episode, a3c.py:52-63)
            carry2 = jnp.where(
                done.reshape((-1,) + (1,) * (carry2.ndim - 1)),
                0.0, carry2)
            out = (obs_bf, a.astype(F32), jnp.moveaxis(rew, -1, 0),
                   value, done)
            if want_expert:
                out = out + (ea.astype(F32),)
            return (env, obs1, carry2, key), out

        # within-episode step index for the gated expert (episode_len is
        # a multiple of batch_size, so the global step is congruent to
        # the episode step mod spacing)
        xs = None
        if want_expert:
            xs = (jnp.int32(0) if t0 is None else t0.astype(I32)) + \
                jnp.arange(cfg.batch_size, dtype=I32)
        (env, obs, carry, key), seq = jax.lax.scan(
            body, (env, obs, carry, key), xs, length=cfg.batch_size)
        return env, obs, carry, key, seq

    def loss_fn(params, obs_seq, act_seq, adv, returns, done_seq,
                carry0, expert_seq=None, anchor_w=None):
        # EXACT window replay: the GRU carry is re-zeroed at the same
        # auto-reset boundaries the rollout saw (done at step t cuts
        # the carry feeding step t+1), so loss-side hidden states match
        # the rollout's bit-for-bit — no post-overflow approximation.
        def step(carry, xs):
            obs_t, done_t = xs
            scores_t, value_t, carry = forward(params, obs_t, carry)
            carry = jnp.where(
                done_t.reshape((-1,) + (1,) * (carry.ndim - 1)),
                0.0, carry)
            return carry, (scores_t, value_t)

        _, (scores, values) = jax.lax.scan(
            step, carry0, (obs_seq, done_seq))     # (T, B, ...)
        ce = optax.sigmoid_binary_cross_entropy(scores, act_seq)
        policy_loss = jnp.mean(jnp.sum(adv * ce, axis=-1))
        if expert_seq is not None:
            # DAgger-style anchor toward the expert's decisions on the
            # visited states (see Config.bc_anchor)
            ce_e = optax.sigmoid_binary_cross_entropy(scores, expert_seq)
            if cfg.bc_anchor_gated:
                # anchor only where the policy's own action did NOT
                # beat the value baseline (adv is post-SIL-clamp, so
                # adv <= 0 iff the raw advantage was <= 0)
                ce_e = jnp.where(adv <= 0, ce_e, 0.0)
            policy_loss = policy_loss + anchor_w * jnp.mean(
                jnp.sum(ce_e, axis=-1))
        value_loss = 0.5 * jnp.mean(jnp.sum(
            jnp.square(returns - values), axis=-1))
        from .exploration import entropy as _entropy
        ent = _entropy(jax.nn.sigmoid(scores))
        loss = 0.5 * value_loss + policy_loss - cfg.entropy_coef * ent
        return loss, (policy_loss, value_loss, ent)

    @jax.jit
    def run_window(ts: A3CTS):
        """One n-step window: rollout + bootstrap + GAE + one SGD step
        (the batched equivalent of each worker's train() call)."""
        eps = anneal(cfg.start_eps, cfg.end_eps, cfg.annealing_episodes,
                     ts.episode)
        carry0 = ts.gru
        bc = ts.episode < cfg.bc_episodes if cfg.bc_episodes else None
        env, obs, carry, key, seq = rollout(
            ts.params, ts.env, ts.obs, ts.gru, ts.key, eps, bc=bc,
            t0=ts.step)
        obs_seq, act_seq, rew_seq, val_seq, done_seq = seq[:5]
        expert_seq = seq[5] if want_expert else None
        # bootstrap value of the final obs (a3c.py:121-124)
        _, v_boot, _ = forward(ts.params, flat_bf(obs), carry)
        rew_seq = rew_seq / F32(cfg.reward_scale)     # a3c.py:126
        adv, returns = gae(rew_seq, val_seq, v_boot, cfg.gamma, cfg.lam,
                           nd=1.0 - done_seq.astype(F32))
        if cfg.norm_adv:
            # per-window advantage standardization (diagnostic knob:
            # decouples the policy-gradient scale from reward_scale)
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + F32(1e-6))
        if cfg.sil:
            # self-imitation: reinforce only better-than-baseline
            # actions (see Config.sil)
            adv = jnp.maximum(adv, 0.0)
        if cfg.bc_episodes:
            # BC phase: supervised sigmoid-CE on the expert's actions
            # (unit weight); the value head still fits returns
            adv = jnp.where(bc, jnp.ones_like(adv), adv)
        adv = jax.lax.stop_gradient(adv)
        returns = jax.lax.stop_gradient(returns)
        if cfg.bc_anchor > 0:
            # the anchor activates post-BC only (the BC phase's policy
            # loss already IS unit-weight expert CE)
            anchor_w = F32(cfg.bc_anchor)
            if bc is not None:
                anchor_w = jnp.where(bc, F32(0), anchor_w)
        else:
            expert_seq, anchor_w = None, None
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, obs_seq, act_seq, adv, returns, done_seq, carry0,
            expert_seq, anchor_w)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        ts = ts.replace(params=params, opt_state=opt_state, env=env,
                        obs=obs, gru=carry, key=key,
                        step=ts.step + cfg.batch_size)
        return ts, (loss, jnp.mean(rew_seq), *aux)

    windows_per_episode = max(1, cfg.episode_len // cfg.batch_size)

    @jax.jit
    def run_episode(ts: A3CTS):
        def body(ts, _):
            return run_window(ts)
        ts, outs = jax.lax.scan(body, ts, None, length=windows_per_episode)
        ts = ts.replace(episode=ts.episode + 1,
                        gru=jnp.zeros_like(ts.gru))
        return ts, jax.tree.map(jnp.mean, outs)

    validate_mode = cfg.mode == "validate"

    @jax.jit
    def greedy_episode(ts: A3CTS):
        env, obs = benv.reset(ts.env)

        def body(c, t):
            env, obs, carry, alive, total, n1 = c
            scores, _, carry = forward(ts.params, flat_bf(obs), carry)
            a = sigmoid_greedy(scores)
            env, obs1, rew, done, info = benv.step_autoreset_lazy(
                env, jnp.moveaxis(a, 0, -1))
            disc = cfg.gamma ** t.astype(F32) if cfg.print_discounted else 1.0
            # episode_reward stops at each env's first done
            step_r = jnp.mean(rew, axis=0) * alive.astype(F32)
            ys = info["light_times"] if validate_mode else None
            return (env, obs1, carry, alive & ~done,
                    total + jnp.mean(step_r) * disc,
                    n1 + jnp.sum(a)), ys

        (env, obs, _, alive, total, n1), lt = jax.lax.scan(
            body, (env, obs, jnp.zeros_like(ts.gru),
                   jnp.ones(B, bool), F32(0), jnp.int32(0)),
            jnp.arange(cfg.episode_len))
        denom = cfg.episode_len * benv.n_intersections * benv.n_envs
        return total, env, n1.astype(F32) / denom, lt

    return net, tx, run_window, run_episode, greedy_episode, gru0, loss_fn


def make_state(cfg: Config):
    topo, cfg, benv = build_env(cfg)
    net, tx, run_window, run_episode, greedy_episode, gru0, loss_fn = \
        make_fns(cfg, benv, topo)
    key = jax.random.key(cfg.seed)
    k_env, k_net, k_ts = jax.random.split(key, 3)
    env = benv.init(k_env)
    env, obs = jax.jit(benv.reset)(env)
    import numpy as np
    in_dim = int(np.prod(benv.env.observation_space.shape))
    params = net.init(k_net, jnp.zeros((1, 1, in_dim), F32))
    ts = A3CTS(params=params, opt_state=tx.init(params), env=env, obs=obs,
               gru=gru0(), step=jnp.int32(0), episode=jnp.int32(0),
               key=k_ts)
    if getattr(benv, "mesh", None) is not None:
        from ..parallel import shard_train_state
        ts = shard_train_state(benv.mesh, ts)
    return A3CCtx(benv=benv, net=net, run_window=run_window,
                  run_episode=run_episode, greedy_episode=greedy_episode,
                  cfg=cfg, loss_fn=loss_fn), ts


def _grad_summaries(ctx: A3CCtx, ts: A3CTS, writer, episode: int):
    """--grad_summary histograms, matching the reference's names: the
    decision "scores"/"probs" (algorithms/util.py:85,13) and the
    per-action input-gradient histograms "obs_grad{i}"/"state_grad{i}"
    (a3c.py:41-46), probed on (a 256-env slice of) the current obs."""
    import numpy as np
    B = ctx.benv.n_envs
    nb = min(B, 256)
    obs_bf = jnp.moveaxis(ts.obs, -1, 0).reshape(B, -1)[:nb]
    gru0 = jnp.zeros_like(ts.gru)[:nb]

    def mean_probs(o, h):
        s, _, _ = ctx.net.apply(ts.params, o[:, None, :], h)
        return jnp.mean(jax.nn.sigmoid(s[:, 0]), axis=0)     # (I,)

    scores, _, _ = ctx.net.apply(ts.params, obs_bf[:, None, :], gru0)
    scores = scores[:, 0]
    writer.histogram("scores", np.asarray(scores), episode)
    writer.histogram("probs", np.asarray(jax.nn.sigmoid(scores)), episode)
    go, gh = jax.jacrev(mean_probs, argnums=(0, 1))(obs_bf, gru0)
    for i in range(go.shape[0]):
        writer.histogram(f"obs_grad{i}", np.asarray(go[i]), episode)
        writer.histogram(f"state_grad{i}", np.asarray(gh[i]), episode)


def train(cfg: Config, ctx: A3CCtx, ts: A3CTS, writer, ckpt):
    best = [cfg.best_threshold]
    episode = int(ts.episode)
    try:
        while cfg.total_episodes is None or episode < cfg.total_episodes:
            ts = refresh_schedule(ctx.benv, ts)
            ts, (loss, mean_r, pl, vl, ent) = ctx.run_episode(ts)
            episode = int(ts.episode)
            if episode % cfg.summary_rate == 0:
                writer.scalar("loss", float(loss), episode)
                writer.scalar("policy_loss", float(pl), episode)
                writer.scalar("value_loss", float(vl), episode)
                writer.scalar("entropy_val", float(ent), episode)
                writer.scalar("mean_reward", float(mean_r), episode)
                if cfg.grad_summary:
                    _grad_summaries(ctx, ts, writer, episode)
            if episode % cfg.validate_rate == 0:
                ts = refresh_schedule(ctx.benv, ts)
                rew = float(ctx.greedy_episode(ts)[0])
                validation_hook(cfg, ckpt, writer, best, episode, ts, rew)
            if episode % cfg.save_rate == 0:
                ckpt.save(ts)
    finally:
        ckpt.save(ts)
    return ts


def validate(cfg: Config, ctx: A3CCtx, ts: A3CTS):
    from .common import validate_telemetry
    th0 = getattr(ts.env, "sim", None) and ts.env.sim.trip_hist
    rew, env_final, onep, lt = ctx.greedy_episode(ts)
    info = validate_telemetry(cfg, ctx.benv, env_final, th0, float(onep),
                              light_times=lt)
    return float(rew), info, ts.replace(env=env_final)


def policy_step(ctx: A3CCtx, ts: A3CTS):
    """Host-steppable greedy policy for --render."""
    B = ctx.benv.n_envs

    @jax.jit
    def step(obs, carry):
        if carry is None:
            carry = jnp.zeros_like(ts.gru)
        obs_bf = jnp.moveaxis(obs, -1, 0).reshape(B, -1)
        scores, _, carry = ctx.net.apply(ts.params, obs_bf[:, None, :],
                                         carry)
        a = sigmoid_greedy(scores[:, 0])
        return jnp.moveaxis(a, 0, -1), carry
    return step


def run(cfg: Config):
    return handle_modes(cfg, make_state, train, validate, policy_step)

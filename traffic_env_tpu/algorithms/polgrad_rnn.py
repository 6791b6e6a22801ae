"""Vanilla policy gradient with a GRU trunk (reference polgrad_rnn.py).

Semantics ported: GRU(250) policy with Bernoulli sigmoid heads
(polgrad_rnn.py:58-75), REINFORCE loss = sum over intersections of
discounted-normalized returns x sigmoid cross-entropy
(polgrad_rnn.py:77-79), returns normalized to zero mean / unit std
unless average-reward mode (polgrad_rnn.py:32-35; the traffic driver
forces use_avg for this trainer, traffic_test.py:23), gradient
accumulation across ``batch_size`` episodes before one Adam apply
(polgrad_rnn.py:41-43, 82-86).

Batched: the env batch collects B episodes per jitted call; gradients
are averaged over the batch, and ``batch_size`` accumulation windows
are preserved on top (grad buffers live in the train state).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models import PolGradNet
from ..ops import discount
from .common import (build_env, handle_modes, make_expert_action,
                     refresh_schedule, validation_hook)
from .exploration import anneal, sigmoid_decision, sigmoid_greedy

F32 = jnp.float32
I32 = jnp.int32
EPS = 1e-8


@struct.dataclass
class PGTS:
    params: Any
    grad_acc: Any
    n_acc: jnp.ndarray
    opt_state: Any
    env: Any
    step: jnp.ndarray
    episode: jnp.ndarray
    key: jnp.ndarray


class PGCtx(NamedTuple):
    benv: Any
    net: PolGradNet
    run_episode: Any
    greedy_episode: Any
    cfg: Config


def make_fns(cfg: Config, benv, topo):
    I = benv.n_intersections
    B = benv.n_envs
    net = PolGradNet(n_actions=I)
    if cfg.bc_episodes and cfg.finetune_lr:
        # optimizer applies once per batch_size-episode accumulation
        # window; the BC phase tolerates a larger step than the
        # REINFORCE fine-tune that follows (same rationale as a3c's
        # Config.finetune_lr)
        bc_updates = max(1, cfg.bc_episodes // cfg.batch_size)
        lr = optax.piecewise_constant_schedule(
            cfg.learning_rate,
            {bc_updates: cfg.finetune_lr / cfg.learning_rate})
    else:
        lr = cfg.learning_rate
    tx = optax.adam(lr)

    validate_mode = cfg.mode == "validate"
    expert_action = make_expert_action(cfg, benv, topo)
    want_expert = expert_action is not None

    def collect(params, env, key, eps, greedy=False, bc=None):
        env, obs = benv.reset(env)

        def body(c, t):
            env, obs, gru, key = c
            key, k = jax.random.split(key)
            obs_bf = jnp.moveaxis(obs, -1, 0).reshape(B, -1)
            scores, gru = net.apply(params, obs_bf[:, None, :], gru)
            scores = scores[:, 0]
            a = sigmoid_greedy(scores) if greedy else \
                sigmoid_decision(k, scores, eps, cfg.exploration)
            ea = expert_action(t, k, env, obs_bf) if want_expert else None
            if cfg.bc_episodes:
                # BC warm start: behave with the expert during the
                # first bc_episodes (Config.bc_episodes; the episode
                # starts at reset, so t is the within-episode step the
                # gated expert needs)
                a = jnp.where(bc, ea, a)
            env, obs1, rew, done, info = benv.step_autoreset_lazy(
                env, jnp.moveaxis(a, 0, -1))
            # GRU carry resets at auto-reset boundaries
            gru = jnp.where(done[:, None], 0.0, gru)
            ysd = info["light_times"] if validate_mode else None
            out = (obs_bf, a.astype(F32), jnp.moveaxis(rew, -1, 0), done,
                   ysd)
            if want_expert:
                out = out + (ea.astype(F32),)
            return (env, obs1, gru, key), out

        gru0 = jnp.zeros((B, net.hidden), F32)
        ts_idx = jnp.arange(cfg.episode_len, dtype=I32)
        (env, _, _, key), seq = jax.lax.scan(
            body, (env, obs, gru0, key), ts_idx)
        xs, ys, rs, ds, lt = seq[:5]
        es = seq[5] if want_expert else None
        return env, key, xs, ys, rs, ds, lt, es

    def loss_fn(params, xs, ys, epr, es=None, anchor_w=None):
        # xs (T, B, obs) -> (B, T, obs)
        scores, _ = net.apply(params, jnp.moveaxis(xs, 0, 1))
        ce = optax.sigmoid_binary_cross_entropy(
            scores, jnp.moveaxis(ys, 0, 1))
        loss = jnp.mean(jnp.sum(jnp.moveaxis(epr, 0, 1) * ce, axis=-1))
        if es is not None:
            # post-BC expert-CE anchor on the visited states (same
            # DAgger-style regularizer as a3c's Config.bc_anchor)
            ce_e = optax.sigmoid_binary_cross_entropy(
                scores, jnp.moveaxis(es, 0, 1))
            loss = loss + anchor_w * jnp.mean(jnp.sum(ce_e, axis=-1))
        return loss

    @jax.jit
    def run_episode(ts: PGTS):
        eps = anneal(cfg.start_eps, cfg.end_eps, cfg.annealing_episodes,
                     ts.episode)
        key, k = jax.random.split(ts.key)
        bc = ts.episode < cfg.bc_episodes if cfg.bc_episodes else None
        env, key2, xs, ys, rs, ds, _, es = collect(
            ts.params, ts.env, k, eps, bc=bc)
        # per-intersection reward columns (polgrad feeds the reward
        # vector per action head, polgrad_rnn.py:19,28-31)
        epr = discount(rs, cfg.gamma, cfg.use_avg,
                       nd=1.0 - ds.astype(F32))
        # Reference semantics standardize returns only in discounted
        # mode (polgrad_rnn.py:32-35); --norm_adv extends the same
        # standardization to avg-reward mode (the traffic driver forces
        # use_avg), decoupling the REINFORCE gradient scale from the
        # reward units — same scale fix as a3c's norm_adv.
        if cfg.norm_adv or not cfg.use_avg:
            epr = (epr - jnp.mean(epr)) / (jnp.std(epr) + EPS)
        if cfg.bc_episodes:
            # BC phase: unit-weight CE on the expert's actions (ys IS
            # the expert stream while bc holds)
            epr = jnp.where(bc, jnp.ones_like(epr), epr)
        if cfg.bc_anchor > 0:
            anchor_w = F32(cfg.bc_anchor)
            if bc is not None:
                anchor_w = jnp.where(bc, F32(0), anchor_w)
        else:
            es, anchor_w = None, None
        (loss, grads) = jax.value_and_grad(loss_fn)(
            ts.params, xs, ys, epr, es, anchor_w)
        grad_acc = jax.tree.map(jnp.add, ts.grad_acc, grads)
        n_acc = ts.n_acc + 1
        apply_now = n_acc >= cfg.batch_size

        def do_apply(op):
            params, opt_state, acc = op
            mean_g = jax.tree.map(lambda g: g / F32(cfg.batch_size), acc)
            updates, opt_state = tx.update(mean_g, opt_state, params)
            params = optax.apply_updates(params, updates)
            zeros = jax.tree.map(jnp.zeros_like, acc)
            return params, opt_state, zeros

        params, opt_state, grad_acc = jax.lax.cond(
            apply_now, do_apply, lambda op: op,
            (ts.params, ts.opt_state, grad_acc))
        n_acc = jnp.where(apply_now, 0, n_acc)
        ts = ts.replace(params=params, opt_state=opt_state,
                        grad_acc=grad_acc, n_acc=n_acc, env=env, key=key2,
                        episode=ts.episode + 1,
                        step=ts.step + cfg.episode_len)
        return ts, (loss, jnp.mean(rs))

    @jax.jit
    def greedy_episode(ts: PGTS):
        env, key, xs, ys, rs, ds, lt, _ = collect(
            ts.params, ts.env, ts.key, F32(0), greedy=True,
            bc=jnp.bool_(False))
        t = jnp.arange(cfg.episode_len).astype(F32)
        disc = cfg.gamma ** t if cfg.print_discounted else jnp.ones_like(t)
        # episode_reward stops at each env's first done (util.py:68-94)
        d = ds.astype(F32)
        alive = (jnp.cumsum(d, axis=0) - d) < 1
        r_env = jnp.mean(rs, axis=2) * alive
        rew = jnp.sum(jnp.mean(r_env, axis=1) * disc)
        if cfg.print_avg:
            if cfg.gamma == 1:
                rew = rew / cfg.episode_len
            else:
                rew = rew / ((cfg.gamma ** cfg.episode_len - 1)
                             / (cfg.gamma - 1))
        return rew, env, jnp.mean(ys.astype(F32)), lt

    return net, tx, run_episode, greedy_episode


def make_state(cfg: Config):
    topo, cfg, benv = build_env(cfg)
    net, tx, run_episode, greedy_episode = make_fns(cfg, benv, topo)
    key = jax.random.key(cfg.seed)
    k_env, k_net, k_ts = jax.random.split(key, 3)
    env = benv.init(k_env)
    import numpy as np
    in_dim = int(np.prod(benv.env.observation_space.shape))
    params = net.init(k_net, jnp.zeros((1, 1, in_dim), F32))
    ts = PGTS(params=params,
              grad_acc=jax.tree.map(jnp.zeros_like, params),
              n_acc=jnp.int32(0), opt_state=tx.init(params), env=env,
              step=jnp.int32(0), episode=jnp.int32(0), key=k_ts)
    if getattr(benv, "mesh", None) is not None:
        from ..parallel import shard_train_state
        ts = shard_train_state(benv.mesh, ts)
    return PGCtx(benv=benv, net=net, run_episode=run_episode,
                 greedy_episode=greedy_episode, cfg=cfg), ts


def train(cfg: Config, ctx: PGCtx, ts: PGTS, writer, ckpt):
    best = [cfg.best_threshold]
    episode = int(ts.episode)
    try:
        while cfg.total_episodes is None or episode < cfg.total_episodes:
            ts = refresh_schedule(ctx.benv, ts)
            ts, (loss, mean_r) = ctx.run_episode(ts)
            episode = int(ts.episode)
            if episode % cfg.summary_rate == 0:
                writer.scalar("loss", float(loss), episode)
                writer.scalar("mean_reward", float(mean_r), episode)
            if episode % cfg.validate_rate == 0:
                ts = refresh_schedule(ctx.benv, ts)
                rew = float(ctx.greedy_episode(ts)[0])
                validation_hook(cfg, ckpt, writer, best, episode, ts, rew)
            if episode % cfg.save_rate == 0:
                ckpt.save(ts)
    finally:
        ckpt.save(ts)
    return ts


def validate(cfg: Config, ctx: PGCtx, ts: PGTS):
    from .common import validate_telemetry
    th0 = getattr(ts.env, "sim", None) and ts.env.sim.trip_hist
    rew, env_final, onep, lt = ctx.greedy_episode(ts)
    info = validate_telemetry(cfg, ctx.benv, env_final, th0, float(onep),
                              light_times=lt)
    return float(rew), info, ts.replace(env=env_final)


def policy_step(ctx: PGCtx, ts: PGTS):
    """Host-steppable greedy policy for --render."""
    B = ctx.benv.n_envs

    @jax.jit
    def step(obs, carry):
        if carry is None:
            carry = jnp.zeros((B, ctx.net.hidden), F32)
        obs_bf = jnp.moveaxis(obs, -1, 0).reshape(B, -1)
        scores, carry = ctx.net.apply(ts.params, obs_bf[:, None, :],
                                      carry)
        a = sigmoid_greedy(scores[:, 0])
        return jnp.moveaxis(a, 0, -1), carry
    return step


def run(cfg: Config):
    return handle_modes(cfg, make_state, train, validate, policy_step)

"""Double dueling DRQN with episode-level replay (reference qrnn.py).

Semantics ported: GRU(220) dueling trunk with Q = V + A - mean(A)
(qrnn.py:5-23), whole-episode device replay with per-episode lengths
(qrnn.py:31-55), trace sampling of <= trace_size contiguous steps
(qrnn.py:25-29,56-68), TD error masked to in-bounds AND the latter half
of each trace (recurrent burn-in, qrnn.py:93-95), loss normalized by
total sampled length (qrnn.py:96-97), chooser/target sync cadence as in
qlearn.

Batched shape: B envs roll one episode in a single jitted scan
(carrying GRU state through time), the whole batch of episodes inserts
into replay at once, then a scan of SGD steps trains on sampled traces.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Config
from ..models import DuelingQRNN
from .common import (build_env, handle_modes, refresh_schedule,
                     validation_hook)
from .exploration import exploration_param, softmax_decision
from .replay import EpisodeReplay

F32 = jnp.float32
I32 = jnp.int32


@struct.dataclass
class QRnnTS:
    params_main: Any
    params_chooser: Any
    params_target: Any
    opt_state: Any
    replay: EpisodeReplay
    env: Any
    step: jnp.ndarray
    train_steps: jnp.ndarray
    episode: jnp.ndarray
    key: jnp.ndarray


class QRnnCtx(NamedTuple):
    benv: Any
    net: DuelingQRNN
    run_episode: Any
    greedy_episode: Any
    cfg: Config


def make_fns(cfg: Config, benv):
    I = benv.n_intersections
    B = benv.n_envs
    if cfg.single_agent:
        # --single_agent: one 2^I-way head, decoded to phase bits for
        # the env, mean reward (see qlearn.make_fns / UnGSpaceWrapper)
        from ..envs.extra_wrappers import ungspace_actions
        _, _decode, _ = ungspace_actions(I)
        heads, choices = 1, 2 ** I
        env_action = jax.vmap(_decode)
        learn_reward = lambda r_bf: jnp.mean(r_bf, axis=-1,
                                             keepdims=True)
    else:
        heads, choices = I, 2
        env_action = lambda a: a
        learn_reward = lambda r_bf: r_bf
    net = DuelingQRNN(n_actions=heads, n_choices=choices)
    tx = optax.adam(cfg.learning_rate)

    def flat_bf(obs):
        """trailing-batch obs (possibly history-stacked) -> (B, features)"""
        return jnp.moveaxis(obs, -1, 0).reshape(B, -1)

    def act(params, obs_bf, carry, eps, key, greedy=False):
        """obs_bf (B, obs_dim) one step; returns actions (B, I)."""
        q, carry = net.apply(params, obs_bf[:, None, :], carry)
        q = q[:, 0]                                   # (B, I, 2)
        if greedy:
            return jnp.argmax(q, -1).astype(I32), carry
        return softmax_decision(key, q, eps, cfg.exploration), carry

    validate_mode = cfg.mode == "validate"

    def collect_episode(params, env, key, eps, greedy=False):
        """Roll one episode on all B envs; returns sequences + env
        (plus the light-time stack in validate mode)."""
        env, obs = benv.reset(env)

        def body(carry, _):
            env, obs, gru, key = carry
            key, k = jax.random.split(key)
            a, gru = act(params, flat_bf(obs), gru, eps, k, greedy)
            env, obs1, rew, done, info = benv.step_autoreset_lazy(
                env, jnp.moveaxis(env_action(a), 0, -1))
            # GRU carry resets at episode boundaries (the reference
            # threads state_in per episode, a3c.py:52-63 analogue)
            gru = jnp.where(done[:, None], 0.0, gru)
            ys = info["light_times"] if validate_mode else None
            out = (flat_bf(obs), a,
                   learn_reward(jnp.moveaxis(rew, -1, 0)), done, ys)
            return (env, obs1, gru, key), out

        gru0 = jnp.zeros((B, net.hidden), F32)
        (env, obs_last, _, key), (s_seq, a_seq, r_seq, d_seq, lt) = \
            jax.lax.scan(body, (env, obs, gru0, key), None,
                         length=cfg.episode_len)
        return (env, key, s_seq, a_seq, r_seq, d_seq, flat_bf(obs_last),
                lt)

    def td_train(ts, _):
        key, k1 = jax.random.split(ts.key)
        s, a, r, nd, s1, sizes = ts.replay.sample_traces(
            k1, cfg.batch_size, cfg.trace_size)
        qc, _ = net.apply(ts.params_chooser, s1)
        greedy1 = jnp.argmax(qc, -1)
        qt, _ = net.apply(ts.params_target, s1)
        next_q = jnp.take_along_axis(qt, greedy1[..., None], -1)[..., 0]
        target = jax.lax.stop_gradient(
            r + cfg.gamma * nd[..., None] * next_q)

        def loss_fn(pm):
            qm, _ = net.apply(pm, s)
            pred = jnp.take_along_axis(qm, a[..., None], -1)[..., 0]
            td = target - pred
            t_idx = jnp.arange(cfg.trace_size)[None, :]
            inbounds = (t_idx < sizes[:, None]).astype(F32)
            latter = (t_idx >= cfg.trace_size // 2).astype(F32)
            masked = (inbounds * latter)[..., None] * td
            loss = jnp.sum(jnp.square(masked)) / jnp.maximum(
                jnp.sum(sizes).astype(F32), 1.0)
            return loss, jnp.max(pred)

        (loss, max_q), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params_main)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params_main)
        params_main = optax.apply_updates(ts.params_main, updates)
        ts = ts.replace(params_main=params_main, params_chooser=params_main,
                        opt_state=opt_state, key=key,
                        train_steps=ts.train_steps + 1)
        sync = ts.train_steps % cfg.target_update_rate == 0
        params_target = jax.tree.map(lambda t, m: jnp.where(sync, m, t),
                                     ts.params_target, params_main)
        return ts.replace(params_target=params_target), (loss, max_q)

    @jax.jit
    def run_episode(ts: QRnnTS):
        eps = exploration_param(cfg, ts.episode)
        key, k = jax.random.split(ts.key)
        env, key, s_seq, a_seq, r_seq, d_seq, s_last, _ = collect_episode(
            ts.params_main, ts.env, k, eps)
        # time-major -> episode-major storage
        s_full = jnp.concatenate(
            [jnp.moveaxis(s_seq, 0, 1), s_last[:, None]], axis=1)
        # real episode lengths (qrnn.py:31-55 stores each episode with
        # its length): an env that overflowed ends its stored episode
        # at the first done — steps after it belong to the auto-reset
        # successor episode and are masked out of sampled traces
        anyd = jnp.any(d_seq, axis=0)                        # (B,)
        first_done = jnp.argmax(d_seq.astype(I32), axis=0)
        lens = jnp.where(anyd, first_done + 1,
                         cfg.episode_len).astype(I32)
        replay = ts.replay.add_episodes(
            s_full, jnp.moveaxis(a_seq, 0, 1), jnp.moveaxis(r_seq, 0, 1),
            1.0 - jnp.moveaxis(d_seq, 0, 1).astype(F32), lens)
        ts = ts.replace(env=env, key=key, replay=replay,
                        step=ts.step + cfg.episode_len)
        ready = ts.replay.filled >= ts.replay.size
        n_updates = max(1, cfg.episode_len // cfg.train_rate)

        def do_train(ts):
            ts, (losses, max_qs) = jax.lax.scan(td_train, ts, None,
                                                length=n_updates)
            return ts, (jnp.mean(losses), jnp.max(max_qs))

        ts, (loss, max_q) = jax.lax.cond(
            ready, do_train, lambda t: (t, (F32(0), F32(0))), ts)
        return ts.replace(episode=ts.episode + 1), \
            (jnp.mean(r_seq), loss, max_q)

    @jax.jit
    def greedy_episode(ts: QRnnTS):
        env, key, s_seq, a_seq, r_seq, d_seq, _, lt = collect_episode(
            ts.params_main, ts.env, ts.key, F32(0), greedy=True)
        t = jnp.arange(cfg.episode_len).astype(F32)
        disc = cfg.gamma ** t if cfg.print_discounted else jnp.ones_like(t)
        # episode_reward stops at each env's first done (util.py:68-94)
        d = d_seq.astype(F32)                          # (T, B)
        alive = (jnp.cumsum(d, axis=0) - d) < 1
        r_env = jnp.mean(r_seq, axis=2) * alive        # (T, B)
        rew = jnp.sum(jnp.mean(r_env, axis=1) * disc)
        # ones fraction over env PHASES (decode first under --single_agent)
        ea_seq = jax.vmap(env_action)(a_seq)           # (T, B, I)
        return rew, env, jnp.mean(ea_seq.astype(F32)), lt

    return net, tx, run_episode, greedy_episode


def make_state(cfg: Config):
    topo, cfg, benv = build_env(cfg)
    net, tx, run_episode, greedy_episode = make_fns(cfg, benv)
    key = jax.random.key(cfg.seed)
    k_env, k_net, k_ts = jax.random.split(key, 3)
    env = benv.init(k_env)
    import numpy as np
    obs_dim = int(np.prod(benv.env.observation_space.shape))
    params = net.init(k_net, jnp.zeros((1, 1, obs_dim), F32))
    # episode replay sized in episodes: at least the env batch (else a
    # whole-batch insert keeps only a rotating subset and discards the
    # rest of the collected experience), bounded by buffer_size; a 4096
    # x 121-step x obs-dim store is ~180 MB — fine in HBM
    n_slots = max(cfg.batch_size,
                  min(cfg.buffer_size, max(512, benv.n_envs)))
    ts = QRnnTS(
        params_main=params, params_chooser=params, params_target=params,
        opt_state=tx.init(params),
        replay=EpisodeReplay.create(
            n_slots, cfg.episode_len, obs_dim,
            1 if cfg.single_agent else benv.n_intersections,
            1 if cfg.single_agent else benv.env.reward_size),
        env=env, step=jnp.int32(0), train_steps=jnp.int32(0),
        episode=jnp.int32(0), key=k_ts)
    if getattr(benv, "mesh", None) is not None:
        from ..parallel import shard_train_state
        ts = shard_train_state(benv.mesh, ts)
    return QRnnCtx(benv=benv, net=net, run_episode=run_episode,
                   greedy_episode=greedy_episode, cfg=cfg), ts


def train(cfg: Config, ctx: QRnnCtx, ts: QRnnTS, writer, ckpt):
    best = [cfg.best_threshold]
    episode = int(ts.episode)
    try:
        while cfg.total_episodes is None or episode < cfg.total_episodes:
            ts = refresh_schedule(ctx.benv, ts)
            ts, (mean_r, loss, max_q) = ctx.run_episode(ts)
            episode = int(ts.episode)
            if episode % cfg.summary_rate == 0:
                writer.scalar("loss_val", float(loss), episode)
                writer.scalar("max_predicted_q", float(max_q), episode)
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


def validate(cfg: Config, ctx: QRnnCtx, ts: QRnnTS):
    from .common import validate_telemetry
    th0 = getattr(ts.env, "sim", None) and ts.env.sim.trip_hist
    rew, env_final, onep, lt = ctx.greedy_episode(ts)
    info = validate_telemetry(cfg, ctx.benv, env_final, th0, float(onep),
                              light_times=lt)
    # thread the advanced env back so repeated validation episodes see
    # fresh spawn-stream state instead of replaying one trajectory
    return float(rew), info, ts.replace(env=env_final)


def policy_step(ctx: QRnnCtx, ts: QRnnTS):
    """Host-steppable greedy policy for --render."""
    cfg = ctx.cfg
    B = ctx.benv.n_envs
    I = ctx.benv.n_intersections
    if cfg.single_agent:
        from ..envs.extra_wrappers import ungspace_actions
        _, _decode, _ = ungspace_actions(I)
        decode = jax.vmap(_decode)
    else:
        decode = lambda a: a

    @jax.jit
    def step(obs, carry):
        if carry is None:
            carry = jnp.zeros((B, ctx.net.hidden), F32)
        obs_bf = jnp.moveaxis(obs, -1, 0).reshape(B, -1)
        q, carry = ctx.net.apply(ts.params_main, obs_bf[:, None, :],
                                 carry)
        a = decode(jnp.argmax(q[:, 0], -1).astype(I32))
        return jnp.moveaxis(a, 0, -1), carry
    return step


def run(cfg: Config):
    return handle_modes(cfg, make_state, train, validate, policy_step)

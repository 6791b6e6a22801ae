"""Cross-entropy method over a linear threshold policy (reference
cem.py).

Policy: ``a = (obs . theta < 0)`` per intersection (cem.py:39).  Each
CEM iteration samples ``sample_size`` parameter vectors from a diagonal
Gaussian, scores each by a rollout return, refits mean/std on the elite
fraction (cem.py:15-31), and persists the mean to weights.json
(cem.py:50-62).

TPU-native: the theta population is just another batch axis — the
whole population is evaluated in ONE lockstep env batch (env i runs
candidate i//num_envs_per_candidate), so a full CEM generation is a
single jitted rollout.  The reference's separate tf.app.flags config
(a latent inconsistency, SURVEY.md §2.2) is folded into Config.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .common import build_env, refresh_env_schedule

F32 = jnp.float32

# CEM-specific knobs (reference cem.py:9-13)
ELITE_FRAC = 0.06
SAMPLE_SIZE = 60
N_ITER = 100
INITIAL_STD = 10.0


class CEMCtx(NamedTuple):
    benv: Any = None


from typing import Any  # noqa: E402


def make_eval(cfg: Config, benv, sample_size: int = SAMPLE_SIZE):
    """Batched population evaluation: candidate k runs on envs
    k*tries..(k+1)*tries-1 and its score is the mean over those
    rollouts — the reference's num_tries averaging (cem.py:12, declared
    but dropped by the `for _ in range(1)` latent defect at cem.py:36;
    here it is real and just widens the env batch)."""
    I = benv.n_intersections
    obs_dim = benv.env.obs_dim
    tries = max(1, benv.n_envs // sample_size)

    @jax.jit
    def evaluate(env, thetas, key):
        """thetas (S, obs_dim, I) -> per-candidate per-intersection
        returns (S, I) (the reference's vector ys, cem.py:40-43)."""
        reps = jnp.repeat(thetas, tries, axis=0)       # (B, obs_dim, I)
        env, obs = benv.reset(env)

        def body(c, t):
            env, obs, total, mult = c
            obs_bf = jnp.moveaxis(obs, -1, 0)          # (B, obs_dim)
            scores = jnp.einsum("bo,boi->bi", obs_bf, reps)
            a = (scores < 0).astype(jnp.int32)         # cem.py:39
            env, obs1, rew, done, _ = benv.step_autoreset_lazy(
                env, jnp.moveaxis(a, 0, -1))
            r = jnp.moveaxis(rew, -1, 0)               # (B, I)
            total = total + r * (mult if cfg.print_discounted else 1.0)
            return (env, obs1, total, mult * cfg.gamma), None

        (env, _, total, _), _ = jax.lax.scan(
            body, (env, obs, jnp.zeros((benv.n_envs, I), F32), F32(1)),
            jnp.arange(cfg.episode_len))
        ys = total.reshape(-1, tries, I).mean(axis=1)  # (S, I)
        return env, ys

    return evaluate


def refit(ths, ys, n_elite):
    """Elite refit.  With vector returns the reference selects elites
    PER INTERSECTION (ys.argsort(axis=0) + the expand_dims gather,
    cem.py:21-25): each theta column is refit from the candidates that
    scored best at THAT intersection — per-agent credit assignment the
    scalar reduction would destroy."""
    if ys.ndim > 1:
        idx = np.argsort(ys, axis=0)[-n_elite:]        # (n, I)
        elite = np.take_along_axis(ths, idx[:, None, :], axis=0)
    else:
        elite = ths[np.argsort(ys)[-n_elite:]]
    return elite.mean(axis=0), elite.std(axis=0)


def curve(cfg: Config, n_iter: int = N_ITER, validate_every: int = 5):
    """CEM learning curve in the scripted-baseline metric (VERDICT r2
    item 8): every ``validate_every`` generations the current mean
    theta is evaluated deterministically across the whole env batch
    (every env runs the SAME policy), producing the same
    sum-over-steps-of-mean-reward scalar ``baselines.episode_runner``
    reports, so curves/cem_3x3.json is directly comparable to
    random/fixed/greedy."""
    topo, cfg, benv = build_env(cfg, n_envs=SAMPLE_SIZE * cfg.num_tries)
    evaluate = make_eval(cfg, benv)
    I = benv.n_intersections
    obs_dim = benv.env.obs_dim
    shape = (obs_dim, I)
    th_mean = np.zeros(shape, np.float32)
    th_std = np.ones(shape, np.float32) * INITIAL_STD
    n_elite = int(round(SAMPLE_SIZE * ELITE_FRAC))
    rng = np.random.RandomState(cfg.seed)
    env = benv.init(jax.random.key(cfg.seed))
    key = jax.random.key(cfg.seed + 1)

    def eval_mean(env, th):
        reps = jnp.broadcast_to(jnp.asarray(th), (SAMPLE_SIZE, *shape))
        env, ys = evaluate(env, reps, key)
        return env, float(np.asarray(ys).mean())

    env = refresh_env_schedule(benv, env)
    env, v0 = eval_mean(env, th_mean)
    points = [[0, v0]]
    for it in range(1, n_iter + 1):
        env = refresh_env_schedule(benv, env)
        ths = (rng.randn(SAMPLE_SIZE, *shape).astype(np.float32)
               * th_std + th_mean)
        env, ys = evaluate(env, jnp.asarray(ths), key)
        th_mean, th_std = refit(ths, np.asarray(ys), n_elite)
        if it % validate_every == 0 or it == n_iter:
            env = refresh_env_schedule(benv, env)
            env, v = eval_mean(env, th_mean)
            points.append([it, v])
            print(f"cem iter {it}: mean-theta return {v:.4f}",
                  flush=True)
    return points


def run(cfg: Config):
    topo, cfg, benv = build_env(cfg, n_envs=SAMPLE_SIZE * cfg.num_tries)
    evaluate = make_eval(cfg, benv)
    I = benv.n_intersections
    obs_dim = benv.env.obs_dim
    shape = (obs_dim, I)
    wpath = os.path.join(cfg.logdir, "weights.json")
    os.makedirs(cfg.logdir, exist_ok=True)
    try:
        with open(wpath) as f:
            th_mean = np.reshape(np.asarray(json.load(f), np.float32), shape)
    except Exception:
        th_mean = np.zeros(shape, np.float32)
    th_std = np.ones_like(th_mean) * INITIAL_STD
    n_elite = int(round(SAMPLE_SIZE * ELITE_FRAC))
    rng = np.random.RandomState(cfg.seed)
    env = benv.init(jax.random.key(cfg.seed))
    if benv.mesh is not None:
        from ..parallel import shard_env_state
        env = shard_env_state(benv.mesh, env)
    key = jax.random.key(cfg.seed + 1)
    means = []
    try:
        for it in range(N_ITER):

            env = refresh_env_schedule(benv, env)
            ths = (rng.randn(SAMPLE_SIZE, *shape).astype(np.float32)
                   * th_std + th_mean)
            env, ys = evaluate(env, jnp.asarray(ths), key)
            ys = np.asarray(ys)
            th_mean, th_std = refit(ths, ys, n_elite)
            means.append(float(ys.mean()))
            print(f"iter {it}: mean return {ys.mean():.4f} "
                  f"best {ys.max():.4f}")
            if cfg.total_episodes is not None and it + 1 >= cfg.total_episodes:
                break
    except KeyboardInterrupt:
        pass
    with open(wpath, "w") as f:
        json.dump(np.asarray(th_mean, np.float64).reshape(-1).tolist(), f,
                  indent=4, separators=(",", ": "))
    print("Saved to", wpath)
    return th_mean, means

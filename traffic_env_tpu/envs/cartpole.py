"""Jitted CartPole: the algorithm-correctness fixture.

The reference validates its RL stack on CartPole-v0 through a
GSpace adapter before trusting it on traffic (cartpole-test.py:7-30;
SURVEY.md §4: "a cheap, well-understood env that separates algorithm
bugs from simulator bugs").  This is the same fixture as a pure jitted
batched env with the BatchedEnv surface, so every learner runs on it
unchanged: obs (4, B), one binary action head, scalar reward (as a
1-vector, like GSpaceWrapper's reward reshape, wrappers/gspace.py:17).

Classic-control dynamics: gravity 9.8, cart 1.0, pole 0.1/0.5, force
10, Euler tau=0.02, termination |x|>2.4 or |theta|>12deg or 200 steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..spaces import GSpace

F32 = jnp.float32
I32 = jnp.int32

GRAVITY = 9.8
MASSCART = 1.0
MASSPOLE = 0.1
TOTAL_MASS = MASSCART + MASSPOLE
LENGTH = 0.5
POLEMASS_LENGTH = MASSPOLE * LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_LIMIT = 12 * 2 * jnp.pi / 360
X_LIMIT = 2.4
MAX_STEPS = 200


@struct.dataclass
class CartPoleState:
    s: jnp.ndarray       # f32[4] (x, x_dot, theta, theta_dot)
    t: jnp.ndarray       # i32[]
    key: jnp.ndarray     # u32[2]
    done: jnp.ndarray    # bool[]


class _EnvLike(NamedTuple):
    observation_space: GSpace
    action_space: GSpace
    reward_size: int
    obs_dim: int
    sim_fns: object


class CartPoleBatched(NamedTuple):
    env: _EnvLike
    n_envs: int
    init: callable
    reset: callable
    step: callable
    step_autoreset: callable
    step_autoreset_lazy: callable
    n_intersections: int     # = 1 action head (GSpace([1], 2))


def _physics(s, action):
    x, x_dot, theta, theta_dot = s
    force = jnp.where(action > 0, F32(FORCE_MAG), F32(-FORCE_MAG))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    temp = (force + POLEMASS_LENGTH * theta_dot ** 2 * sin) / TOTAL_MASS
    theta_acc = (GRAVITY * sin - cos * temp) / (
        LENGTH * (4.0 / 3.0 - MASSPOLE * cos ** 2 / TOTAL_MASS))
    x_acc = temp - POLEMASS_LENGTH * theta_acc * cos / TOTAL_MASS
    x = x + TAU * x_dot
    x_dot = x_dot + TAU * x_acc
    theta = theta + TAU * theta_dot
    theta_dot = theta_dot + TAU * theta_acc
    return jnp.stack([x, x_dot, theta, theta_dot])


def make_cartpole_benv(n_envs: int) -> CartPoleBatched:
    def init_one(key):
        return CartPoleState(s=jnp.zeros(4, F32), t=jnp.int32(0),
                             key=jax.random.key_data(key),
                             done=jnp.asarray(False))

    def reset_one(st: CartPoleState):
        k, sub = jax.random.split(jax.random.wrap_key_data(st.key))
        s = jax.random.uniform(sub, (4,), F32, -0.05, 0.05)
        return CartPoleState(s=s, t=jnp.int32(0),
                             key=jax.random.key_data(k),
                             done=jnp.asarray(False)), s

    def step_one(st: CartPoleState, action):
        a = jnp.reshape(action, ()).astype(I32)
        s = _physics(st.s, a)
        t = st.t + 1
        done = ((jnp.abs(s[0]) > X_LIMIT) | (jnp.abs(s[2]) > THETA_LIMIT)
                | (t >= MAX_STEPS))
        st = st.replace(s=s, t=t, done=done)
        return st, s, jnp.ones(1, F32), done, None

    def lazy_one(st, action):
        fresh, _ = reset_one(st)
        st = jax.tree.map(lambda a, b: jnp.where(st.done, a, b), fresh, st)
        return step_one(st, action)

    def autoreset_one(st, action):
        st, obs, r, done, _ = step_one(st, action)
        fresh, obs_r = reset_one(st)
        sel = lambda a, b: jnp.where(done, a, b)
        st = jax.tree.map(sel, fresh, st)
        return st, jnp.where(done, obs_r, obs), r, done, None

    vm = lambda f: jax.vmap(f, in_axes=-1, out_axes=-1)

    def init(key):
        keys = jax.random.split(key, n_envs)
        return jax.vmap(init_one, in_axes=0, out_axes=-1)(keys)

    env = _EnvLike(
        observation_space=GSpace([4], jnp.float32(2.4), F32),
        action_space=GSpace([1], 2),
        reward_size=1, obs_dim=4, sim_fns=None)
    return CartPoleBatched(
        env=env, n_envs=n_envs, init=init,
        reset=vm(reset_one), step=vm(step_one),
        step_autoreset=vm(autoreset_one),
        step_autoreset_lazy=vm(lazy_one),
        n_intersections=1)

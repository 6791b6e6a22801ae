"""Return / advantage scans.

``discount`` is the reference's in-place backward recurrence
``a[i-1] += gamma * a[i]`` with optional average-reward normalization
by geometric-sum denominators (algorithms/util.py:119-129), expressed
as a reverse ``lax.scan`` (time-major, any trailing shape).  ``gae`` is
the generalized-advantage pipeline the reference builds from it
(a3c.py:100-107).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discount(a, gamma: float, use_avg: bool = False, nd=None):
    """Backward discounted accumulation along axis 0.

    Returns the transformed array (the reference mutates in place).
    ``nd`` (1-done, broadcastable to ``a``) cuts the recurrence at
    episode boundaries for auto-reset rollouts."""
    gamma = jnp.float32(gamma)

    if nd is not None:
        ndx = jnp.broadcast_to(
            nd.reshape(nd.shape + (1,) * (a.ndim - nd.ndim)),
            a.shape).astype(jnp.float32)

        def backm(carry, xs):
            x, m = xs
            y = x + gamma * m * carry
            return y, y

        _, out = jax.lax.scan(backm, jnp.zeros_like(a[-1]),
                              (a, ndx), reverse=True)
    else:
        def back(carry, x):
            y = x + gamma * carry
            return y, y

        last = a[-1]
        _, rest = jax.lax.scan(back, last, a[:-1], reverse=True)
        out = jnp.concatenate([rest, last[None]], axis=0)
    if use_avg:
        n = a.shape[0]
        if nd is not None:
            # the denominator must follow the same nd-masked recurrence
            # as the numerator (denom_t = 1 + gamma*m_t*denom_{t+1});
            # the horizon-only geometric sum would average a truncated
            # return as if it covered the whole remaining horizon,
            # biasing positions shortly before an auto-reset low
            def back_denom(carry, m):
                y = 1.0 + gamma * m * carry
                return y, y

            _, denoms = jax.lax.scan(back_denom, jnp.zeros_like(a[-1]),
                                     ndx, reverse=True)
            out = out / denoms
        else:
            # denom_i = 1 + gamma + ... + gamma^(n-1-i), front-to-back
            # exactly like the reference loop (util.py:123-129)
            denoms = []
            denom, extras = jnp.float32(1.0), gamma
            for _ in range(n):
                denoms.append(denom)
                denom = denom + extras
                extras = extras * gamma
            denoms = jnp.stack(denoms[::-1])
            out = out / denoms.reshape((n,) + (1,) * (a.ndim - 1))
    return out


def gae(rewards, values, bootstrap, gamma: float, lam: float, nd=None):
    """Generalized advantage estimation over a time-major rollout.

    deltas = r + gamma*V'*nd - V, discounted by lam*gamma*nd; returns
    (advantages, discounted_returns) (a3c.py:100-107 intended
    semantics).  ``nd`` (1-done, time-major, broadcastable to rewards)
    cuts both the bootstrap and the backward discounting at episode
    boundaries so auto-reset rollouts don't leak value across
    terminations; None means no terminations."""
    gamma = jnp.float32(gamma)
    lamg = jnp.float32(lam) * gamma
    vals = jnp.concatenate([values, bootstrap[None]], axis=0)
    if nd is None:
        deltas = rewards + gamma * vals[1:] - vals[:-1]
        advantages = discount(deltas, lam * gamma)
        drs = jnp.concatenate([rewards, bootstrap[None]], axis=0)
        returns = discount(drs, gamma)[:-1]
        return advantages, returns
    ndx = jnp.broadcast_to(
        nd.reshape(nd.shape + (1,) * (rewards.ndim - nd.ndim)),
        rewards.shape).astype(jnp.float32)
    deltas = rewards + gamma * vals[1:] * ndx - vals[:-1]

    def back_adv(carry, xs):
        d, m = xs
        y = d + lamg * m * carry
        return y, y

    _, advantages = jax.lax.scan(back_adv, jnp.zeros_like(bootstrap),
                                 (deltas, ndx), reverse=True)

    def back_ret(carry, xs):
        r, m = xs
        y = r + gamma * m * carry
        return y, y

    _, returns = jax.lax.scan(back_ret, bootstrap, (rewards, ndx),
                              reverse=True)
    return advantages, returns

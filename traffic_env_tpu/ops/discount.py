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


def discount(a, gamma: float, use_avg: bool = False):
    """Backward discounted accumulation along axis 0.

    Returns the transformed array (the reference mutates in place)."""
    gamma = jnp.float32(gamma)

    def back(carry, x):
        y = x + gamma * carry
        return y, y

    last = a[-1]
    _, rest = jax.lax.scan(back, last, a[:-1], reverse=True)
    out = jnp.concatenate([rest, last[None]], axis=0)
    if use_avg:
        n = a.shape[0]
        # denom_i = 1 + gamma + ... + gamma^(n-1-i), built front-to-back
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


def gae(rewards, values, bootstrap, gamma: float, lam: float):
    """Generalized advantage estimation over a time-major rollout.

    deltas = r + gamma*V' - V, discounted by lam*gamma; returns
    (advantages, discounted_returns) (a3c.py:100-107 intended
    semantics)."""
    vals = jnp.concatenate([values, bootstrap[None]], axis=0)
    deltas = rewards + gamma * vals[1:] - vals[:-1]
    advantages = discount(deltas, lam * gamma)
    # drs[-1] = bootstrap, then plain discounting; the first T entries
    # are the value targets (a3c.py:100-102).
    drs = jnp.concatenate([rewards, bootstrap[None]], axis=0)
    returns = discount(drs, gamma)[:-1]
    return advantages, returns

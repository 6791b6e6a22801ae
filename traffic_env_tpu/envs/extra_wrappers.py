"""Strobe / Last action-repeat wrappers and the single-agent adapter.

``StrobeWrapper`` / ``LastWrapper`` are dead code in the reference
(wrappers/strobe.py:5-37,40-55 — zero importers, SURVEY.md §2.2) but
part of its wrapper API surface; ported here as pure jitted transforms
over a simulator-core tick.  ``UnGSpace`` is the ``--single_agent``
adapter (wrappers/gspace.py:23-34, traffic_test.py:90): multi-head
binary actions become one integer in [0, 2^I), for drivers that only
speak scalar action spaces.

Fixed-shape deviation from the reference (documented): the reference's
Strobe returns a *truncated* history when an episode ends mid-window;
XLA programs have static shapes, so the full ``(num_samples, obs)``
history is returned with ticks after ``done`` frozen (same freeze rule
as the Repeater).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..spaces import GSpace

F32 = jnp.float32
I32 = jnp.int32


def _select(pred, new, old):
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), new, old)


def make_strobe(fns, repeat_count: int, num_samples: int, obs_dim: int,
                sum_indices=()):
    """Action repeat with ``num_samples`` evenly-spaced obs snapshots;
    indices in ``sum_indices`` accumulate within each sample window,
    all others keep the latest value (strobe.py:17-31)."""
    sample_size = repeat_count // num_samples
    assert sample_size * num_samples == repeat_count, \
        (repeat_count, num_samples)
    mask = np.zeros(obs_dim, np.float32)
    if len(sum_indices):
        mask[np.asarray(sum_indices)] = 1

    def step(sim, action, sched=None):
        action = jnp.asarray(action).astype(I32)

        def body(carry, i):
            sim, done, hist, tot = carry
            nxt = fns.tick(sim, action, sched)
            live = ~done
            sim = _select(live, nxt, sim)
            obs = fns.obs(sim).astype(F32)
            tot = tot + jnp.where(live, nxt.rewards, F32(0))
            row = i // sample_size
            start = (i % sample_size) == 0
            row1h = jnp.arange(num_samples) == row
            upd = jnp.where(start, obs, hist[row] * mask + obs)
            # live gating: frozen lanes keep their history rows
            upd = jnp.where(live, upd, hist[row])
            hist = jnp.where(row1h[:, None], upd[None], hist)
            done = done | (live & nxt.done)
            return (sim, done, hist, tot), None

        hist0 = jnp.zeros((num_samples, obs_dim), F32)
        init = (sim, sim.done, hist0, jnp.zeros_like(sim.rewards))
        (sim, done, hist, tot), _ = jax.lax.scan(
            body, init, jnp.arange(repeat_count))
        return sim, hist, tot, done

    return step


def make_last(fns, repeat_count: int):
    """Action repeat returning the final tick's obs and the summed
    reward (strobe.py:40-55)."""

    def step(sim, action, sched=None):
        action = jnp.asarray(action).astype(I32)

        def body(carry, _):
            sim, done, tot = carry
            nxt = fns.tick(sim, action, sched)
            live = ~done
            sim = _select(live, nxt, sim)
            tot = tot + jnp.where(live, nxt.rewards, F32(0))
            done = done | (live & nxt.done)
            return (sim, done, tot), None

        init = (sim, sim.done, jnp.zeros_like(sim.rewards))
        (sim, done, tot), _ = jax.lax.scan(
            body, init, None, length=repeat_count)
        return sim, fns.obs(sim).astype(F32), tot, done

    return step


def ungspace_actions(n_heads: int):
    """The --single_agent adapter (UnGSpaceWrapper): encode/decode
    between one integer in [0, 2^n) and n binary phase heads."""
    space = GSpace([1], 2 ** n_heads)

    def decode(a):
        a = jnp.reshape(jnp.asarray(a).astype(I32), ())
        return (a >> jnp.arange(n_heads)) & 1

    def encode(bits):
        bits = jnp.asarray(bits).astype(I32)
        return jnp.sum(bits * (1 << jnp.arange(n_heads)), axis=0,
                       keepdims=True)

    return space, decode, encode

"""Env batching with a trailing batch axis.

The env batch is mapped onto the *last* axis of every state leaf so it
occupies the TPU's 128-wide vector lanes: a ``(roads, params, slots)``
leaf becomes ``(roads, params, slots, B)``, which XLA tiles with the
large batch dimension minormost instead of lane-padding the tiny
19-slot ring (a ~7x bandwidth difference).  Scalars batch to ``(B,)``.
"""

from __future__ import annotations

import jax

from ..topology import GridRoad
from .structs import SimState, init_state


def batch_last(fn, n_extra_unbatched: int = 0):
    """vmap ``fn`` with the batch axis last on every argument/output.

    ``n_extra_unbatched`` trailing positional args are broadcast
    (e.g. a shared spawn schedule)."""
    if n_extra_unbatched:
        in_axes = ([-1], [None] * n_extra_unbatched)

        def wrapper(*args):
            n = len(args) - n_extra_unbatched
            mapped = jax.vmap(
                lambda *a: fn(*a, *args[n:]),
                in_axes=-1, out_axes=-1)
            return mapped(*args[:n])
        return wrapper
    return jax.vmap(fn, in_axes=-1, out_axes=-1)


def init_batched_state(topo: GridRoad, keys) -> SimState:
    """A fresh batch of env states; ``keys`` is a (B,) PRNG key array."""
    return jax.vmap(lambda k: init_state(topo, k), in_axes=0,
                    out_axes=-1)(keys)

"""GSpace: multi-agent tensor spaces.

The reference replaces gym's single-agent Space with a "generic space":
an integer tensor of a given shape with a per-element exclusive limit
(gspace.py:4-23).  Algorithms size their networks from ``.size`` and
``.limit``; wrappers use ``.replicated`` to prepend history axes.  Here
a GSpace is plain metadata (no gym dependency) plus jax-PRNG sampling,
so it can be used inside jitted programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class GSpace:
    def __init__(self, shape, limit, dtype=jnp.int32):
        self.shape = tuple(int(s) for s in shape)
        self.limit = limit
        self.dtype = dtype
        self.size = int(np.prod(self.shape)) if self.shape else 1

    def sample(self, key):
        """Uniform sample on device (reference uses global np.random,
        gspace.py:13-14)."""
        return jax.random.randint(key, self.shape, 0, self.limit,
                                  dtype=self.dtype)

    def sample_np(self, rng: np.random.RandomState):
        """Host-side sample with the reference's RandomState semantics."""
        return rng.randint(self.limit, size=self.shape, dtype=np.int32)

    def empty(self):
        return jnp.zeros(self.shape, self.dtype)

    def to_action(self, a):
        return jnp.reshape(a, self.shape).astype(self.dtype)

    def contains(self, x):
        return tuple(x.shape) == self.shape

    def replicated(self, n: int) -> "GSpace":
        return GSpace([n, *self.shape], self.limit, self.dtype)

    def __repr__(self):
        return f"GSpace(shape={self.shape}, limit={self.limit})"

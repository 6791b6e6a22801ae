"""Device-resident experience replay.

The reference keeps its replay buffers inside the TF graph as Variables
with scatter-update inserts and random-gather sampling (qlearn.py:22-50,
qrnn.py:31-68) so replay never leaves the compute device.  Here the
buffers are plain jnp arrays inside the training-state pytree: inserts
are ``dynamic_update_slice`` rings, sampling is PRNG-gather, and the
whole thing is donated through the jitted train step — zero host
traffic, shardable across a mesh along the buffer axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TransitionReplay:
    """Ring buffer of (s, a, r, done, s') transitions (qlearn.py:22-50)."""
    s: jnp.ndarray       # f32[N, *obs_shape]
    a: jnp.ndarray       # i32[N, act_dim]
    r: jnp.ndarray       # f32[N, reward_size]
    nd: jnp.ndarray      # f32[N]  (1 - done)
    s1: jnp.ndarray      # f32[N, *obs_shape]
    filled: jnp.ndarray  # i32[] inserts, saturating at N (fill gate —
                         # an unbounded counter overflows int32 after
                         # ~2^31 inserts and silently disables training)
    cursor: jnp.ndarray  # i32[] ring write position (wraps mod N)

    @classmethod
    def create(cls, size: int, obs_shape, act_dim: int, reward_size: int):
        return cls(
            s=jnp.zeros((size, *obs_shape), jnp.float32),
            a=jnp.zeros((size, act_dim), jnp.int32),
            r=jnp.zeros((size, reward_size), jnp.float32),
            nd=jnp.zeros((size,), jnp.float32),
            s1=jnp.zeros((size, *obs_shape), jnp.float32),
            filled=jnp.int32(0),
            cursor=jnp.int32(0),
        )

    @property
    def idx(self):
        # back-compat alias: the reference gates training on total
        # inserts reaching buffer_size (qlearn.py:117-122)
        return self.filled

    @property
    def size(self):
        return self.s.shape[0]

    def add_batch(self, s, a, r, done, s1):
        """Insert a batch of B transitions at consecutive ring slots."""
        b = s.shape[0]
        slots = (self.cursor + jnp.arange(b)) % self.size
        return self.replace(
            s=self.s.at[slots].set(s),
            a=self.a.at[slots].set(a),
            r=self.r.at[slots].set(r),
            nd=self.nd.at[slots].set(1.0 - done.astype(jnp.float32)),
            s1=self.s1.at[slots].set(s1),
            filled=jnp.minimum(self.filled + b, jnp.int32(self.size)),
            cursor=(self.cursor + b) % jnp.int32(self.size),
        )

    def sample(self, key, n: int):
        """Uniform sample over the whole ring (qlearn.py:42-50 samples
        uniformly over buffer_size regardless of fill, after the warmup
        gate ensures the buffer is full)."""
        i = jax.random.randint(key, (n,), 0, self.size)
        return (self.s[i], self.a[i], self.r[i], self.nd[i, None],
                self.s1[i])


@struct.dataclass
class EpisodeReplay:
    """Episode-level replay for recurrent learners (qrnn.py:31-68):
    whole episodes with lengths; sampling draws random contiguous
    traces of up to trace_size steps."""
    s: jnp.ndarray       # f32[N, T+1, obs_dim]
    a: jnp.ndarray       # i32[N, T, act_dim]
    r: jnp.ndarray       # f32[N, T, reward_size]
    nd: jnp.ndarray      # f32[N, T]
    lens: jnp.ndarray    # i32[N]
    filled: jnp.ndarray  # i32[] episodes inserted, saturating at N
    cursor: jnp.ndarray  # i32[] ring write position (wraps mod N)

    @classmethod
    def create(cls, size: int, episode_len: int, obs_dim: int,
               act_dim: int, reward_size: int):
        return cls(
            s=jnp.zeros((size, episode_len + 1, obs_dim), jnp.float32),
            a=jnp.zeros((size, episode_len, act_dim), jnp.int32),
            r=jnp.zeros((size, episode_len, reward_size), jnp.float32),
            nd=jnp.zeros((size, episode_len), jnp.float32),
            lens=jnp.zeros((size,), jnp.int32),
            filled=jnp.int32(0),
            cursor=jnp.int32(0),
        )

    @property
    def size(self):
        return self.s.shape[0]

    def add_episodes(self, s_seq, a_seq, r_seq, nd_seq, lengths):
        """Insert B whole episodes (s_seq has T+1 observations).

        When B exceeds the buffer, a rotating deterministic subset of
        ``size`` episodes is kept — duplicate ring slots in a single
        scatter would otherwise keep an implementation-defined winner
        (nondeterministic, breaking --exact reproducibility)."""
        b = lengths.shape[0]
        n = self.size
        if b > n:
            sel = (self.cursor * jnp.int32(13)
                   + jnp.arange(n)) % jnp.int32(b)
            s_seq, a_seq = s_seq[sel], a_seq[sel]
            r_seq, nd_seq, lengths = r_seq[sel], nd_seq[sel], lengths[sel]
            b = n
        slots = (self.cursor + jnp.arange(b)) % n
        return self.replace(
            s=self.s.at[slots].set(s_seq),
            a=self.a.at[slots].set(a_seq),
            r=self.r.at[slots].set(r_seq),
            nd=self.nd.at[slots].set(nd_seq),
            lens=self.lens.at[slots].set(lengths),
            filled=jnp.minimum(self.filled + b, jnp.int32(n)),
            cursor=(self.cursor + b) % jnp.int32(n),
        )

    def sample_traces(self, key, n_ep: int, n_exp: int):
        """qrnn.py:25-29,56-68: pick n_ep episodes, one random
        contiguous trace of up to n_exp steps each; returns
        (s, a, r, nd, s1, trace_sizes) with time axis n_exp, zero-padded."""
        k1, k2 = jax.random.split(key)
        i = jax.random.randint(k1, (n_ep,), 0, self.size)
        lens = self.lens[i]
        sizes = jnp.minimum(n_exp, lens)
        max_start = jnp.maximum(1, lens - n_exp + 1)
        start = (jax.random.uniform(k2, (n_ep,))
                 * max_start.astype(jnp.float32)).astype(jnp.int32)
        offs = jnp.arange(n_exp)[None, :]
        j = start[:, None] + offs
        valid = offs < sizes[:, None]
        j = jnp.where(valid, j, 0)
        ii = i[:, None]
        return (self.s[ii, j], self.a[ii, j], self.r[ii, j],
                self.nd[ii, j], self.s[ii, j + 1], sizes)

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
class FrameReplay:
    """Transition replay that stores each observation FRAME once.

    The reference's graph-resident ring stores full (s, s') pairs per
    transition (qlearn.py:22-50); with qlearn's 20-frame history stacks
    that means writing 2x20 frames of redundant HBM per insert.  Here
    the ring is per-STEP: one frame row, one action/reward/done row per
    agent step across the whole env batch, and the k-frame stacks the
    net consumes are reconstructed at sample time by gathering k+1
    consecutive rows — a ~2k-fold cut in replay write bandwidth, the
    dominant cost of the jitted qlearn episode at 4096 envs.

    Reconstruction is EXACT for the lazy-autoreset actor (env.py
    step_autoreset_lazy): the env's history buffer rolls straight
    through resets, so the last k frames of an env's own stream are
    precisely the stack the policy saw.  Capacity is ``steps`` ring
    rows = steps * n_envs transitions; sampling is uniform over the
    (valid steps x envs) window, and one row per step means duplicate
    ring slots cannot occur (insert order is trivially deterministic).
    """
    frames: jnp.ndarray  # f32[N, B, obs_dim]  newest frame after step
    a: jnp.ndarray       # i32[N, B, heads]
    r: jnp.ndarray       # f32[N, B, reward_size]
    nd: jnp.ndarray      # f32[N, B]  (1 - done)
    filled: jnp.ndarray  # i32[] steps inserted, saturating at N
    cursor: jnp.ndarray  # i32[] ring write position (wraps mod N)
    k: int = struct.field(pytree_node=False, default=1)  # history depth

    @classmethod
    def create(cls, buffer_size: int, n_envs: int, k: int, obs_dim: int,
               act_dim: int, reward_size: int):
        """``buffer_size`` is the reference's transition capacity; the
        step-ring depth is buffer_size/n_envs rows, floored at k+2 so
        at least two distinct stacks are always reconstructible."""
        steps = max(buffer_size // max(n_envs, 1), k + 2)
        return cls(
            frames=jnp.zeros((steps, n_envs, obs_dim), jnp.float32),
            a=jnp.zeros((steps, n_envs, act_dim), jnp.int32),
            r=jnp.zeros((steps, n_envs, reward_size), jnp.float32),
            nd=jnp.zeros((steps, n_envs), jnp.float32),
            filled=jnp.int32(0),
            cursor=jnp.int32(0),
            k=int(k),
        )

    @property
    def idx(self):
        # back-compat alias: the reference gates training on the
        # buffer being full (qlearn.py:117-122)
        return self.filled

    @property
    def size(self):
        return self.frames.shape[0]

    def add_step(self, frame, a, r, done):
        """Insert one agent step across the env batch: ``frame`` is the
        NEWEST observation frame after the step, (B, obs_dim)."""
        c = self.cursor
        return self.replace(
            frames=self.frames.at[c].set(frame),
            a=self.a.at[c].set(a),
            r=self.r.at[c].set(r),
            nd=self.nd.at[c].set(1.0 - done.astype(jnp.float32)),
            filled=jnp.minimum(self.filled + 1, jnp.int32(self.size)),
            cursor=(c + 1) % jnp.int32(self.size),
        )

    def prefill(self, frames_kbo):
        """Seed the ring with the env's reset-time history prefill
        (k rows, (k, B, obs_dim)) so ``last_stack`` is warm from step 0.

        The rows carry dummy action/reward; they can never anchor a
        sampled transition because ``sample`` draws only from the
        newest ``filled - k`` rows — prefill rows serve purely as
        history context until the ring overwrites them."""
        k = frames_kbo.shape[0]
        c = self.cursor
        N = jnp.int32(self.size)
        slots = (c + jnp.arange(k)) % N
        return self.replace(
            frames=self.frames.at[slots].set(frames_kbo),
            filled=jnp.minimum(self.filled + k, N),
            cursor=(c + k) % N,
        )

    def last_stack(self):
        """The k-frame stack the policy should act on NOW: the newest
        k rows in insertion order, (k, B, obs_dim).

        This replaces the env-side ``jnp.roll`` history buffer in the
        training hot loop: the ring is written one row per step by
        ``add_step`` anyway, so the k-row roll WRITE (the dominant
        qlearn memory cost at history=20) disappears and the policy
        gathers its input straight from the ring."""
        N = self.size
        idx = (self.cursor - self.k + jnp.arange(self.k)) % jnp.int32(N)
        return self.frames[idx]

    def sample(self, key, n: int):
        """Uniform over valid (step, env) transitions.  Transition j
        consumes frames j-k..j: s = stack(j-k..j-1) (the obs the actor
        saw when choosing a(j)), s1 = stack(j-k+1..j)."""
        N, B = self.size, self.frames.shape[1]
        k1, k2 = jax.random.split(key)
        m = jnp.maximum(self.filled - self.k, 1)  # valid step count
        u = jax.random.randint(k1, (n,), 0, m)    # offset from newest
        e = jax.random.randint(k2, (n,), 0, B)
        j = (self.cursor - 1 - u) % jnp.int32(N)  # row of frame(j)
        offs = jnp.arange(self.k)
        idx_s = (j[:, None] - self.k + offs[None, :]) % N   # (n, k)
        s = self.frames[idx_s, e[:, None]]        # (n, k, obs)
        s1 = self.frames[(idx_s + 1) % N, e[:, None]]
        return (s, self.a[j, e], self.r[j, e], self.nd[j, e][:, None],
                s1)


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
        b = orig_b = lengths.shape[0]
        n = self.size
        if b > n:
            sel = (self.cursor * jnp.int32(13)
                   + jnp.arange(n)) % jnp.int32(b)
            s_seq, a_seq = s_seq[sel], a_seq[sel]
            r_seq, nd_seq, lengths = r_seq[sel], nd_seq[sel], lengths[sel]
            b = n
        slots = (self.cursor + jnp.arange(b)) % n
        # cursor advances by the ORIGINAL batch size: with b a
        # multiple of n, advancing by the kept count would leave the
        # cursor fixed and the "rotating" subset static forever
        return self.replace(
            s=self.s.at[slots].set(s_seq),
            a=self.a.at[slots].set(a_seq),
            r=self.r.at[slots].set(r_seq),
            nd=self.nd.at[slots].set(nd_seq),
            lens=self.lens.at[slots].set(lengths),
            filled=jnp.minimum(self.filled + b, jnp.int32(n)),
            cursor=(self.cursor + orig_b) % jnp.int32(n),
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

"""Policy / value network families.

Architectures match the reference nets (sizes, activations, heads):

* ``QNet`` — feed-forward double-DQN trunk with a residual block
  (qlearn.py:12-20): obs -> 200 relu -> 200 -> +resid(200) -> relu ->
  per-intersection Q values of shape (actions, 2).
* ``DuelingQRNN`` — recurrent double dueling DQN (qrnn.py:5-23):
  180 relu -> GRU(220) -> 180 relu -> split advantage/value streams ->
  Q = V + A - mean(A).
* ``A3CNet`` — GRU actor-critic (a3c.py:8-24): 160 relu -> GRU(160) ->
  160 relu -> per-intersection Bernoulli logits + vector value head.
* ``PolGradNet`` — vanilla-PG GRU trunk (polgrad_rnn.py:58-75).
* ``ConvGRUCell`` — grid-shaped convolutional GRU (conv_gru_cell.py:5-28),
  used by the conv-GRU A3C policy variant: the hidden state is an
  (m, n, C) feature map over the intersection grid.

All run in float32 (the nets are tiny; the MXU work is the batched
matmuls over thousands of envs).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def obs_grid_channels(flat, m, n):
    """Flat observation -> (…, m, n, C) grid channel maps.

    The flattened obs is per-road passed/detected (4 directions x 2)
    + per-intersection phase feature (9 columns per intersection), and
    with --occupancy_obs four more per-direction occupancy channels
    (13 columns); road id within a direction block is row*n + col, so
    each block reshapes row-major onto the (m, n) grid.  With
    --history=k the flat obs is k frame-major frames (oldest first,
    EnvState.history); each frame becomes its own channel group,
    giving C = k*9 or k*13 channels.  Shared by the grid-native nets
    (ConvGRUA3CNet policy, ConvQNet value)."""
    v = m * n
    lead = flat.shape[:-1]
    d = flat.shape[-1]
    # prefer the occupancy frame width when both divide (ambiguous
    # only at history multiples of 9, not used by any config)
    frame = 13 * v if d % (13 * v) == 0 else \
        9 * v if d % (9 * v) == 0 else 0
    if not frame:
        return jnp.zeros(lead + (m, n, 9), flat.dtype)
    k = d // frame
    width = frame // v            # 9 or 13 channels per frame

    def to_grid(fr):
        def block(lo, n_dirs):
            return fr[..., lo * v:(lo + n_dirs) * v].reshape(
                lead + (n_dirs, m, n))
        chans = [block(0, 4), block(4, 4), block(8, 1)]
        if width >= 13:
            chans.append(block(9, 4))
        g = jnp.concatenate(chans, axis=-3)
        return jnp.moveaxis(g, -3, -1)    # (…, m, n, 9 or 13)

    frames = flat.reshape(lead + (k, frame))
    return jnp.concatenate(
        [to_grid(frames[..., i, :]) for i in range(k)], axis=-1)


class QNet(nn.Module):
    """qlearn.py:12-20 — returns (batch, n_actions, n_choices) Q values.
    n_choices=2 is the per-intersection phase pair; --single_agent uses
    one head with 2^I choices (wrappers/gspace.py:23-34)."""
    n_actions: int
    n_choices: int = 2

    @nn.compact
    def __call__(self, obs):
        x = obs.reshape((obs.shape[0], -1))
        h0 = nn.relu(nn.Dense(200)(x))
        h1 = nn.Dense(200)(h0)
        resid = nn.Dense(200)(nn.relu(h1))
        h2 = nn.relu(h1 + resid)
        q = nn.Dense(self.n_actions * self.n_choices)(h2)
        return q.reshape((-1, self.n_actions, self.n_choices))


class ConvQNet(nn.Module):
    """Grid-native double-DQN trunk: QNet's residual structure with
    the Dense layers replaced by weight-shared convolutions over the
    (m, n) intersection grid (obs_grid_channels; history frames as
    channel groups).  Same interface as QNet — flat obs in,
    (batch, m*n, n_choices) Q out — so it drops into qlearn's
    main/chooser/target triple unchanged (--conv_gru with
    --trainer=qlearn).  Rationale: the flattened QNet plateaus below
    scripted greedy on the 5x5 grid (25 heads through one Dense-200
    bottleneck); sharing weights across intersections restores the
    3x3-sized learning problem at every grid size, and convs are the
    MXU-friendly shape for it."""
    m: int
    n: int
    n_choices: int = 2
    channels: int = 64

    @nn.compact
    def __call__(self, obs):
        b = obs.shape[0]
        g = obs_grid_channels(obs.reshape((b, -1)), self.m, self.n)
        h0 = nn.relu(nn.Conv(self.channels, (3, 3))(g))
        h1 = nn.Conv(self.channels, (3, 3))(h0)
        resid = nn.Conv(self.channels, (3, 3))(nn.relu(h1))
        h2 = nn.relu(h1 + resid)
        q = nn.Conv(self.n_choices, (1, 1))(h2)       # (b, m, n, 2)
        return q.reshape((b, self.m * self.n, self.n_choices))


class DuelingQRNN(nn.Module):
    """qrnn.py:5-23 — recurrent dueling Q net over a trace.

    Input (batch, time, obs_dim); returns ((batch, time, actions,
    n_choices) Q, final GRU state)."""
    n_actions: int
    hidden: int = 220
    n_choices: int = 2

    @nn.compact
    def __call__(self, obs, initial_state=None, lens=None):
        b, t = obs.shape[0], obs.shape[1]
        x = obs.reshape((b, t, -1))
        x = nn.relu(nn.Dense(180)(x))
        cell = nn.GRUCell(features=self.hidden)
        if initial_state is None:
            initial_state = jnp.zeros((b, self.hidden), x.dtype)
        scan = nn.RNN(cell, return_carry=True)
        carry, seq = scan(x, initial_carry=initial_state)
        mid = nn.relu(nn.Dense(180)(seq))
        a_stream, v_stream = jnp.split(mid, 2, axis=-1)
        nc = self.n_choices
        adv = nn.Dense(self.n_actions * nc)(a_stream).reshape(
            (b, t, self.n_actions, nc))
        val = nn.Dense(self.n_actions * nc)(v_stream).reshape(
            (b, t, self.n_actions, nc))
        q = val + adv - jnp.mean(adv, axis=-1, keepdims=True)
        return q, carry


class A3CNet(nn.Module):
    """a3c.py:8-24 — GRU actor-critic with sigmoid Bernoulli heads."""
    n_actions: int
    reward_size: int
    hidden: int = 160

    @nn.compact
    def __call__(self, obs, initial_state=None):
        b, t = obs.shape[0], obs.shape[1]
        x = nn.relu(nn.Dense(self.hidden)(obs.reshape((b, t, -1))))
        cell = nn.GRUCell(features=self.hidden)
        if initial_state is None:
            initial_state = jnp.zeros((b, self.hidden), x.dtype)
        carry, seq = nn.RNN(cell, return_carry=True)(
            x, initial_carry=initial_state)
        h0 = nn.relu(nn.Dense(self.hidden)(seq))
        scores = nn.Dense(self.n_actions, name="score_layer")(h0)
        value = nn.Dense(self.reward_size, name="value_layer")(h0)
        return scores, value, carry


class PolGradNet(nn.Module):
    """polgrad_rnn.py:58-75 — GRU policy with Bernoulli heads."""
    n_actions: int
    hidden: int = 250

    @nn.compact
    def __call__(self, obs, initial_state=None):
        b, t = obs.shape[0], obs.shape[1]
        x = nn.relu(nn.Dense(200)(obs.reshape((b, t, -1))))
        cell = nn.GRUCell(features=self.hidden)
        if initial_state is None:
            initial_state = jnp.zeros((b, self.hidden), x.dtype)
        carry, seq = nn.RNN(cell, return_carry=True)(
            x, initial_carry=initial_state)
        h0 = nn.relu(nn.Dense(200)(seq))
        h1 = nn.relu(nn.Dense(200)(h0))
        scores = nn.Dense(self.n_actions, name="score_layer")(h1)
        return scores, carry


class ConvGRUCell(nn.Module):
    """conv_gru_cell.py:5-28 — 2-D convolutional GRU cell.

    State and input are (batch, m, n, C) feature maps; the three gates
    are convolutions over the concatenated state+input (no biases,
    sigmoid/sigmoid/tanh activations)."""
    hidden_channels: int
    kernel: Sequence[int] = (3, 3)

    @nn.compact
    def __call__(self, state, inputs):
        both = jnp.concatenate([state, inputs], axis=-1)
        conv = lambda name: nn.Conv(self.hidden_channels, self.kernel,
                                    use_bias=False, name=name)
        z = nn.sigmoid(conv("update_gate")(both))
        r = nn.sigmoid(conv("reset_gate")(both))
        cand = jnp.concatenate([r * state, inputs], axis=-1)
        h_tilde = nn.tanh(nn.Conv(self.hidden_channels, self.kernel,
                                  use_bias=False, name="candidate")(cand))
        h = (1 - z) * state + z * h_tilde
        return h, h


class ConvGRUA3CNet(nn.Module):
    """A3C policy over the intersection grid using ConvGRUCell: the obs
    vector is reshaped into per-intersection feature columns on the
    (m, n) grid, recurrent state is a grid feature map, and heads are
    1x1 convolutions producing one logit/value per intersection.
    (The reference shipped ConvGRUCell unused — conv_gru_cell.py — and
    names the conv-GRU A3C policy in its benchmark configs; this is
    that model, grid-native.)"""
    m: int
    n: int
    hidden_channels: int = 32

    @nn.compact
    def __call__(self, obs, initial_state=None):
        # obs (batch, time, obs_dim) -> (batch, time, m, n, C) channel
        # maps; history frames become channel groups (obs_grid_channels
        # — this is what lets the conv-GRU pair with the history-20
        # distillation teacher, Config.bc_expert).
        b, t = obs.shape[0], obs.shape[1]
        v = self.m * self.n
        grid = obs_grid_channels(obs.reshape((b, t, -1)), self.m, self.n)
        cell = ConvGRUCell(self.hidden_channels)
        if initial_state is None:
            initial_state = jnp.zeros(
                (b, self.m, self.n, self.hidden_channels))

        def scan_fn(carry, xt):
            return cell(carry, xt)

        scan = nn.scan(lambda mdl, c, xt: mdl(c, xt),
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        carry, seq = scan(cell, initial_state, grid)
        head = lambda ch, name: nn.Conv(ch, (1, 1), name=name)(seq)
        scores = head(1, "score_head").reshape((b, t, v))
        value = head(1, "value_head").reshape((b, t, v))
        return scores, value, carry

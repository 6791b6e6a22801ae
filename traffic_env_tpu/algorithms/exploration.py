"""Exploration policies and annealing.

Reference semantics (algorithms/util.py:17-22, 75-114):

* ``anneal`` — linear decay from start to end over annealing_episodes,
  stepped once per episode, floored at end.
* ``softmax_decision`` — per-agent argmax over the last axis of a score
  tensor; e-greedy replaces each agent's action with a uniform draw
  with probability eps.  The reference's Boltzmann branch is marked
  broken ("THIS DOESN'T WORK!!", util.py:88); here it is implemented
  with the intended semantics (Gumbel sampling of softmax(scores/temp)).
* ``sigmoid_decision`` — independent Bernoulli heads; e-greedy mixes
  probabilities toward 0.5, "proportional" samples the raw sigmoids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def anneal(start: float, end: float, annealing_episodes: float, episode):
    """Value after ``episode`` per-episode decay steps (util.py:17-22)."""
    step = (start - end) / annealing_episodes
    return jnp.maximum(end, start - step * episode.astype(jnp.float32))


def exploration_param(cfg, episode):
    """The annealed exploration knob (algorithms/util.py:75-80): the
    epsilon schedule for e_greedy/proportional, the TEMPERATURE
    schedule (start_temp=500 -> end_temp=1) for boltzman.  The two
    schedules differ by ~3 orders of magnitude at episode 0; feeding
    eps to the softmax divisor is not a substitute."""
    if cfg.exploration == "boltzman":
        return anneal(cfg.start_temp, cfg.end_temp,
                      cfg.annealing_episodes, episode)
    return anneal(cfg.start_eps, cfg.end_eps, cfg.annealing_episodes,
                  episode)


def greedy_from_scores(scores):
    """argmax over the trailing action axis (util.py:86)."""
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def softmax_decision(key, scores, eps, mode: str = "e_greedy"):
    """Explore action from a (..., n_choices) score tensor."""
    greedy = greedy_from_scores(scores)
    n = scores.shape[-1]
    if mode == "e_greedy":
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, greedy.shape, 0, n, dtype=jnp.int32)
        cond = jax.random.uniform(k2, greedy.shape) < eps
        return jnp.where(cond, rand, greedy)
    if mode == "boltzman":
        return jax.random.categorical(key, scores / eps, axis=-1).astype(
            jnp.int32)
    raise ValueError(f"Unknown exploration type {mode}")


def sigmoid_decision(key, scores, eps, mode: str = "e_greedy"):
    """Bernoulli per-agent heads (util.py:103-114).  Returns int32 0/1."""
    probs = jax.nn.sigmoid(scores)
    if mode == "e_greedy":
        shifted = eps * 0.5 + (1 - eps) * probs
    elif mode == "proportional":
        shifted = probs
    else:
        raise ValueError(f"Unknown exploration type {mode}")
    return (jax.random.uniform(key, shifted.shape) < shifted).astype(
        jnp.int32)


def sigmoid_greedy(scores):
    """round(sigmoid(scores)) (util.py:107)."""
    return jnp.round(jax.nn.sigmoid(scores)).astype(jnp.int32)


def entropy(probs, eps: float = 1e-8):
    """Mean Bernoulli score entropy summary (util.py:12-15)."""
    return -jnp.mean(probs * jnp.log(probs + eps))

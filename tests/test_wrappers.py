"""Bit-exactness of the full wrapper stack (Repeater/Remi/Localize/
Squish/Warmup/History) against the oracle stack, driven with identical
phase/action streams."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import build_schedule, make_env
from traffic_env_tpu.oracle.stack import OracleEnv
from traffic_env_tpu.topology import GridRoad


def build(seed=5, m=3, n=3, length=250.0, **kw):
    topo = GridRoad(m, n, length)
    cfg = Config(grid_m=m, grid_n=n, road_length=length, **kw).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    oracle = OracleEnv(topo, cfg, seed=seed)
    env = make_env(topo, cfg, on_device_spawns=False)
    return topo, cfg, oracle, env


def run_parity(topo, cfg, oracle, env, seed, agent_steps=25, episodes=2):
    I = topo.intersections
    k_hist = max(cfg.history, 1)
    n_reset_actions = 1 + cfg.warmup_lights + (k_hist - 1 if k_hist > 1 else 0)
    ticks_needed = (agent_steps + n_reset_actions + 2) * \
        cfg.light_iterations * episodes + 50
    sched = jax.tree.map(jnp.asarray,
                         build_schedule(topo, cfg, seed, ticks_needed))
    rng = np.random.RandomState(1000 + seed)
    state = env.init(jax.random.key(0))
    step = jax.jit(lambda s, a: env.step(s, a, sched))
    reset = jax.jit(lambda s, ph, acts: env.reset(s, sched, ph, acts))

    for ep in range(episodes):
        phase0 = rng.randint(2, size=I).astype(np.int32)
        racts = rng.randint(2, size=(n_reset_actions, I)).astype(np.int32)
        oracle.rng = _StreamRng(phase0, racts)
        obs_o = oracle.reset()
        state, obs_j = reset(state, phase0, racts)
        np.testing.assert_array_equal(
            np.asarray(obs_o, np.float32), np.asarray(obs_j),
            err_msg=f"reset obs ep {ep}")
        for t in range(agent_steps):
            a = rng.randint(2, size=I).astype(np.int32)
            oo, ro, do, io = oracle.step(a)
            state, oj, rj, dj, ij = step(state, a)
            np.testing.assert_array_equal(np.asarray(oo, np.float32),
                                          np.asarray(oj),
                                          err_msg=f"obs ep{ep} t{t}")
            np.testing.assert_array_equal(np.float32(ro), np.asarray(rj),
                                          err_msg=f"reward ep{ep} t{t}")
            assert do == bool(dj), f"done ep{ep} t{t}"
            if cfg.mode == "validate":
                secs = np.asarray(ij["light_times"])
                np.testing.assert_array_equal(
                    io["light_times"], secs[np.nonzero(secs)])
            if do:
                break


class _StreamRng:
    """Feeds a pre-decided phase + action stream to the oracle stack
    (mirrors driving the JAX reset with explicit host samples)."""

    def __init__(self, phase, actions):
        self.rows = [phase, *actions]
        self.i = 0

    def randint(self, *a, **kw):
        row = self.rows[self.i]
        self.i += 1
        return row


def test_default_stack_remi():
    run_parity(*build(seed=5), seed=5)


def test_raw_repeater_rewards():
    run_parity(*build(seed=6, remi=False), seed=6)


def test_localized_rewards():
    run_parity(*build(seed=7, local_weight=3), seed=7)


def test_squished_rewards():
    run_parity(*build(seed=8, squish_rewards=True), seed=8)


def test_warmup():
    run_parity(*build(seed=9, warmup_lights=2), seed=9, agent_steps=15)


def test_history_stack():
    run_parity(*build(seed=10, history=4), seed=10, agent_steps=15)


def test_validate_mode_light_times():
    run_parity(*build(seed=11, mode="validate"), seed=11, agent_steps=15)


def test_small_grid_long():
    run_parity(*build(seed=12, m=2, n=2, length=150.0), seed=12,
               agent_steps=40, episodes=3)


def test_strobe_last_and_ungspace():
    """Dead-code wrapper API parity (strobe.py): Strobe subsamples
    obs snapshots with sum-index accumulation, Last returns the final
    tick's obs; UnGSpace round-trips scalar <-> multi-head actions."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from traffic_env_tpu.config import Config, derive_spawn_rate
    from traffic_env_tpu.envs.extra_wrappers import (make_last, make_strobe,
                                                     ungspace_actions)
    from traffic_env_tpu.envs.fast_core import (init_state_compact,
                                                make_sim_fast)
    from traffic_env_tpu.topology import GridRoad

    topo = GridRoad(1, 1, 80.0)
    cfg = Config(grid_m=1, grid_n=1, road_length=80.0,
                 history=1).derive().replace(history=1)
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    fns = make_sim_fast(topo, cfg)
    sim = init_state_compact(topo, jax.random.key(0))
    sim = fns.reset(sim, jnp.zeros(1, jnp.int32))
    obs_dim = 2 * 2 * topo.train_roads + 2 * topo.intersections
    obs_dim = len(np.asarray(fns.obs(sim)))
    Rt = topo.train_roads
    strobe = jax.jit(make_strobe(fns, 10, 2, obs_dim,
                                 sum_indices=np.arange(Rt)))
    sim2, hist, rew, done = strobe(sim, jnp.zeros(1, jnp.int32))
    assert hist.shape == (2, obs_dim)
    # passed indices accumulate across the sample window; raw obs is
    # per-tick, so the strobed row must be >= any single tick's value
    last = jax.jit(make_last(fns, 10))
    sim3, obs3, rew3, done3 = last(sim, jnp.zeros(1, jnp.int32))
    assert obs3.shape == (obs_dim,)
    # the two transforms advance the sim identically
    np.testing.assert_array_equal(np.asarray(sim2.cars),
                                  np.asarray(sim3.cars))

    space, decode, encode = ungspace_actions(9)
    assert space.limit == 2 ** 9
    a = jnp.asarray([1, 0, 1, 1, 0, 0, 1, 0, 1], jnp.int32)
    code = encode(a)
    np.testing.assert_array_equal(np.asarray(decode(code)), np.asarray(a))

"""The C++ native core must match the NumPy oracle bit-for-bit."""

import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.oracle import OracleSim, PoissonSpawner
from traffic_env_tpu.topology import GridRoad

native = pytest.importorskip("traffic_env_tpu.runtime.native")


def test_native_matches_oracle_long():
    topo = GridRoad(3, 3, 250.0)
    cfg = Config().derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    oracle = OracleSim(topo, cfg, seed=5)
    nsim = native.NativeSim(topo, cfg)
    # one shared spawn stream driving both
    rand = np.random.RandomState(5)
    spawner = PoissonSpawner(rand, cfg.cars_per_sec, cfg.rate)
    rng = np.random.RandomState(77)
    phase = rng.randint(2, size=9).astype(np.int32)
    oracle.reset(phase=phase)
    nsim.reset(phase)
    for t in range(2000):
        a = rng.randint(2, size=9).astype(np.int32) if t % 10 == 0 else a
        roads = [r for r, _, _ in spawner.tick(topo.entrypoints)]
        obs_n, rew_n, done_n, _ = nsim.step(a, roads)
        # drive the oracle with the same explicit arrival list
        obs_o, rew_o, done_o = _oracle_step_with(oracle, a, roads)
        np.testing.assert_array_equal(obs_o, obs_n, err_msg=f"obs @ {t}")
        np.testing.assert_array_equal(rew_o, rew_n, err_msg=f"rew @ {t}")
        assert done_o == done_n, f"done @ {t}"
        if done_o:
            phase = rng.randint(2, size=9).astype(np.int32)
            oracle.reset(phase=phase)
            nsim.reset(phase)
    assert nsim.generated_cars > 100


def _oracle_step_with(oracle, action, roads):
    """Oracle tick with an explicit arrival list (same code path as
    OracleSim.step but spawner-bypassed)."""
    import numpy as np

    from traffic_env_tpu.oracle.sim import ARCHETYPES, W

    action = np.asarray(action)
    if oracle.cfg.learn_switch:
        change = action
        oracle.phase[:] = np.logical_xor(oracle.phase, action)
    else:
        change = np.logical_xor(oracle.phase, action).astype(np.int32)
        oracle.phase[:] = action
    oracle.elapsed += 1
    oracle.elapsed *= np.logical_not(change).astype(np.int32)
    oracle.rewards[:] = 0
    oracle.passed[:] = 0
    overflowed = False
    for r in roads:
        car = ARCHETYPES[0].copy()
        car[W] = oracle.steps
        oracle.generated_cars += 1
        overflowed = oracle._add_car(int(r), car) or overflowed
    oracle._move()
    overflowed = oracle._advance() or overflowed
    oracle.steps += np.float32(1)
    return oracle.obs(), oracle.rewards.copy(), bool(overflowed)


def test_native_remi_and_occupancy():
    topo = GridRoad(2, 2, 120.0)
    cfg = Config(grid_m=2, grid_n=2, road_length=120.0).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    oracle = OracleSim(topo, cfg, seed=1)
    nsim = native.NativeSim(topo, cfg)
    phase = np.zeros(4, np.int32)
    oracle.reset(phase=phase)
    nsim.reset(phase)
    rand = np.random.RandomState(1)
    spawner = PoissonSpawner(rand, cfg.cars_per_sec, cfg.rate)
    a = np.zeros(4, np.int32)
    for t in range(150):
        a[:] = (t // 25) % 2
        roads = [r for r, _, _ in spawner.tick(topo.entrypoints)]
        nsim.step(a, roads)
        _oracle_step_with(oracle, a, roads)
    np.testing.assert_array_equal(oracle.cars_per_road(),
                                  nsim.cars_per_road())
    np.testing.assert_array_equal(oracle.remi_reward(), nsim.remi_reward())


def test_native_sim_run_matches_sequential_steps():
    """The batched in-C++ benchmark driver (sim_run) must leave the
    simulator in exactly the state the per-tick step/remi/reset Python
    loop produces — same spawns, same window remi cadence, same
    overflow resets (cycled phases)."""
    topo = GridRoad(2, 2, 80.0)   # short roads → overflows happen
    cfg = Config(grid_m=2, grid_n=2, road_length=80.0).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    rng = np.random.RandomState(3)
    T, I = 600, topo.intersections
    acts = np.repeat(rng.randint(2, size=(T // 10, I)), 10,
                     axis=0).astype(np.int32)
    spawner = PoissonSpawner(np.random.RandomState(4),
                             cfg.cars_per_sec * 3, cfg.rate)
    off = np.zeros(T + 1, np.int32)
    roads = []
    for t in range(T):
        roads.extend(r for r, _, _ in spawner.tick(topo.entrypoints))
        off[t + 1] = len(roads)
    roads = np.asarray(roads, np.int32)
    reset_phases = rng.randint(2, size=(7, I)).astype(np.int32)
    phase0 = rng.randint(2, size=I).astype(np.int32)

    batched = native.NativeSim(topo, cfg)
    batched.reset(phase0)
    n_resets = batched.run(acts, off, roads, 10, reset_phases)

    seq = native.NativeSim(topo, cfg)
    seq.reset(phase0)
    resets = 0
    for t in range(T):
        _, _, done, _ = seq.step(acts[t], roads[off[t]:off[t + 1]])
        if (t + 1) % 10 == 0:
            seq.remi_reward()
        if done:
            seq.reset(reset_phases[resets % len(reset_phases)])
            resets += 1

    assert resets == n_resets and resets > 0, (resets, n_resets)
    np.testing.assert_array_equal(seq.cars_per_road(),
                                  batched.cars_per_road())
    np.testing.assert_array_equal(np.stack(seq.pointers()),
                                  np.stack(batched.pointers()))
    np.testing.assert_array_equal(seq.raw_cars(), batched.raw_cars())
    assert seq.generated_cars == batched.generated_cars

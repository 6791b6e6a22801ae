"""The C++ twin's DECEL_PENALTY path must match the NumPy oracle
bit-for-bit (non-dyadic k/10 increments make the per-road add order and
true-division rounding observable)."""

import numpy as np
import pytest

from tests.test_native import _oracle_step_with
from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.oracle import OracleSim, PoissonSpawner
from traffic_env_tpu.topology import GridRoad

native = pytest.importorskip("traffic_env_tpu.runtime.native")


def test_native_decel_matches_oracle():
    topo = GridRoad(2, 2, 120.0)
    cfg = Config(grid_m=2, grid_n=2, road_length=120.0,
                 decel_penalty=True, remi=False,
                 local_cars_per_sec=0.25).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    oracle = OracleSim(topo, cfg, seed=9)
    nsim = native.NativeSim(topo, cfg)
    rand = np.random.RandomState(9)
    spawner = PoissonSpawner(rand, cfg.cars_per_sec, cfg.rate)
    rng = np.random.RandomState(31)
    I = topo.intersections
    phase = rng.randint(2, size=I).astype(np.int32)
    oracle.reset(phase=phase)
    nsim.reset(phase)
    saw_decel = False
    a = np.zeros(I, np.int32)
    for t in range(800):
        a = rng.randint(2, size=I).astype(np.int32) if t % 10 == 0 else a
        roads = [r for r, _, _ in spawner.tick(topo.entrypoints)]
        obs_n, rew_n, done_n, _ = nsim.step(a, roads)
        obs_o, rew_o, done_o = _oracle_step_with(oracle, a, roads)
        np.testing.assert_array_equal(obs_o, obs_n, err_msg=f"obs @ {t}")
        np.testing.assert_array_equal(rew_o, rew_n, err_msg=f"rew @ {t}")
        assert done_o == done_n, f"done @ {t}"
        saw_decel = saw_decel or bool(
            np.any(rew_o != np.round(rew_o * 2) / 2))
        if done_o:
            phase = rng.randint(2, size=I).astype(np.int32)
            oracle.reset(phase=phase)
            nsim.reset(phase)
    assert saw_decel

import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.oracle import OracleSim
from traffic_env_tpu.topology import GridRoad


def make(m=3, n=3, length=250.0, seed=0, **kw):
    topo = GridRoad(m, n, length)
    cfg = Config(grid_m=m, grid_n=n, road_length=length, **kw).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    return topo, cfg, OracleSim(topo, cfg, seed=seed)


def test_car_conservation():
    """generated == on-roads + exited-off-map (no cars lost)."""
    topo, cfg, sim = make(seed=3)
    sim.validate = True
    sim.reset(phase=np.zeros(9, np.int32))
    exited = 0
    for t in range(300):
        before = len(sim.trip_times)
        _, _, done, _ = sim.step(np.full(9, (t // 10) % 2, np.int32))
        exited += len(sim.trip_times) - before
        if done:
            break
    on_roads = int(sim.cars_per_road().sum())
    assert sim.generated_cars == on_roads + exited


def test_elapsed_resets_on_change():
    topo, cfg, sim = make(seed=1)
    sim.reset(phase=np.zeros(9, np.int32))
    a = np.zeros(9, np.int32)
    for _ in range(5):
        sim.step(a)
    assert (sim.elapsed == 5).all()
    a[0] = 1
    sim.step(a)
    assert sim.elapsed[0] == 0 and (sim.elapsed[1:] == 6).all()


def test_overflow_penalty_and_done():
    """Force overflow by blocking everything on red with heavy spawns."""
    topo, cfg, sim = make(m=1, n=1, length=40.0, seed=0,
                          local_cars_per_sec=3.0)
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    sim.cfg = cfg
    sim.seed_generator(0)
    sim.reset(phase=np.zeros(1, np.int32))
    done = False
    for _ in range(400):
        obs, rew, done, _ = sim.step(np.zeros(1, np.int32))
        if done:
            break
    assert done
    assert rew.min() <= -10.0  # overflow penalty landed


def test_remi_bounds_and_clears():
    topo, cfg, sim = make(seed=5)
    sim.reset(phase=np.zeros(9, np.int32))
    for t in range(80):
        sim.step(np.full(9, (t // 10) % 2, np.int32))
    r = sim.remi_reward()
    assert (np.abs(r) <= 2.0).all()  # 4 roads/intersection, +-0.5 each
    assert (r % 0.5 == 0).all()
    assert (sim.waiting == 0).all()
    assert not sim.passed_dst.any()


def test_detected_stale_across_reset():
    """detected is not cleared by reset (traffic_env.py:259-272)."""
    topo, cfg, sim = make(seed=2)
    sim.reset(phase=np.zeros(9, np.int32))
    for t in range(200):
        _, _, done, _ = sim.step(np.zeros(9, np.int32))
        if done:
            break
    det = sim.detected.copy()
    assert det.any()  # red everywhere piles cars onto detectors
    sim.reset(phase=np.zeros(9, np.int32))
    np.testing.assert_array_equal(sim.detected, det)


def test_spawn_stream_persists_across_reset():
    """Same seed, different reset points -> the arrival stream continues
    rather than restarting (traffic_env.py:250-253)."""
    topo, cfg, a = make(seed=11)
    _, _, b = make(seed=11)
    a.reset(phase=np.zeros(9, np.int32))
    b.reset(phase=np.zeros(9, np.int32))
    for _ in range(50):
        a.step(np.zeros(9, np.int32))
        b.step(np.zeros(9, np.int32))
    a.reset(phase=np.zeros(9, np.int32))
    b.reset(phase=np.zeros(9, np.int32))
    ga, gb = a.generated_cars, b.generated_cars
    for _ in range(50):
        a.step(np.zeros(9, np.int32))
        b.step(np.zeros(9, np.int32))
    assert a.generated_cars == b.generated_cars
    assert a.generated_cars > ga  # stream kept flowing after reset


def test_regular_spawner():
    topo, cfg, sim = make(seed=0, poisson=False)
    sim.reset(phase=np.zeros(9, np.int32))
    for _ in range(40):
        sim.step(np.zeros(9, np.int32))
    # regular stream: ticks_per_car = round(1/0.72) = 1 -> 1 car/tick
    assert sim.generated_cars == 40

"""Device-spawn cap discipline (SURVEY §7 hard part (c)).

The on-device Poisson path (fast_core.spawn_device) places at most
``max_spawns_per_tick`` (Ks) arrivals per tick; arrivals beyond the cap
keep their zero inter-arrival gap in the carried ``spawn_gap`` and
spawn on the following tick(s) — a timing-only deferral, never a drop.
The reference drains its spawn generator unboundedly each tick
(/root/reference/gym_traffic/envs/traffic_env.py:274-283), so the
falsifiable claim is: under a *deliberately binding* cap the long-run
arrival rate still equals the oracle spawner's.

Workload: 1x1 grid with the rate elevated to ~1.65 cars/tick (mean of
the rounded-exponential renewal at cars_per_sec=3, rate=0.5) against
Ks=2, so bursts above the cap are routine (P(Poisson(1.65) > 2) ~ 0.2)
and the deferral queue is exercised constantly while staying stable
(utilization ~82%).
"""

import jax
import jax.numpy as jnp
import numpy as np

from traffic_env_tpu.config import Config
from traffic_env_tpu.envs.fast_core import init_state_compact, make_sim_fast
from traffic_env_tpu.oracle.sim import PoissonSpawner
from traffic_env_tpu.topology import GridRoad

TICKS = 20000


def test_device_spawn_deferral_preserves_arrival_rate():
    cfg = Config(grid_m=1, grid_n=1).derive().replace(cars_per_sec=3.0)
    topo = GridRoad(1, 1, 250.0)
    fns = make_sim_fast(topo, cfg, on_device_spawns=True,
                        max_spawns_per_tick=2)
    s0 = init_state_compact(topo, jax.random.key(0))
    entry = np.asarray(topo.entrypoints)
    action = jnp.zeros_like(s0.phase)

    def body(state, _):
        # drain every road before the tick so ring capacity never
        # binds: the per-tick placement count is then purely the
        # arrival process (gap chain + cap)
        state = state.replace(leading=state.lastcar)
        state = fns.tick(state, action)
        placed = jnp.sum(fns.cars_per_road(state)[entry])
        return state, placed

    _, placed = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=TICKS))(s0)
    placed = np.asarray(placed)

    # the cap must actually bind for this test to mean anything
    assert placed.max() == 2, placed.max()
    assert (placed == 2).mean() > 0.05, "cap never binding: rate too low"

    # oracle arrival rate on the identical config (unbounded drain)
    sp = PoissonSpawner(np.random.RandomState(0), cfg.cars_per_sec,
                        cfg.rate)
    oracle_mean = sum(
        len(sp.tick(topo.entrypoints)) for _ in range(TICKS)) / TICKS

    dev_mean = placed.mean()
    # ~6 sigma of the Poisson mean-difference at TICKS samples
    assert abs(dev_mean - oracle_mean) / oracle_mean < 0.05, \
        (dev_mean, oracle_mean)


def test_benchmark_rate_deferral_is_negligible():
    """At the benchmark spawn rate (0.72 cars/tick) the default caps
    (Ks=4 kernel / 8 XLA) are effectively never hit: the Poisson tail
    P(X > 4) is ~1e-3 per tick and P(X > 8) ~ 1e-8, so schedule mode's
    loud build-time assert and device mode's deferral agree to within
    measurement noise.  Checked empirically on the oracle stream."""
    cfg = Config().derive().replace(cars_per_sec=1.44)   # 3x3, all sides
    topo = GridRoad(3, 3, 250.0)
    sp = PoissonSpawner(np.random.RandomState(1), cfg.cars_per_sec,
                        cfg.rate)
    counts = np.array([len(sp.tick(topo.entrypoints))
                       for _ in range(TICKS)])
    assert counts.max() <= 8, counts.max()
    assert (counts > 4).mean() < 5e-3, (counts > 4).mean()

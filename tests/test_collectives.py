"""Falsifiable scaling claims: where collectives are allowed to appear.

The sharding design (SURVEY.md §2.4; parallel/mesh.py) promises that
the env simulation is embarrassingly parallel over the dp axis — every
collective belongs to the *learner*:

* the env window (the Pallas kernel under shard_map, and the fast-core
  step under GSPMD) compiles to ZERO cross-device collectives;
* qlearn's sharded-replay design all-reduces only the sampled
  minibatch (a few KB) — gradients are computed redundantly on the
  replicated params, so NO param-sized psum exists at all;
* a3c's on-policy update all-reduces exactly its parameter pytree
  (one fused grad psum) plus O(1) scalar stats.

These tests compile the real programs over the 8-virtual-device CPU
mesh and assert those properties on the post-SPMD HLO, so a layout
regression that silently adds ICI traffic fails CI long before real
multi-chip hardware exists.  The measured per-step volumes are
recorded in BASELINE.md ("Collective volume").
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from traffic_env_tpu.config import Config, derive_spawn_rate
from traffic_env_tpu.envs import build_batched_schedule
from traffic_env_tpu.parallel import make_mesh, shard_env_state
from traffic_env_tpu.parallel.mesh import shard_train_state
from traffic_env_tpu.topology import GridRoad

needs_multi = pytest.mark.skipif(jax.device_count() < 8,
                                 reason="needs 8 virtual devices")

_SIZES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2, "f16": 2,
          "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def collective_report(compiled_text: str):
    """(all_reduce_byte_sizes, other_collective_opnames) from post-SPMD
    HLO text."""

    def nbytes(tystr):
        tot = 0
        for m in re.finditer(r"(\w+)\[([0-9,]*)\]", tystr):
            dt, dims = m.groups()
            if dt not in _SIZES:
                continue
            n = 1
            if dims:
                for d in dims.split(","):
                    n *= int(d)
            tot += n * _SIZES[dt]
        return tot

    ars = [nbytes(t) for t in re.findall(
        r"= (\([^)]*\)|\S+) all-reduce\(", compiled_text)]
    others = sorted(set(re.findall(
        r"\b(all-gather|reduce-scatter|collective-permute|all-to-all)\b",
        compiled_text)))
    return ars, others


@needs_multi
def test_env_window_compiles_to_zero_collectives():
    """The production TPU env path (fused Pallas window under
    shard_map, schedule-driven spawns) must be collective-free: each
    device simulates its own env shard with no ICI traffic."""
    from traffic_env_tpu.envs.rollout import make_pallas_batched_env

    topo = GridRoad(3, 3, 250.0)
    cfg = Config(grid_m=3, grid_n=3, road_length=250.0,
                 history=1).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    mesh = make_mesh("8", jax.devices()[:8])
    B = 64
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, list(range(B)), 8 * cfg.light_iterations, 8))
    benv = make_pallas_batched_env(topo, cfg, B, mesh=mesh,
                                   interpret=True, block_envs=8,
                                   on_device_spawns=False,
                                   max_spawns_per_tick=8)
    st = shard_env_state(mesh, benv.init(jax.random.key(0)))
    a = jnp.zeros((9, B), jnp.int32)
    comp = jax.jit(
        lambda s, a: benv.step_autoreset_lazy(s, a, sched)).lower(
        st, a).compile()
    ars, others = collective_report(comp.as_text())
    assert not ars and not others, (ars, others)


@needs_multi
@pytest.mark.slow   # HLO accounting battery (compile-heavy); the zero-collective env
# window assertion stays quick
def test_qlearn_collectives_are_minibatch_assembly_not_grad_psum():
    """Sharded-replay qlearn: each device's FrameReplay holds its own
    envs' frames; sampling all-reduces the (tiny) assembled minibatch
    and the SGD then runs replicated — so no all-reduce may reach even
    1% of the parameter bytes."""
    from traffic_env_tpu.algorithms import qlearn

    cfg = Config(grid_m=1, grid_n=2, road_length=60.0, num_envs=16,
                 episode_secs=20, light_secs=5, buffer_size=16,
                 batch_size=4, logdir="/tmp/coll_q", seed=0).derive()
    ctx, ts = qlearn.make_state(cfg)
    mesh = make_mesh("8", jax.devices()[:8])
    ts = shard_train_state(mesh, ts)
    with mesh:
        comp = jax.jit(ctx.run_episode).lower(ts).compile()
    ars, others = collective_report(comp.as_text())
    assert not others, others
    param_bytes = sum(x.size * 4 for x in jax.tree.leaves(ts.params_main))
    assert ars, "expected the minibatch-assembly all-reduce"
    # the minibatch (batch * 2 history stacks) is ~2% of params even at
    # this tiny test config, and shrinks relative to params at the
    # benchmark shapes (BASELINE.md "Collective volume")
    assert max(ars) < 0.05 * param_bytes, (ars, param_bytes)
    # volume sanity: everything all-reduced per episode stays a few KB
    assert sum(ars) < 64 * 1024, ars


@needs_multi
@pytest.mark.slow   # HLO accounting battery (compile-heavy); the zero-collective env
# window assertion stays quick
def test_a3c_collectives_are_exactly_one_grad_psum():
    """On-policy a3c: the ONLY non-scalar collective is the fused
    gradient all-reduce, and its payload is bit-for-bit the parameter
    pytree size — the psum-over-ICI replacement for the reference's
    shared-memory parameter server (a3c.py:47-48,66-97)."""
    from traffic_env_tpu.algorithms import a3c

    cfg = Config(trainer="a3c", grid_m=1, grid_n=2, road_length=60.0,
                 num_envs=16, episode_secs=20, light_secs=5,
                 logdir="/tmp/coll_a", seed=0).derive()
    ctx, ts = a3c.make_state(cfg)
    mesh = make_mesh("8", jax.devices()[:8])
    ts = shard_train_state(mesh, ts)
    with mesh:
        comp = jax.jit(ctx.run_episode).lower(ts).compile()
    ars, others = collective_report(comp.as_text())
    assert not others, others
    param_bytes = sum(x.size * 4 for x in jax.tree.leaves(ts.params))
    big = [a for a in ars if a >= 1024]
    assert big == [param_bytes], (big, param_bytes)
    assert sum(a for a in ars if a < 1024) <= 64, ars  # scalar stats

#!/usr/bin/env python
"""Headline benchmark: env-steps/s/chip.

Configuration = BASELINE.md config 3/4 workload: 3x3 grid, 250 m roads,
4096 lockstep env instances under jit, random policy, on-device Poisson
spawns, remi reward shaping, lazy auto-reset.  One env-step = one
simulator tick of one env instance (the base env.step unit; an agent
step is light_iterations=10 of them).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s/chip", "vs_baseline": N/1e7}
vs_baseline is measured against the driver-defined target of 10M
env-steps/s/chip (BASELINE.json:5 — the reference publishes no numbers,
BASELINE.md).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=4096)
    p.add_argument("--agent_steps", type=int, default=120,
                   help="measured agent steps (x10 ticks each)")
    p.add_argument("--warmup_steps", type=int, default=24)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--core", type=str, default="auto",
                   help="auto | pallas | fast | exact")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the env batch over N devices (dp axis); "
                        "0 = single device")
    p.add_argument("--block_envs", type=int, default=0,
                   help="Pallas block size override (0 = auto)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu" and args.mesh > 1:
        # virtual device mesh (the axon sitecustomize rewrites
        # XLA_FLAGS at interpreter start, so append at runtime —
        # the backend has not initialized yet)
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.mesh}")

    import traffic_env_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS)
    from traffic_env_tpu.config import Config, derive_spawn_rate
    from traffic_env_tpu.envs.rollout import make_batched_env, random_rollout
    from traffic_env_tpu.topology import GridRoad

    topo = GridRoad(3, 3, 250.0)
    cfg = Config(history=1, trainer="random",
                 num_envs=args.num_envs).derive()
    cfg = derive_spawn_rate(cfg, topo.open_sides(0))
    if args.core == "native":
        # Head-to-head denominator: the C++ host twin (the
        # reference-class sequential CPU path — the role numba's
        # nopython kernels play in /root/reference/gym_traffic/envs/
        # traffic_env.py:46-218) on the same 3x3 workload, one env,
        # one CPU core, Python-driven per tick exactly like the
        # reference's gym loop.  Prints its own JSON line and exits.
        print(json.dumps(_native_cpu_baseline(args, topo, cfg)))
        return
    core = args.core
    if core == "auto":
        # positive TPU check (matches common.build_env): unknown plugin
        # platforms fall back to the XLA core, not a Mosaic compile
        on_tpu = jax.default_backend() == "tpu" or \
            jax.devices()[0].platform in ("tpu", "axon")
        core = ("pallas" if on_tpu and args.num_envs % 128 == 0
                else "fast")
    def measure(n_envs, mesh=None):
        """Best-of-repeats env-steps/s for an n_envs batch (optionally
        sharded over a dp mesh)."""
        kw = ({"block_envs": args.block_envs}
              if args.block_envs and core == "pallas" else {})
        if core == "pallas" and mesh is not None:
            from traffic_env_tpu.envs.rollout import make_pallas_batched_env
            benv = make_pallas_batched_env(topo, cfg, n_envs, mesh=mesh,
                                           **kw)
        else:
            benv = make_batched_env(topo, cfg, n_envs, core=core, **kw)
        state = benv.init(jax.random.key(0))
        state, _ = benv.reset(state)
        if mesh is not None:
            from traffic_env_tpu.parallel import shard_env_state
            state = shard_env_state(mesh, state)
        roll = jax.jit(lambda st, k, n=args.agent_steps:
                       random_rollout(benv, st, k, n))
        warm = jax.jit(lambda st, k, n=args.warmup_steps:
                       random_rollout(benv, st, k, n))
        key = jax.random.key(1)
        # Compile + warm up (also fills roads to steady-state occupancy).
        state, key, rews, dones = warm(state, key)
        float(jnp.sum(rews))
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state, key, rews, dones = roll(state, key)
            # a real host fetch, not block_until_ready: remote-execution
            # backends can report readiness before the program has run;
            # materializing a value that depends on every window can't lie
            float(jnp.sum(rews) + jnp.sum(dones))
            dt = time.perf_counter() - t0
            ticks = args.agent_steps * cfg.light_iterations * n_envs
            best = max(best, ticks / dt)
        return best

    out = {
        "metric": "env_steps_per_sec_per_chip (3x3 grid, "
                  f"{args.num_envs} envs, random policy)",
        "unit": "env-steps/s/chip",
    }
    if args.mesh > 1:
        # scaling-efficiency harness (BASELINE.json:5's >=90% target):
        # weak scaling — the N-device mesh runs N x the single-device
        # per-device workload; efficiency = thr_N / (N * thr_1)
        from traffic_env_tpu.parallel import make_mesh
        mesh = make_mesh(str(args.mesh), jax.devices()[:args.mesh])
        per_dev = args.num_envs // args.mesh
        thr_1 = measure(per_dev)
        thr_n = measure(args.num_envs, mesh=mesh)
        eff = thr_n / (args.mesh * thr_1)
        out.update({
            "metric": f"scaling_efficiency ({args.mesh} devices, "
                      f"{per_dev} envs/device, random policy)",
            "value": round(thr_n, 1),
            "mesh_devices": args.mesh,
            "single_device_env_steps_per_sec": round(thr_1, 1),
            "scaling_efficiency": round(eff, 4),
            "vs_baseline": round(eff / 0.9, 4),
        })
    else:
        best = measure(args.num_envs)
        out.update({"value": round(best, 1),
                    "vs_baseline": round(best / 1e7, 4)})
    print(json.dumps(out))


def _native_cpu_baseline(args, topo, cfg):
    """env-steps/s of the native C++ simulator twin: one env, one CPU
    core, sequential ticks driven from Python (spawner + random action
    every light period + remi each window — the reference's per-tick
    host loop shape, traffic_test.py:48-55 / traffic_env.py:224-248)."""
    import numpy as np

    from traffic_env_tpu.oracle import PoissonSpawner
    from traffic_env_tpu.runtime.native import NativeSim

    nsim = NativeSim(topo, cfg)
    spawner = PoissonSpawner(np.random.RandomState(0),
                             cfg.cars_per_sec, cfg.rate)
    rng = np.random.RandomState(1)
    n_i = topo.intersections
    nsim.reset(rng.randint(2, size=n_i).astype(np.int32))

    def make_stream(agent_steps):
        """Pre-generate per-tick actions + spawn lists so the measured
        loop is the C++ core alone (RNG/stream prep excluded — the
        conservative direction for the TPU-vs-native ratio, since the
        TPU number INCLUDES its on-device spawn draws)."""
        ticks = agent_steps * cfg.light_iterations
        acts = np.repeat(rng.randint(2, size=(agent_steps, n_i)),
                         cfg.light_iterations, axis=0).astype(np.int32)
        off = np.zeros(ticks + 1, np.int32)
        roads = []
        for t in range(ticks):
            roads.extend(r for r, _, _ in spawner.tick(topo.entrypoints))
            off[t + 1] = len(roads)
        return (acts, off, np.asarray(roads, np.int32),
                rng.randint(2, size=(256, n_i)).astype(np.int32))

    a, off, rds, ph = make_stream(args.warmup_steps)
    nsim.run(a, off, rds, cfg.light_iterations, ph)  # steady-state fill
    best = 0.0
    for _ in range(args.repeats):
        a, off, rds, ph = make_stream(args.agent_steps)
        t0 = time.perf_counter()
        nsim.run(a, off, rds, cfg.light_iterations, ph)
        dt = time.perf_counter() - t0
        best = max(best, args.agent_steps * cfg.light_iterations / dt)
    return {
        "metric": "env_steps_per_sec_per_core (native C++ twin, "
                  "3x3 grid, 1 env, 1 CPU core)",
        "unit": "env-steps/s/core",
        "value": round(best, 1),
        "vs_baseline": round(best / 1e7, 4),
    }


if __name__ == "__main__":
    main()

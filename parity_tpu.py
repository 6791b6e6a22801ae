#!/usr/bin/env python
"""On-chip bit-parity gate for the Mosaic-compiled Pallas window kernel.

Every headline number (bench.py throughput, the training curves) rides
the *compiled* Pallas kernel on the real TPU, while the CI parity
batteries run it in interpreter mode on CPU (tests/conftest.py).  Mosaic
lowering is exactly where ULP-level divergence creeps in, so this gate
re-proves bit-exactness where it matters: it runs the compiled kernel
and the XLA fast core side by side ON THE CHIP, over full episodes with
schedule-driven spawns, overflows, in-kernel lazy auto-resets, and
validate-mode telemetry, asserting bit-equal obs/reward/done per window
and a bit-equal final SimState.

Both sides run their production lazy-autoreset step: in schedule mode
the fast core applies ``lazy_reset_phase`` (the kernel's deterministic
schedule-mode phase rule) to done lanes before each window
(envs/env.py step_autoreset_lazy), exactly as
tests/test_pallas_window.py::test_inkernel_autoreset_matches_external_reset
proves equivalent in interpreter mode.

Writes PARITY_TPU.json (the committed artifact) and exits non-zero on
any mismatch.  Re-run whenever ops/pallas_window.py changes:

    python parity_tpu.py            # on the chip (axon platform)
    python parity_tpu.py --interpret --platform=cpu   # local debug

Reference role: the reference has ONE kernel layer
(/root/reference/gym_traffic/envs/traffic_env.py:46-218) so parity was
free; this framework has an oracle + two XLA cores + a Pallas kernel,
so parity is a recorded gate.
"""

import argparse
import json
import subprocess
import time

import numpy as np


def tree_mismatch(a, b, exclude=()):
    """First mismatching SimState leaf name, or None."""
    import dataclasses

    def as_map(x):
        if dataclasses.is_dataclass(x):
            x = {f.name: getattr(x, f.name)
                 for f in dataclasses.fields(x)}
        return {k: v for k, v in x.items()
                if v is not None and k not in exclude}
    fa, fb = as_map(a), as_map(b)
    for k in fa:
        x, y = np.asarray(fa[k]), np.asarray(fb[k])
        if not np.array_equal(x, y):
            bad = int(np.sum(x != y))
            return {"leaf": k, "n_bad": bad,
                    "max_abs": float(np.max(np.abs(
                        x.astype(np.float64) - y.astype(np.float64))))}
    return None


def run_scenario(name, topo, cfg, n_envs, n_windows, actions_fn,
                 interpret, compare_info=False, max_spawns=8,
                 seed0=100):
    import jax
    import jax.numpy as jnp
    from traffic_env_tpu.envs import build_batched_schedule
    from traffic_env_tpu.envs.rollout import make_batched_env

    seeds = [seed0 + i for i in range(n_envs)]
    n_ticks = (n_windows + cfg.history + 4) * cfg.light_iterations
    sched = jax.tree.map(jnp.asarray, build_batched_schedule(
        topo, cfg, seeds, n_ticks, max_spawns))
    kw = dict(on_device_spawns=False, max_spawns_per_tick=max_spawns)
    fast = make_batched_env(topo, cfg, n_envs, core="fast", **kw)
    pal = make_batched_env(topo, cfg, n_envs, core="pallas",
                           block_envs=min(n_envs, 256),
                           interpret=interpret, **kw)
    sf = fast.init(jax.random.key(5))
    sp = jax.tree.map(lambda a: a, sf)
    sf, of = fast.reset(sf, sched)
    sp, op = pal.reset(sp, sched)

    # the production fast-core lazy step: in schedule mode it applies
    # the kernel's deterministic hash phase to done lanes
    # (envs/env.py step_autoreset_lazy), so both sides run their real
    # training code paths
    f_step = jax.jit(lambda s, a: fast.step_autoreset_lazy(s, a, sched))
    p_step = jax.jit(lambda s, a: pal.step_autoreset_lazy(s, a, sched))

    rng = np.random.RandomState(7)
    resets_seen = 0
    result = {"name": name, "envs": n_envs, "windows": n_windows,
              "ok": True, "mismatch": None}
    t0 = time.perf_counter()
    for t in range(n_windows):
        a = jnp.asarray(actions_fn(rng, t))
        sf, of, rf, df, inf_f = f_step(sf, a)
        sp, op, rp, dp, inf_p = p_step(sp, a)
        obs_f, obs_p = np.asarray(of), np.asarray(op)
        rew_f, rew_p = np.asarray(rf), np.asarray(rp)
        don_f, don_p = np.asarray(df), np.asarray(dp)
        resets_seen += int(don_p.sum())
        for what, x, y in (("obs", obs_f, obs_p), ("reward", rew_f, rew_p),
                           ("done", don_f, don_p)):
            if not np.array_equal(x, y):
                result.update(ok=False, mismatch={
                    "window": t, "what": what,
                    "n_bad": int(np.sum(x != y)),
                    "max_abs": float(np.max(np.abs(
                        x.astype(np.float64) - y.astype(np.float64))))})
                break
        if compare_info and result["ok"]:
            lt = tree_mismatch({"light_times": inf_f["light_times"],
                                "trip_hist": sf.sim.trip_hist},
                               {"light_times": inf_p["light_times"],
                                "trip_hist": sp.sim.trip_hist})
            if lt is not None:
                result.update(ok=False,
                              mismatch={"window": t, "what": "info", **lt})
        if not result["ok"]:
            break
    if result["ok"]:
        mm = tree_mismatch(sf.sim, sp.sim)
        if mm is not None:
            result.update(ok=False,
                          mismatch={"window": "final_state", **mm})
    result["done_lanes_reset"] = resets_seen
    result["wall_s"] = round(time.perf_counter() - t0, 2)
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpreter mode (local debug only; the "
                        "committed artifact must be compiled on-chip)")
    p.add_argument("--windows", type=int, default=240,
                   help="benchmark-scenario windows (240 = 2 episodes)")
    p.add_argument("--out", type=str, default="PARITY_TPU.json")
    args = p.parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import traffic_env_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS)
    from traffic_env_tpu.config import Config, derive_spawn_rate
    from traffic_env_tpu.topology import GridRoad

    dev = jax.devices()[0]
    on_chip = dev.platform in ("tpu", "axon")

    def mk(m, n, length, **kw):
        topo = GridRoad(m, n, length)
        cfg = Config(grid_m=m, grid_n=n, road_length=length,
                     **kw).derive()
        return topo, derive_spawn_rate(cfg, topo.open_sides(0))

    scenarios = []

    # 1. benchmark workload (BASELINE.md config 3): 3x3, 256 envs,
    #    random actions, lazy autoreset — 2 full episodes
    topo, cfg = mk(3, 3, 250.0, history=1)
    scenarios.append(run_scenario(
        "bench_3x3_random", topo, cfg, 256, args.windows,
        lambda rng, t: rng.randint(2, size=(9, 256)).astype(np.int32),
        args.interpret, max_spawns=16))

    # 2. overflow storm: 1x1 short roads, dense spawns, all-red —
    #    forces ring overflow + in-kernel lazy resets every few windows
    topo, cfg = mk(1, 1, 40.0, history=1, local_cars_per_sec=0.8)
    scenarios.append(run_scenario(
        "overflow_1x1_allred", topo, cfg, 128, 50,
        lambda rng, t: np.zeros((1, 128), np.int32),
        args.interpret, max_spawns=24))

    # 3. validate-mode telemetry: light_times + trip histograms
    topo, cfg = mk(3, 3, 250.0, history=1, mode="validate")
    scenarios.append(run_scenario(
        "validate_3x3_telemetry", topo, cfg, 128, 60,
        lambda rng, t: rng.randint(2, size=(9, 128)).astype(np.int32),
        args.interpret, compare_info=True, max_spawns=16))

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd="/root/repo",
            capture_output=True, text=True).stdout.strip()
    except Exception:
        commit = ""
    out = {
        "ok": all(s["ok"] for s in scenarios) and on_chip
        and not args.interpret,
        "on_chip": on_chip,
        "compiled": not args.interpret,
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "jax": jax.__version__,
        "commit": commit,
        "claim": "Mosaic-compiled Pallas window == XLA fast core, "
                 "bit-exact obs/reward/done per window + final SimState, "
                 "schedule-driven spawns, lazy autoresets + overflows + "
                 "validate telemetry included",
        "scenarios": scenarios,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    raise SystemExit(0 if out["ok"] or args.interpret and
                     all(s["ok"] for s in scenarios) else 1)


if __name__ == "__main__":
    main()

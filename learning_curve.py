#!/usr/bin/env python
"""Learning-curve regression on the benchmark workload (BASELINE.md
configs 4-5): train a learner on the 3x3 grid and compare its greedy
validation return against the scripted baselines (the reference's
validation story — "learned policies are validated by beating these",
/root/reference/README.md:4).

    python learning_curve.py --trainer=qlearn --episodes=400
    python learning_curve.py --trainer=a3c --conv_gru=true --grid=5

Prints one line per validation point and a final JSON summary
(baselines + curve + verdict); use --out to also write it to a file.
"""

import argparse
import importlib
import json
import time

import jax
import jax.numpy as jnp

import traffic_env_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS)
from traffic_env_tpu.config import Config


def baseline_rewards(cfg, names=("random", "fixed", "greedy"), episodes=3):
    """Mean episode reward of each scripted baseline on this workload."""
    from traffic_env_tpu.algorithms.baselines import (episode_runner,
                                                      make_policies)
    from traffic_env_tpu.algorithms.common import build_env
    topo, cfg, benv = build_env(cfg)
    out = {}
    for name in names:
        policy = make_policies(cfg, benv, topo)[name]
        runner = episode_runner(cfg, benv, policy)
        env = benv.init(jax.random.key(cfg.seed))
        key = jax.random.key(cfg.seed + 1)
        totals = []
        for _ in range(episodes):
            env, key, total, *_ = runner(env, key)
            totals.append(float(total))
        out[name] = sum(totals) / len(totals)
        print(f"baseline {name}: {out[name]:.4f}")
    return out


def _sustained(curve, k=5):
    """Held value: mean of the last k validation points.  The pass-mark
    a best-of-run peak can satisfy inside validation noise, a held tail
    cannot — report both (ADVICE round 4)."""
    tail = [v for _, v in curve[-k:]]
    return sum(tail) / len(tail)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trainer", type=str, default="qlearn")
    p.add_argument("--episodes", type=int, default=400)
    p.add_argument("--validate_every", type=int, default=25)
    p.add_argument("--num_envs", type=int, default=4096)
    p.add_argument("--grid", type=int, default=3)
    p.add_argument("--conv_gru", action="store_true")
    p.add_argument("--occupancy_obs", action="store_true")
    p.add_argument("--mesh_shape", type=str, default="")
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--lam", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=0,
                   help="0 = per-trainer default")
    p.add_argument("--annealing", type=float, default=0.0,
                   help="0 = half the training episodes")
    p.add_argument("--buffer_size", type=int, default=100000)
    p.add_argument("--entropy_coef", type=float, default=0.001)
    p.add_argument("--reward_scale", type=float, default=100.0)
    p.add_argument("--norm_adv", action="store_true")
    p.add_argument("--history", type=int, default=0,
                   help="0 = per-trainer default (qlearn derives 20)")
    p.add_argument("--bc_episodes", type=int, default=0,
                   help="a3c: scripted-greedy imitation warm start")
    p.add_argument("--finetune_lr", type=float, default=0.0,
                   help="a3c: post-BC learning rate (0 = learning_rate)")
    p.add_argument("--bc_gated", action="store_true",
                   help="BC expert keeps the baseline's t%%spacing gate")
    p.add_argument("--bc_anchor", type=float, default=0.0,
                   help="a3c: post-BC expert-CE anchor weight")
    p.add_argument("--bc_anchor_gated", action="store_true",
                   help="a3c: anchor only where advantage <= 0")
    p.add_argument("--bc_expert", type=str, default="greedy",
                   help="a3c BC teacher: greedy | qlearn (distillation)")
    p.add_argument("--bc_expert_ckpt", type=str, default="",
                   help="teacher run logdir for --bc_expert=qlearn")
    p.add_argument("--sil", action="store_true",
                   help="a3c: positive-advantage-only policy loss")
    p.add_argument("--start_eps", type=float, default=0.8)
    p.add_argument("--end_eps", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="")
    p.add_argument("--teacher_out", type=str, default="",
                   help="save the retained best params as best.ckpt in "
                        "this dir (a --bc_expert_ckpt teacher for a3c "
                        "distillation)")
    p.add_argument("--platform", type=str, default="",
                   help="cpu: force the host platform (with --mesh_shape "
                        "N, also fabricates N virtual devices — the "
                        "config-5 sharded-run harness)")
    args = p.parse_args()
    if args.platform == "cpu":
        import os
        n = int(args.mesh_shape.split(",")[0]) if args.mesh_shape else 0
        if n > 1 and "xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n}")
        jax.config.update("jax_platforms", "cpu")

    anneal = args.annealing or max(args.episodes // 2, 1)
    batch = args.batch_size or (30 if args.trainer != "qlearn" else 256)
    cfg = Config(
        trainer=args.trainer, grid_m=args.grid, grid_n=args.grid,
        num_envs=args.num_envs, conv_gru=args.conv_gru,
        occupancy_obs=args.occupancy_obs,
        mesh_shape=args.mesh_shape, learning_rate=args.learning_rate,
        gamma=args.gamma, lam=args.lam,
        batch_size=batch, buffer_size=args.buffer_size,
        annealing_episodes=anneal, start_eps=args.start_eps,
        end_eps=args.end_eps, bc_episodes=args.bc_episodes,
        finetune_lr=args.finetune_lr, bc_gated=args.bc_gated,
        bc_anchor=args.bc_anchor, sil=args.sil,
        bc_anchor_gated=args.bc_anchor_gated,
        bc_expert=args.bc_expert, bc_expert_ckpt=args.bc_expert_ckpt,
        target_update_rate=30, seed=args.seed,
        entropy_coef=args.entropy_coef, reward_scale=args.reward_scale,
        norm_adv=args.norm_adv,
        logdir=f"/tmp/curve_{args.trainer}_{args.grid}x{args.grid}",
        **({"history": args.history} if args.history else {}),
    ).derive()

    bl = baseline_rewards(cfg)

    if args.trainer == "cem":
        # derivative-free path: iterations stand in for episodes
        from traffic_env_tpu.algorithms import cem
        t0 = time.time()
        curve = cem.curve(cfg, n_iter=args.episodes,
                          validate_every=args.validate_every)
        best = max(v for _, v in curve)
        sustained = _sustained(curve)
        summary = {
            "workload": f"{args.grid}x{args.grid} grid, "
                        f"{cem.SAMPLE_SIZE} envs (CEM population), "
                        "trainer cem",
            "args": vars(args),
            "baselines": bl, "curve": curve, "best_greedy": best,
            "beats_scripted_greedy": best > bl.get("greedy",
                                                   float("inf")),
            "sustained_greedy": sustained,
            "beats_scripted_greedy_sustained":
                sustained > bl.get("greedy", float("inf")),
            "wall_s": round(time.time() - t0, 1),
        }
        print(json.dumps(summary))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(summary, f, indent=2)
        return

    mod = importlib.import_module(
        f"traffic_env_tpu.algorithms.{args.trainer}")
    ctx, ts = mod.make_state(cfg)
    curve = []
    v0 = float(ctx.greedy_episode(ts)[0])
    curve.append([0, v0])
    print(f"episode 0: greedy {v0:.4f}")
    t0 = time.time()
    ep = 0
    pfields = [f for f in ("params", "params_main", "params_chooser",
                           "params_target", "gru") if hasattr(ts, f)]
    snap = lambda: {f: getattr(ts, f) for f in pfields}
    best_v, best_snap = v0, snap()
    while ep < args.episodes:
        for _ in range(args.validate_every):
            ts, _ = ctx.run_episode(ts)
        ep = int(ts.episode)
        v = float(ctx.greedy_episode(ts)[0])
        if v > best_v:
            # best-checkpoint retention (the reference keeps best.ckpt
            # the same way, qlearn.py:129-136); params are immutable
            # device arrays, holding references is a snapshot
            best_v, best_snap = v, snap()
        curve.append([ep, v])
        print(f"episode {ep}: greedy {v:.4f}  "
              f"({time.time() - t0:.0f}s)", flush=True)

    # Held value of the RETAINED policy: re-validate the best
    # checkpoint on fresh, independent workload draws.  A best-of-run
    # peak can sit inside validation noise; the retained policy's mean
    # over fresh draws cannot (ADVICE round 4: gate the pass-mark on a
    # held value).
    held = []
    for i in range(10):
        env_i = ctx.benv.init(jax.random.key(args.seed + 1000 + i))
        if getattr(ctx.benv, "mesh", None) is not None:
            from traffic_env_tpu.parallel import shard_env_state
            env_i = shard_env_state(ctx.benv.mesh, env_i)
        held.append(float(ctx.greedy_episode(
            ts.replace(env=env_i, **best_snap))[0]))
        print(f"held validation {i}: greedy {held[-1]:.4f}", flush=True)
    held_best = sum(held) / len(held)
    if args.teacher_out:
        # persist the retained-best params for --bc_expert=qlearn
        # distillation (the a3c loader reads raw_state["params_main"])
        import os
        from traffic_env_tpu.utils.checkpoint import Checkpointer
        os.makedirs(args.teacher_out, exist_ok=True)
        Checkpointer(args.teacher_out).save(best_snap, name="best.ckpt")
        print(f"teacher params saved to {args.teacher_out}/best.ckpt "
              f"(retained validation {best_v:.4f})", flush=True)
    best = max(v for _, v in curve)
    sustained = _sustained(curve)
    summary = {
        "workload": f"{args.grid}x{args.grid} grid, "
                    f"{args.num_envs} envs, trainer {args.trainer}"
                    + (" conv_gru" if args.conv_gru else "")
                    + (f" mesh {args.mesh_shape}" if args.mesh_shape
                       else ""),
        "args": vars(args),
        "baselines": bl,
        "curve": curve,
        "best_greedy": best,
        "beats_scripted_greedy": best > bl.get("greedy", float("inf")),
        "sustained_greedy": sustained,
        "beats_scripted_greedy_sustained":
            sustained > bl.get("greedy", float("inf")),
        "held_best_greedy": held_best,
        "held_best_values": held,
        "beats_scripted_greedy_held":
            held_best > bl.get("greedy", float("inf")),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()

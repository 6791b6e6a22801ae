"""Shared training lifecycle: the ``handle_modes`` equivalent.

Builds the batched env for a config, dispatches train/validate modes,
owns the logdir (wipe + settings.json snapshot on fresh runs, restore
on --restore), periodic + best + on-exit checkpoints, and the
validation loop with streaming stats — the reference's lifecycle
(algorithms/util.py:27-61) rebuilt around jitted batched learners.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import numpy as np

from ..config import Config, derive_spawn_rate, entry_spec
from ..envs.rollout import BatchedEnv, make_batched_env
from ..topology import GridRoad
from .. import utils
from ..utils.checkpoint import (Checkpointer, load_settings, remkdir,
                                snapshot_settings)
from ..utils.metrics import MetricWriter
from ..utils.stats import forever, print_running_stats, write_data


def build_env(cfg: Config, n_envs: int | None = None,
              core: str = "auto") -> tuple[GridRoad, Config, BatchedEnv]:
    """The make_env() factory (traffic_test.py:78-91), batched.  With
    --env_name=cartpole, builds the jitted CartPole fixture instead
    (cartpole-test.py:7-10; same BatchedEnv surface).

    ``core="auto"`` picks the fused Pallas light-period kernel on a
    single real TPU when the batch divides its 128-lane block, else
    the XLA fast core."""
    if cfg.env_name == "cartpole":
        from ..envs.cartpole import make_cartpole_benv
        return None, cfg, make_cartpole_benv(n_envs or cfg.num_envs)
    topo = GridRoad(cfg.grid_m, cfg.grid_n, cfg.road_length)
    spec = entry_spec(cfg)
    topo.set_entry_mask(spec)
    cfg = derive_spawn_rate(cfg, topo.open_sides(spec))
    n = n_envs or cfg.num_envs
    mesh = None
    if cfg.mesh_shape:
        # --mesh_shape=N or "dp,mp": the device mesh every learner
        # trains over — env batch + replay sharded on dp, gradients
        # all-reduced by the partitioner (the reference's 4-thread
        # Hogwild store, a3c.py:66-97, becomes mesh collectives)
        from ..parallel import make_mesh
        mesh = make_mesh(cfg.mesh_shape)
        n_dp = mesh.shape["dp"]
        if n % n_dp:
            raise ValueError(
                f"--num_envs={n} must divide over the dp axis "
                f"({n_dp} devices)")
    n_dp = mesh.shape["dp"] if mesh is not None else 1
    if core == "auto":
        # positive TPU check: unknown plugin platforms fall back to the
        # XLA core instead of attempting a Mosaic compile
        on_tpu = jax.default_backend() == "tpu" or \
            jax.devices()[0].platform in ("tpu", "axon")
        # validate mode is kernel-capable: light_times come from the
        # pre-window phase/elapsed and trip histograms from the
        # kernel's exit-pop event stream (ops/pallas_window.py)
        core = ("pallas" if on_tpu and (n // n_dp) % 128 == 0
                else "fast")
    if cfg.exact:
        # bit-exact parity mode: the reference's persistent per-env
        # MT19937 arrival stream (traffic_env.py:159-176, 250-253) is
        # replayed by a host ScheduleStream in O(chunk) windows, each
        # carried through the train step inside EnvState.sched.  The
        # throughput (Pallas) core runs this mode too — its
        # schedule-driven spawn path is bit-exact vs the fast core
        # (parity_tpu.py) — so exact soaks no longer pay the ~7x
        # XLA-core slowdown or materialize the whole-run schedule.
        from ..envs.spawn import ScheduleStream
        W = cfg.light_iterations
        # chunk covers one host-loop segment: an episode_len rollout
        # plus every lazy reset it can contain (reset = 1 repeater
        # window + warmup + history prefill), with 25% headroom
        reset_w = cfg.warmup_lights + max(cfg.history, 1) + 2
        n_resets = (cfg.episode_len * W) // max(cfg.episode_ticks, W) + 2
        chunk = (cfg.episode_len + n_resets * reset_w) * W
        chunk += chunk // 4 + 64
        stream = ScheduleStream(topo, cfg,
                                [cfg.seed + i for i in range(n)],
                                chunk, max_per_tick=8)
        kw = dict(on_device_spawns=False, max_spawns_per_tick=8)
        if core == "pallas" and mesh is not None:
            from ..envs.rollout import make_pallas_batched_env
            benv = make_pallas_batched_env(topo, cfg, n, mesh=mesh, **kw)
        else:
            benv = make_batched_env(topo, cfg, n, core=core, **kw)
        benv = attach_schedule_stream(benv, stream)
    elif core == "pallas" and mesh is not None:
        from ..envs.rollout import make_pallas_batched_env
        benv = make_pallas_batched_env(topo, cfg, n, mesh=mesh)
    else:
        benv = make_batched_env(topo, cfg, n, core=core)
    return topo, cfg, benv._replace(mesh=mesh)


def attach_schedule_stream(benv: BatchedEnv, stream) -> BatchedEnv:
    """Exact-mode wiring: ``init`` attaches the stream's first window
    (base tick 0) to EnvState.sched so the very first reset/warmup
    already consumes the chunked stream; the stream handle rides on the
    BatchedEnv for refresh_schedule."""
    import jax.numpy as jnp

    def init(key):
        state = benv.init(key)
        sched = jax.tree.map(jnp.asarray, stream.window(
            np.zeros(stream.n_envs, np.int64)))
        return state.replace(sched=sched)

    return benv._replace(init=init, sched_stream=stream)


def refresh_env_schedule(benv, env):
    """Advance the exact-mode arrival window to cover the next
    host-loop segment (one episode + its resets; chunk sized in
    build_env).  A no-op without --exact.  The new chunk has the same
    shapes as the old, so the jitted episode never retraces."""
    stream = getattr(benv, "sched_stream", None)
    if stream is None or env is None or getattr(env, "sim", None) is None:
        return env
    import jax.numpy as jnp
    gt = np.asarray(jax.device_get(env.sim.global_tick), np.int64)
    sched = jax.tree.map(jnp.asarray, stream.window(gt))
    return env.replace(sched=sched)


def make_expert_action(cfg: Config, benv, topo):
    """BC/anchor expert for the sigmoid-policy learners (a3c,
    polgrad_rnn): ``(t, key, env, obs_bf) -> (B, I) int32`` actions in
    the learner's encoding, or None when no imitation flag is set.

    ``bc_expert="greedy"`` is the scripted baseline (optionally with
    its ``t % spacing`` gate kept, Config.bc_gated);
    ``bc_expert="qlearn"`` distills a trained double-DQN's argmax from
    ``bc_expert_ckpt`` (the teacher net reads the same batch-first
    flattened obs the learner computes, so history/occupancy/grid must
    match the teacher's run — Config.bc_expert)."""
    import jax.numpy as jnp
    I32 = jnp.int32
    want = bool(cfg.bc_episodes) or cfg.bc_anchor > 0
    if not want:
        return None
    if cfg.bc_expert == "qlearn":
        from ..models import QNet
        ck = Checkpointer(cfg.bc_expert_ckpt)
        path = ck.latest_path("best.ckpt") or ck.latest_path("model.ckpt")
        if path is None:
            raise FileNotFoundError(
                f"bc_expert=qlearn: no checkpoint in {cfg.bc_expert_ckpt}")
        raw_state = ck._ck.restore(path)
        q_params = jax.tree.map(jnp.asarray, raw_state["params_main"])
        # the teacher's trunk is recoverable from its param tree: a
        # grid-native ConvQNet teacher has Conv_* layers, the
        # flattened QNet Dense_* (both share the flat-obs-in,
        # (B, I, 2)-Q-out interface)
        if any(k.startswith("Conv") for k in q_params["params"]):
            from ..models import ConvQNet
            _qnet = ConvQNet(m=cfg.grid_m, n=cfg.grid_n)
        else:
            _qnet = QNet(n_actions=benv.n_intersections)

        def expert_action(t, key, env, obs_bf):
            q = _qnet.apply(q_params, obs_bf)        # (B, I, 2)
            return jnp.argmax(q, axis=-1).astype(I32)
        return expert_action

    from .baselines import make_policies
    _greedy_expert = make_policies(cfg, benv, topo)["greedy"]

    def expert_action(t, key, env, obs_bf):
        """Scripted-greedy action in the learner's encoding.  With
        bc_gated the expert is the actual scripted baseline (re-picks
        every ``spacing`` steps, holding the current phase between
        picks); otherwise t=0 forces the gate open (a spacing-1
        greedy, memoryless in the obs).  Pair with --occupancy_obs so
        the policy sees the expert's cars_on_roads signal."""
        t = t if cfg.bc_gated else jnp.int32(0)
        raw, _ = _greedy_expert(t, key, env, env.sim.phase)
        if cfg.learn_switch:
            raw = jnp.logical_xor(raw, env.sim.phase).astype(I32)
        return jnp.moveaxis(raw, -1, 0)   # (I, B) -> learner (B, I)
    return expert_action


def refresh_schedule(benv: BatchedEnv, ts):
    """refresh_env_schedule over a train state carrying ``.env``.
    Called at the top of every train-loop iteration and before each
    validation episode."""
    env = getattr(ts, "env", None)
    new = refresh_env_schedule(benv, env)
    return ts if new is env else ts.replace(env=new)


def handle_modes(cfg: Config, make_state: Callable, train: Callable,
                 validate: Callable, policy_step: Callable | None = None):
    """Lifecycle dispatch (algorithms/util.py:27-61).

    ``make_state(cfg) -> (ctx, state)`` builds the learner context
    (env, nets, jitted fns) and initial train state;
    ``train(cfg, ctx, state, writer, ckpt)`` runs the train loop;
    ``validate(cfg, ctx, state) -> (reward, info)`` runs one greedy
    validation episode; ``policy_step(ctx, state)`` (optional) returns
    a host-steppable greedy policy ``obs, carry -> (action, carry)``
    used by --render to draw the learned policy's episode.
    """
    if cfg.restore:
        # The reference reloads settings.json into the flag *defaults*
        # before argparse runs (algorithms/util.py:39-41), so explicit
        # CLI/caller overrides still win over the snapshot.  Reproduce
        # that: any field differing from the dataclass default was set
        # explicitly (or derived — derive() recomputes those anyway).
        import dataclasses as _dc
        from ..config import explicit_cli_flags
        defaults = Config()
        explicit = explicit_cli_flags()
        overrides = {f.name: getattr(cfg, f.name)
                     for f in _dc.fields(Config)
                     if f.name in explicit
                     or getattr(cfg, f.name) != getattr(defaults, f.name)}
        cfg = load_settings(cfg.logdir).replace(**overrides).derive()
    else:
        remkdir(cfg.logdir)
        snapshot_settings(cfg, cfg.logdir)
    ctx, state = make_state(cfg)
    ckpt = Checkpointer(cfg.logdir)
    if cfg.restore:
        state = ckpt.restore(state)
        if cfg.mode == "validate":
            state = _ensure_trip_hist(cfg, state)
    if cfg.mode == "validate":
        if cfg.render and policy_step is not None:
            render_greedy(cfg, ctx, state, policy_step)
        box = [state]

        def _one():
            box[0] = refresh_schedule(getattr(ctx, "benv", None), box[0])
            out = validate(cfg, ctx, box[0])
            # learners return (reward, info, advanced_state) so
            # consecutive validation episodes see fresh env state
            # instead of replaying one deterministic trajectory
            if len(out) == 3:
                reward, info, box[0] = out
                return reward, info
            return out

        data = print_running_stats(
            forever(_one),
            max_iterations=None if not cfg.total_episodes
            else cfg.total_episodes)
        if cfg.interactive:
            return data
        write_data(cfg, *data, outdir=cfg.logdir)
        return data
    writer = MetricWriter(cfg.logdir)
    try:
        return train(cfg, ctx, state, writer, ckpt)
    finally:
        writer.close()


def render_greedy(cfg: Config, ctx, state, policy_step: Callable):
    """--render for learner trainers (reference renders any trainer in
    validate mode via the patched step, gym_traffic/__init__.py:6-8,
    traffic_env.py:285-359): step one greedy episode from the host,
    writing a frame per agent step for env lane 0."""
    benv = ctx.benv
    if getattr(benv.env, "sim_fns", None) is None:
        return     # CartPole fixture has nothing to draw
    import jax.numpy as jnp
    from ..render import EpisodeRenderer, TermRenderer
    topo = GridRoad(cfg.grid_m, cfg.grid_n, cfg.road_length)
    rend = TermRenderer(
        topo, rate_s=cfg.rate / 2 if cfg.render_ticks else 0.25) \
        if cfg.render_live else \
        EpisodeRenderer(topo, os.path.join(cfg.logdir, "render"))
    step_pi = policy_step(ctx, state)
    ticks_mode = cfg.render_ticks
    if ticks_mode and benv.step_autoreset_lazy_ticks is None:
        # the fused kernel has no per-tick HBM visibility: rebuild the
        # same env on the XLA fast core for the rendered episode
        benv = make_batched_env(topo, cfg, benv.n_envs, core="fast")
    env, obs = jax.jit(benv.reset)(state.env)
    step_j = jax.jit(benv.step_autoreset_lazy_ticks if ticks_mode
                     else benv.step_autoreset_lazy)
    carry = None
    for _ in range(cfg.episode_len):
        a, carry = step_pi(obs, carry)
        if ticks_mode:
            env, obs, _, _, _, ticks = step_j(env, a)
            rend.add_ticks(ticks)
        else:
            env, obs, _, _, _ = step_j(env, a)
            rend.add(env.sim)
    gif = rend.finish(duration_ms=50 if ticks_mode else 250)
    print(f"rendered {len(rend.frames)} frames to {rend.outdir}"
          + (f" ({gif})" if gif else ""))


def validation_hook(cfg: Config, ckpt: Checkpointer, writer: MetricWriter,
                    best_threshold: list, episode_num: int, state,
                    reward: float):
    """Shared post-validation bookkeeping: avg_r summary, best.ckpt on
    records (qlearn.py:129-136)."""
    print("Reward", reward)
    writer.scalar("avg_r_summary", reward, episode_num)
    if best_threshold[0] < reward:
        ckpt.save(state, "best.ckpt")
        best_threshold[0] = reward


def _ensure_trip_hist(cfg: Config, state):
    """Checkpoints written in train mode carry trip_hist=None; a
    validate-mode restore needs the histogram re-attached so the
    telemetry drain works (the accumulator is validate-only state, not
    learned state)."""
    import jax.numpy as jnp
    env = getattr(state, "env", None)
    sim = getattr(env, "sim", None)
    if sim is None or getattr(sim, "trip_hist", 0) is not None:
        return state
    nb = cfg.episode_ticks + 2
    th = jnp.zeros((nb,) + tuple(sim.done.shape), jnp.int32)
    return state.replace(env=env.replace(sim=sim.replace(trip_hist=th)))


def validate_telemetry(cfg: Config, benv, env_after, trip_hist_before,
                       ones_fraction: float, light_times=None):
    """Assemble the validate-mode info dict the stats loop consumes
    (util.py:68-94): action fractions, per-step light times collected
    inside the greedy rollout scan, trip-time drain from the on-device
    histogram delta, unfinished-car count.  None outside validate mode
    or for envs without a simulator (CartPole fixture)."""
    if cfg.mode != "validate" or getattr(benv.env, "sim_fns", None) is None:
        return None
    import jax.numpy as jnp
    sim = env_after.sim
    trip_times: list = []
    if sim.trip_hist is not None and trip_hist_before is not None:
        counts = np.asarray(sim.trip_hist) - np.asarray(trip_hist_before)
        counts = counts.sum(axis=tuple(range(1, counts.ndim)))
        trip_times = np.repeat(
            np.arange(len(counts)) * cfg.rate, counts).tolist()
    lt_list: list = []
    if light_times is not None:
        # the Repeater emits a light time only when the phase changed
        # (traffic_test.py:41-47); zeros mean "no switch this window"
        lt = np.asarray(light_times)
        lt_list = lt[lt != 0].tolist()
    unfinished = float(jnp.sum(jax.vmap(
        benv.env.sim_fns.cars_per_road, in_axes=-1,
        out_axes=-1)(sim)) / benv.n_envs)
    return {"onep": ones_fraction, "zerop": 1.0 - ones_fraction,
            "light_times": lt_list, "trip_times": trip_times,
            "unfinished": unfinished}

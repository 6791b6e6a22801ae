"""RL algorithms + scripted baselines, dispatched by trainer name
(reference alg_flags.py:46-49)."""

from __future__ import annotations

import importlib

from ..config import Config

_BASELINES = ("random", "const0", "const1", "fixed", "greedy",
              "spacedgreedy")
_LEARNERS = ("qlearn", "qrnn", "a3c", "polgrad_rnn", "cem")


def run_alg(cfg: Config):
    """Dynamic dispatch on --trainer (alg_flags.py:46-49)."""
    name = cfg.trainer
    if cfg.platform:
        # must land before backend init; env vars are not enough here
        # because platform plugins may rewrite them at interpreter
        # start (e.g. a site customization pinning its own backend)
        import jax
        jax.config.update("jax_platforms", cfg.platform)
    if cfg.num_processes > 1:
        # multi-host bring-up BEFORE any backend touch: after this,
        # jax.devices() spans every process and --mesh_shape can name
        # a global mesh (collectives ride ICI within a slice, DCN
        # across; SURVEY.md §2.4)
        from ..parallel import distributed_init
        distributed_init(cfg.coordinator or None, cfg.num_processes,
                         cfg.process_id)
    if cfg.debug:
        # --debug: the reference wraps the session in tf_debug's CLI
        # debugger (algorithms/util.py:55-58); the JAX-native
        # equivalent is NaN trapping inside jitted programs
        import jax
        jax.config.update("jax_debug_nans", True)
    if cfg.single_agent and name not in ("qlearn", "qrnn"):
        raise ValueError(
            "--single_agent flattens the action space to one 2^I-way "
            "head, which only the argmax learners (qlearn, qrnn) can "
            "express; the reference's sigmoid/baseline paths break "
            "under UnGSpaceWrapper too (wrappers/gspace.py:23-34)")
    if name in _BASELINES:
        from . import baselines
        return baselines.run(cfg, name)
    if name not in _LEARNERS:
        raise ValueError(f"unknown trainer {name!r}; "
                         f"choose from {_LEARNERS + _BASELINES}")
    mod = importlib.import_module(f"{__name__}.{name}")
    return mod.run(cfg.derive())


__all__ = ["run_alg"]

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
    if name in _BASELINES:
        from . import baselines
        return baselines.run(cfg, name)
    if name not in _LEARNERS:
        raise ValueError(f"unknown trainer {name!r}; "
                         f"choose from {_LEARNERS + _BASELINES}")
    mod = importlib.import_module(f"{__name__}.{name}")
    return mod.run(cfg.derive())


__all__ = ["run_alg"]

"""Checkpoint / restore / reproducibility snapshots.

The reference's ``handle_modes`` (algorithms/util.py:27-61) wipes the
logdir on a fresh run, snapshots every flag to settings.json (so old
runs revalidate exactly even after defaults change), saves model.ckpt
every save_rate episodes and best.ckpt on validation records, and
restores the latest checkpoint with settings re-applied before env
construction.  Same lifecycle here, with orbax holding the whole train
state pytree (params + optimizer + replay + env state + counters).
"""

from __future__ import annotations

import os
import shutil

import jax
import orbax.checkpoint as ocp

from ..config import Config


def remkdir(d: str):
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)


def snapshot_settings(cfg: Config, logdir: str):
    with open(os.path.join(logdir, "settings.json"), "w") as f:
        f.write(cfg.to_json())


def load_settings(logdir: str) -> Config:
    with open(os.path.join(logdir, "settings.json")) as f:
        return Config.from_json(f.read())


class Checkpointer:
    """model.ckpt / best.ckpt pair in the logdir."""

    def __init__(self, logdir: str):
        self.logdir = os.path.abspath(logdir)
        self._ck = ocp.PyTreeCheckpointer()

    def _path(self, name: str, step=None) -> str:
        sfx = f"-{int(step)}" if step is not None else ""
        return os.path.join(self.logdir, f"{name}{sfx}")

    def save(self, state, name: str = "model.ckpt", step=None):
        path = self._path(name, step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ck.save(path, jax.device_get(state))
        # keep a 'latest' pointer
        with open(os.path.join(self.logdir, f"{name}.latest"), "w") as f:
            f.write(os.path.basename(path))
        return path

    def latest_path(self, name: str = "model.ckpt"):
        ptr = os.path.join(self.logdir, f"{name}.latest")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return os.path.join(self.logdir, f.read().strip())

    def restore(self, template, name: str = "model.ckpt"):
        path = self.latest_path(name)
        if path is None:
            raise FileNotFoundError(f"no checkpoint '{name}' in {self.logdir}")
        return self._ck.restore(path, item=jax.device_get(template))

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
        state = _host_state(state)
        primary = jax.process_index() == 0
        multihost = jax.process_count() > 1
        path = self._path(name, step)
        if multihost and not primary:
            # orbax's sync checkpointer barriers across processes, so
            # every process must participate in the save; non-primary
            # processes write to a scratch path that is discarded
            # (process 0 owns the real checkpoint — the gathered host
            # state is identical everywhere)
            path = os.path.join(self.logdir,
                                f".scratch-{jax.process_index()}")
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ck.save(path, state)
        if multihost and not primary:
            shutil.rmtree(path, ignore_errors=True)
            return None
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
        tpl = jax.device_get(template)
        try:
            return self._ck.restore(path, item=tpl)
        except Exception:
            # schema-migration path: restore untyped, rewrite legacy
            # field layouts, refit onto the template's pytree types
            raw = self._ck.restore(path)
            migrated = _migrate_schema(raw, template)
            if migrated is None:
                raise
            return _fill_like(tpl, migrated)


def _host_state(state):
    """Materialize a train state on the host.  Leaves sharded across
    processes cannot be device_get directly; they are allgathered
    (collective — every process must call this) so each host holds the
    full value."""
    import jax.numpy as jnp
    multihost = jax.process_count() > 1

    def fetch(leaf):
        is_key = (hasattr(leaf, "dtype")
                  and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key))
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            from jax.experimental import multihost_utils
            if is_key:
                # multihost serialization wants plain host numpy, so
                # keys persist as their raw uint32 data; restore's
                # schema-migration path re-wraps them
                return multihost_utils.process_allgather(
                    jax.random.key_data(leaf), tiled=True)
            return multihost_utils.process_allgather(leaf, tiled=True)
        if multihost and is_key:
            return jax.device_get(jax.random.key_data(leaf))
        return jax.device_get(leaf)
    return jax.tree.map(fetch, state)


class _FreshReplay:
    """Sentinel: keep the template's freshly-initialized replay."""


def _migrate_schema(raw, template):
    """Known legacy checkpoint layouts -> current schema.  Returns the
    rewritten untyped tree, or None if no migration applies.

    * replay ``idx`` -> ``filled``/``cursor`` (the single insert
      counter was split into a saturating fill gate and a rotating
      write cursor; filled = min(idx, size), cursor = idx %% size).
    * legacy per-transition (s, a, r, nd, s1) replay -> the current
      per-step FrameReplay cannot represent that layout, so the replay
      restores EMPTY (replay is transient experience — params,
      optimizer, env state and counters all restore; training refills
      the ring within one buffer window).
    """
    if not isinstance(raw, dict):
        return None
    rep = raw.get("replay")
    if not isinstance(rep, dict):
        return None
    changed = False
    if "idx" in rep and "filled" not in rep and "s" in rep:
        import numpy as np
        rep = dict(rep)
        idx = np.asarray(rep.pop("idx"))
        size = np.asarray(rep["s"]).shape[0]
        rep["filled"] = np.minimum(idx, size).astype(np.int32)
        rep["cursor"] = (idx % size).astype(np.int32)
        changed = True
    from ..algorithms.replay import FrameReplay
    tpl_rep = getattr(template, "replay", None)
    if isinstance(tpl_rep, FrameReplay) and "frames" not in rep:
        import warnings
        warnings.warn(
            "legacy transition-replay checkpoint: replay layout is "
            "incompatible with the per-step frame ring and restores "
            "empty (all learned state restores normally)")
        rep = _FreshReplay
        changed = True
    if not changed:
        return None
    out = dict(raw)
    out["replay"] = rep
    return out


def _fill_like(template, raw):
    """Refit an untyped (dict/list) restored tree onto the template's
    pytree types (flax struct dataclasses, NamedTuples, dicts)."""
    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    def get(r, key, idx):
        if isinstance(r, dict):
            return r[key] if key in r else r[str(idx)]
        return r[idx]

    def fill(t, r):
        if t is None:
            return None
        if r is _FreshReplay:
            return t      # keep the template's freshly-created subtree
        if dc.is_dataclass(t) and not isinstance(t, type):
            return type(t)(**{
                f.name: fill(getattr(t, f.name), get(r, f.name, i))
                for i, f in enumerate(dc.fields(t))})
        if isinstance(t, dict):
            return {k: fill(v, get(r, k, i))
                    for i, (k, v) in enumerate(t.items())}
        if isinstance(t, tuple) and hasattr(t, "_fields"):
            return type(t)(*[fill(v, get(r, k, i))
                             for i, (k, v) in enumerate(
                                 zip(t._fields, t))])
        if isinstance(t, (list, tuple)):
            return type(t)(fill(v, get(r, None, i))
                           for i, v in enumerate(t))
        if hasattr(t, "dtype") and jnp.issubdtype(t.dtype,
                                                  jax.dtypes.prng_key):
            # typed PRNG keys round-trip through their raw uint32 data
            data = np.asarray(jax.random.key_data(r)
                              if hasattr(r, "dtype")
                              and jnp.issubdtype(getattr(r, "dtype"),
                                                 jax.dtypes.prng_key)
                              else r)
            return jax.random.wrap_key_data(
                jnp.asarray(data, jnp.uint32))
        arr = np.asarray(r)
        want = np.asarray(t)
        return jnp.asarray(arr.astype(want.dtype).reshape(want.shape))

    return fill(template, raw)

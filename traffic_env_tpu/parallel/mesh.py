"""Device meshes and sharding rules.

The reference's only "distribution" is 4 Python threads Hogwild-sharing
one TF variable store (a3c.py:66-97).  The TPU-native replacement
(SURVEY.md §2.4): a ``jax.sharding.Mesh`` with a data axis ``dp`` (env
batch + replay sharded; XLA inserts psum all-reduces for gradients over
ICI) and an optional model axis ``mp`` (hidden activations / Dense
kernels sharded) for scale-out beyond data parallelism.  Multi-host
runs call ``distributed_init`` first so the mesh spans all processes'
devices.

The env batch lives on the *trailing* axis of every state leaf, so its
sharding spec is "replicate every leading axis, shard the last on dp".
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed); no-op on a single host."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(mesh_shape: str = "", devices=None) -> Mesh:
    """"" -> all devices on dp; "4,2" -> (dp=4, mp=2)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if mesh_shape:
        dims = tuple(int(x) for x in mesh_shape.split(","))
    else:
        dims = (len(devices),)
    names = ("dp", "mp")[:len(dims)]
    return Mesh(devices[:int(np.prod(dims))].reshape(dims), names)


def batch_sharding(mesh: Mesh, leaf) -> NamedSharding:
    """Shard the trailing (env-batch) axis on dp, replicate the rest."""
    spec = P(*([None] * (leaf.ndim - 1) + ["dp"])) if leaf.ndim else P()
    return NamedSharding(mesh, spec)


def _global_put(leaf, sharding: NamedSharding):
    """Place a host/local value under ``sharding``, working on
    multi-process meshes too.

    Single-process meshes use plain device_put.  On a multi-process
    mesh, device_put cannot target non-addressable devices: sharded
    leaves are assembled per-shard with
    make_array_from_single_device_arrays (every process passes the
    same full value — init is seed-deterministic — and contributes its
    local shards); fully-replicated leaves are returned as-is, which
    multi-process jit treats as replicated-by-convention."""
    pidx = jax.process_index()
    if all(d.process_index == pidx for d in sharding.device_set):
        return jax.device_put(leaf, sharding)
    if all(p is None for p in sharding.spec):
        return leaf
    arr = np.asarray(leaf)
    idx_map = sharding.addressable_devices_indices_map(arr.shape)
    shards = [jax.device_put(arr[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(
        arr.shape, sharding, shards)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, tree):
    """Place a batched env/train-state pytree: batch-trailing leaves on
    dp, scalars and parameters replicated."""
    def place(leaf):
        return _global_put(leaf, batch_sharding(mesh, leaf))
    return jax.tree.map(place, tree)


def row_sharding(mesh: Mesh, leaf) -> NamedSharding:
    """Shard the LEADING axis on dp (replay rows, batch-first GRU
    carries), replicate the rest."""
    spec = P(*(["dp"] + [None] * (leaf.ndim - 1))) if leaf.ndim else P()
    return NamedSharding(mesh, spec)


def shard_rows(mesh: Mesh, tree):
    return jax.tree.map(
        lambda l: _global_put(l, row_sharding(mesh, l)), tree)


def shard_train_state(mesh: Mesh, ts):
    """Place a learner's whole training-state pytree on the mesh by
    field role: the env/obs batch (trailing axis) and replay rows /
    batch-first carries (leading axis) shard on dp, everything else
    (parameters, optimizer, counters, PRNG keys) replicates — XLA's
    partitioner then all-reduces gradients over dp (psum on ICI), the
    collectives replacement for the reference's shared-memory
    parameter server (a3c.py:47-48,66-97)."""
    import dataclasses as _dc
    updates = {}
    for f in _dc.fields(ts):
        val = getattr(ts, f.name)
        if val is None:
            continue
        if f.name in ("env", "obs"):
            updates[f.name] = shard_env_state(mesh, val)
        elif f.name == "replay":
            from ..algorithms.replay import FrameReplay
            if isinstance(val, FrameReplay):
                # frame rings are (steps, envs, ...): shard the env
                # axis so each device's replay holds its own envs
                def place(l):
                    spec = (P(*([None, "dp"] + [None] * (l.ndim - 2)))
                            if l.ndim >= 2 else P())
                    return _global_put(l, NamedSharding(mesh, spec))
                updates[f.name] = jax.tree.map(place, val)
            else:
                updates[f.name] = shard_rows(mesh, val)
        elif f.name == "gru":
            updates[f.name] = shard_rows(mesh, val)
        else:
            updates[f.name] = jax.tree.map(
                lambda l: _global_put(l, replicated(mesh)), val)
    return ts.replace(**updates)


def shard_params(mesh: Mesh, params, axis: Optional[str] = None):
    """Replicate parameters (dp) or shard Dense kernels' output dim on
    mp when a model axis exists."""
    if axis is None or "mp" not in mesh.axis_names:
        return jax.tree.map(
            lambda l: _global_put(l, replicated(mesh)), params)

    def place(leaf):
        if leaf.ndim == 2:       # Dense kernel (in, out) -> shard out
            s = NamedSharding(mesh, P(None, "mp"))
        elif leaf.ndim == 1:     # bias
            s = NamedSharding(mesh, P("mp"))
        else:
            s = replicated(mesh)
        return jax.device_put(leaf, s)
    return jax.tree.map(place, params)

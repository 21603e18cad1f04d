"""Data-parallel sharding over a 1-D device mesh.

The model is ~1-2M params with a fixed 6891-vertex "sequence", so the right
parallelism is pure DP: batch sharded over all chips, params replicated, XLA
inserting the gradient psum over ICI (SURVEY.md §2.3 — the reference is
strictly single-GPU; this is the TPU-native scaling design, not a port).
Multi-host scaling composes through jax.distributed.initialize() + the same
mesh over all processes' devices.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, axis_names=(axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading (batch) axis sharded across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a param pytree across the mesh."""
    rep = replicated_sharding(mesh)
    return jax.device_put(params, rep)


def put_replicated(tree, mesh: Mesh):
    """Replicate a host pytree across the mesh — multi-process safe.

    Single-process: plain device_put.  Multi-process: device_put on
    non-addressable devices raises, so assemble the global array from
    per-process callbacks (every process holds the full value)."""
    rep = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)
    import numpy as np

    def put(x):
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, rep, lambda idx: a[idx])
    return jax.tree.map(put, tree)


def fully_replicate(arr, mesh: Mesh):
    """Gather a (possibly batch-sharded) global array so every process can
    read it host-side (np.asarray on a non-addressable array raises)."""
    if jax.process_count() == 1:
        return arr
    out = jax.jit(lambda x: x,
                  out_shardings=replicated_sharding(mesh))(arr)
    return out.addressable_data(0)


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place each batch array with its leading axis split across the mesh."""
    bs = batch_sharding(mesh, axis_name)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out

"""Mesh sharding for replica scale-out.

The reference scales by NCCL DDP + SLURM job arrays over independent
(pair, pose) replicas (druglib/core/runner/dist_utils.py:31-122,
parallel/distributed.py:12). Graphs are tiny (<= ~1k nodes), so the only
useful parallel axis is the replica batch: we shard it over a
`jax.sharding.Mesh` ('dp',) and let pjit insert the collectives. Params are
replicated; gradient all-reduce falls out of pjit automatically.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
job-table sharding per host lives in the app layer (host-local data, global
mesh), matching the reference's SLURM array pattern without any rendezvous
code.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis (replica) sharding for every array in a batch pytree."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a host batch onto the mesh, sharded along the replica axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

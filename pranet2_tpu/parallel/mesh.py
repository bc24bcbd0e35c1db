"""Mesh construction + sharding policies — the entire parallel substrate.

The reference's parallelism is single-process multi-GPU DataParallel plus a
thread-pipe SyncBN (``binary_seg/lib/nn/`` — SURVEY.md §2.7).  On TPU the
whole subsystem collapses to GSPMD: one ``Mesh`` over ICI, batches sharded on
the 'data' axis, parameters replicated.  Under ``jit``, BatchNorm statistics
are computed over the *global* batch (XLA inserts the cross-replica
reductions), which is exactly SyncBN — no thread pipes, no master/slave
rendezvous, no ReduceAddCoalesced.

Models here are small (25-85M params) so data parallelism is the right and
only sharding for production; ``make_mesh`` still accepts an ``(dp, mp)``
shape so tensor-parallel experiments can reuse the same entry points.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, shape: tuple[int, ...] | None = None,
              axis_names: tuple[str, ...] = ("data",)) -> Mesh:
    """Mesh over all (or given) devices; default a 1-D 'data' axis."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree onto the mesh."""
    return jax.device_put(params, replicated_sharding(mesh))

"""Multi-chip scaling utilities.

The reference's only multi-device strategy is single-process
`nn.DataParallel` (examples/train.py:101-108). The TPU-native equivalent is
SPMD data parallelism over an ICI mesh: parameters replicated, the batch
sharded over the `data` axis, gradient reduction emitted by XLA as `psum`
collectives when the loss is jitted over the mesh. Larger models can extend
the same mesh with a `model` axis (the transforms here fit one chip, so the
default mesh is 1-D).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)

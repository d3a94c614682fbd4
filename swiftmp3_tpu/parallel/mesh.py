"""Device mesh construction and shardings for the batch axis."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'data'.

    MP3 batch encoding has no cross-stream communication, so a flat data
    axis is the whole story; a multi-host deployment extends the same axis
    over DCN.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Sharding for arrays whose axis `batch_axis` is the stream batch."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def carry_sharding(mesh: Mesh) -> NamedSharding:
    """Carry pytree leaves are batch-leading."""
    return NamedSharding(mesh, P(DATA_AXIS))


def time_major_sharding(mesh: Mesh) -> NamedSharding:
    """[T, B, ...] arrays: shard the second (batch) axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS))

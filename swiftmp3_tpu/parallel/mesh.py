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


def initialize_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize jax.distributed for multi-host batch scale-out over DCN.

    After this returns, `jax.devices()` spans every process (ordered by
    process index), so `make_mesh()` builds ONE flat data axis across all
    hosts — the single-host and multi-host code paths are otherwise
    identical (SURVEY.md §5 'Distributed communication backend'). Call
    before any jax computation; no-op if already initialized.
    """
    if num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_batch_bounds(mesh: Mesh, global_batch: int) -> tuple:
    """[lo, hi) rows of the global stream batch fed by THIS process.

    With the flat data mesh over `jax.devices()` (process-major order),
    each process owns a contiguous span of the batch axis; the host feeds
    PCM for exactly those streams and drains exactly their bytes.
    """
    flat = list(mesh.devices.flat)
    n_dev = len(flat)
    if global_batch % n_dev:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh size {n_dev}"
        )
    per_dev = global_batch // n_dev
    local = [i for i, d in enumerate(flat) if d.process_index == jax.process_index()]
    if not local:
        return (0, 0)
    if local != list(range(local[0], local[0] + len(local))):
        raise ValueError(
            "this process's devices are not contiguous on the data axis; "
            "build the mesh from jax.devices() order"
        )
    return (local[0] * per_dev, (local[-1] + 1) * per_dev)


def put_global(mesh: Mesh, local_rows: np.ndarray, batch_axis: int = 0):
    """Assemble a mesh-global, batch-sharded array from this process's rows.

    Single-process: equivalent to `jax.device_put` with the batch sharding.
    Multi-process: `local_rows` holds only this host's `process_batch_bounds`
    span and the result is a global jax.Array spanning all hosts.
    """
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_rows), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows)
    )


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Sharding for arrays whose axis `batch_axis` is the stream batch."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def carry_sharding(mesh: Mesh) -> NamedSharding:
    """Carry pytree leaves are batch-leading."""
    return NamedSharding(mesh, P(DATA_AXIS))


def time_major_sharding(mesh: Mesh) -> NamedSharding:
    """DEPRECATED: chunk tensors are batch-major since round 2 (use
    carry_sharding / batch_sharding); kept for callers of the old layout."""
    return NamedSharding(mesh, P(None, DATA_AXIS))

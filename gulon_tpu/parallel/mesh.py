"""Device-mesh plumbing for sharded indices and distributed training.

The reference's only parallel substrate is a JVM thread pool over shared
memory (SURVEY §2.3). The TPU-native equivalent is a
``jax.sharding.Mesh``: index rows shard across devices (the counterpart of
the 25k-row assignment batches and 4096-row scan blocks), codebooks and
queries replicate, and per-shard results merge with XLA collectives over
ICI. Multi-host meshes work transparently through ``jax.distributed``.

Axis conventions:

- ``"rows"`` — the corpus axis: codes / norms / raw vectors shard here.
- ``"sub"``  — the PQ subspace axis (model parallel): the stacked ``[m, n, d']``
  training tensor can shard here as well, giving a 2-D (rows × sub) mesh for
  codebook training.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS = "rows"
SUB = "sub"


def distributed_init(**kwargs) -> None:
    """Join a multi-host JAX runtime (``jax.distributed.initialize``).

    On multi-host TPU slices every host must call this before any jax use;
    afterwards ``jax.devices()`` spans the whole slice and ``make_mesh()``
    lays the row/sub axes across it — intra-slice collectives ride ICI,
    cross-host segments ride DCN, transparently. No-op when already
    initialized. Accepts the usual coordinator_address/num_processes/
    process_id overrides; on Cloud TPU they are auto-detected.
    """
    import jax

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def make_mesh(
    num_devices: Optional[int] = None,
    *,
    sub_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (rows × sub) mesh over the available devices.

    ``sub_parallel`` devices are dedicated to the PQ-subspace axis; the rest
    shard rows. Defaults to a pure row mesh (``sub_parallel=1``), the layout
    for serving, where the whole code matrix shards row-wise.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % sub_parallel != 0:
        raise ValueError(
            f"device count {n} not divisible by sub_parallel {sub_parallel}"
        )
    grid = np.asarray(devices).reshape(n // sub_parallel, sub_parallel)
    return Mesh(grid, (ROWS, SUB))


def row_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Rows sharded on axis 0, everything else replicated."""
    return NamedSharding(mesh, P(ROWS, *(None,) * (ndim - 1)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def num_row_shards(mesh: Mesh) -> int:
    return mesh.shape[ROWS]


def pad_rows_to_shards(
    array: np.ndarray, mesh: Mesh, pad_value
) -> Tuple[np.ndarray, int]:
    """Pad axis 0 to a multiple of the row-shard count; returns (padded, n_pad).

    Padded rows must be inert in whatever scan consumes them — callers pad
    norms with ``+inf`` so padding can never enter a top-k (the same trick
    the single-chip scans use for tile padding).
    """
    n = array.shape[0]
    shards = num_row_shards(mesh)
    n_pad = (-n) % shards
    if n_pad:
        pad_cfg = ((0, n_pad),) + ((0, 0),) * (array.ndim - 1)
        array = np.pad(array, pad_cfg, constant_values=pad_value)
    return array, n_pad


def place_global(full: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Place a host value under ``sharding``, multi-process included.

    Single-process this is ``jax.device_put``. Multi-process, the mesh
    spans non-addressable devices; every process holds the SAME full host
    value (the multi-host contract of this layer — each host parses or
    builds the identical corpus) and contributes only its addressable
    shards via ``jax.make_array_from_single_device_arrays`` — the same
    decomposition ``device_put`` performs on a real multi-host TPU slice.
    """
    if jax.process_count() == 1:
        return jax.device_put(full, sharding)
    shards = [
        jax.device_put(full[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(
            full.shape
        ).items()
    ]
    return jax.make_array_from_single_device_arrays(
        full.shape, sharding, shards
    )


def shard_rows(array, mesh: Mesh, pad_value=0) -> jax.Array:
    """Pad + place an array row-sharded across the mesh."""
    arr = np.asarray(array)
    padded, _ = pad_rows_to_shards(arr, mesh, pad_value)
    return place_global(padded, row_sharding(mesh, padded.ndim))


def replicate(array, mesh: Mesh) -> jax.Array:
    return place_global(np.asarray(array), replicated(mesh))

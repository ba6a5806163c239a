"""Device mesh and sharding utilities.

The reference is strictly single-GPU/single-process (SURVEY.md §2.4-2.5: no
DDP/NCCL/MPI anywhere). This module is the *new* distribution layer of the
TPU build: a ``jax.sharding.Mesh`` over all local (or all global) devices
with a data-parallel axis, batch sharded over ICI, parameters replicated.
Gradient all-reduce is inserted by XLA when the jitted train step consumes a
sharded batch and produces replicated parameter updates — no hand-written
collectives on the data-parallel path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a device mesh. Default: 1-D data-parallel mesh over all devices."""
    if devices is None:
        devices = jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    n = 1
    for s in mesh_shape:
        n *= s
    if n < len(devices):
        # an explicit smaller mesh (e.g. mesh_shape [1] to run without
        # cross-device collectives) takes the first n devices
        devices = list(devices)[:n]
    devs = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(devs, tuple(axis_names))


def batch_sharding(mesh: Mesh, dp_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(dp_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, dp_axis: str = "data") -> Any:
    """Device-put a host batch with its leading axis sharded over ``dp_axis``.

    This is the TPU replacement for the reference's per-batch
    ``.to(device)`` H2D copies (reference: train.py:195-200) — one transfer
    per device shard, overlappable with compute via dispatch asynchrony.
    """
    sharding = batch_sharding(mesh, dp_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_devices(n: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= n (per-device batch must be equal)."""
    return ((n + n_devices - 1) // n_devices) * n_devices

"""Multi-host (multi-process) distribution layer.

The reference has no distributed runtime at all (SURVEY.md §2.5: no
torch.distributed / NCCL / MPI anywhere); this module is new, TPU-first
design. It covers the pod / pod-slice regime where JAX runs one process per
host and the mesh spans *global* devices:

* :func:`initialize` — `jax.distributed.initialize` driven by explicit args
  or standard env vars; a no-op on single-process runs (and on TPU pods where
  the runtime auto-detects the topology).
* :func:`global_mesh` — data-parallel mesh over all *global* devices. On a
  multi-slice deployment the data axis orders devices slice-major so gradient
  all-reduce segments ride ICI within a slice before crossing DCN.
* :func:`make_global_batch` — per-host batch feeding: each process loads only
  its shard of the global batch from host storage and
  `jax.make_array_from_process_local_data` assembles the logically-global
  sharded array (zero cross-host data movement).
* :func:`is_main_process` / :func:`sync_global_devices` — process-0 guards
  for checkpoint/metric writes and a barrier for shutdown ordering.

Single-process multi-device behavior is identical to `parallel.mesh`: these
helpers degrade gracefully so the trainer uses one code path everywhere.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Initialize the JAX distributed runtime when running multi-process.

    Args may come from the caller or from the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``;
    also the ``COORDINATOR_ADDRESS``-style names used by launchers). Returns
    True when the distributed runtime was (already) initialized, False for
    single-process runs.
    """
    env = os.environ
    coordinator_address = coordinator_address or env.get(
        "JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        raw = env.get("JAX_NUM_PROCESSES") or env.get("NUM_PROCESSES")
        num_processes = int(raw) if raw else None
    if process_id is None:
        raw = env.get("JAX_PROCESS_ID") or env.get("PROCESS_ID")
        process_id = int(raw) if raw else None

    if coordinator_address is None:
        # single-process, or a pod runtime that already initialized
        return jax.process_count() > 1
    try:
        # must run before ANY backend-initializing JAX call — do not probe
        # jax.process_count() first
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        if "already" not in str(e):
            raise
    return jax.process_count() > 1


def is_main_process() -> bool:
    """True on process 0 — the only process that writes checkpoints, metric
    files, and debug visualizations (every host computes identical replicated
    state, so one writer suffices and avoids write races on shared storage)."""
    return jax.process_index() == 0


def sync_global_devices(name: str = "sync") -> None:
    """Barrier across all processes (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def global_mesh(dp_axis: str = "data",
                mesh_shape: Optional[Sequence[int]] = None,
                axis_names: Optional[Sequence[str]] = None):
    """Mesh over all GLOBAL devices (every process sees the same mesh).

    Devices are ordered process-major, so contiguous batch shards land on the
    devices local to the host that fed them, and the gradient all-reduce tree
    XLA builds sums within a host's slice (ICI) before crossing hosts (DCN).
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    if axis_names is None:
        axis_names = (dp_axis,) if len(mesh_shape) == 1 else tuple(
            f"axis{i}" for i in range(len(mesh_shape)))
    return make_mesh(mesh_shape, axis_names, devices=devices)


def process_batch_slice(global_batch: int) -> slice:
    """The [start, stop) sample range of the global batch this process feeds.

    ``global_batch`` must divide evenly by process_count (callers round up
    with parallel.mesh.pad_batch_to_devices against the GLOBAL device count,
    which is a multiple of the process count)."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count "
            f"{n_proc}")
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def make_global_batch(local_batch: Dict[str, np.ndarray], mesh,
                      dp_axis: str = "data") -> Dict[str, jax.Array]:
    """Assemble a logically-global batch from per-process local shards.

    Each process passes ONLY its local samples (``global_batch /
    process_count`` leading dim); the returned arrays are globally sharded
    over ``dp_axis``. Single-process, this is exactly
    ``parallel.mesh.shard_batch``."""
    sharding = batch_sharding(mesh, dp_axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), local_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)

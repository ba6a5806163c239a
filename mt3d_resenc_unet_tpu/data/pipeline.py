"""Async host input pipeline: threaded sample loading + device prefetch.

The reference hides zarr-read + augmentation latency behind torch DataLoader
worker *processes* (reference: train.py:109-118, inference.py:55-63). JAX has
no DataLoader; this module provides the TPU equivalent: a thread pool decodes
samples (tensorstore releases the GIL during chunk reads/decompression, and
the numpy augmentations release it for large ops), batches are assembled and
``jax.device_put`` with the data-parallel NamedSharding, and a small prefetch
queue keeps H2D copies ahead of the training step (double buffering).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np

from ..parallel.mesh import batch_sharding
from ..utils.hostmem import retain_large_allocations


class _EndOfData:
    pass


_EOD = _EndOfData()


def batch_iterator(
    dataset,
    indices: Sequence[int],
    batch_size: int,
    *,
    num_threads: int = 8,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield stacked host batches, samples decoded by a thread pool."""
    # a prefetch window of retained ~100 MB samples puts glibc on the
    # mmap/munmap fresh-page path (catastrophic on ballooned TPU-host VMs);
    # pin large blocks to the arena so pages fault once (utils/hostmem.py)
    retain_large_allocations()
    indices = list(indices)
    if drop_last:
        usable = (len(indices) // batch_size) * batch_size
        indices = indices[:usable]
    if not indices:
        return
    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        # submit a rolling window of sample fetches
        window = num_threads * 2 + batch_size
        futures = {}
        it = iter(range(len(indices)))
        submitted = 0
        for _ in range(min(window, len(indices))):
            i = next(it)
            futures[i] = pool.submit(dataset.__getitem__, indices[i])
            submitted += 1
        n_batches = len(indices) // batch_size
        for b in range(n_batches):
            samples = []
            for j in range(b * batch_size, (b + 1) * batch_size):
                samples.append(futures.pop(j).result())
                if submitted < len(indices):
                    i = next(it)
                    futures[i] = pool.submit(dataset.__getitem__, indices[i])
                    submitted += 1
            batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            yield batch


def device_prefetch(
    host_batches: Iterable[Dict[str, np.ndarray]],
    mesh=None,
    dp_axis: str = "data",
    prefetch: int = 2,
) -> Iterator[Dict[str, jax.Array]]:
    """Move host batches to device ahead of consumption (double buffering).

    With a mesh, the batch axis is sharded over ``dp_axis`` so each device
    receives only its shard (the pjit data-parallel feed; no reference
    counterpart — SURVEY.md §2.4). Multi-process, each host passes ONLY its
    local samples and the global array is assembled with
    ``jax.make_array_from_process_local_data`` (parallel/distributed.py)."""
    sharding = batch_sharding(mesh, dp_axis) if mesh is not None else None
    multiproc = jax.process_count() > 1

    def put(batch):
        if sharding is not None:
            if multiproc:
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding, np.asarray(x)), batch)
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def producer():
        # Propagate producer-side failures (dataset reads, device_put) to the
        # consumer instead of silently truncating the epoch: the exception is
        # enqueued and re-raised from the consuming thread.
        try:
            for batch in host_batches:
                q.put(put(batch))
        except BaseException as e:  # noqa: BLE001 - forwarded, not swallowed
            q.put(e)
        finally:
            q.put(_EOD)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if isinstance(item, _EndOfData):
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def train_val_split(n: int, split: float, seed: int = 0):
    """Shuffled index split (reference: train.py:99-107)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    cut = int(np.floor(split * n))
    return idx[:cut].tolist(), idx[cut:].tolist()

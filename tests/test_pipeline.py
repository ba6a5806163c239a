"""Host input pipeline: threaded batch assembly, device prefetch, splits."""

import numpy as np
import jax

from mt3d_resenc_unet_tpu.data.pipeline import (
    batch_iterator,
    device_prefetch,
    train_val_split,
)
from mt3d_resenc_unet_tpu.parallel.mesh import make_mesh


class _FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.full((2, 2, 2, 1), float(i), np.float32),
                "sheet": np.full((2, 2, 2, 1), float(-i), np.float32)}


def test_batch_iterator_order_and_shape():
    ds = _FakeDataset(10)
    batches = list(batch_iterator(ds, list(range(10)), batch_size=3,
                                  num_threads=4))
    assert len(batches) == 3  # drop_last
    for b, batch in enumerate(batches):
        assert batch["image"].shape == (3, 2, 2, 2, 1)
        # samples arrive in index order despite threaded fetch
        np.testing.assert_array_equal(
            batch["image"][:, 0, 0, 0, 0], [3 * b, 3 * b + 1, 3 * b + 2])
        np.testing.assert_array_equal(
            batch["sheet"][:, 0, 0, 0, 0], [-3 * b, -(3 * b + 1), -(3 * b + 2)])


def test_batch_iterator_keep_last():
    ds = _FakeDataset(5)
    batches = list(batch_iterator(ds, list(range(5)), batch_size=2,
                                  drop_last=True))
    assert len(batches) == 2


def test_device_prefetch_sharded():
    ds = _FakeDataset(8)
    mesh = make_mesh((8,), ("data",))
    out = list(device_prefetch(
        batch_iterator(ds, list(range(8)), batch_size=8), mesh, "data"))
    assert len(out) == 1
    arr = out[0]["image"]
    assert isinstance(arr, jax.Array)
    assert arr.shape == (8, 2, 2, 2, 1)
    # sharded over 8 devices: one sample per device
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr)[:, 0, 0, 0, 0],
                                  np.arange(8.0))


def test_train_val_split_deterministic():
    a1, v1 = train_val_split(100, 0.9, seed=3)
    a2, v2 = train_val_split(100, 0.9, seed=3)
    assert a1 == a2 and v1 == v2
    assert len(a1) == 90 and len(v1) == 10
    assert sorted(a1 + v1) == list(range(100))
    a3, _ = train_val_split(100, 0.9, seed=4)
    assert a3 != a1


def test_device_prefetch_propagates_producer_errors():
    from mt3d_resenc_unet_tpu.data.pipeline import device_prefetch

    def gen():
        yield {"x": np.zeros((2, 4), np.float32)}
        raise RuntimeError("zarr read failed")

    it = device_prefetch(gen(), mesh=None)
    next(it)
    try:
        next(it)
        raised = False
    except RuntimeError as e:
        raised = "zarr read failed" in str(e)
    assert raised, "producer exception must surface to the consumer"

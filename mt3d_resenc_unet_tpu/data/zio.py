"""Chunked volume IO on tensorstore (native C++ async zarr driver).

The reference reads/writes zarr v2 stores through the Python ``zarr`` +
``fsspec`` + ``numcodecs`` stack, reopening stores inside every
``__getitem__`` for fork-safety (reference: dataloading/dataset.py:36-38,
114-143; inference.py:76-113). The TPU build replaces that stack with
tensorstore: a single native handle is thread-safe, performs async
multi-chunk reads with internal parallelism, and decodes Blosc/zstd chunks in
C++ — no worker processes required. Stores written here are bit-compatible
with the reference's (zarr v2, Blosc zstd-5 bitshuffle).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import tensorstore as ts

# Blosc zstd level 5 with bitshuffle — the reference's compressor for all
# prediction stores (reference: inference.py:92).
DEFAULT_COMPRESSOR = {"id": "blosc", "cname": "zstd", "clevel": 5, "shuffle": 2}

_DTYPE_TO_ZARR = {
    np.dtype("uint8"): "|u1",
    np.dtype("uint16"): "<u2",
    np.dtype("uint32"): "<u4",
    np.dtype("int8"): "|i1",
    np.dtype("int16"): "<i2",
    np.dtype("int32"): "<i4",
    np.dtype("int64"): "<i8",
    np.dtype("float32"): "<f4",
    np.dtype("float64"): "<f8",
}


def _kvstore_spec(path: str) -> Dict[str, Any]:
    """Map a path/URL to a tensorstore kvstore spec. Supports local paths,
    http(s), s3 and gs URLs (the reference supports local/fsspec-HTTP/S3 —
    helpers.py:300-319)."""
    if path.startswith(("http://", "https://")):
        return {"driver": "http", "base_url": path.rstrip("/")}
    if path.startswith("s3://"):
        rest = path[len("s3://"):]
        bucket, _, prefix = rest.partition("/")
        return {"driver": "s3", "bucket": bucket, "path": prefix}
    if path.startswith("gs://"):
        rest = path[len("gs://"):]
        bucket, _, prefix = rest.partition("/")
        return {"driver": "gcs", "bucket": bucket, "path": prefix}
    if path.startswith("memory://"):
        return {"driver": "memory", "path": path[len("memory://"):]}
    # tensorstore's file driver rejects relative "./x" paths; normalize
    return {"driver": "file", "path": os.path.abspath(path)}


@dataclasses.dataclass
class Volume:
    """Thin wrapper over a tensorstore array handle."""

    store: ts.TensorStore
    path: str

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.store.shape)

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(self.store.dtype.numpy_dtype)

    @property
    def chunks(self) -> Tuple[int, ...]:
        return tuple(self.store.chunk_layout.read_chunk.shape)

    def __getitem__(self, idx) -> np.ndarray:
        return np.asarray(self.store[idx].read().result())

    def read_async(self, idx):
        """Begin an async read; returns a future with .result()."""
        return self.store[idx].read()

    def __setitem__(self, idx, value) -> None:
        self.store[idx].write(value).result()

    def write_async(self, idx, value):
        return self.store[idx].write(value)

    def read_all(self) -> np.ndarray:
        return np.asarray(self.store.read().result())


class _ReadyFuture:
    """Minimal future shim so RamVolume satisfies Volume.read_async."""

    __slots__ = ("_value",)

    def __init__(self, value):
        self._value = value

    def result(self):
        return self._value


@dataclasses.dataclass
class RamVolume:
    """A Volume fully resident in host RAM (read-only).

    Per-sample reads cost a strided numpy slice copy instead of a
    tensorstore chunk fetch + Blosc decode — measured ~4x cheaper on
    1-core hosts, where the read path otherwise starves the chip. The
    training analog of the reference's inference-side ``load_all``
    (reference: inference.py:32-33); the reference's training datasets
    always re-read chunks per sample (dataloading/dataset.py:114-143).
    """

    data: np.ndarray
    path: str

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    @property
    def dtype(self) -> np.dtype:
        return self.data.dtype

    @property
    def chunks(self) -> Tuple[int, ...]:
        return self.data.shape

    def __getitem__(self, idx) -> np.ndarray:
        return self.data[idx]

    def read_async(self, idx):
        return _ReadyFuture(self.data[idx])

    def read_all(self) -> np.ndarray:
        return self.data


def volume_nbytes(vol) -> int:
    """Stored (decompressed) size of a volume in bytes."""
    return int(np.prod(vol.shape)) * np.dtype(vol.dtype).itemsize


def to_ram(vol) -> "RamVolume":
    """Materialize a Volume into host RAM (no-op for RamVolume)."""
    if isinstance(vol, RamVolume):
        return vol
    return RamVolume(data=np.ascontiguousarray(vol.read_all()), path=vol.path)


def open_zarr(path: str, *, component: Optional[str] = None,
              writable: bool = False) -> Volume:
    """Open an existing zarr v2 array (local or remote).

    ``component`` selects an array inside a group (e.g. multiscale level
    "0"); the reference indexes ``zarr.open(...)[0]`` for HTTP multiscale
    inputs (dataloading/dataset.py:117-120).
    """
    full = path if component is None else os.path.join(path, component)
    spec = {"driver": "zarr", "kvstore": _kvstore_spec(full)}
    try:
        store = ts.open(spec, open=True, read=True, write=writable).result()
    except Exception:
        if component is None:
            # maybe a group with a "0" multiscale level
            try:
                return open_zarr(path, component="0", writable=writable)
            except Exception:
                raise
        raise
    return Volume(store=store, path=full)


def create_zarr(
    path: str,
    shape: Sequence[int],
    dtype,
    chunks: Sequence[int],
    *,
    compressor: Optional[Dict[str, Any]] = DEFAULT_COMPRESSOR,
    fill_value: Any = 0,
    delete_existing: bool = False,
    allow_existing: bool = False,
) -> Volume:
    """Create a zarr v2 array (bit-compatible with the reference's stores)."""
    dt = np.dtype(dtype)
    metadata = {
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": _DTYPE_TO_ZARR[dt],
        "compressor": compressor,
        "fill_value": fill_value,
    }
    spec = {"driver": "zarr", "kvstore": _kvstore_spec(path), "metadata": metadata}
    store = ts.open(
        spec,
        create=True,
        delete_existing=delete_existing,
        open=allow_existing,
    ).result()
    return Volume(store=store, path=path)


def zarr_exists(path: str) -> bool:
    try:
        ts.open({"driver": "zarr", "kvstore": _kvstore_spec(path)}, read=True).result()
        return True
    except Exception:
        return False


_U8_UNIT_LUT = None
_U16_UNIT_LUT = None


def normalize_to_unit(data: np.ndarray, dtype: np.dtype) -> np.ndarray:
    """Input normalization: uint8/255, uint16/65535, pass-through floats
    (reference: dataloading/dataset.py:125-131). Integer dtypes decode via a
    lookup table — one gather pass instead of astype+divide (the sample
    decode path must sustain ~40 patches/s to feed the chip)."""
    global _U8_UNIT_LUT, _U16_UNIT_LUT
    if dtype == np.uint8:
        if _U8_UNIT_LUT is None:
            _U8_UNIT_LUT = (np.arange(256, dtype=np.float32) / 255.0)
        return _U8_UNIT_LUT[data]
    if dtype == np.uint16:
        if _U16_UNIT_LUT is None:
            _U16_UNIT_LUT = (np.arange(65536, dtype=np.float32) / 65535.0)
        return _U16_UNIT_LUT[data]
    return data.astype(np.float32)


# Normals codec. The reference uses THREE inconsistent scales (encode 65535 at
# inference.py:254, 65000 in standalone_inf_average.py:106, decode 32767.5 at
# dataset.py:150 — SURVEY.md §2.6.8). We standardize on the 32767.5 codec:
#   encode: u16 = clip((v + 1) * 32767.5, 0, 65535)
#   decode: v   = u16 / 32767.5 - 1
NORMALS_SCALE = 32767.5


def encode_normals_u16(vec: np.ndarray) -> np.ndarray:
    q = (vec.astype(np.float32) + 1.0) * NORMALS_SCALE
    return np.clip(q, 0, 65535).astype(np.uint16)


_NORMALS_LUT = None


def decode_normals(data: np.ndarray, dtype: np.dtype) -> np.ndarray:
    """uint16 -> [-1, 1] via /32767.5 - 1; other dtypes assumed [0,1] -> *2-1
    (reference: dataloading/dataset.py:147-152). uint16 decodes via a 64K
    lookup table: one gather instead of astype + two arithmetic passes."""
    global _NORMALS_LUT
    if dtype == np.uint16:
        if _NORMALS_LUT is None:
            # (u - 32767.5) / 32767.5 == u/32767.5 - 1 exactly in real
            # arithmetic; this grouping makes fp32 NEGATION exact in encoded
            # space (decode(65535 - u) == -decode(u) bit-for-bit), which the
            # wire-format geometric flips rely on (data/augment.py)
            _NORMALS_LUT = ((np.arange(65536, dtype=np.float32)
                             - NORMALS_SCALE) / NORMALS_SCALE)
        return _NORMALS_LUT[data]
    return data.astype(np.float32) * 2.0 - 1.0

"""ctypes bindings for the native host-ops library (native/hostops.cpp).

Builds the shared library on first use (g++, cached next to the source) and
falls back to numpy implementations when a toolchain is unavailable, so the
framework stays importable everywhere. All wrappers validate dtypes and
contiguity before handing raw pointers to C++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "hostops.cpp"
_LIB_PATH = _SRC.parent / "libhostops.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and _SRC.exists():
        _build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        if lib.hostops_abi_version() != 1:
            return None
    except Exception:
        return None

    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.accumulate_patch.argtypes = [f32p, f32p, f32p, f32p] + [i64] * 10
    lib.finalize_average.argtypes = [f32p, f32p, i64, i64]
    lib.renormalize_vectors.argtypes = [f32p, f32p, i64]
    lib.quantize_u8.argtypes = [f32p, u8p, i64]
    lib.encode_normals_u16.argtypes = [f32p, u16p, i64]
    lib.normalize_u8.argtypes = [u8p, f32p, i64]
    lib.normalize_u16.argtypes = [u16p, f32p, i64]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def accumulate_patch(sum_arr: np.ndarray, cnt_arr: np.ndarray,
                     pred: np.ndarray, wmap: np.ndarray,
                     z0: int, y0: int, x0: int) -> None:
    """sum (C,SZ,SY,SX) += pred (C,PZ,PY,PX) at offset; cnt += wmap."""
    lib = load()
    c, sz, sy, sx = sum_arr.shape
    pz, py, px = pred.shape[1:]
    if lib is not None and all(a.dtype == np.float32 and a.flags.c_contiguous
                               for a in (sum_arr, cnt_arr, pred, wmap)):
        lib.accumulate_patch(
            _ptr(sum_arr, ctypes.c_float), _ptr(cnt_arr, ctypes.c_float),
            _ptr(pred, ctypes.c_float), _ptr(wmap, ctypes.c_float),
            c, sz, sy, sx, pz, py, px, z0, y0, x0)
        return
    sum_arr[:, z0:z0 + pz, y0:y0 + py, x0:x0 + px] += pred
    cnt_arr[z0:z0 + pz, y0:y0 + py, x0:x0 + px] += wmap


def finalize_average(sum_block: np.ndarray, cnt_block: np.ndarray) -> None:
    """In place: sum[c][cnt>0] /= cnt. sum_block (C, *spatial)."""
    lib = load()
    c = sum_block.shape[0]
    n = cnt_block.size
    if lib is not None and sum_block.dtype == np.float32 \
            and sum_block.flags.c_contiguous and cnt_block.flags.c_contiguous \
            and sum_block.size == c * n:
        lib.finalize_average(_ptr(sum_block, ctypes.c_float),
                             _ptr(cnt_block, ctypes.c_float), c, n)
        return
    mask = cnt_block > 0
    for ch in range(c):
        sum_block[ch][mask] /= cnt_block[mask]


def renormalize_vectors(sum_block: np.ndarray, cnt_block: np.ndarray) -> None:
    """In place unit-renormalization of (3, *spatial) where cnt > 0."""
    lib = load()
    n = cnt_block.size
    if lib is not None and sum_block.dtype == np.float32 \
            and sum_block.flags.c_contiguous and cnt_block.flags.c_contiguous \
            and sum_block.shape[0] == 3 and sum_block.size == 3 * n:
        lib.renormalize_vectors(_ptr(sum_block, ctypes.c_float),
                                _ptr(cnt_block, ctypes.c_float), n)
        return
    mask = cnt_block > 0
    mag = np.maximum(np.sqrt(np.sum(sum_block ** 2, axis=0)), 1e-30)
    for ch in range(3):
        sum_block[ch][mask] /= mag[mask]


def quantize_u8(block: np.ndarray) -> np.ndarray:
    lib = load()
    if lib is not None and block.dtype == np.float32 and block.flags.c_contiguous:
        out = np.empty(block.shape, np.uint8)
        lib.quantize_u8(_ptr(block, ctypes.c_float),
                        _ptr(out, ctypes.c_uint8), block.size)
        return out
    return np.clip(block * 255.0, 0, 255).astype(np.uint8)


def encode_normals_u16(block: np.ndarray) -> np.ndarray:
    lib = load()
    if lib is not None and block.dtype == np.float32 and block.flags.c_contiguous:
        out = np.empty(block.shape, np.uint16)
        lib.encode_normals_u16(_ptr(block, ctypes.c_float),
                               _ptr(out, ctypes.c_uint16), block.size)
        return out
    return np.clip((block + 1.0) * 32767.5, 0, 65535).astype(np.uint16)

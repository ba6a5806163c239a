"""Native host-ops: C++ implementations must match the numpy fallbacks."""

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native hostops unavailable (no toolchain)")
    return lib


def test_accumulate_patch(lib, rng):
    c, sz, sy, sx = 3, 12, 10, 10
    pz, py, px = 4, 4, 4
    sum_a = rng.random((c, sz, sy, sx)).astype(np.float32)
    cnt_a = rng.random((sz, sy, sx)).astype(np.float32)
    sum_b, cnt_b = sum_a.copy(), cnt_a.copy()
    pred = rng.random((c, pz, py, px)).astype(np.float32)
    wmap = rng.random((pz, py, px)).astype(np.float32)

    native.accumulate_patch(sum_a, cnt_a, pred, wmap, 2, 3, 1)
    sum_b[:, 2:6, 3:7, 1:5] += pred
    cnt_b[2:6, 3:7, 1:5] += wmap
    np.testing.assert_allclose(sum_a, sum_b, rtol=1e-6)
    np.testing.assert_allclose(cnt_a, cnt_b, rtol=1e-6)


def test_finalize_average(lib, rng):
    s = rng.random((2, 6, 6, 6)).astype(np.float32)
    c = (rng.random((6, 6, 6)) * 3).astype(np.float32)
    c[0, 0, :] = 0.0
    s2 = s.copy()
    native.finalize_average(s, c)
    mask = c > 0
    for ch in range(2):
        s2[ch][mask] /= c[mask]
    np.testing.assert_allclose(s, s2, rtol=1e-5)


def test_renormalize_vectors(lib, rng):
    s = rng.standard_normal((3, 5, 5, 5)).astype(np.float32) * 7
    c = np.ones((5, 5, 5), np.float32)
    c[0, 0, 0] = 0.0
    orig = s.copy()
    native.renormalize_vectors(s, c)
    mag = np.sqrt((s[:, 1:] ** 2).sum(axis=0))
    np.testing.assert_allclose(mag, 1.0, atol=1e-5)
    np.testing.assert_array_equal(s[:, 0, 0, 0], orig[:, 0, 0, 0])


def test_quantize_roundtrip(lib, rng):
    x = rng.random((32, 32)).astype(np.float32)
    got = native.quantize_u8(x)
    want = np.clip(x * 255.0, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)

    v = rng.uniform(-1, 1, (32, 32)).astype(np.float32)
    got = native.encode_normals_u16(v)
    want = np.clip((v + 1.0) * 32767.5, 0, 65535).astype(np.uint16)
    # allow 1 ulp from float rounding differences
    assert np.max(np.abs(got.astype(np.int32) - want.astype(np.int32))) <= 1

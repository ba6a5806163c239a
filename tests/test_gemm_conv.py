"""GEMM conv reformulations (ops/gemm_conv.py) vs lax.conv_general_dilated:
forward and gradients must match exactly on every supported shape class."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mt3d_resenc_unet_tpu.ops.gemm_conv import (
    conv3d_im2col, conv3d_tapsum, im2col_supported, tapsum_supported)


def _ref(x, w, strides):
    return lax.conv_general_dilated(
        x, w, strides, tuple(((k - 1) // 2,) * 2 for k in w.shape[:3]),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


def _case(fn, shape, cin, cout, strides, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2,) + shape + (cin,)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.1)
    y = fn(x, w, strides)
    y_ref = _ref(x, w, strides)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)

    # gradient parity (dx and dW through autodiff)
    gy = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))

    def loss(f, x, w):
        return jnp.sum(f(x, w, strides) * gy)

    gx, gw = jax.grad(lambda x, w: loss(fn, x, w), argnums=(0, 1))(x, w)
    rx, rw = jax.grad(lambda x, w: loss(_ref, x, w), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-3)


def test_im2col_stem_stride1():
    _case(conv3d_im2col, (8, 10, 12), 1, 32, (1, 1, 1), 0)


def test_im2col_stride2():
    _case(conv3d_im2col, (8, 8, 8), 1, 16, (2, 2, 2), 1)


def test_tapsum_stride1():
    _case(conv3d_tapsum, (6, 6, 6), 8, 16, (1, 1, 1), 2)


def test_tapsum_stride2():
    _case(conv3d_tapsum, (8, 8, 8), 8, 16, (2, 2, 2), 3)


def test_dispatch_predicates():
    assert im2col_supported((1, 8, 8, 8, 1), (3, 3, 3, 1, 32))
    assert not im2col_supported((1, 8, 8, 8, 8), (3, 3, 3, 8, 32))
    assert tapsum_supported((1, 16, 16, 16, 256), (3, 3, 3, 256, 256))
    assert not tapsum_supported((1, 64, 64, 64, 256), (3, 3, 3, 256, 256))
    assert not tapsum_supported((1, 16, 16, 16, 128), (3, 3, 3, 128, 128))


def test_stem_group_packed():
    from mt3d_resenc_unet_tpu.ops.gemm_conv import conv3d_stem, stem_supported
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 16, 1)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 1, 32)).astype(np.float32) * 0.2)
    assert stem_supported(x.shape, w.shape)
    y = conv3d_stem(x, w)
    y_ref = _ref(x, w, (1, 1, 1))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    # dW parity through autodiff (dx is dead for the stem input)
    gy = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    gw = jax.grad(lambda w: jnp.sum(conv3d_stem(x, w) * gy))(w)
    rw = jax.grad(lambda w: jnp.sum(_ref(x, w, (1, 1, 1)) * gy))(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-3, atol=1e-3)


def test_stem_co16_and_64():
    from mt3d_resenc_unet_tpu.ops.gemm_conv import conv3d_stem, stem_supported
    rng = np.random.default_rng(5)
    for co in (16, 64):
        g = 128 // co
        x = jnp.asarray(
            rng.standard_normal((1, 4, 4, 2 * g, 1)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, 1, co)).astype(np.float32) * 0.2)
        assert stem_supported(x.shape, w.shape)
        np.testing.assert_allclose(
            np.asarray(conv3d_stem(x, w)),
            np.asarray(_ref(x, w, (1, 1, 1))), rtol=1e-4, atol=1e-4)


def test_stem_cf_matches_xla():
    from mt3d_resenc_unet_tpu.ops.gemm_conv import conv3d_stem_cf
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 16, 1)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 1, 32)).astype(np.float32) * 0.2)
    np.testing.assert_allclose(
        np.asarray(conv3d_stem_cf(x, w)),
        np.asarray(_ref(x, w, (1, 1, 1))), rtol=1e-4, atol=1e-4)
    gy = jnp.asarray(rng.standard_normal((2, 6, 8, 16, 32)).astype(np.float32))
    gw = jax.grad(lambda w: jnp.sum(conv3d_stem_cf(x, w) * gy))(w)
    rw = jax.grad(lambda w: jnp.sum(_ref(x, w, (1, 1, 1)) * gy))(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-3, atol=1e-3)
    # dx (dead in training but part of the custom VJP contract)
    gx = jax.grad(lambda x: jnp.sum(conv3d_stem_cf(x, w) * gy))(x)
    rx = jax.grad(lambda x: jnp.sum(_ref(x, w, (1, 1, 1)) * gy))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-3)
    # packed_out form: same dW through the packed cotangent path
    gyp = gy.reshape(2, 6, 8, 4, 128)
    gwp = jax.grad(lambda w: jnp.sum(
        conv3d_stem_cf(x, w, True) * gyp))(w)
    np.testing.assert_allclose(np.asarray(gwp), np.asarray(rw),
                               rtol=1e-3, atol=1e-3)


def test_stem_packed_out_and_convnormact_shape():
    """conv3d_stem_cf(packed_out=True) emits the x-packed layout, and
    ConvNormAct still returns the unpacked (N,D,H,W,C) shape with values
    equal to the unpacked path."""
    from mt3d_resenc_unet_tpu.ops.gemm_conv import conv3d_stem_cf
    from mt3d_resenc_unet_tpu.models.blocks import ConvNormAct
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 16, 1)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 1, 16)).astype(np.float32) * 0.2)
    yp = conv3d_stem_cf(x, w, packed_out=True)
    assert yp.shape == (2, 4, 6, 2, 128)
    y = conv3d_stem_cf(x, w)
    np.testing.assert_allclose(
        np.asarray(yp.reshape(2, 4, 6, 16, 16)), np.asarray(y),
        rtol=1e-5, atol=1e-5)

    mod = ConvNormAct(features=16, kernel=(3, 3, 3), stride=(1, 1, 1),
                      use_pallas=True, dtype=jnp.float32)
    params = mod.init({"params": jax.random.key(0)}, x)
    out = mod.apply(params, x)
    assert out.shape == (2, 4, 6, 16, 16)
    ref = ConvNormAct(features=16, kernel=(3, 3, 3), stride=(1, 1, 1),
                      use_pallas=False, dtype=jnp.float32).apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

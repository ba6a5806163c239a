"""Banded Pallas conv kernel: forward/dx/dW parity with lax.conv in
interpreter mode, packed-io variant, and model-level equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mt3d_resenc_unet_tpu.ops.pallas_conv import (
    _ref_conv,
    conv3d_auto,
    conv3d_packed,
    conv3d_small_c,
    is_supported,
)

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


CASES = [((2, 8, 8, 16, 32), 32, 32), ((1, 8, 8, 16, 64), 64, 32),
         ((1, 4, 4, 8, 128), 128, 32), ((2, 4, 6, 8, 64), 64, 64),
         ((1, 4, 6, 8, 128), 128, 64), ((1, 4, 4, 32, 16), 16, 16)]


@pytest.mark.parametrize("shape,ci,co", CASES)
def test_forward_parity(rng, shape, ci, co):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1)
    assert is_supported(x.shape, w.shape)
    got = conv3d_small_c(x, w)
    want = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,ci,co", CASES[:3])
def test_gradients_parity(rng, shape, ci, co):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.standard_normal(shape[:-1] + (co,)).astype(np.float32))
    dx, dw = jax.grad(lambda x, w: jnp.sum(conv3d_small_c(x, w) * g),
                      argnums=(0, 1))(x, w)
    dxr, dwr = jax.grad(lambda x, w: jnp.sum(_ref_conv(x, w) * g),
                        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dxr),
                               rtol=1e-4, atol=1e-4)
    scale = float(jnp.max(jnp.abs(dwr))) + 1e-8
    np.testing.assert_allclose(np.asarray(dw) / scale, np.asarray(dwr) / scale,
                               rtol=1e-4, atol=1e-5)


def test_packed_io_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)).astype(np.float32) * 0.1)
    g = 4
    xp = x.reshape(2, 8, 8, 4, 128)
    yp = conv3d_packed(xp, w, g)
    want = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(yp.reshape(want.shape)),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fused_stats_forward(rng):
    """conv3d_packed_stats: y matches the plain kernel; stats match XLA
    reductions of the output."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import conv3d_packed_stats

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)).astype(np.float32) * 0.1)
    g = 4
    xp = x.reshape(2, 8, 8, 4, 128)
    yp, st = conv3d_packed_stats(xp, w, g)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(conv3d_packed(xp, w, g)),
                               rtol=1e-4, atol=1e-4)
    yf = np.asarray(yp, np.float32)
    np.testing.assert_allclose(np.asarray(st[:, 0]), yf.sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, 1]), (yf * yf).sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)


def _norm_vecs(rng, n, gc):
    scale = jnp.asarray(rng.random((n, gc)).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.standard_normal((n, gc)).astype(np.float32) * 0.1)
    return scale, shift


def test_fused_pre_forward(rng):
    """conv3d_packed_ns == conv(leaky(x*scale - shift)) with zero padding
    applied AFTER the pre-op (same-padding semantics preserved)."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import conv3d_packed_ns

    neg = 1e-2
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)).astype(np.float32) * 0.1)
    g = 4
    scale, shift = _norm_vecs(rng, 2, 128)
    xp = x.reshape(2, 8, 8, 4, 128)
    yp, st = conv3d_packed_ns(xp, w, scale, shift, g, neg)

    u = xp * scale[:, None, None, None, :] - shift[:, None, None, None, :]
    xn = jnp.where(u >= 0, u, u * neg).reshape(x.shape)
    want = _ref_conv(xn, w)
    np.testing.assert_allclose(np.asarray(yp.reshape(want.shape)),
                               np.asarray(want), rtol=1e-4, atol=1e-4)
    yf = np.asarray(yp, np.float32)
    np.testing.assert_allclose(np.asarray(st[:, 0]), yf.sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)


def test_fused_pre_gradients(rng):
    """Gradients of the fused pre+conv+stats op vs the composed XLA
    reference, through a loss that uses BOTH outputs (y and stats)."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import conv3d_packed_ns

    neg = 1e-2
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)).astype(np.float32) * 0.1)
    g = 4
    scale, shift = _norm_vecs(rng, 2, 128)
    xp = x.reshape(2, 8, 8, 4, 128)
    gy = jnp.asarray(rng.standard_normal(xp.shape).astype(np.float32))
    gs = jnp.asarray(rng.standard_normal((2, 2, 128)).astype(np.float32) * 0.1)

    def loss_fused(xp, w, scale, shift):
        y, st = conv3d_packed_ns(xp, w, scale, shift, g, neg)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    def loss_ref(xp, w, scale, shift):
        u = xp * scale[:, None, None, None, :] - shift[:, None, None, None, :]
        xn = jnp.where(u >= 0, u, u * neg)
        y = _ref_conv(xn.reshape(2, 8, 8, 16, 32), w).reshape(xp.shape)
        st = jnp.stack([jnp.sum(y, (1, 2, 3)),
                        jnp.sum(y * y, (1, 2, 3))], axis=1)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xp, w, scale, shift)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xp, w, scale, shift)
    for a, b, name in zip(got, want, ("dx", "dw", "dscale", "dshift")):
        sc = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_fused_block_pipeline_matches_unfused(rng):
    """BasicBlockD's fused packed pipeline == the unfused packed path
    (same params: the fused path only reroutes where norms are computed)."""
    from mt3d_resenc_unet_tpu.models.blocks import BasicBlockD

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16, 32)).astype(np.float32))
    g = 4
    xp = x.reshape(2, 8, 8, 4, 128)
    blk = BasicBlockD(features=32, kernel=(3, 3, 3), stride=(1, 1, 1),
                      use_pallas=True, packed_g=g, dtype=jnp.float32)
    params = blk.init({"params": jax.random.key(0)}, xp, False)
    fused = blk.apply(params, xp, False)

    # reference: same params through explicit conv->norm->conv->norm+add
    from mt3d_resenc_unet_tpu.ops.instance_norm import (
        instance_norm_act_packed_io)
    k1 = params["params"]["conv1"]["conv"]["kernel"]
    k2 = params["params"]["conv2"]["conv"]["kernel"]
    y1 = conv3d_packed(xp, k1, g)
    y1 = instance_norm_act_packed_io(y1, g, None, None, 1e-5, 1e-2, True)
    y2 = conv3d_packed(y1, k2, g)
    want = instance_norm_act_packed_io(y2, g, None, None, 1e-5, 1e-2, True,
                                       residual=xp)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_dual_stats_matches_sum(rng):
    """conv3d_packed_dual_stats == conv(x1,w1)+conv(x2,w2) with stats of the
    SUM, and its gradients match the composed reference."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import conv3d_packed_dual_stats

    g = 4
    x1 = jnp.asarray(
        rng.standard_normal((2, 8, 8, 4, 128)).astype(np.float32))
    x2 = jnp.asarray(
        rng.standard_normal((2, 8, 8, 4, 128)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 64, 32)).astype(np.float32) * 0.1)
    y, st = conv3d_packed_dual_stats(x1, x2, w, g)
    want = (conv3d_packed(x1, w[..., :32, :], g)
            + conv3d_packed(x2, w[..., 32:, :], g))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    yf = np.asarray(want, np.float32)
    np.testing.assert_allclose(np.asarray(st[:, 0]), yf.sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, 1]), (yf * yf).sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)

    gy = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    gs = jnp.asarray(rng.standard_normal((2, 2, 128)).astype(np.float32) * .1)

    def loss_fused(x1, x2, w):
        y, st = conv3d_packed_dual_stats(x1, x2, w, g)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    def loss_ref(x1, x2, w):
        y = (conv3d_packed(x1, w[..., :32, :], g)
             + conv3d_packed(x2, w[..., 32:, :], g))
        st = jnp.stack([jnp.sum(y, (1, 2, 3)),
                        jnp.sum(y * y, (1, 2, 3))], axis=1)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    got = jax.grad(loss_fused, (0, 1, 2))(x1, x2, w)
    want_g = jax.grad(loss_ref, (0, 1, 2))(x1, x2, w)
    for a, b, name in zip(got, want_g, ("dx1", "dx2", "dw")):
        sc = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_dense_g1_big_channels(rng):
    """The g=1 class: deep-stage convs (C >= 256) run as ONE kernel with
    dense per-tap GEMMs (zero structural-zero FLOPs) instead of XLA's
    ~2000-dispatch tapsum swarm. Forward + both gradients vs XLA."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import (conv3d_small_c,
                                                      is_supported)

    x = jnp.asarray(
        rng.standard_normal((1, 4, 4, 8, 256)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 256, 256)).astype(np.float32) * 0.05)
    assert is_supported(x.shape, w.shape)
    y = conv3d_small_c(x, w)
    want = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    gy = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    gx, gw = jax.grad(
        lambda x, w: jnp.sum(conv3d_small_c(x, w) * gy), (0, 1))(x, w)
    rx, rw = jax.grad(
        lambda x, w: jnp.sum(_ref_conv(x, w) * gy), (0, 1))(x, w)
    for a, b, name in ((gx, rx, "dx"), (gw, rw, "dw")):
        sc = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_dense_g1_mixed_channels(rng):
    """ci != co within the g=1 class (decoder split halves, transitions)."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import (conv3d_small_c,
                                                      is_supported)

    x = jnp.asarray(
        rng.standard_normal((1, 4, 4, 4, 128)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 128, 256)).astype(np.float32) * 0.05)
    assert is_supported(x.shape, w.shape)
    np.testing.assert_allclose(np.asarray(conv3d_small_c(x, w)),
                               np.asarray(_ref_conv(x, w)),
                               rtol=2e-4, atol=2e-4)
    gy = jnp.asarray(
        rng.standard_normal((1, 4, 4, 4, 256)).astype(np.float32))
    gw = jax.grad(lambda w: jnp.sum(conv3d_small_c(x, w) * gy))(w)
    rw = jax.grad(lambda w: jnp.sum(_ref_conv(x, w) * gy))(w)
    sc = float(jnp.max(jnp.abs(rw))) + 1e-8
    np.testing.assert_allclose(np.asarray(gw) / sc, np.asarray(rw) / sc,
                               rtol=2e-3, atol=2e-4)


def test_unsupported_shapes_fall_back(rng):
    # kernel 1x1x1 -> not supported, dispatch goes to XLA
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 32)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((1, 1, 1, 32, 32)).astype(np.float32))
    assert not is_supported(x.shape, w1.shape)
    # co = 128 -> unsupported
    w128 = np.zeros((3, 3, 3, 32, 128), np.float32)
    assert not is_supported(x.shape, w128.shape)
    # conv3d_auto runs either way
    y = conv3d_auto(x, jnp.asarray(np.random.default_rng(0)
                                   .standard_normal((3, 3, 3, 32, 32))
                                   .astype(np.float32)))
    assert y.shape == x.shape


def test_model_packed_path_matches_xla(rng):
    """Full model with use_pallas_conv must equal the XLA model (remat off:
    interpret-mode pallas cannot run under jax.checkpoint)."""
    from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_autoconfig
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    import jax.tree_util as jtu

    plan_x = plan_from_autoconfig(
        (16, 16, 16), 1, [TaskHead("sheet", 1, "sigmoid")],
        base_features=16, max_features=32, remat=False)
    plan_p = type(plan_x)(**{**plan_x.__dict__, "use_pallas_conv": True})
    mx = ResEncUNet(plan=plan_x, dtype=jnp.float32)
    mp = ResEncUNet(plan=plan_p, dtype=jnp.float32)
    x = jnp.asarray(rng.random((1, 16, 16, 16, 1), np.float32))
    px = mx.init({"params": jax.random.key(0)}, x, train=False)
    pp = mp.init({"params": jax.random.key(0)}, x, train=False)
    assert jtu.tree_structure(px) == jtu.tree_structure(pp)
    ox = mx.apply(px, x, train=False)["sheet"]
    op = mp.apply(px, x, train=False)["sheet"]
    np.testing.assert_allclose(np.asarray(ox), np.asarray(op),
                               rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------
# stride-2 banded kernel (downsampling convs)
# ----------------------------------------------------------------------

S2_CASES = [
    ((2, 8, 8, 16, 32), 32, 64),    # g_out=2: the 32->64 downsample class
    ((1, 8, 12, 8, 64), 64, 128),   # g_out=1: the 64->128 class
    ((1, 4, 4, 32, 16), 16, 32),    # g_out=4
]


def _ref_s2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@pytest.mark.parametrize("x_shape,ci,co", S2_CASES)
def test_s2_forward_matches_xla(x_shape, ci, co):
    from mt3d_resenc_unet_tpu.ops.pallas_conv import conv3d_s2, s2_supported
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.2)
    assert s2_supported(x.shape, w.shape)
    y = conv3d_s2(x, w)
    y_ref = _ref_s2(x, w)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("x_shape,ci,co", S2_CASES)
def test_s2_gradients_match_xla(x_shape, ci, co):
    from mt3d_resenc_unet_tpu.ops.pallas_conv import conv3d_s2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(x_shape).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.2)
    gy = jnp.asarray(rng.standard_normal(
        (x_shape[0], x_shape[1] // 2, x_shape[2] // 2, x_shape[3] // 2, co)
    ).astype(np.float32))

    def loss(f, x, w):
        return jnp.sum(f(x, w) * gy)

    gx, gw = jax.grad(lambda x, w: loss(conv3d_s2, x, w), (0, 1))(x, w)
    rx, rw = jax.grad(lambda x, w: loss(_ref_s2, x, w), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-3, atol=2e-3)


# ----------------------------------------------------------------------
# round-2 packed helpers: pool+proj GEMM, packed dual conv
# ----------------------------------------------------------------------

def test_pool_proj_packed_matches_avgpool_conv():
    """_pool_proj's packed GEMM path == AvgPool(2) then 1x1 projection."""
    from mt3d_resenc_unet_tpu.models.blocks import _pool_proj
    from flax import linen as fnn
    rng = np.random.default_rng(11)
    for ci, co in ((32, 64), (64, 128)):
        x = jnp.asarray(
            rng.standard_normal((2, 4, 6, 128 // (128 // ci) * 2, ci))
            .astype(np.float32))
        k = jnp.asarray(
            rng.standard_normal((1, 1, 1, ci, co)).astype(np.float32) * 0.2)
        y = _pool_proj(x, k, (2, 2, 2), jnp.float32)
        pooled = fnn.avg_pool(x, (2, 2, 2), (2, 2, 2), padding="VALID")
        ref = jnp.dot(pooled, k.reshape(ci, co))
        assert y.shape == ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_pool_proj_generic_fallback():
    """Unpackable channel counts route through the tiled-kernel conv."""
    from mt3d_resenc_unet_tpu.models.blocks import _pool_proj
    from flax import linen as fnn
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 24)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((1, 1, 1, 24, 48)).astype(np.float32) * 0.2)
    y = _pool_proj(x, k, (2, 2, 2), jnp.float32)
    pooled = fnn.avg_pool(x, (2, 2, 2), (2, 2, 2), padding="VALID")
    ref = jnp.dot(pooled, k.reshape(24, 48))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_packed_dual_conv_matches_concat():
    """Conv(packed_g) with an x2 pair == conv of the channel concat."""
    from mt3d_resenc_unet_tpu.models.blocks import Conv
    rng = np.random.default_rng(13)
    c = 32
    g = 128 // c
    x1 = jnp.asarray(
        rng.standard_normal((1, 6, 6, 16, c)).astype(np.float32))
    x2 = jnp.asarray(
        rng.standard_normal((1, 6, 6, 16, c)).astype(np.float32))
    mod = Conv(features=c, kernel_size=(3, 3, 3), strides=(1, 1, 1),
               padding=((1, 1),) * 3, use_pallas=True, packed_g=g,
               dtype=jnp.float32)
    xp1 = x1.reshape(1, 6, 6, 16 // g, g * c)
    xp2 = x2.reshape(1, 6, 6, 16 // g, g * c)
    params = mod.init({"params": jax.random.key(0)}, xp1, xp2)
    yp = mod.apply(params, xp1, xp2)
    y = np.asarray(yp).reshape(1, 6, 6, 16, c)
    ref = _ref_conv_np(
        np.concatenate([np.asarray(x1), np.asarray(x2)], axis=-1),
        np.asarray(params["params"]["kernel"]))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def _ref_conv_np(x, w):
    return np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32))


def test_flat_layout_fused_paths(rng):
    """Flat (H*W/g-flattened) tile layout: active when wg %% sublane == 0
    (here W=32, g=4 -> wg=8, fp32). Covers plain/stats/pre/dual + grads
    against the reference conv (the W=16 tests above cover the 5-D
    fallback)."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import (
        _flat_env, conv3d_packed_dual_stats, conv3d_packed_stats,
        conv3d_packed_ns)
    assert _flat_env()

    g = 4
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 32, 32)).astype(np.float32))
    xp = x.reshape(1, 4, 4, 8, 128)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 32, 32)).astype(np.float32) * 0.1)

    want = _ref_conv(x, w).reshape(xp.shape)
    yp, st = conv3d_packed_stats(xp, w, g)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    yf = np.asarray(want, np.float32)
    np.testing.assert_allclose(np.asarray(st[:, 0]), yf.sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, 1]), (yf * yf).sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)

    # pre-op (scale/shift + LeakyReLU applied in-kernel) + gradients
    scale = jnp.asarray(rng.random((1, 128)).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32) * .1)
    gy = jnp.asarray(rng.standard_normal(xp.shape).astype(np.float32))
    gs = jnp.asarray(rng.standard_normal((1, 2, 128)).astype(np.float32) * .1)

    def loss_fused(xp, w, scale, shift):
        y, st = conv3d_packed_ns(xp, w, scale, shift, g, 1e-2)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    def loss_ref(xp, w, scale, shift):
        xn = xp * scale[:, None, None, None, :] \
            - shift[:, None, None, None, :]
        xn = jnp.where(xn >= 0, xn, xn * 1e-2)
        y = _ref_conv(xn.reshape(x.shape), w).reshape(xp.shape)
        st = jnp.stack([jnp.sum(y, (1, 2, 3)),
                        jnp.sum(y * y, (1, 2, 3))], axis=1)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    np.testing.assert_allclose(loss_fused(xp, w, scale, shift),
                               loss_ref(xp, w, scale, shift), rtol=1e-3)
    got = jax.grad(loss_fused, (0, 1, 2, 3))(xp, w, scale, shift)
    want_g = jax.grad(loss_ref, (0, 1, 2, 3))(xp, w, scale, shift)
    for a, b, name in zip(got, want_g, ("dx", "dw", "dscale", "dshift")):
        sc = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   rtol=2e-3, atol=2e-4, err_msg=name)

    # dual (split-weight concat) on the flat layout
    x2 = jnp.asarray(
        rng.standard_normal((1, 4, 4, 8, 128)).astype(np.float32))
    w2 = jnp.asarray(
        rng.standard_normal((3, 3, 3, 64, 32)).astype(np.float32) * 0.1)
    y, st = conv3d_packed_dual_stats(xp, x2, w2, g)
    want2 = (conv3d_packed(xp, w2[..., :32, :], g)
             + conv3d_packed(x2, w2[..., 32:, :], g))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want2),
                               rtol=1e-4, atol=1e-4)


def test_flat_fused_backward_paths(rng):
    """The flat-eligible backward paths run the corrected-cotangent +
    pre-op-backward fusions entirely in-kernel (_conv3d_dx_fused_f, dW
    corr); gradients must match the composed references for all three
    stats-emitting ops."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import (
        _flat_eligible, conv3d_packed_dual_stats, conv3d_packed_stats)

    g = 4
    xp = jnp.asarray(
        rng.standard_normal((1, 4, 4, 8, 128)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 32, 32)).astype(np.float32) * 0.1)
    assert _flat_eligible(8, g, xp.dtype)
    gy = jnp.asarray(rng.standard_normal(xp.shape).astype(np.float32))
    gs = jnp.asarray(rng.standard_normal((1, 2, 128)).astype(np.float32) * .1)

    def loss_f(xp, w):
        y, st = conv3d_packed_stats(xp, w, g)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    def loss_r(xp, w):
        y = conv3d_packed(xp, w, g)
        st = jnp.stack([jnp.sum(y, (1, 2, 3)),
                        jnp.sum(y * y, (1, 2, 3))], axis=1)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    for a, b, name in zip(jax.grad(loss_f, (0, 1))(xp, w),
                          jax.grad(loss_r, (0, 1))(xp, w), ("dx", "dw")):
        sc = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   rtol=2e-3, atol=2e-4, err_msg=name)

    x2 = jnp.asarray(rng.standard_normal(xp.shape).astype(np.float32))
    w2 = jnp.asarray(
        rng.standard_normal((3, 3, 3, 64, 32)).astype(np.float32) * 0.1)

    def loss_f3(x1, x2, w):
        y, st = conv3d_packed_dual_stats(x1, x2, w, g)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    def loss_r3(x1, x2, w):
        y = (conv3d_packed(x1, w[..., :32, :], g)
             + conv3d_packed(x2, w[..., 32:, :], g))
        st = jnp.stack([jnp.sum(y, (1, 2, 3)),
                        jnp.sum(y * y, (1, 2, 3))], axis=1)
        return jnp.sum(y * gy) + jnp.sum(st * gs)

    for a, b, name in zip(jax.grad(loss_f3, (0, 1, 2))(xp, x2, w2),
                          jax.grad(loss_r3, (0, 1, 2))(xp, x2, w2),
                          ("dx1", "dx2", "dw")):
        sc = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_fused_stats_g1_sample_batched(rng):
    """Deep-stage g=1 class: fused stats with sample-batched whole-plane
    tiles (bn > 1) matches XLA reductions; fused pre-op matches the
    composed reference (the 256/512-channel stages' fused chain)."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import (
        conv3d_packed_ns, conv3d_packed_stats)

    c = 256
    x = jnp.asarray(rng.standard_normal((4, 4, 4, 4, c)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, c, c)).astype(np.float32) * 0.05)
    yp, st = conv3d_packed_stats(x, w, 1)
    want = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    yf = np.asarray(yp, np.float32)
    np.testing.assert_allclose(np.asarray(st[:, 0]), yf.sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st[:, 1]), (yf * yf).sum((1, 2, 3)),
                               rtol=1e-3, atol=1e-3)

    neg = 1e-2
    scale = jnp.asarray(rng.random((4, c)).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.standard_normal((4, c)).astype(np.float32) * 0.1)
    yp2, st2 = conv3d_packed_ns(x, w, scale, shift, 1, neg)
    u = x * scale[:, None, None, None, :] - shift[:, None, None, None, :]
    xn = jnp.where(u >= 0, u, u * neg)
    want2 = _ref_conv(xn, w)
    np.testing.assert_allclose(np.asarray(yp2), np.asarray(want2),
                               rtol=1e-4, atol=1e-4)


def test_fused_pre_gradients_g1(rng):
    """Gradient parity for the g=1 fused pre+conv+stats op (deep stages)."""
    from mt3d_resenc_unet_tpu.ops.pallas_conv import conv3d_packed_ns

    c = 256
    neg = 1e-2
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, c)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, c, c)).astype(np.float32) * 0.05)
    scale = jnp.asarray(rng.random((2, c)).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.standard_normal((2, 4, 4, 4, c)).astype(np.float32))

    def loss_fused(x, w, scale, shift):
        y, st = conv3d_packed_ns(x, w, scale, shift, 1, neg)
        return (jnp.sum((y.astype(jnp.float32) - t) ** 2)
                + jnp.sum(st[:, 0] * 0.5) + jnp.sum(st[:, 1] * 0.25))

    def loss_ref(x, w, scale, shift):
        u = (x * scale[:, None, None, None, :]
             - shift[:, None, None, None, :])
        xn = jnp.where(u >= 0, u, u * neg)
        y = _ref_conv(xn, w).astype(jnp.float32)
        st0 = y.sum((1, 2, 3))
        st1 = (y * y).sum((1, 2, 3))
        return (jnp.sum((y - t) ** 2)
                + jnp.sum(st0 * 0.5) + jnp.sum(st1 * 0.25))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_entry_block_fusion_matches_plain(rng):
    """Strided entry-block fusion (conv1 stats -> conv2 pre-op -> fused
    tail) == the plain ConvNormAct composition with identical params."""
    from mt3d_resenc_unet_tpu.models.blocks import BasicBlockD

    for c, e in [(64, 8), (256, 8)]:
        x = jnp.asarray(
            rng.standard_normal((1, e, e, 2 * e, c // 2)).astype(np.float32))
        kw = dict(features=c, kernel=(3, 3, 3), stride=(2, 2, 2),
                  dtype=jnp.float32)
        m0 = BasicBlockD(use_pallas=False, **kw)
        m1 = BasicBlockD(use_pallas=True, **kw)
        params = m0.init(jax.random.key(0), x)
        y0 = m0.apply(params, x)
        y1 = m1.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"C={c}")

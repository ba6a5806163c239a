"""Fused 2x upsample kernel (ops/pallas_upsample.py): forward/backward
parity with the XLA GEMM + stack + transpose formulation, in interpreter
mode, plus UpsampleConv model-level equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mt3d_resenc_unet_tpu.models.network import UpsampleConv
from mt3d_resenc_unet_tpu.ops.pallas_upsample import (
    upsample2x_packed, upsample2x_supported)

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _xla_ref(xp, wb):
    n, d, h, wg, _ = xp.shape
    ys = [jnp.dot(xp, wb[di, dj], preferred_element_type=jnp.float32)
          for di in range(2) for dj in range(2)]
    y = jnp.stack(ys, axis=0).reshape(2, 2, n, d, h, wg, 128)
    y = y.transpose(2, 3, 0, 4, 1, 5, 6)       # (N, D, di, H, dj, Wg, L)
    return y.astype(xp.dtype)


def test_forward_parity(rng):
    xp = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 128)), jnp.float32)
    wb = jnp.asarray(rng.standard_normal((2, 2, 128, 128)) * 0.1,
                     jnp.float32)
    got = upsample2x_packed(xp, wb)
    want = _xla_ref(xp, wb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_grads_match_xla(rng):
    xp = jnp.asarray(rng.standard_normal((1, 2, 4, 8, 128)), jnp.float32)
    wb = jnp.asarray(rng.standard_normal((2, 2, 128, 128)) * 0.1,
                     jnp.float32)
    t = jnp.asarray(rng.standard_normal((1, 2, 2, 4, 2, 8, 128)),
                    jnp.float32)

    def loss_kernel(xp, wb):
        return jnp.sum((upsample2x_packed(xp, wb).astype(jnp.float32) - t)
                       ** 2)

    def loss_ref(xp, wb):
        return jnp.sum((_xla_ref(xp, wb).astype(jnp.float32) - t) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1))(xp, wb)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(xp, wb)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_upsample_conv_pallas_path_matches_xla_path(rng):
    """Model-level: UpsampleConv(use_pallas=True) == use_pallas=False with
    identical parameters (the decoder's 2x transposed conv,
    reference: builders/decoder.py:76-79)."""
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 64)), jnp.float32)
    m0 = UpsampleConv(features=32, kernel_size=(2, 2, 2), use_pallas=False,
                      dtype=jnp.float32)
    m1 = UpsampleConv(features=32, kernel_size=(2, 2, 2), use_pallas=True,
                      dtype=jnp.float32)
    params = m0.init(jax.random.key(0), x)
    y0 = m0.apply(params, x)
    y1 = m1.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)


def test_supported_predicate():
    assert upsample2x_supported((1, 4, 4, 8, 64), 64, 32)
    assert upsample2x_supported((1, 4, 4, 8, 128), 128, 64)
    assert not upsample2x_supported((1, 4, 4, 8, 256), 256, 128)  # g_o < 2
    assert not upsample2x_supported((1, 4, 4, 8, 32), 32, 32)  # qn*ci != 128

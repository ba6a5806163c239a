"""Pallas fused instance-norm kernel vs the XLA reference implementation —
forward and gradients, run in interpreter mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mt3d_resenc_unet_tpu.ops.instance_norm import instance_norm_act

pytestmark = pytest.mark.slow



@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("act", [True, False])
def test_forward_matches_xla(rng, act):
    from mt3d_resenc_unet_tpu.ops.pallas_norm_act import instance_norm_act_pallas

    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8, 16)).astype(np.float32))
    got = instance_norm_act_pallas(x, act=act)
    want = instance_norm_act(x, act=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_forward_with_affine(rng):
    from mt3d_resenc_unet_tpu.ops.pallas_norm_act import instance_norm_act_pallas

    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 8)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    got = instance_norm_act_pallas(x, scale, bias, act=True)
    want = instance_norm_act(x, scale, bias, act=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gradient_matches_xla(rng):
    from mt3d_resenc_unet_tpu.ops.pallas_norm_act import instance_norm_act_pallas

    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8, 16)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, 4, 4, 8, 16)).astype(np.float32))

    def f_pallas(x):
        return jnp.sum(instance_norm_act_pallas(x, act=True) * g)

    def f_xla(x):
        return jnp.sum(instance_norm_act(x, act=True) * g)

    gp = jax.grad(f_pallas)(x)
    gx = jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-3, atol=1e-4)

"""Instance normalization for NDHWC volumes.

The reference normalizes every conv output with ``nn.InstanceNorm3d(
affine=False, eps=1e-5)`` (reference: builders/build_network_from_config.py:172,
simple_conv_blocks.py:58-59). On TPU the op is bandwidth-bound: per (sample,
channel) statistics over D*H*W voxels. We compute statistics in fp32 even when
activations are bf16 (matching torch's fp32 accumulation under AMP) and let
XLA fuse the normalize+activation epilogue into the surrounding convolution.

A Pallas kernel (`ops/pallas_norm_act.py`) provides a fused
norm+LeakyReLU path for cases where XLA's fusion falls short.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("eps", "negative_slope", "act"))
def instance_norm_act(
    x: jax.Array,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
    negative_slope: float = 1e-2,
    act: bool = True,
) -> jax.Array:
    """Normalize over all spatial axes per (batch, channel), then LeakyReLU.

    Args:
      x: (N, *spatial, C) array, any float dtype.
      scale/bias: optional (C,) affine parameters.
      act: apply LeakyReLU(negative_slope) after normalizing.
    """
    return _instance_norm_act_impl(x, scale, bias, eps, negative_slope, act)


def _instance_norm_act_impl(x, scale, bias, eps, negative_slope, act):
    spatial_axes = tuple(range(1, x.ndim - 1))
    # statistics in fp32 (XLA fuses the bf16->f32 convert into the
    # reduction, so no f32 copy of the activation is materialized)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=spatial_axes, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=spatial_axes, keepdims=True) \
        - jnp.square(mean)
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    # normalize in the compute dtype: the per-(n,c) scalars are tiny, and
    # keeping the elementwise math in bf16 halves the HBM traffic of the
    # epilogue (measured ~16% step-time win on v5e at 64^3)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    if scale is not None:
        y = y * scale.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    if act:
        y = jnp.where(y >= 0, y, y * negative_slope)
    return y

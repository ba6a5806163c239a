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


def pack_group(c: int, w: int) -> Optional[int]:
    """x-packing factor g so that g*C fills 128 lanes; None when the shape
    cannot pack. Tensors whose minor dim is a small C are stored lane-padded
    4x/2x by XLA; viewing them as (..., W/g, g*C) makes every elementwise and
    reduction pass move only real bytes."""
    if c in (16, 32, 64) and c < 128:
        g = 128 // c
        if w % g == 0 and w // g >= 1:
            return g
    return None


def instance_norm_act_packed_io(xp, g: int, scale, bias, eps,
                                negative_slope, act, residual=None):
    """Instance norm (+ LeakyReLU, + optional pre-activation residual add)
    on an ALREADY-PACKED (N, D, H, W/g, g*C) tensor, returning packed.

    The packed minor dim is 128-wide, so the stats reduction and the
    normalize/add/act passes avoid XLA's 4x lane padding. Statistics fold
    the g packed x-positions back per channel."""
    n, d, h, wg, gc = xp.shape
    c = gc // g
    xf = xp.astype(jnp.float32)
    s = jnp.sum(xf, axis=(1, 2, 3))                  # (N, g*C)
    ss = jnp.sum(jnp.square(xf), axis=(1, 2, 3))
    count = d * h * wg * g
    mean = s.reshape(n, g, c).sum(axis=1) / count    # (N, C)
    ex2 = ss.reshape(n, g, c).sum(axis=1) / count
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    if scale is not None:
        inv = inv * scale.astype(jnp.float32)
    shift = mean * inv
    if bias is not None:
        shift = shift - bias.astype(jnp.float32)
    # tile per-channel scalars across the g packed positions
    inv_t = jnp.tile(inv, (1, g)).astype(xp.dtype)[:, None, None, None, :]
    shift_t = jnp.tile(shift, (1, g)).astype(xp.dtype)[:, None, None, None, :]
    y = xp * inv_t - shift_t
    if residual is not None:
        y = y + residual.reshape(xp.shape)
    if act:
        y = jnp.where(y >= 0, y, y * negative_slope)
    return y


def stats_to_scale_shift(stats, g: int, count: int, eps: float,
                         scale=None, bias=None):
    """Kernel-emitted packed stats (N, 2, g*C) fp32 [sum; sumsq] ->
    per-lane normalization vectors (inv, mean*inv), each (N, g*C) fp32,
    such that ``x * inv - shift`` is the instance-normalized tensor
    (optionally folding an affine scale/bias). Tiny (N, C) math — stays in
    XLA so gradients flow through the statistics chain."""
    n, _, gc = stats.shape
    c = gc // g
    s = stats[:, 0].reshape(n, g, c).sum(axis=1)
    ss = stats[:, 1].reshape(n, g, c).sum(axis=1)
    mean = s / count
    var = jnp.maximum(ss / count - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    if scale is not None:
        inv = inv * scale.astype(jnp.float32)
    shift = mean * inv
    if bias is not None:
        shift = shift - bias.astype(jnp.float32)
    return jnp.tile(inv, (1, g)), jnp.tile(shift, (1, g))


def packed_stats_xla(xp) -> jax.Array:
    """(N, D, H, W/g, g*C) -> (N, 2, g*C) fp32 [sum; sumsq] — the same
    statistics the fused conv kernels emit, for producers that cannot
    (e.g. the split-weight decoder pair, whose sum's sumsq is not the sum
    of the halves' sumsqs)."""
    xf = xp.astype(jnp.float32)
    return jnp.stack([jnp.sum(xf, axis=(1, 2, 3)),
                      jnp.sum(jnp.square(xf), axis=(1, 2, 3))], axis=1)


def norm_apply_packed(xp, inv, shift, negative_slope, act,
                      residual=None, residual_pre=None):
    """Elementwise ``leaky((xp * inv - shift) [+ residual])`` on a packed
    tensor with PRECOMPUTED per-lane vectors (N, g*C) — the residual-block
    tail pass of the fused pipeline (one read+write instead of stats +
    apply).

    ``residual_pre``: optional (scale, shift) pair applied to the residual
    on the fly — ``residual = leaky(residual * scale - shift)`` — for the
    stem handoff, where the block input is the RAW stem conv output and
    the true (reference-semantics) residual is its normalized form. One
    fused pass instead of materializing the normed stem tensor."""
    inv_t = inv.astype(xp.dtype)[:, None, None, None, :]
    shift_t = shift.astype(xp.dtype)[:, None, None, None, :]
    y = xp * inv_t - shift_t
    if residual is not None:
        if residual_pre is not None:
            ra, rb = residual_pre
            r = (residual * ra.astype(residual.dtype)[:, None, None, None, :]
                 - rb.astype(residual.dtype)[:, None, None, None, :])
            residual = jnp.where(r >= 0, r, r * negative_slope)
        y = y + residual
    if act:
        y = jnp.where(y >= 0, y, y * negative_slope)
    return y


def instance_norm_act_packed(x, scale, bias, eps, negative_slope, act,
                             residual=None, g: Optional[int] = None):
    """Same as :func:`instance_norm_act_packed_io` for an unpacked
    (N, *spatial, C) tensor (packs/unpacks at the edges; adjacent reshapes
    cancel in XLA when producer/consumer also use the packed view). 2-D
    inputs use the plain implementation."""
    if x.ndim != 5:
        y = _instance_norm_act_impl(x, scale, bias, eps, negative_slope,
                                    False)
        if residual is not None:
            y = y + residual
        if act:
            y = jnp.where(y >= 0, y, y * negative_slope)
        return y
    n, d, h, w, c = x.shape
    if g is None:
        g = pack_group(c, w)
    if g is None or g == 1:
        y = _instance_norm_act_impl(x, scale, bias, eps, negative_slope,
                                    False)
        if residual is not None:
            y = y + residual
        if act:
            y = jnp.where(y >= 0, y, y * negative_slope)
        return y
    xp = x.reshape(n, d, h, w // g, g * c)
    y = instance_norm_act_packed_io(xp, g, scale, bias, eps, negative_slope,
                                    act, residual=residual)
    return y.reshape(x.shape)


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

"""Pallas TPU kernel: fused InstanceNorm + LeakyReLU with custom VJP.

The instance-norm epilogue after every conv is the framework's most
bandwidth-sensitive elementwise op (SURVEY.md §7.3.2): per-(sample, channel)
statistics over D*H*W voxels, then a normalize+activation pass. This kernel
streams the volume through VMEM exactly twice in forward (stats pass +
normalize pass, the information-theoretic minimum for exact two-pass
normalization) with fp32 accumulators in VMEM scratch, and twice in backward
(gradient-statistics pass + elementwise pass), saving only (x, mean, inv)
as residuals — no fp32 copy of the activation is ever materialized.

Usable through ``instance_norm_act_pallas(x, ...)`` on (N, *spatial, C)
arrays; falls back to the XLA implementation on non-TPU backends. The XLA
path remains the default (ops/instance_norm.py); benchmarks select
whichever is faster for the shape.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(s: int, target: int = 2048) -> int:
    """Largest divisor of s that is <= target (spatial sizes here are
    products of powers of two)."""
    blk = min(s, target)
    while s % blk:
        blk -= 1
    return blk


# ----------------------------------------------------------------------
# forward kernels
# ----------------------------------------------------------------------

def _stats_kernel(x_ref, out_ref, acc_ref, *, s_total: int, eps: float):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[0].astype(jnp.float32)          # (S_blk, C)
    acc_ref[0, :] += jnp.sum(xb, axis=0)
    acc_ref[1, :] += jnp.sum(xb * xb, axis=0)

    @pl.when(s == pl.num_programs(1) - 1)
    def _():
        inv_n = 1.0 / s_total
        mean = acc_ref[0, :] * inv_n
        var = acc_ref[1, :] * inv_n - mean * mean
        out_ref[0, 0, :] = mean
        out_ref[0, 1, :] = lax.rsqrt(jnp.maximum(var, 0.0) + eps)


def _norm_kernel(x_ref, stats_ref, y_ref, *, negative_slope: float,
                 act: bool):
    x = x_ref[0]
    mean = stats_ref[0, 0, :].astype(x.dtype)
    inv = stats_ref[0, 1, :].astype(x.dtype)
    y = (x - mean[None, :]) * inv[None, :]
    if act:
        y = jnp.where(y >= 0, y, y * negative_slope)
    y_ref[0] = y


def _forward(x2, eps, negative_slope, act):
    """x2: (N, S, C) -> (y, mean, inv)."""
    n, s, c = x2.shape
    blk = _pick_block(s)
    grid = (n, s // blk)

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, s_total=s, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
    )(x2)

    y = pl.pallas_call(
        functools.partial(_norm_kernel, negative_slope=negative_slope,
                          act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    )(x2, stats)
    return y, stats


# ----------------------------------------------------------------------
# backward kernels
# ----------------------------------------------------------------------

def _bwd_stats_kernel(x_ref, stats_ref, g_ref, out_ref, acc_ref, *,
                      negative_slope: float, act: bool):
    """Accumulate sum(g') and sum(g' * xhat) per channel, where g' is the
    cotangent after the LeakyReLU backward."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mean = stats_ref[0, 0, :]
    inv = stats_ref[0, 1, :]
    xhat = (x - mean[None, :]) * inv[None, :]
    if act:
        g = jnp.where(xhat >= 0, g, g * negative_slope)
    acc_ref[0, :] += jnp.sum(g, axis=0)
    acc_ref[1, :] += jnp.sum(g * xhat, axis=0)

    @pl.when(s == pl.num_programs(1) - 1)
    def _():
        out_ref[0, 0, :] = acc_ref[0, :]
        out_ref[0, 1, :] = acc_ref[1, :]


def _bwd_dx_kernel(x_ref, stats_ref, gsums_ref, g_ref, dx_ref, *,
                   s_total: int, negative_slope: float, act: bool):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mean = stats_ref[0, 0, :]
    inv = stats_ref[0, 1, :]
    xhat = (x - mean[None, :]) * inv[None, :]
    if act:
        g = jnp.where(xhat >= 0, g, g * negative_slope)
    inv_n = 1.0 / s_total
    mg = gsums_ref[0, 0, :] * inv_n
    mgx = gsums_ref[0, 1, :] * inv_n
    dx = inv[None, :] * (g - mg[None, :] - xhat * mgx[None, :])
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _backward(x2, stats, g2, eps, negative_slope, act):
    n, s, c = x2.shape
    blk = _pick_block(s)
    grid = (n, s // blk)

    gsums = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, negative_slope=negative_slope,
                          act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
    )(x2, stats, g2)

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, s_total=s,
                          negative_slope=negative_slope, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    )(x2, stats, gsums, g2)
    return dx


# ----------------------------------------------------------------------
# public op
# ----------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _norm_act_2d(x2, eps, negative_slope, act):
    y, _ = _forward(x2, eps, negative_slope, act)
    return y


def _norm_act_fwd(x2, eps, negative_slope, act):
    y, stats = _forward(x2, eps, negative_slope, act)
    return y, (x2, stats)


def _norm_act_bwd(eps, negative_slope, act, res, g):
    x2, stats = res
    dx = _backward(x2, stats, g, eps, negative_slope, act)
    return (dx,)


_norm_act_2d.defvjp(_norm_act_fwd, _norm_act_bwd)


def instance_norm_act_pallas(
    x: jax.Array,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
    negative_slope: float = 1e-2,
    act: bool = True,
) -> jax.Array:
    """Fused instance norm (+ optional LeakyReLU) on (N, *spatial, C).

    Affine scale/bias (when given) are applied outside the kernel — they are
    (C,) vectors, cheap for XLA to fuse into the consumer.
    """
    n, c = x.shape[0], x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    x2 = x.reshape(n, s, c)
    fuse_act = act and scale is None and bias is None
    y = _norm_act_2d(x2, eps, negative_slope, fuse_act)
    y = y.reshape(x.shape)
    if scale is not None:
        y = y * scale.astype(y.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if act and not fuse_act:
        y = jnp.where(y >= 0, y, y * negative_slope)
    return y

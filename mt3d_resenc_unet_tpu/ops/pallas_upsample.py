"""Pallas TPU kernel: 2x cube transposed-conv upsampling with the
(D, H) interleave fused into the GEMM's output write.

The decoder's kernel==stride transposed convs are one pointwise GEMM per
(di, dj) output parity plus a depth-to-space interleave
(models/network.py UpsampleConv; reference: builders/decoder.py:76-79).
In XLA the interleave costs two full materializations of the upsampled
tensor (a 4-way stack + a major-dims transpose, ~14 ms/step at batch 4
across tasks, fwd+bwd, profiled 2026-08-18). Here each grid tile runs the
four 128x128 GEMMs and writes the (di, dj) results into contiguous
sub-planes of an output shaped

    (N, Di, 2, Hi, 2, Wg, 128)

so the caller's reshape to (N, 2*Di, 2*Hi, Wg, 128) — the packed layout
the decoder's split-weight conv consumes — is a free view: no stack, no
transpose, no extra HBM pass.

Lane contract (matching UpsampleConv's packed GEMM): input row lanes pack
qn = g_o/2 consecutive x-positions x ci channels (qn*ci = 128); output
lanes pack g_o x-positions x co channels (g_o*co = 128). wb is the
(2, 2, 128, 128) band matrix built by the caller in XLA (gradients to the
transposed-conv parameter flow through its construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
_DN = (((1,), (0,)), ((), ()))


def _pick_tile(d: int, h: int, wg: int, itemsize: int,
               budget_bytes: int = 1 << 20):
    row_bytes = wg * LANES * itemsize
    best = (1, 1)
    for bd in (8, 4, 2, 1):
        if d % bd:
            continue
        for bh in (64, 32, 16, 8, 4, 2, 1):
            if h % bh:
                continue
            if bd * bh * row_bytes > budget_bytes:
                continue
            if bd * bh > best[0] * best[1]:
                best = (bd, bh)
            break
    return best


def _fwd_kernel(x_ref, wb_ref, y_ref, *, bd, bh, wg):
    m = bd * bh * wg
    x2 = x_ref[0].reshape(m, LANES)
    for di in range(2):
        for dj in range(2):
            y = lax.dot_general(x2, wb_ref[di, dj], _DN,
                                preferred_element_type=jnp.float32)
            y_ref[0, :, di, :, dj] = y.reshape(
                bd, bh, wg, LANES).astype(y_ref.dtype)


def _dx_kernel(gy_ref, wbt_ref, dx_ref, *, bd, bh, wg):
    m = bd * bh * wg
    acc = jnp.zeros((m, LANES), jnp.float32)
    for di in range(2):
        for dj in range(2):
            g = gy_ref[0, :, di, :, dj].reshape(m, LANES)
            acc += lax.dot_general(g, wbt_ref[di, dj], _DN,
                                   preferred_element_type=jnp.float32)
    dx_ref[0] = acc.reshape(bd, bh, wg, LANES).astype(dx_ref.dtype)


def _dw_kernel(x_ref, gy_ref, dwb_ref, *, bd, bh, wg):
    k = pl.program_id(0) * pl.num_programs(1) * pl.num_programs(2) \
        + pl.program_id(1) * pl.num_programs(2) + pl.program_id(2)

    @pl.when(k == 0)
    def _():
        dwb_ref[...] = jnp.zeros_like(dwb_ref)

    m = bd * bh * wg
    x2 = x_ref[0].reshape(m, LANES)
    dn = (((0,), (0,)), ((), ()))  # contract over rows
    for di in range(2):
        for dj in range(2):
            g = gy_ref[0, :, di, :, dj].reshape(m, LANES)
            dwb_ref[di, dj] += lax.dot_general(
                x2, g, dn, preferred_element_type=jnp.float32)


def _run_fwd(xp, wb):
    n, d, h, wg, _ = xp.shape
    bd, bh = _pick_tile(d, h, wg, xp.dtype.itemsize)
    kernel = functools.partial(_fwd_kernel, bd=bd, bh=bh, wg=wg)
    return pl.pallas_call(
        kernel,
        grid=(n, d // bd, h // bh),
        in_specs=[
            pl.BlockSpec((1, bd, bh, wg, LANES),
                         lambda a, b, c: (a, b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, LANES, LANES),
                         lambda a, b, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bd, 2, bh, 2, wg, LANES),
                               lambda a, b, c: (a, b, 0, c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, 2, h, 2, wg, LANES),
                                       xp.dtype),
        compiler_params=_VMEM_LIMIT,
    )(xp, wb)


@jax.custom_vjp
def upsample2x_packed(xp: jax.Array, wb: jax.Array) -> jax.Array:
    """xp (N, Di, Hi, Wg, 128), wb (2, 2, 128, 128) ->
    (N, Di, 2, Hi, 2, Wg, 128); reshape to (N, 2Di, 2Hi, Wg, 128) is free."""
    return _run_fwd(xp, wb)


def _upsample_fwd(xp, wb):
    return _run_fwd(xp, wb), (xp, wb)


def _upsample_bwd(res, gy):
    xp, wb = res
    n, d, h, wg, _ = xp.shape
    bd, bh = _pick_tile(d, h, wg, xp.dtype.itemsize)
    gy = gy.astype(xp.dtype)
    wbt = jnp.swapaxes(wb, 2, 3)
    gy_spec = pl.BlockSpec((1, bd, 2, bh, 2, wg, LANES),
                           lambda a, b, c: (a, b, 0, c, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((2, 2, LANES, LANES), lambda a, b, c: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, bd, bh, wg, LANES),
                          lambda a, b, c: (a, b, c, 0, 0),
                          memory_space=pltpu.VMEM)
    dxp = pl.pallas_call(
        functools.partial(_dx_kernel, bd=bd, bh=bh, wg=wg),
        grid=(n, d // bd, h // bh),
        in_specs=[gy_spec, w_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        compiler_params=_VMEM_LIMIT,
    )(gy, wbt)
    dwb = pl.pallas_call(
        functools.partial(_dw_kernel, bd=bd, bh=bh, wg=wg),
        grid=(n, d // bd, h // bh),
        in_specs=[x_spec, gy_spec],
        out_specs=pl.BlockSpec((2, 2, LANES, LANES),
                               lambda a, b, c: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 2, LANES, LANES), jnp.float32),
        compiler_params=_VMEM_LIMIT,
    )(xp, gy)
    return dxp, dwb.astype(wb.dtype)


upsample2x_packed.defvjp(_upsample_fwd, _upsample_bwd)


def upsample2x_supported(x_shape, ci: int, co: int) -> bool:
    """Packed 2x upsample path: co <= 64 with g_o = 128//co >= 2,
    qn*ci == 128, and the packed x-extent divisible as required."""
    if len(x_shape) != 5:
        return False
    g_o = 128 // co if co <= 64 and 128 % co == 0 else 0
    qn = g_o // 2
    return g_o >= 2 and qn * ci == LANES and x_shape[-1] == ci

#!/usr/bin/env python
"""Experiment: banded conv with a single concatenated-K mid GEMM.

The production kernel (ops/pallas_conv.py) runs, per tile, 9 mid GEMMs of
(m,128)x(128,128) with 9 fp32 accumulates plus 18 narrow side GEMMs. Each
mid operand is a shifted slice-reshape (a VPU relayout of the full tile), and
each accumulate is a (m,128) f32 VPU add — both compete with the MXU.

Variant CAT: copy the 9 shifted operands into one (m, 9*128) VMEM scratch and
run ONE GEMM against the stacked band matrix (K=1152), keeping the 18 narrow
side GEMMs. Same raw FLOPs, 1 accumulate instead of 9+18, and the MXU sees a
long-K contraction.

Also measures: plain resident-operand GEMM at the same shape = MXU ceiling.

Usage: python scripts/exp_conv_cat.py [--batch 4]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mt3d_resenc_unet_tpu.ops.pallas_conv import (
    build_banded_weights, conv3d_packed, _ref_conv)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


REPEAT = 8


def timeit(fn, *args, iters=5, warmup=2):
    @jax.jit
    def wrapped(*a):
        first, rest = a[0], a[1:]
        acc = None
        for k in range(REPEAT):
            out = fn(first + jnp.asarray(k, first.dtype) * 1e-6, *rest)
            out0 = jax.tree.leaves(out)[0]
            acc = out0 if acc is None else acc + out0
        return acc

    for _ in range(warmup):
        out = wrapped(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = wrapped(*args)
    _sync(out)
    return (time.perf_counter() - t0) / (iters * REPEAT)


# ----------------------------------------------------------------------
# CAT variant kernel
# ----------------------------------------------------------------------

def _cat_kernel(x_hbm, bcat_ref, bl_ref, br_ref, y_ref, x_s0, x_s1, xcat,
                sem, *, g, ci, co, bd, bh):
    ni = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    gci = g * ci
    gco = g * co
    wg = y_ref.shape[3]
    m = bd * bh * wg
    dn = (((1,), (0,)), ((), ()))
    side_k = ci if gci <= 128 else 128

    def tile_dma(buf, sl, a, b, c):
        return pltpu.make_async_copy(
            x_hbm.at[a, pl.ds(b * bd, bd + 2), pl.ds(c * bh, bh + 2)],
            buf, sem.at[sl])

    k = (ni * nd + di) * nh + hi
    total = pl.num_programs(0) * nd * nh

    @pl.when(k == 0)
    def _():
        tile_dma(x_s0, 0, ni, di, hi).start()

    nk = k + 1
    n_ni = nk // (nd * nh)
    rem = nk % (nd * nh)
    n_di = rem // nh
    n_hi = rem % nh

    @pl.when((nk < total) & (nk % 2 == 0))
    def _():
        tile_dma(x_s0, 0, n_ni, n_di, n_hi).start()

    @pl.when((nk < total) & (nk % 2 == 1))
    def _():
        tile_dma(x_s1, 1, n_ni, n_di, n_hi).start()

    def compute(x_s):
        for dz in range(3):
            for dy in range(3):
                rows = x_s[dz:dz + bd, dy:dy + bh]
                idx = dz * 3 + dy
                xcat[:, idx * gci:(idx + 1) * gci] = (
                    rows[:, :, 1:wg + 1, :].reshape(m, gci))
        acc = lax.dot_general(xcat[...], bcat_ref[...], dn,
                              preferred_element_type=jnp.float32)
        for dz in range(3):
            for dy in range(3):
                rows = x_s[dz:dz + bd, dy:dy + bh]
                left = rows[:, :, 0:wg, gci - side_k:gci].reshape(m, side_k)
                acc += lax.dot_general(left, bl_ref[dz, dy], dn,
                                       preferred_element_type=jnp.float32)
                right = rows[:, :, 2:wg + 2, 0:side_k].reshape(m, side_k)
                acc += lax.dot_general(right, br_ref[dz, dy], dn,
                                       preferred_element_type=jnp.float32)
        y_ref[0] = acc.reshape(bd, bh, wg, gco).astype(y_ref.dtype)

    @pl.when(k % 2 == 0)
    def _():
        tile_dma(x_s0, 0, ni, di, hi).wait()
        compute(x_s0)

    @pl.when(k % 2 == 1)
    def _():
        tile_dma(x_s1, 1, ni, di, hi).wait()
        compute(x_s1)


def conv3d_cat(xp, w, g, bd, bh):
    n, d, h, wg, gci = xp.shape
    ci = gci // g
    co = w.shape[-1]
    gco = g * co
    sub = 16 if xp.dtype == jnp.bfloat16 else 8
    wga = ((wg + 2 + sub - 1) // sub) * sub
    m = bd * bh * wg

    xpp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (1, wga - (wg + 1)), (0, 0)))
    b_mid, b_left, b_right = build_banded_weights(w.astype(xp.dtype), g)
    # stack the 9 (dz,dy) band matrices along K
    bcat = b_mid.reshape(9 * gci, gco)

    kernel = functools.partial(_cat_kernel, g=g, ci=ci, co=co, bd=bd, bh=bh)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, di, hi: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, d // bd, h // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            const_spec((9 * gci, gco)),
            const_spec(b_left.shape),
            const_spec(b_right.shape),
        ],
        out_specs=pl.BlockSpec((1, bd, bh, wg, gco),
                               lambda ni, di, hi: (ni, di, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, h, wg, gco), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((bd + 2, bh + 2, wga, gci), xp.dtype),
            pltpu.VMEM((bd + 2, bh + 2, wga, gci), xp.dtype),
            pltpu.VMEM((m, 9 * gci), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xpp, bcat, b_left, b_right)


# ----------------------------------------------------------------------
# MXU ceiling: resident-operand GEMM, same shapes
# ----------------------------------------------------------------------

def _gemm_kernel(a_ref, b_ref, y_ref):
    y_ref[...] = lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(y_ref.dtype)


def gemm_ceiling(m, kdim, ncols, steps, dtype=jnp.bfloat16):
    a = jnp.ones((m, kdim), dtype)
    b = jnp.ones((kdim, ncols), dtype)
    f = pl.pallas_call(
        _gemm_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((m, kdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kdim, ncols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, ncols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, ncols), dtype),
    )
    t = timeit(lambda a, b: f(a, b), a, b)
    fl = 2.0 * m * kdim * ncols * steps
    return t, fl / t / 1e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()
    b = args.batch

    key = jax.random.key(0)
    c = 32
    g = 128 // c
    sp = 128
    x = jax.random.normal(key, (b, sp, sp, sp, c), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, c, c), jnp.bfloat16) * 0.1
    xp = x.reshape(b, sp, sp, sp // g, g * c)
    useful = 2 * b * sp ** 3 * 27 * c * c

    # correctness check vs XLA reference on a small slice
    xs = x[:1, :16, :16, :32]
    xsp = xs.reshape(1, 16, 16, 32 // g, g * c)
    y_ref = _ref_conv(xs.astype(jnp.float32), w.astype(jnp.float32))
    y_cat = conv3d_cat(xsp, w, g, 8, 8).reshape(1, 16, 16, 32, c)
    err = float(jnp.max(jnp.abs(y_cat.astype(jnp.float32) - y_ref)))
    scale = float(jnp.max(jnp.abs(y_ref)))
    print(f"cat correctness: max_abs_err={err:.4f} (scale {scale:.1f})")

    t0 = timeit(jax.jit(lambda xp, w: conv3d_packed(xp, w, g)), xp, w)
    print(f"V0 current    : {t0*1e3:8.3f} ms  {useful/t0/1e12:6.1f} TF/s useful")

    for bd, bh in [(16, 8), (8, 8)]:
        try:
            f = jax.jit(lambda xp, w, bd=bd, bh=bh: conv3d_cat(xp, w, g, bd, bh))
            t1 = timeit(f, xp, w)
            print(f"V1 cat {bd:2d}x{bh:<2d}  : {t1*1e3:8.3f} ms  "
                  f"{useful/t1/1e12:6.1f} TF/s useful")
        except Exception as e:
            print(f"V1 cat {bd}x{bh} failed: {type(e).__name__}: {str(e)[:200]}")

    # MXU ceiling for the CAT GEMM shape (m=2048, K=1152, N=128)
    for m, kdim in [(4096, 1152), (4096, 128)]:
        try:
            t, tf = gemm_ceiling(m, kdim, 128, 64)
            print(f"GEMM ceiling m={m} K={kdim} N=128: {tf:6.1f} TF/s")
        except Exception as e:
            print(f"GEMM ceiling m={m} K={kdim} failed: {str(e)[:120]}")


if __name__ == "__main__":
    main()

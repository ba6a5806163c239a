#!/usr/bin/env python
"""Prototype probe: TWO-AXIS packed banded conv for the C=32 class.

The production banded kernel packs g=4 consecutive x-positions into the
128 MXU lanes; its mid band matrix is then only (3g-2)/g^2 = 62.5%
structurally dense, and each (dz, dy) tap pair needs its own GEMM
(9 mid + 9 side issues per tile). Packing (2 h-positions x 2 x-positions
x 32 channels) instead makes the mid band 100% dense — for p=2 per axis
every (input-offset, output-offset) pair maps to a valid tap — and folds
the dy taps into the band: 3 mid GEMMs (one per dz) plus 3 combined-side
GEMMs (all 8 spatial neighbors concatenated, K = 4*64 + 4*32 = 384).

This probe measures the forward kernel against the production
conv3d_small_c forward at the flagship C=32@128^3 shape, to decide whether
the layout is worth productionizing (dx/dW + layout plumbing). Input is
pre-padded (1 D group, 2 H2 groups each side) and pre-packed; pack cost is
timed separately.

Lane layout: l = (h%2 * 2 + x%2) * 32 + c; flat spatial f = h2 * WG + x2
(WG = W/2). Tiles (bd+2, (bh+4)*WG, 128), double-buffered manual DMA.

Run: python scripts/exp_conv2axis.py [--batch 4] [--e 128]
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

C = 32
LANES = 128
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def pack2(x):
    """(N, D, H, W, C) -> (N, D, H/2, W/2, 128), lane = (h%2)*64+(x%2)*32+c."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(n, d, h // 2, w // 2, 4 * c)


def unpack2(xp, h, w):
    n, d = xp.shape[:2]
    x = xp.reshape(n, d, h // 2, w // 2, 2, 2, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(n, d, h, w, C)


# side-operand column order: 8 neighbor slices, (lane range of the source)
#   cols   0: 64  h-top  f-WG   lanes 64:128   rows (1,0),(1,1)
#   cols  64:128  h-bot  f+WG   lanes  0:64    rows (0,0),(0,1)
#   cols 128:192  x-left f-1    lanes 32:64, 96:128   rows (0,1),(1,1)
#   cols 192:256  x-rght f+1    lanes  0:32, 64:96    rows (0,0),(1,0)
#   cols 256:288  c-tl   f-WG-1 lanes 96:128   row (1,1)
#   cols 288:320  c-tr   f-WG+1 lanes 64:96    row (1,0)
#   cols 320:352  c-bl   f+WG-1 lanes 32:64    row (0,1)
#   cols 352:384  c-br   f+WG+1 lanes  0:32    row (0,0)
def build_band2(w):
    kd = 3
    wn = w.astype(jnp.bfloat16)
    mid = jnp.zeros((kd, LANES, LANES), jnp.bfloat16)
    for ih in range(2):
        for ix in range(2):
            for oh in range(2):
                for ox in range(2):
                    th, tx = ih - oh + 1, ix - ox + 1
                    r = (ih * 2 + ix) * C
                    q = (oh * 2 + ox) * C
                    mid = mid.at[:, r:r + C, q:q + C].set(wn[:, th, tx])
    side = jnp.zeros((kd, 384, LANES), jnp.bfloat16)

    def put(base, rows, dh, dx):
        nonlocal side
        for j, (hh, xx) in enumerate(rows):
            for oh in range(2):
                for ox in range(2):
                    th = hh + 2 * dh - oh + 1
                    tx = xx + 2 * dx - ox + 1
                    if 0 <= th < 3 and 0 <= tx < 3:
                        r = base + j * C
                        q = (oh * 2 + ox) * C
                        side = side.at[:, r:r + C, q:q + C].set(
                            wn[:, th, tx])

    put(0, [(1, 0), (1, 1)], -1, 0)
    put(64, [(0, 0), (0, 1)], +1, 0)
    put(128, [(0, 1), (1, 1)], 0, -1)
    put(192, [(0, 0), (1, 0)], 0, +1)
    put(256, [(1, 1)], -1, -1)
    put(288, [(1, 0)], -1, +1)
    put(320, [(0, 1)], +1, -1)
    put(352, [(0, 0)], +1, +1)
    return mid, side


def _kernel(x_hbm, mid_ref, side_ref, mx_ref, y_ref,
            x_s0, x_s1, sem, scat, *, bd, bh, wg):
    ni = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    po = bh * wg
    base = 2 * wg
    m = bd * po
    dn = (((1,), (0,)), ((), ()))

    def dma(sl, a, b, c, op):
        buf = (x_s0, x_s1)[sl]
        cp = pltpu.make_async_copy(
            x_hbm.at[a, pl.ds(b * bd, bd + 2),
                     pl.ds(c * po, (bh + 4) * wg)],
            buf, sem.at[sl])
        cp.start() if op == "start" else cp.wait()

    k = (ni * nd + di) * nh + hi
    total = pl.num_programs(0) * nd * nh

    @pl.when(k == 0)
    def _():
        dma(0, ni, di, hi, "start")

    nk = k + 1
    n_ni = nk // (nd * nh)
    rem = nk % (nd * nh)
    n_di = rem // nh
    n_hi = rem % nh

    @pl.when((nk < total) & (nk % 2 == 0))
    def _():
        dma(0, n_ni, n_di, n_hi, "start")

    @pl.when((nk < total) & (nk % 2 == 1))
    def _():
        dma(1, n_ni, n_di, n_hi, "start")

    def compute(x_buf):
        x = x_buf[...]                       # (bd+2, (bh+4)*wg, 128)
        ml = mx_ref[:, 0:1]
        mr = mx_ref[:, 1:2]

        def sl(off, lo, hi_):
            return x[:, base + off:base + off + po, lo:hi_]

        scat[:, :, 0:64] = sl(-wg, 64, 128)
        scat[:, :, 64:128] = sl(wg, 0, 64)
        scat[:, :, 128:160] = sl(-1, 32, 64) * ml
        scat[:, :, 160:192] = sl(-1, 96, 128) * ml
        scat[:, :, 192:224] = sl(1, 0, 32) * mr
        scat[:, :, 224:256] = sl(1, 64, 96) * mr
        scat[:, :, 256:288] = sl(-wg - 1, 96, 128) * ml
        scat[:, :, 288:320] = sl(-wg + 1, 64, 96) * mr
        scat[:, :, 320:352] = sl(wg - 1, 32, 64) * ml
        scat[:, :, 352:384] = sl(wg + 1, 0, 32) * mr

        acc = jnp.zeros((m, LANES), jnp.float32)
        for dz in range(3):
            midop = x[dz:dz + bd, base:base + po].reshape(m, LANES)
            acc += lax.dot_general(midop, mid_ref[dz], dn,
                                   preferred_element_type=jnp.float32)
            sd = scat[dz:dz + bd].reshape(m, 384)
            acc += lax.dot_general(sd, side_ref[dz], dn,
                                   preferred_element_type=jnp.float32)
        y_ref[0] = acc.reshape(bd, po, LANES).astype(y_ref.dtype)

    @pl.when(k % 2 == 0)
    def _():
        dma(0, ni, di, hi, "wait")
        compute(x_s0)

    @pl.when(k % 2 == 1)
    def _():
        dma(1, ni, di, hi, "wait")
        compute(x_s1)


def conv2axis_fwd(xp, w, d, h2, wg):
    """xp: (N, D+2, (H2+4)*WG, 128) pre-padded packed input."""
    n = xp.shape[0]
    mid, side = build_band2(w)
    budget = int(os.environ.get("MT3D_CONV_TILE_BUDGET", (5 << 20) // 2))
    row_bytes = wg * LANES * 2
    best = (1, 1)
    for bd in (16, 8, 4, 2, 1):
        if d % bd:
            continue
        for bh in (16, 8, 4, 2, 1):
            if h2 % bh:
                continue
            if (bd + 2) * (bh + 4) * row_bytes > budget:
                continue
            if bd * bh > best[0] * best[1]:
                best = (bd, bh)
            break
    bd, bh = best
    pos = np.arange(bh * wg) % wg
    mx = jnp.asarray(np.stack([(pos != 0), (pos != wg - 1)], 1),
                     jnp.bfloat16)
    kernel = functools.partial(_kernel, bd=bd, bh=bh, wg=wg)
    cs = lambda s: pl.BlockSpec(s, lambda a, b, c: (0,) * len(s),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, d // bd, h2 // bh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  cs(mid.shape), cs(side.shape), cs(mx.shape)],
        out_specs=pl.BlockSpec((1, bd, bh * wg, LANES),
                               lambda a, b, c: (a, b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d, h2 * wg, LANES), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((bd + 2, (bh + 4) * wg, LANES), xp.dtype),
            pltpu.VMEM((bd + 2, (bh + 4) * wg, LANES), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bd + 2, bh * wg, 384), xp.dtype),
        ],
        compiler_params=_VMEM_LIMIT,
    )(xp, mid, side, mx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--e", type=int, default=128)
    args = ap.parse_args()
    n, e = args.batch, args.e
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, e, e, e, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.1,
                    jnp.bfloat16)
    h2 = e // 2
    wg = e // 2

    from profile_convs import timeit
    from mt3d_resenc_unet_tpu.ops.pallas_conv import conv3d_small_c

    flops = 2 * 27 * C * C * (e ** 3) * n
    t = timeit(conv3d_small_c, x, w)
    print(f"banded g=4 fwd : {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")

    prep = jax.jit(lambda x: jnp.pad(
        pack2(x), ((0, 0), (1, 1), (2, 2), (0, 0), (0, 0))).reshape(
        n, e + 2, (h2 + 4) * wg, LANES))
    xp = jax.block_until_ready(prep(x))

    f2 = jax.jit(lambda xp, w: conv2axis_fwd(xp, w, e, h2, wg))
    y2 = f2(xp, w)
    y2h = unpack2(np.asarray(jax.device_get(y2)).reshape(
        n, e, h2, wg, LANES), e, e)
    yref = jax.device_get(jax.jit(lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16))(x, w))
    err = np.abs(y2h.astype(np.float32) - np.asarray(yref, np.float32)).max()
    scale = np.abs(np.asarray(yref, np.float32)).max()
    print(f"two-axis max abs err {err:.4f} (rel {err / scale:.5f})")

    t = timeit(f2, xp, w)
    print(f"two-axis kernel: {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s"
          f"  (pre-packed, pre-padded)")
    t = timeit(lambda x, w: f2(prep(x), w), x, w)
    print(f"two-axis + pack: {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()

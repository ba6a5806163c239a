#!/usr/bin/env python
"""Anatomy of the banded conv kernel: where does the non-MXU half go?

The production kernel sustains ~48 TF/s useful (~97 raw with the 2x band
zeros) on the C=32 full-res stages — 50% of the v5e MXU. This bench re-runs
the SAME tile/DMA/grid structure with pieces knocked out to attribute the
other 50%:

  full    : the production compute loop (9 mid + 18 side GEMMs, sliced
            operands) — the baseline
  noside  : mid GEMMs only (numerically wrong; times the side-GEMM share)
  contig  : operands are whole contiguous dz-slices incl. halo junk
            ((bh+2) x wga rows instead of bh x wg) — MORE flops but ZERO
            operand-materialization copies; if faster per useful flop, the
            strided-slice copies are the overhead
  nogemm  : DMA + y write only (the DMA/bookkeeping floor)

Timing: R chained repeats inside one jit (arg perturbed per repeat so XLA
cannot CSE) to amortize the ~1-2 ms axon dispatch latency.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_kernel_anatomy.py
"""

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
    _VMEM_LIMIT, _pick_tile, build_banded_weights)


def make_variant(mode, n, d, h, wg, gci, gco, side_k, dtype=jnp.bfloat16,
                 tile=None, split=1):
    sub = 16 if dtype == jnp.bfloat16 else 8
    wga = ((wg + 2 + sub - 1) // sub) * sub
    if tile is not None:
        bd, bh = tile
    else:
        bd, bh = _pick_tile(d, h, wga, max(gci, gco),
                            jnp.dtype(dtype).itemsize)
    m = bd * bh * wg
    m_full = bd * (bh + 2) * wga
    dn = (((1,), (0,)), ((), ()))
    assert (bd + 2) % split == 0
    rows_per = (bd + 2) // split

    def kernel(x_hbm, bm_ref, bl_ref, br_ref, y_ref, x_s0, x_s1, sem):
        ni, di, hi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        nd, nh = pl.num_programs(1), pl.num_programs(2)

        def tile_dmas(buf, sl, a, b, c):
            # `split` concurrent sub-copies along the leading axis, each on
            # its own semaphore — probes per-DMA-stream bandwidth limits
            return [pltpu.make_async_copy(
                x_hbm.at[a, pl.ds(b * bd + s * rows_per, rows_per),
                         pl.ds(c * bh, bh + 2)],
                buf.at[pl.ds(s * rows_per, rows_per)], sem.at[sl, s])
                for s in range(split)]

        def start(buf, sl, a, b, c):
            for dma in tile_dmas(buf, sl, a, b, c):
                dma.start()

        def wait(buf, sl, a, b, c):
            for dma in tile_dmas(buf, sl, a, b, c):
                dma.wait()

        k = (ni * nd + di) * nh + hi
        total = pl.num_programs(0) * nd * nh

        @pl.when(k == 0)
        def _():
            start(x_s0, 0, ni, di, hi)

        nk = k + 1
        n_ni = nk // (nd * nh)
        rem = nk % (nd * nh)
        n_di, n_hi = rem // nh, rem % nh

        @pl.when((nk < total) & (nk % 2 == 0))
        def _():
            start(x_s0, 0, n_ni, n_di, n_hi)

        @pl.when((nk < total) & (nk % 2 == 1))
        def _():
            start(x_s1, 1, n_ni, n_di, n_hi)

        def compute(x_s):
            if mode == "nogemm":
                y_ref[0] = (x_s[1:bd + 1, 1:bh + 1, 1:wg + 1, :gco]
                            .astype(y_ref.dtype))
                return
            acc = jnp.zeros((m, gco), jnp.float32)
            if mode == "contig":
                accf = jnp.zeros((m_full, gco), jnp.float32)
                for dz in range(3):
                    rows = x_s[dz:dz + bd].reshape(m_full, gci)
                    for dy in range(3):
                        accf += lax.dot_general(
                            rows, bm_ref[dz, dy], dn,
                            preferred_element_type=jnp.float32)
                acc = accf.reshape(bd, bh + 2, wga, gco)[:, 1:bh + 1,
                                                         1:wg + 1]
                acc = acc.reshape(m, gco)
            else:
                for dz in range(3):
                    for dy in range(3):
                        rows = x_s[dz:dz + bd, dy:dy + bh]
                        mid = rows[:, :, 1:wg + 1].reshape(m, gci)
                        acc += lax.dot_general(
                            mid, bm_ref[dz, dy], dn,
                            preferred_element_type=jnp.float32)
                        if mode == "noside":
                            continue
                        if mode == "wideside":
                            # full-lane side operands (w-shift only, no
                            # lane slice) against zero-row-extended weights
                            left = rows[:, :, 0:wg].reshape(m, gci)
                            right = rows[:, :, 2:wg + 2].reshape(m, gci)
                        else:
                            left = rows[:, :, 0:wg,
                                        gci - side_k:gci].reshape(m, side_k)
                            right = rows[:, :, 2:wg + 2,
                                         0:side_k].reshape(m, side_k)
                        acc += lax.dot_general(
                            left, bl_ref[dz, dy], dn,
                            preferred_element_type=jnp.float32)
                        acc += lax.dot_general(
                            right, br_ref[dz, dy], dn,
                            preferred_element_type=jnp.float32)
            y_ref[0] = acc.reshape(bd, bh, wg, gco).astype(y_ref.dtype)

        @pl.when(k % 2 == 0)
        def _():
            wait(x_s0, 0, ni, di, hi)
            compute(x_s0)

        @pl.when(k % 2 == 1)
        def _():
            wait(x_s1, 1, ni, di, hi)
            compute(x_s1)

    def run(xpp, b_mid, b_left, b_right):
        const_spec = lambda shape: pl.BlockSpec(
            shape, lambda ni, di, hi: (0,) * len(shape),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(n, d // bd, h // bh),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      const_spec(b_mid.shape), const_spec(b_left.shape),
                      const_spec(b_right.shape)],
            out_specs=pl.BlockSpec((1, bd, bh, wg, gco),
                                   lambda ni, di, hi: (ni, di, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, d, h, wg, gco), dtype),
            scratch_shapes=[
                pltpu.VMEM((bd + 2, bh + 2, wga, gci), dtype),
                pltpu.VMEM((bd + 2, bh + 2, wga, gci), dtype),
                pltpu.SemaphoreType.DMA((2, split)),
            ],
            compiler_params=_VMEM_LIMIT,
        )(xpp, b_mid, b_left, b_right)

    return run, (bd, bh, wga)


def main():
    n, d, h, w = 4, 128, 128, 128
    ci = co = 32
    g = 128 // co
    wg = w // g
    gci = gco = g * ci
    side_k = ci
    R = 8
    sub = 16
    wga = ((wg + 2 + sub - 1) // sub) * sub

    key = jax.random.key(0)
    x = jax.random.normal(key, (n, d, h, wg, gci), jnp.bfloat16)
    wt = jax.random.normal(jax.random.key(1), (3, 3, 3, ci, co),
                           jnp.bfloat16) * 0.1
    b_mid, b_left, b_right = build_banded_weights(wt, g)
    xpp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, wga - (wg + 1)), (0, 0)))

    useful = 2 * 27 * ci * co * n * d * h * w  # true conv flops
    print(f"shape=({n},{d},{h},{w}) C={ci} g={g}; useful "
          f"{useful / 1e9:.1f} GFLOP/call")

    # (mode, tile, split): tile None = production _pick_tile; split = S
    # concurrent sub-DMAs per tile (probes per-stream bandwidth: full-H
    # contiguous tiles showed the same ~190 GB/s as 12 KB-row tiles, so
    # the limit is not descriptor rate)
    # zero-row-extended side weights for the wideside variant: the left
    # rows live in the LAST ci lanes, right rows in the FIRST ci
    blw = jnp.zeros((3, 3, gci, gco), b_left.dtype)
    blw = blw.at[:, :, gci - side_k:].set(b_left)
    brw = jnp.zeros((3, 3, gci, gco), b_right.dtype)
    brw = brw.at[:, :, :side_k].set(b_right)

    cases = [("full", None, 1), ("wideside", None, 1),
             ("wideside", None, 1), ("full", None, 1),
             ("noside", None, 1), ("nogemm", None, 1)]
    for mode, tl, sp in cases:
        run, tile = make_variant(mode, n, d, h, wg, gci, gco, side_k,
                                 tile=tl, split=sp)
        if mode == "wideside":
            bl_use, br_use = blw, brw
        else:
            bl_use, br_use = b_left, b_right

        def chained(xpp):
            y = run(xpp, b_mid, bl_use, br_use)
            for i in range(R - 1):
                # perturb so XLA can't CSE; reuse y to chain dependencies
                y = run(xpp + (y.mean() * 1e-12).astype(xpp.dtype),
                        b_mid, bl_use, br_use)
            return y

        f = jax.jit(chained)
        y = f(xpp)
        np.asarray(y[0, 0, 0, 0, 0])
        t0 = time.perf_counter()
        y = f(xpp)
        np.asarray(y[0, 0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / R
        print(f"  {mode:<8} tile={tile} split={sp}  {dt * 1e3:7.3f} "
              f"ms/call  useful {useful / dt / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()

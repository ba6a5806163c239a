#!/usr/bin/env python
"""MXU envelope sweep: resident-operand GEMM TF/s as a function of (M, K, N)
on the v5e. Determines whether the banded conv kernels' N=128 output width
is what caps them at ~66 TF/s raw, and which shape the next kernel design
should target.

Usage: python scripts/exp_gemm_envelope.py
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


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=5, warmup=2, repeat=8):
    @jax.jit
    def wrapped(*a):
        first, rest = a[0], a[1:]
        acc = None
        for k in range(repeat):
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
    return (time.perf_counter() - t0) / (iters * repeat)


def _gemm_kernel(a_ref, b_ref, y_ref, *, acc32):
    out = lax.dot_general(a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    y_ref[...] = out if acc32 else out.astype(y_ref.dtype)


def gemm_rate(m, kdim, ncols, steps=64, dtype=jnp.bfloat16, acc32=False):
    a = jnp.ones((m, kdim), dtype)
    b = jnp.ones((kdim, ncols), dtype)
    odt = jnp.float32 if acc32 else dtype
    f = pl.pallas_call(
        functools.partial(_gemm_kernel, acc32=acc32),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((m, kdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kdim, ncols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, ncols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, ncols), odt),
    )
    t = timeit(lambda a, b: f(a, b), a, b)
    return 2.0 * m * kdim * ncols * steps / t / 1e12


def main():
    print("resident-operand GEMM TF/s (bf16 in, bf16 out):")
    print(f"{'M':>6} {'K':>6} {'N':>6} {'TF/s':>8}")
    cases = [
        # N scaling at fixed M, K
        (2048, 1152, 128), (2048, 1152, 256), (2048, 1152, 512),
        (2048, 1152, 1024),
        # K scaling at N=128
        (2048, 128, 128), (2048, 512, 128), (2048, 2304, 128),
        # M scaling
        (512, 1152, 128), (8192, 1152, 128),
        # square-ish reference (should be near peak)
        (2048, 2048, 2048), (1024, 1024, 1024), (512, 512, 512),
        # the conv-relevant target shapes
        (4096, 128, 512), (2048, 384, 384), (1024, 1152, 1408),
    ]
    for m, k, n in cases:
        if m * k * 2 + k * n * 2 + m * n * 4 > 12 * 2 ** 20:
            print(f"{m:>6} {k:>6} {n:>6}     skip (VMEM)")
            continue
        try:
            tf = gemm_rate(m, k, n)
            print(f"{m:>6} {k:>6} {n:>6} {tf:8.1f}")
        except Exception as e:
            print(f"{m:>6} {k:>6} {n:>6}  FAIL {type(e).__name__}: "
                  f"{str(e)[:80]}")


if __name__ == "__main__":
    main()

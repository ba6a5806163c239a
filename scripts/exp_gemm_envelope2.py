#!/usr/bin/env python
"""Envelope v2: distinguish per-grid-step overhead from true GEMM rate.

The v1 sweep (exp_gemm_envelope.py) showed N=128 GEMMs at 5-30 TF/s, but the
production banded kernel demonstrably sustains ~97 TF/s raw in N=128 GEMMs —
so v1's single-dot-per-step harness measures something else (per-step fixed
cost, or a non-MXU lowering). Here each grid step runs R back-to-back dots
with rotating operand slices (no CSE), so fixed cost amortizes, and we sweep
steps to expose any per-step constant.

Usage: python scripts/exp_gemm_envelope2.py
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


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, y_ref, *, r, m, kdim):
    # r dots per grid step, each reading a different M-offset slice of the
    # (m + r) row buffer so Mosaic cannot CSE them; accumulate in fp32
    acc = jnp.zeros((m, y_ref.shape[-1]), jnp.float32)
    for j in range(r):
        acc += lax.dot_general(
            a_ref[j:j + m], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y_ref[...] = acc.astype(y_ref.dtype)


def rate(m, kdim, ncols, steps, r, dtype=jnp.bfloat16):
    a = jnp.ones((m + r, kdim), dtype)
    b = jnp.ones((kdim, ncols), dtype)
    f = pl.pallas_call(
        functools.partial(_kernel, r=r, m=m, kdim=kdim),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((m + r, kdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kdim, ncols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, ncols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, ncols), dtype),
    )
    jf = jax.jit(f)
    t = timeit(jf, a, b)
    fl = 2.0 * m * kdim * ncols * steps * r
    return fl / t / 1e12, t / (steps * r) * 1e6


def main():
    print("GEMM TF/s | us-per-dot  (R dots/step, rotating slices)")
    print(f"{'M':>6} {'K':>6} {'N':>6} {'steps':>6} {'R':>3} "
          f"{'TF/s':>8} {'us/dot':>8}")
    cases = [
        # R scaling: fixed-overhead amortization at the conv kernel's shape
        (4096, 128, 128, 16, 1),
        (4096, 128, 128, 16, 8),
        (4096, 128, 128, 16, 27),
        # steps scaling at R=8
        (4096, 128, 128, 64, 8),
        # K scaling at R=8
        (4096, 384, 128, 16, 8),
        (4096, 1152, 128, 8, 8),
        # N scaling at R=8
        (2048, 128, 256, 16, 8),
        (2048, 128, 512, 16, 8),
        (2048, 256, 512, 16, 8),
        # side-GEMM shape
        (4096, 32, 128, 16, 27),
        (4096, 64, 128, 16, 27),
    ]
    for m, k, n, steps, r in cases:
        try:
            tf, us = rate(m, k, n, steps, r)
            print(f"{m:>6} {k:>6} {n:>6} {steps:>6} {r:>3} "
                  f"{tf:8.1f} {us:8.2f}")
        except Exception as e:
            print(f"{m:>6} {k:>6} {n:>6} {steps:>6} {r:>3}  "
                  f"FAIL {type(e).__name__}: {str(e)[:70]}")


if __name__ == "__main__":
    main()

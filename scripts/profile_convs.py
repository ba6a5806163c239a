#!/usr/bin/env python
"""Per-op microbenchmarks on the real TPU: every conv shape class in the
flagship 128^3 net, fwd / dx / dW, XLA vs banded Pallas, plus norms and
upsampling. Guides kernel priorities (docs/PERFORMANCE.md).

Usage: python scripts/profile_convs.py [--batch 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sync(out):
    # fetch one element: forces real execution on the axon tunnel (plain
    # block_until_ready on chained dispatches can return early; see
    # docs/PERFORMANCE.md)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


REPEAT = 8


def _repeat_wrap(fn, *args):
    """Chain REPEAT invocations of fn inside ONE jitted program, summing the
    outputs to a single array. Per-dispatch RPC latency on the tunneled TPU
    (~1-2 ms) otherwise swamps sub-millisecond ops. Each call perturbs its
    first arg by a distinct constant so XLA cannot CSE the repeats."""
    @jax.jit
    def wrapped(*a):
        first, rest = a[0], a[1:]
        acc = None
        for k in range(REPEAT):
            out = fn(first + jnp.asarray(k, first.dtype) * 1e-6, *rest)
            out0 = jax.tree.leaves(out)[0]
            acc = out0 if acc is None else acc + out0
        return acc

    return wrapped


def timeit(fn, *args, iters=5, warmup=2):
    """Returns per-single-op seconds."""
    wrapped = _repeat_wrap(fn, *args)
    for _ in range(warmup):
        out = wrapped(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = wrapped(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / (iters * REPEAT)
    return dt


def conv_flops(shape_out, kernel, cin):
    return 2 * np.prod(shape_out) * np.prod(kernel) * cin


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()
    b = args.batch

    from mt3d_resenc_unet_tpu.ops.pallas_conv import (
        conv3d_small_c, conv3d_packed, conv3d_dw_packed, is_supported,
        _ref_conv)

    key = jax.random.key(0)

    # (label, spatial_in, cin, cout, stride)
    cases = [
        ("stem 1->32 @128", (128, 128, 128), 1, 32, 1),
        ("s0 32->32 @128", (128, 128, 128), 32, 32, 1),
        ("s1 dn 32->64 @128", (128, 128, 128), 32, 64, 2),
        ("s1 64->64 @64", (64, 64, 64), 64, 64, 1),
        ("s2 dn 64->128 @64", (64, 64, 64), 64, 128, 2),
        ("s2 128->128 @32", (32, 32, 32), 128, 128, 1),
        ("s3 dn 128->256 @32", (32, 32, 32), 128, 256, 2),
        ("s3 256 @16", (16, 16, 16), 256, 256, 1),
        ("s4 dn 256->512 @16", (16, 16, 16), 256, 512, 2),
        ("s4 512 @8", (8, 8, 8), 512, 512, 1),
        ("dec 64->32 @128", (128, 128, 128), 64, 32, 1),
        ("dec 128->64 @64", (64, 64, 64), 128, 64, 1),
        ("dec 256->128 @32", (32, 32, 32), 256, 128, 1),
    ]

    def tapsum_conv(x, w, stride=1):
        """3^3 conv as 27 accumulated GEMMs (one per tap): for C >= 128 the
        MXU runs clean (M, C)x(C, C') contractions at near peak while XLA's
        direct conv lowering measures 3-20 TF/s at small spatial sizes."""
        n, d, h, wd, ci = x.shape
        kd, kh, kw, _, co = w.shape
        sd = stride
        od, oh, ow = d // sd, h // sd, wd // sd
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dz in range(kd):
            for dy in range(kh):
                for dx in range(kw):
                    sl = jax.lax.slice(
                        xp, (0, dz, dy, dx, 0),
                        (n, dz + (od - 1) * sd + 1, dy + (oh - 1) * sd + 1,
                         dx + (ow - 1) * sd + 1, ci),
                        (1, sd, sd, sd, 1))
                    t = jnp.dot(sl.reshape(-1, ci), w[dz, dy, dx],
                                preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
        return acc.reshape(n, od, oh, ow, co).astype(x.dtype)

    print(f"batch={b}  (times in ms, TF/s = useful conv FLOPs / time)")
    hdr = (f"{'case':22s} {'xla_fwd':>9s} {'pal_fwd':>9s} {'tap_fwd':>9s} "
           f"{'xla_dw':>9s} {'pal_dw':>9s} {'tap_dw':>9s} {'tf_fwd':>7s}")
    print(hdr)
    for label, sp, cin, cout, st in cases:
        x = jax.random.normal(key, (b,) + sp + (cin,), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16)
        strides = (st,) * 3
        pad = ((1, 1),) * 3
        out_sp = tuple(s // st for s in sp)

        def xla_conv(x, w):
            return lax.conv_general_dilated(
                x, w, strides, pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.bfloat16)

        f_xla = jax.jit(xla_conv)
        t_xla = timeit(f_xla, x, w)

        t_pal = float("nan")
        if st == 1 and is_supported(x.shape, w.shape):
            f_pal = jax.jit(conv3d_small_c)
            t_pal = timeit(f_pal, x, w)

        f_tap = jax.jit(lambda x, w, st=st: tapsum_conv(x, w, st))
        t_tap = timeit(f_tap, x, w)

        # dW: gy (b, out_sp, cout); honest XLA dW via jax.grad (operands are
        # ARGUMENTS, not closure constants — constants ship in the compile
        # request and overflow the axon tunnel's body limit)
        gy = jax.random.normal(key, (b,) + out_sp + (cout,), jnp.bfloat16)

        def loss_w(w, x, gy):
            return jnp.sum(xla_conv(x, w).astype(jnp.float32) *
                           gy.astype(jnp.float32))
        f_xla_dw = jax.jit(jax.grad(loss_w))
        t_xla_dw = timeit(f_xla_dw, w, x, gy)

        def loss_w_tap(w, x, gy):
            return jnp.sum(tapsum_conv(x, w, st).astype(jnp.float32) *
                           gy.astype(jnp.float32))
        f_tap_dw = jax.jit(jax.grad(loss_w_tap))
        t_tap_dw = timeit(f_tap_dw, w, x, gy)

        t_pal_dw = float("nan")
        if st == 1 and cin == cout and is_supported(x.shape, w.shape):
            g = 128 // cout
            xp = x.reshape(b, sp[0], sp[1], sp[2] // g, g * cin)
            gyp = gy.reshape(b, sp[0], sp[1], sp[2] // g, g * cout)
            f_pal_dw = jax.jit(
                lambda xp, gyp: conv3d_dw_packed(xp, gyp, g, w.shape))
            t_pal_dw = timeit(f_pal_dw, xp, gyp)

        fl = 2 * b * np.prod(out_sp) * 27 * cin * cout
        best = np.nanmin([t_xla, t_pal, t_tap])
        print(f"{label:22s} {t_xla*1e3:9.2f} {t_pal*1e3:9.2f} "
              f"{t_tap*1e3:9.2f} "
              f"{t_xla_dw*1e3:9.2f} {t_pal_dw*1e3:9.2f} "
              f"{t_tap_dw*1e3:9.2f} {fl/best/1e12:7.1f}")


if __name__ == "__main__":
    main()

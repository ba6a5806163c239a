#!/usr/bin/env python
"""Per-stage timing of the flagship encoder/decoder stacks (fwd and
fwd+bwd), isolating where the train step's time goes.

Each stage is jitted standalone on its in-model input shape. Chained
repeats inside one jit cancel the tunnel's per-dispatch latency
(see scripts/profile_convs.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mt3d_resenc_unet_tpu.models.blocks import StackedResidualBlocks, ConvNormAct, StackedConvBlocks

REPEAT = 4


def timeit(fn, *args, iters=4, warmup=1):
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
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = wrapped(*args)
        np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / (iters * REPEAT)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--remat", action="store_true",
                   help="profile with block remat (as in training)")
    args = p.parse_args()
    b = args.batch
    key = jax.random.key(0)

    # flagship stage table: (name, in_shape, features, n_blocks, stride)
    stages = [
        ("stem 1->32 @128", (b, 128, 128, 128, 1), 32, 0, 1),
        ("s0 C32 x1 @128", (b, 128, 128, 128, 32), 32, 1, 1),
        ("s1 C64 x3 @64", (b, 128, 128, 128, 32), 64, 3, 2),
        ("s2 C128 x4 @32", (b, 64, 64, 64, 64), 128, 4, 2),
        ("s3 C256 x6 @16", (b, 32, 32, 32, 128), 256, 6, 2),
        ("s4 C512 x6 @8", (b, 16, 16, 16, 256), 512, 6, 2),
        ("s5 C512 x6 @4", (b, 8, 8, 8, 512), 512, 6, 2),
        ("dec C64 x1 @64 (split)", (b, 64, 64, 64, 64), 64, -1, 1),
        ("dec C32 x1 @128 (split)", (b, 128, 128, 128, 32), 32, -1, 1),
    ]
    print(f"batch={b} remat={args.remat}  (ms per op; bwd = grad wrt input+params)")
    for name, shape, feats, n_blocks, stride in stages:
        x = jax.random.normal(key, shape, jnp.bfloat16)
        dim = 3
        if n_blocks == 0:
            mod = StackedConvBlocks(
                n_convs=1, features=feats, kernel=(3,) * dim,
                initial_stride=(1,) * dim, use_pallas=True,
                remat=args.remat, dtype=jnp.bfloat16)
            init_args = (x,)
        elif n_blocks > 0:
            mod = StackedResidualBlocks(
                n_blocks=n_blocks, features=feats, kernel=(3,) * dim,
                initial_stride=(stride,) * dim, use_pallas=True,
                remat=args.remat, dtype=jnp.bfloat16)
            init_args = (x,)
        else:
            # decoder stage: split-weight pair input (upsampled, skip)
            mod = StackedConvBlocks(
                n_convs=2, features=feats, kernel=(3,) * dim,
                initial_stride=(1,) * dim, use_pallas=True,
                remat=args.remat, dtype=jnp.bfloat16)
            init_args = (x, False, x)
        params = mod.init({"params": jax.random.key(1)}, *init_args)

        if n_blocks >= 0:
            fwd = lambda x, p: mod.apply(p, x)
        else:
            fwd = lambda x, p: mod.apply(p, x, False, x)
        t_f = timeit(fwd, x, params)

        def loss(x, p):
            return jnp.sum(fwd(x, p).astype(jnp.float32))
        g = jax.grad(loss, argnums=(0, 1))
        t_fb = timeit(lambda x, p: g(x, p)[0], x, params)
        print(f"{name:26s} fwd {t_f*1e3:7.2f}  fwd+bwd {t_fb*1e3:7.2f}")


if __name__ == "__main__":
    main()

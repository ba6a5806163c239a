#!/usr/bin/env python
"""Decompose flagship train-step time: forward loss, backward, optimizer.

Times each piece as its own jitted program with the repeat-chaining trick
(per-dispatch RPC latency on the tunneled TPU would otherwise swamp the
numbers — see scripts/profile_convs.py).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / iters


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--patch", type=int, nargs=3, default=[128, 128, 128])
    args = p.parse_args()
    b = args.batch
    patch = tuple(args.patch)

    import bench as bench_mod
    state, step, data = bench_mod.build(b, patch)

    from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_autoconfig
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.losses import build_task_losses
    from mt3d_resenc_unet_tpu.train.step import multitask_loss

    plan = bench_mod.flagship_plan(patch)
    model = ResEncUNet(plan=plan, dtype=jnp.bfloat16)
    loss_fns = build_task_losses({
        "sheet": {"loss_fn": "BCEDiceLoss",
                  "loss_kwargs": {"alpha": 0.5, "beta": 0.5}},
        "normals": {"loss_fn": "MaskedCosineLoss"},
    })
    weights = {"sheet": 1.0, "normals": 1.0}
    rng = jax.random.key(9)

    def loss_fn(params, batch):
        outs = model.apply({"params": params}, batch["image"], train=True,
                           rngs={"dropout": rng, "droppath": rng})
        targets = {k: v for k, v in batch.items() if k != "image"}
        total, _ = multitask_loss(outs, targets, loss_fns, weights)
        return total

    print(f"batch={b} patch={patch}", flush=True)

    # encoder-only forward (where most FLOPs live)
    from mt3d_resenc_unet_tpu.models.network import Encoder
    enc = Encoder(plan=plan, dtype=jnp.bfloat16)
    enc_params = {"params": state.params["encoder"]}
    f_enc = jax.jit(lambda p, x: enc.apply(
        p, x.astype(jnp.bfloat16), train=True)[-1])
    t_enc = timeit(f_enc, enc_params, data["image"])
    print(f"  encoder fwd         : {t_enc * 1e3:8.1f} ms", flush=True)

    # forward (eval-mode, activations, no loss) — the inference hot path
    f_inf = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
    t_inf = timeit(f_inf, state.params, data["image"])
    print(f"  eval forward        : {t_inf * 1e3:8.1f} ms", flush=True)

    # forward only (train-mode graph, loss scalar out)
    f_fwd = jax.jit(loss_fn)
    t_fwd = timeit(f_fwd, state.params, data)
    print(f"  train forward+loss  : {t_fwd * 1e3:8.1f} ms", flush=True)

    # forward + backward (no optimizer)
    f_grad = jax.jit(lambda p, d: jax.grad(loss_fn)(p, d))
    t_grad = timeit(f_grad, state.params, data)
    print(f"  forward+backward    : {t_grad * 1e3:8.1f} ms "
          f"(bwd ~= {(t_grad - t_fwd) * 1e3:.1f} ms)", flush=True)

    # full step (state is donated: rebind each call, time a fixed count)
    for _ in range(2):
        state, m = step(state, data)
        float(m["total_loss"])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, m = step(state, data)
        float(m["total_loss"])
    t_step = (time.perf_counter() - t0) / iters
    print(f"  full train step     : {t_step * 1e3:8.1f} ms "
          f"(opt+overhead ~= {(t_step - t_grad) * 1e3:.1f} ms)", flush=True)
    print(f"  patches/s (step)    : {b / t_step:8.2f}", flush=True)


if __name__ == "__main__":
    main()

"""Perf ablation harness (throwaway experiments; not part of the package)."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_step(step, state, data, n=6):
    state, m = step(state, data)
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, data)
        float(m["total_loss"])
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--variant", default="base")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--fwd_only", action="store_true")
    args = p.parse_args()

    if args.variant == "bf16norm":
        import mt3d_resenc_unet_tpu.ops.instance_norm as inorm

        def _impl(x, scale, bias, eps, negative_slope, act):
            spatial = tuple(range(1, x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=spatial, keepdims=True)
            var = jnp.mean(jnp.square(xf), axis=spatial, keepdims=True) - jnp.square(mean)
            inv = jax.lax.rsqrt(var + eps)
            y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
            if scale is not None:
                y = y * scale.astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(x.dtype)
            if act:
                y = jnp.where(y >= 0, y, y * negative_slope)
            return y
        inorm._instance_norm_act_impl = _impl
        import mt3d_resenc_unet_tpu.models.blocks as blocks
        blocks._instance_norm_act_impl = _impl

    import bench
    if args.no_remat:
        import mt3d_resenc_unet_tpu.core.plan as planmod
        orig = planmod.plan_from_autoconfig
        def patched(*a, **k):
            k.setdefault('remat', False)
            return orig(*a, **k)
        planmod.plan_from_autoconfig = patched
        bench.__dict__  # bench imports plan_from_autoconfig lazily inside build
    patch = (args.patch,) * 3
    if args.fwd_only:
        from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_autoconfig
        from mt3d_resenc_unet_tpu.models.network import ResEncUNet
        plan = plan_from_autoconfig(patch, 1,
            [TaskHead("sheet", 1, "sigmoid"), TaskHead("normals", 3, "none")])
        model = ResEncUNet(plan=plan, dtype=jnp.bfloat16)
        x = jnp.zeros((args.batch,) + patch + (1,), jnp.float32)
        params = jax.jit(lambda: model.init({"params": jax.random.key(0)}, x,
                                            train=False))()
        f = jax.jit(lambda p, x: model.apply(p, x, train=False))
        out = f(params, x); float(out['sheet'].sum())
        t0 = time.perf_counter()
        for _ in range(6):
            out = f(params, x)
            float(out['sheet'].sum())  # D2H fetch: forces real execution
        dt = (time.perf_counter() - t0) / 6
        print(f"variant={args.variant} fwd patch={args.patch} batch={args.batch}: "
              f"{dt*1000:.1f} ms/step = {args.batch/dt:.2f} patches/s")
        return

    state, step, data = bench.build(args.batch, patch)
    dt = time_step(step, state, data)
    print(f"variant={args.variant} train patch={args.patch} batch={args.batch}: "
          f"{dt*1000:.1f} ms/step = {args.batch/dt:.2f} patches/s")


if __name__ == "__main__":
    main()

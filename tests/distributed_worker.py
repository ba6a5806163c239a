"""Worker process for the multi-host distribution test.

Launched by tests/test_distributed.py as N separate processes, each with 4
virtual CPU devices; together they form an N*4-device global mesh. Each
process feeds ONLY its slice of a deterministic global batch
(`make_global_batch` -> `jax.make_array_from_process_local_data`), runs one
jitted data-parallel train step, and writes {loss, grad_norm, param_sum} to
a JSON file. The test asserts bitwise-level agreement (1e-5) with a
single-process run over the identical global batch.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mt3d_resenc_unet_tpu.parallel import distributed as dist
    from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_manual_config
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.losses import build_task_losses
    from mt3d_resenc_unet_tpu.train.step import (
        TrainState, build_optimizer, cosine_epoch_schedule, make_train_step)

    if args.num_processes > 1:
        ok = dist.initialize(f"localhost:{args.port}",
                             num_processes=args.num_processes,
                             process_id=args.process_id)
        assert ok and jax.process_count() == args.num_processes

    mesh = dist.global_mesh()
    n_global_devices = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global_devices

    patch = (8, 8, 8)
    plan = plan_from_manual_config(
        dict(basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
             bottleneck_block="BasicBlockD", features_per_stage=[8, 16],
             num_stages=2, n_blocks_per_stage=[1, 1],
             n_conv_per_stage_decoder=[1], kernel_sizes=3, strides=[1, 2]),
        patch, 1, [TaskHead("sheet", 1, "sigmoid")])
    model = ResEncUNet(plan=plan, dtype=jnp.float32)

    x0 = jnp.zeros((1,) + patch + (1,), jnp.float32)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.key(0)}, x0, train=False))()["params"]
    from mt3d_resenc_unet_tpu.parallel.mesh import replicate
    params = replicate(params, mesh)

    tx = build_optimizer("AdamW", cosine_epoch_schedule(1e-3, 10, 5))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              rng=jax.random.key(1))
    step = make_train_step(
        model, build_task_losses({"sheet": {"loss_fn": "BCEDiceLoss"}}),
        {"sheet": 1.0}, donate=False)

    # identical deterministic GLOBAL batch in every configuration
    global_bs = 8
    rng = np.random.default_rng(42)
    full = {
        "image": rng.random((global_bs,) + patch + (1,)).astype(np.float32),
        "sheet": (rng.random((global_bs,) + patch + (1,)) > 0.5
                  ).astype(np.float32),
    }
    sl = dist.process_batch_slice(global_bs)
    local = {k: v[sl] for k, v in full.items()}
    batch = dist.make_global_batch(local, mesh)

    state, metrics = step(state, batch)
    param_sum = float(sum(
        np.abs(np.asarray(leaf.addressable_data(0), np.float64)).sum()
        for leaf in jax.tree.leaves(state.params)))
    result = {
        "process_index": jax.process_index(),
        "is_main": dist.is_main_process(),
        "loss": float(metrics["total_loss"]),
        "grad_norm": float(metrics["grad_norm"]),
        "param_sum": param_sum,
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    dist.sync_global_devices("done")
    print("worker", args.process_id, "OK", result)


if __name__ == "__main__":
    main()

"""Worker process for the multi-host INFERENCE test.

Launched by tests/test_infer_multihost.py as N separate processes, each with
a few virtual CPU devices. Each process runs the same ZarrInferenceEngine
over a shared volume/checkpoint: tiles are partitioned by process_index,
every process writes only its own disjoint tiles, and process 0 finalizes.
The test asserts the multi-process store is bit-identical to a 1-process run.
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
    p.add_argument("--local-devices", type=int, default=2)
    p.add_argument("--img", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--budget-bytes", type=int, required=True)
    p.add_argument("--result", required=True)
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

    import jax
    jax.config.update("jax_platforms", "cpu")

    from mt3d_resenc_unet_tpu.parallel import distributed as dist
    from mt3d_resenc_unet_tpu.infer.engine import ZarrInferenceEngine

    if args.num_processes > 1:
        ok = dist.initialize(f"localhost:{args.port}",
                             num_processes=args.num_processes,
                             process_id=args.process_id)
        assert ok and jax.process_count() == args.num_processes

    model_config = dict(
        basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
        bottleneck_block="BasicBlockD", features_per_stage=[8, 16],
        num_stages=2, n_blocks_per_stage=[1, 1], n_conv_per_stage_decoder=[1],
        kernel_sizes=3, strides=[1, 2])
    cfg = {
        "tr_setup": {"model_name": "mh", "autoconfigure": False},
        "tr_config": {"patch_size": [16, 16, 16], "batch_size": 4},
        "model_config": model_config,
        "dataset_config": {
            "in_channels": 1,
            "targets": {"sheet": {"channels": 1, "activation": "sigmoid"}},
            "volume_paths": []},
        "inference_config": {
            "checkpoint_path": args.ckpt, "input_path": args.img,
            "output_path": args.out_dir, "overlap": 0.25,
            "patch_size": [16, 16, 16], "batch_size": 4,
            "normalization": "none",
            "host_ram_budget_gb": args.budget_bytes / 2 ** 30},
    }
    eng = ZarrInferenceEngine(config_dict=cfg)
    store = eng.infer()
    with open(args.result, "w") as f:
        json.dump({"process_index": jax.process_index(),
                   "process_count": jax.process_count(),
                   "store": store}, f)


if __name__ == "__main__":
    main()

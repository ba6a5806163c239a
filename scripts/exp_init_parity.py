#!/usr/bin/env python
"""Experiment: does torch-matched weight init close the normals-accuracy
gap (VERDICT r4 missing #1)?

Runs the parity harness's OUR-side training only (shared miner pool, same
held-out eval) with either the current he_normal/lecun_normal init or a
monkeypatched torch-default init (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt
(fan_in))), at a chosen seed. Prints one JSON line.

Usage:  JAX_PLATFORMS=cpu python scripts/exp_init_parity.py \
            [--init torch|he] [--seed N]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _patch_torch_init():
    """Replace the flax initializers the model uses with torch Conv/Linear
    defaults: U(-b, b), b = 1/sqrt(fan_in), fan_in = prod(kernel) * c_in
    (kernel layout (*k, ci, co))."""
    import jax
    import flax.linen as nn

    def torch_kernel_init():
        def init(key, shape, dtype):
            fan_in = 1
            for s in shape[:-1]:
                fan_in *= s
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)
        return init

    nn.initializers.he_normal = torch_kernel_init
    nn.initializers.lecun_normal = torch_kernel_init


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--init", choices=["torch", "he"], default="torch",
                   help="torch = the (now default) reference-matched init; "
                        "he = 'torch' is already in the model code, so this "
                        "flag only still patches when explicitly 'torch' on "
                        "a pre-change checkout")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--workdir", default=None)
    args_cli = p.parse_args()

    import parity_train as pt

    # identical numerics regardless of backend: plain XLA convs (the Pallas
    # kernels are bf16-shaped; this experiment trains in fp32)
    _orig_cfg = pt.our_config

    def cfg_no_pallas(workdir, paths, a):
        cfg = _orig_cfg(workdir, paths, a)
        cfg["tr_config"]["use_pallas_conv"] = False
        return cfg

    pt.our_config = cfg_no_pallas

    class A:  # the harness's arg namespace
        workdir = (args_cli.workdir or
                   f"/tmp/mt3d_parity_{args_cli.init}_s{args_cli.seed}"
                   f"_e{args_cli.epochs}")
        epochs, steps, batch = args_cli.epochs, args_cli.steps, 2
        lr, seed = args_cli.lr, args_cli.seed

    args = A()
    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(0)  # volume fixed across seeds
    img, sheet_u8, normals_u16, normals_f32 = pt.make_volume(rng)
    paths = pt.write_zarrs(args.workdir, img, sheet_u8, normals_u16)

    from mt3d_resenc_unet_tpu.data.patches import find_valid_patches
    from mt3d_resenc_unet_tpu.data.zio import open_zarr
    mined = find_valid_patches(open_zarr(paths["sheet"]), pt.PATCH,
                               bbox_threshold=0.3, label_threshold=0.05)
    positions = [tuple(int(v) for v in m["start_pos"]) for m in mined]
    rng0 = np.random.default_rng(0)  # SAME split as the main harness seed 0
    rng0.shuffle(positions)
    n_eval = max(4, len(positions) // 5)
    eval_positions = positions[:n_eval]
    pool_positions = positions[n_eval:]

    eval_images, eval_gts = [], []
    for z, y, x in eval_positions:
        sl = np.s_[z:z + pt.PATCH[0], y:y + pt.PATCH[1], x:x + pt.PATCH[2]]
        eval_images.append(img[sl].astype(np.float32) / 255.0)
        eval_gts.append({"sheet": sheet_u8[sl].astype(np.float32) / 255.0,
                         "normals": normals_f32[sl]})

    from mt3d_resenc_unet_tpu.core.config import ConfigManager
    from mt3d_resenc_unet_tpu.data.dataset import ZarrPatchDataset
    mgr = ConfigManager(config_dict=pt.our_config(args.workdir, paths, args),
                        verbose=False)
    ds = ZarrPatchDataset(mgr, augment=False)
    pool_set = set(pool_positions)
    pool_idx = [i for i, info in enumerate(ds.all_valid_patches)
                if tuple(int(v) for v in info["start_pos"]) in pool_set]
    state, plan, dt = pt.train_ours(args.workdir, paths, pool_idx, args)
    preds = pt.predict_ours(state, plan, eval_images)
    res = pt.evaluate(preds, eval_gts)
    print(json.dumps({"init": args_cli.init, "seed": args_cli.seed,
                      **res, "train_seconds": round(dt, 1)}))


if __name__ == "__main__":
    main()

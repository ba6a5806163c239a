#!/usr/bin/env python
"""Trained-accuracy head-to-head: reference ``BaseTrainer`` (torch, CPU) vs
this framework's ``Trainer`` (VERDICT r3 item 5).

Both trainers get the SAME synthetic volume, the SAME mined patch pool
(positions come from this repo's miner and are shared), the SAME
architecture (manual spec), losses, optimizer, LR schedule, batch size,
epochs and step counts, and no augmentations. One evaluator computes final
metrics for both on an identical held-out patch set: Dice (sheet head,
threshold 0.5) and masked cosine similarity + unit-vector MSE (normals
head). Results are printed as JSON and appended to PARITY.md by --update-md.

Reference-side workarounds (behavior-preserving, in the spirit of
tests/test_torch_parity.py):

* missing libraries are stubbed at import time ONLY so that reference
  modules import: zarr/albumentations/skimage/tifffile/volumentations are
  used by code paths this run never exercises (the dataset is injected
  through the reference's own documented extension points,
  reference: train.py:36-40, 99-120); ``dynamic_network_architectures``
  maps to the reference's own equivalent ``builders`` modules
  (reference: builders/resblocks.py:9-11 imports symbols that also exist in
  builders/utils.py and builders/simple_conv_blocks.py).
* ``torch.device('cuda')`` -> cpu, ``torch.compile`` -> identity,
  ``torch.amp.autocast('cuda')`` -> nullcontext, GradScaler disabled: the
  same float32 math on CPU (reference: train.py:130-133, 203, 224).
* ``save_debug_gif`` -> no-op (visualization only, train.py:313-320).

Run (from repo root, CPU):
    JAX_PLATFORMS=cpu python scripts/parity_train.py --update-md
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("MT3D_REFERENCE_DIR", "/root/reference")
sys.path.insert(0, REPO)

PATCH = (64, 64, 64)
VOL_SHAPE = (160, 160, 160)

ARCH = {
    "basic_encoder_block": "BasicBlockD",
    "basic_decoder_block": "ConvBlock",
    "bottleneck_block": "BasicBlockD",
    "features_per_stage": [16, 32, 64],
    "num_stages": 3,
    "n_blocks_per_stage": [1, 2, 2],
    "n_conv_per_stage_decoder": [1, 1],
    "kernel_sizes": [3, 3, 3],
    "strides": [1, 2, 2],
}

TASKS = {
    "sheet": {"channels": 1, "activation": "sigmoid",
              "loss_fn": "BCEDiceLoss",
              "loss_kwargs": {"alpha": 0.5, "beta": 0.5}, "weight": 1.0},
    "normals": {"channels": 3, "activation": "none",
                "loss_fn": "MaskedCosineLoss", "loss_kwargs": {},
                "weight": 1.0},
}


# ---------------------------------------------------------------- synthetic
def make_volume(rng):
    """Two tilted slabs with DIFFERENT surface normals so the normals head
    has something non-trivial to learn; image = mask * 160 + noise."""
    z, y, x = np.mgrid[0:VOL_SHAPE[0], 0:VOL_SHAPE[1], 0:VOL_SHAPE[2]]
    n1 = np.array([0.8, 0.6, 0.0], np.float32)   # slab 1 normal (z, y, x)
    n2 = np.array([0.0, 0.6, 0.8], np.float32)   # slab 2 normal
    p1 = n1[0] * z + n1[1] * y + n1[2] * x
    p2 = n2[0] * z + n2[1] * y + n2[2] * x
    m1 = (p1 > 40) & (p1 < 80)
    m2 = (p2 > 120) & (p2 < 160)
    mask = (m1 | m2)
    normals = np.zeros(VOL_SHAPE + (3,), np.float32)
    normals[m1] = n1
    normals[m2 & ~m1] = n2
    img = (mask * 160 + rng.integers(0, 60, VOL_SHAPE)).astype(np.uint8)
    sheet = mask.astype(np.uint8) * np.uint8(255)
    enc = np.clip((normals + 1.0) * 32767.5, 0, 65535).astype(np.uint16)
    return img, sheet, enc, normals


def write_zarrs(workdir, img, sheet, enc):
    from mt3d_resenc_unet_tpu.data.zio import create_zarr
    paths = {}
    for name, arr in (("img", img), ("sheet", sheet), ("normals", enc)):
        path = os.path.join(workdir, f"{name}.zarr")
        if not os.path.isdir(path):
            chunk = (64, 64, 64) + ((3,) if arr.ndim == 4 else ())
            create_zarr(path, arr.shape, arr.dtype, chunk)[...] = arr
        paths[name] = path
    return paths


# ------------------------------------------------------------- our trainer
def our_config(workdir, paths, args):
    return {
        "tr_setup": {"model_name": "parity_jax", "autoconfigure": False,
                     "tr_val_split": 0.9,
                     "ckpt_out_base": os.path.join(workdir, "jax_ck"),
                     "tensorboard_log_dir": os.path.join(workdir, "jax_tb"),
                     "seed": args.seed},
        "tr_config": {"optimizer": "AdamW", "initial_lr": args.lr,
                      "weight_decay": 0.0,
                      "patch_size": list(PATCH), "batch_size": args.batch,
                      "max_steps_per_epoch": args.steps,
                      "max_val_steps_per_epoch": 2,
                      "max_epoch": args.epochs,
                      "num_dataloader_workers": 2,
                      "compute_dtype": "float32"},
        "model_config": dict(ARCH),
        "dataset_config": {
            "min_bbox_percent": 0.3, "min_labeled_ratio": 0.05,
            "use_cache": True,
            "cache_folder": os.path.join(workdir, "cache"),
            "in_channels": 1,
            "volume_paths": [{"input": paths["img"], "sheet": paths["sheet"],
                              "normals": paths["normals"],
                              "ref_label": "sheet"}],
            "targets": {k: dict(v) for k, v in TASKS.items()},
        },
        "inference_config": {},
    }


def train_ours(workdir, paths, pool, args):
    """Train this framework's Trainer restricted to the shared patch pool
    (augmentations off for a like-for-like comparison)."""
    from mt3d_resenc_unet_tpu.data.dataset import ZarrPatchDataset
    from mt3d_resenc_unet_tpu.train.trainer import Trainer

    class PoolTrainer(Trainer):
        def _configure_dataset(self):
            return ZarrPatchDataset(self.mgr, augment=False,
                                    seed=self.mgr.seed,
                                    wire=self.mgr.wire_format)

        def _configure_dataloaders(self, dataset):
            # train/val split INSIDE the shared pool; the held-out eval
            # set never enters either trainer
            rng = np.random.default_rng(self.mgr.seed)
            idx = list(pool)
            rng.shuffle(idx)
            split = int(0.9 * len(idx))
            return idx[:split], idx[split:]

    cwd = os.getcwd()
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    try:
        t0 = time.time()
        out = PoolTrainer(config_dict=our_config(workdir, paths, args),
                          verbose=False).train()
        dt = time.time() - t0
    finally:
        os.chdir(cwd)
    return out["state"], out["plan"], dt


def predict_ours(state, plan, images):
    """images: list of (Z,Y,X) float32 in [0,1]; returns list of dicts of
    channel-last activated outputs."""
    import jax
    import jax.numpy as jnp

    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.step import make_predict_step

    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    predict = make_predict_step(model)
    outs = []
    for img in images:
        x = jnp.asarray(img[None, ..., None], jnp.float32)
        o = predict(state.params, x)
        outs.append({k: np.asarray(jax.device_get(v))[0]
                     for k, v in o.items()})
    return outs


# -------------------------------------------------------- reference trainer
def _install_reference_stubs():
    """Make the reference importable WITHOUT its missing optional deps.
    Only modules whose code paths this run never exercises are stubbed;
    dynamic_network_architectures maps to the reference's own builders."""
    def module(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    import torch
    from torch import nn

    # --- used-at-import-only stubs ---
    module("zarr", open=None)
    module("albumentations")
    sk = module("skimage")
    sk.morphology = module("skimage.morphology",
                           dilation=lambda a, footprint=None: a,
                           ball=lambda r: np.ones((1, 1, 1), bool))
    module("tifffile", imwrite=lambda *a, **k: None)
    module("volumentations", Compose=lambda *a, **k: (lambda **kw: kw),
           ElasticTransform=lambda *a, **k: None)

    # --- dynamic_network_architectures -> the reference's own builders ---
    sys.path.insert(0, REF)
    import builders.simple_conv_blocks as ref_scb
    import builders.utils as ref_utils

    class DropPath(nn.Module):
        """Stochastic depth (per-sample residual drop), matching the
        upstream semantics the reference imports (resblocks.py:9-11;
        inactive here: stochastic_depth_p defaults to 0.0)."""

        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x * mask / keep

    class SqueezeExcite(nn.Module):
        """Channel SE block (inactive here: squeeze_excitation=False)."""

        def __init__(self, channels, conv_op=None, rd_ratio=1. / 16,
                     rd_divisor=8):
            super().__init__()
            rd = max(int(rd_divisor),
                     int(channels * rd_ratio / rd_divisor) * rd_divisor)
            self.fc1 = nn.Linear(channels, rd)
            self.fc2 = nn.Linear(rd, channels)

        def forward(self, x):
            s = x.mean(dim=tuple(range(2, x.ndim)))
            s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
            return x * s.reshape(s.shape + (1,) * (x.ndim - 2))

    module("dynamic_network_architectures")
    module("dynamic_network_architectures.building_blocks")
    module("dynamic_network_architectures.building_blocks.helper",
           maybe_convert_scalar_to_list=ref_utils.maybe_convert_scalar_to_list,
           get_matching_pool_op=ref_utils.get_matching_pool_op)
    module("dynamic_network_architectures.building_blocks.simple_conv_blocks",
           ConvDropoutNormReLU=ref_scb.ConvDropoutNormReLU)
    module("dynamic_network_architectures.building_blocks.regularization",
           DropPath=DropPath, SqueezeExcite=SqueezeExcite)


def ref_yaml(workdir, args):
    import yaml
    cfg = {
        "tr_setup": {"model_name": "parity_ref", "autoconfigure": False,
                     "tr_val_split": 0.9,
                     "ckpt_out_base": os.path.join(workdir, "ref_ck"),
                     "tensorboard_log_dir": os.path.join(workdir, "ref_tb")},
        "tr_config": {"optimizer": "AdamW", "initial_lr": args.lr,
                      "weight_decay": 0.0,
                      "patch_size": list(PATCH), "batch_size": args.batch,
                      "max_steps_per_epoch": args.steps,
                      "max_val_steps_per_epoch": 2,
                      "max_epoch": args.epochs,
                      "num_dataloader_workers": 0},
        "model_config": dict(ARCH),
        "dataset_config": {
            "in_channels": 1,
            "volume_paths": [],
            "targets": {k: dict(v) for k, v in TASKS.items()},
        },
        "inference_config": {},
    }
    path = os.path.join(workdir, "ref_config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def train_reference(workdir, volumes, pool_positions, args):
    """Train the reference BaseTrainer on CPU over the shared patch pool.
    The dataset/dataloaders are injected through the reference's OWN
    extension points (reference: train.py:36-40, 99-120)."""
    _install_reference_stubs()
    import torch
    from torch.utils.data import DataLoader, Dataset, SubsetRandomSampler

    img, sheet_u8, normals_u16 = volumes

    class InMemoryPatchDataset(Dataset):
        """Reference __getitem__ semantics (dataloading/dataset.py:103-222,
        sans augmentations): uint8/255 image, /255 binary target, uint16
        normals decode /32767.5-1 with (Z,Y,X,C)->(C,Z,Y,X)."""

        def __init__(self, positions):
            self.positions = positions

        def __len__(self):
            return len(self.positions)

        def __getitem__(self, i):
            z, y, x = self.positions[i]
            sl = np.s_[z:z + PATCH[0], y:y + PATCH[1], x:x + PATCH[2]]
            image = img[sl].astype(np.float32) / 255.0
            sheet = sheet_u8[sl].astype(np.float32) / 255.0
            nrm = normals_u16[sl].astype(np.float32) / 32767.5 - 1.0
            return {
                "image": torch.from_numpy(image[None]),
                "sheet": torch.from_numpy(sheet[None]),
                "normals": torch.from_numpy(
                    np.ascontiguousarray(np.moveaxis(nrm, -1, 0))),
            }

    # CPU workarounds (documented in the module docstring). The shim is
    # installed as the reference train MODULE's ``torch`` attribute only —
    # mutating the global torch module breaks torch._dynamo's type
    # annotations (``str | torch.device``).
    import train as ref_train

    class _AmpShim:
        def __getattr__(self, k):
            return getattr(torch.amp, k)

        @staticmethod
        def autocast(*a, **k):
            return contextlib.nullcontext()

    class _TorchShim:
        def __getattr__(self, k):
            return getattr(torch, k)

        amp = _AmpShim()

        @staticmethod
        def device(*a, **k):
            return torch.device("cpu")

        @staticmethod
        def compile(m, **k):
            return m

    ref_train.torch = _TorchShim()
    ref_train.save_debug_gif = lambda *a, **k: None

    dataset = InMemoryPatchDataset(pool_positions)

    class CPUParityTrainer(ref_train.BaseTrainer):
        def _configure_dataset(self):
            return dataset

        def _get_scaler(self):
            return torch.amp.GradScaler("cpu", enabled=False)

        def _configure_dataloaders(self, ds):
            rng = np.random.default_rng(args.seed)
            idx = list(range(len(ds)))
            rng.shuffle(idx)
            split = int(0.9 * len(idx))
            g = torch.Generator().manual_seed(args.seed)
            train_dl = DataLoader(
                ds, batch_size=self.mgr.train_batch_size,
                sampler=SubsetRandomSampler(idx[:split], generator=g),
                num_workers=0)
            val_dl = DataLoader(
                ds, batch_size=1,
                sampler=SubsetRandomSampler(idx[split:], generator=g),
                num_workers=0)
            return train_dl, val_dl

    torch.manual_seed(args.seed)
    trainer = CPUParityTrainer(ref_yaml(workdir, args))
    # reference bug workaround (SURVEY §2.6.4): Encoder/Decoder compare
    # block names with ``is`` (encoder.py:74-79), which only matches
    # interned literals — YAML-loaded strings are not interned and leave
    # ``block`` unbound. Interning restores the intended behavior.
    for key in ("basic_encoder_block", "basic_decoder_block",
                "bottleneck_block"):
        trainer.mgr.model_config[key] = sys.intern(
            trainer.mgr.model_config[key])
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        t0 = time.time()
        trainer.train()
        dt = time.time() - t0
    finally:
        os.chdir(cwd)

    # reload the final weights into a fresh eval model
    model = trainer._build_model()
    state = torch.load(os.path.join(workdir, "parity_ref_final.pth"),
                       map_location="cpu")
    model.load_state_dict(state)
    model.eval()
    return model, dt


def predict_reference(model, images):
    import torch
    outs = []
    with torch.no_grad():
        for img in images:
            x = torch.from_numpy(img[None, None].astype(np.float32))
            o = model(x)  # eval mode: activations applied (ref fwd :321-323)
            outs.append({k: np.moveaxis(v.numpy()[0], 0, -1)
                         for k, v in o.items()})
    return outs


# ------------------------------------------------------------------ metrics
def evaluate(preds, gts):
    """preds/gts: lists of channel-last patches. Returns Dice (sheet) and
    masked cosine similarity / unit-vector MSE (normals) over the set."""
    inter = psum = tsum = 0.0
    cos_num = cos_cnt = 0.0
    mse_num = 0.0
    for p, g in zip(preds, gts):
        pb = (p["sheet"][..., 0] > 0.5)
        gb = (g["sheet"] > 0.5)
        inter += float((pb & gb).sum())
        psum += float(pb.sum())
        tsum += float(gb.sum())

        mask = np.linalg.norm(g["normals"], axis=-1) > 0.5
        if mask.any():
            pv = p["normals"][mask]
            pv = pv / np.maximum(
                np.linalg.norm(pv, axis=-1, keepdims=True), 1e-8)
            gv = g["normals"][mask]
            cos = (pv * gv).sum(-1)
            cos_num += float(cos.sum())
            cos_cnt += float(mask.sum())
            mse_num += float(((pv - gv) ** 2).sum())
    dice = 2.0 * inter / max(psum + tsum, 1.0)
    cos = cos_num / max(cos_cnt, 1.0)
    mse = mse_num / max(cos_cnt * 3.0, 1.0)
    return {"dice": round(dice, 4), "normals_cosine": round(cos, 4),
            "normals_mse": round(mse, 5)}


def main():
    global PATCH, VOL_SHAPE
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/mt3d_parity")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--patch", type=int, default=PATCH[0],
                   help="cubic patch edge (tiny values for the smoke test)")
    p.add_argument("--vol", type=int, default=VOL_SHAPE[0],
                   help="cubic synthetic-volume edge")
    p.add_argument("--skip", choices=["none", "ref", "ours"], default="none")
    p.add_argument("--update-md", action="store_true",
                   help="append/refresh the PARITY.md head-to-head table")
    args = p.parse_args()
    PATCH = (args.patch,) * 3
    VOL_SHAPE = (args.vol,) * 3
    os.makedirs(args.workdir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    img, sheet_u8, normals_u16, normals_f32 = make_volume(rng)
    paths = write_zarrs(args.workdir, img, sheet_u8, normals_u16)

    # shared patch pool from THIS repo's miner (same rule as the reference's
    # _find_valid_patches — equivalence is tested in tests/test_patches.py)
    from mt3d_resenc_unet_tpu.data.patches import find_valid_patches
    from mt3d_resenc_unet_tpu.data.zio import open_zarr
    mined = find_valid_patches(open_zarr(paths["sheet"]), PATCH,
                               bbox_threshold=0.3, label_threshold=0.05)
    positions = [tuple(int(v) for v in m["start_pos"]) for m in mined]
    rng.shuffle(positions)
    n_eval = max(4, len(positions) // 5)
    eval_positions = positions[:n_eval]
    pool_positions = positions[n_eval:]
    print(f"[parity] {len(positions)} mined patches -> "
          f"{len(pool_positions)} train pool + {n_eval} held-out eval")

    # held-out eval tensors (identical for both sides)
    eval_images, eval_gts = [], []
    for z, y, x in eval_positions:
        sl = np.s_[z:z + PATCH[0], y:y + PATCH[1], x:x + PATCH[2]]
        eval_images.append(img[sl].astype(np.float32) / 255.0)
        eval_gts.append({"sheet": sheet_u8[sl].astype(np.float32) / 255.0,
                         "normals": normals_f32[sl]})

    results = {}
    if args.skip != "ours":
        # our dataset mines from the SAME cache rule; restrict its indices
        # to the shared pool by matching positions
        from mt3d_resenc_unet_tpu.core.config import ConfigManager
        from mt3d_resenc_unet_tpu.data.dataset import ZarrPatchDataset
        mgr = ConfigManager(config_dict=our_config(args.workdir, paths, args),
                            verbose=False)
        ds = ZarrPatchDataset(mgr, augment=False)
        pool_set = set(pool_positions)
        pool_idx = [i for i, info in enumerate(ds.all_valid_patches)
                    if tuple(int(v) for v in info["start_pos"]) in pool_set]
        assert len(pool_idx) == len(pool_positions), \
            (len(pool_idx), len(pool_positions))
        state, plan, dt = train_ours(args.workdir, paths, pool_idx, args)
        preds = predict_ours(state, plan, eval_images)
        results["this_framework"] = {**evaluate(preds, eval_gts),
                                     "train_seconds": round(dt, 1)}
        print("[parity] ours:", results["this_framework"])

    if args.skip != "ref":
        model, dt = train_reference(
            args.workdir, (img, sheet_u8, normals_u16), pool_positions, args)
        preds = predict_reference(model, eval_images)
        results["reference_torch_cpu"] = {**evaluate(preds, eval_gts),
                                          "train_seconds": round(dt, 1)}
        print("[parity] reference:", results["reference_torch_cpu"])

    summary = {
        "setup": {"patch": PATCH, "volume": VOL_SHAPE,
                  "epochs": args.epochs, "steps_per_epoch": args.steps,
                  "batch": args.batch, "lr": args.lr, "seed": args.seed,
                  "pool_patches": len(pool_positions),
                  "eval_patches": n_eval},
        "results": results,
    }
    print(json.dumps(summary))

    if args.update_md and len(results) == 2:
        _update_parity_md(summary)


def _update_parity_md(summary):
    ours = summary["results"]["this_framework"]
    ref = summary["results"]["reference_torch_cpu"]
    s = summary["setup"]
    # distinct marker: the curated multi-seed "## Trained head-to-head"
    # section (written round 5) must not be truncated by a later
    # single-run refresh
    marker = "## Latest single-run head-to-head"
    block = f"""{marker} (scripts/parity_train.py)

Same synthetic two-slab volume ({s['volume'][0]}^3), same mined patch pool
({s['pool_patches']} patches), same manual architecture / AdamW(lr={s['lr']})
/ cosine schedule / batch {s['batch']} x {s['steps_per_epoch']} steps x
{s['epochs']} epochs, no augmentations; reference runs its own BaseTrainer
loop (torch CPU, reference: train.py:19-350). Metrics on {s['eval_patches']}
held-out patches neither trainer saw:

| trainer | Dice (sheet) | normals cosine | normals unit-MSE | train s |
|---|---|---|---|---|
| this framework | {ours['dice']} | {ours['normals_cosine']} | {ours['normals_mse']} | {ours['train_seconds']} |
| reference (torch, CPU) | {ref['dice']} | {ref['normals_cosine']} | {ref['normals_mse']} | {ref['train_seconds']} |
"""
    path = os.path.join(REPO, "PARITY.md")
    with open(path) as f:
        text = f.read()
    if marker in text:
        text = text[:text.index(marker)].rstrip() + "\n\n" + block
    else:
        text = text.rstrip() + "\n\n" + block
    with open(path, "w") as f:
        f.write(text)
    print(f"[parity] PARITY.md updated")


if __name__ == "__main__":
    main()

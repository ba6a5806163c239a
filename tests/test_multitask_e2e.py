"""Multi-task end-to-end: joint sheet segmentation + surface-normals
regression on a synthetic volume with analytically known normals, through
training AND sliding-window inference (uint16 normals codec, vector
renormalization, load_all, JPEG export)."""

import os

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.data.zio import (
    create_zarr,
    decode_normals,
    encode_normals_u16,
    open_zarr,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mt")
    rng = np.random.default_rng(2)
    shape = (32, 32, 32)
    # a tilted slab: sheet mask + constant unit normal perpendicular to it
    zz, yy, xx = np.mgrid[0:32, 0:32, 0:32]
    plane = 0.6 * yy + 0.8 * zz          # normal direction (0, .6, .8) in (x,y,z)
    mask = ((plane > 12) & (plane < 30)).astype(np.uint8)
    img = (mask * 180 + rng.integers(0, 50, shape)).astype(np.uint8)
    normals = np.zeros(shape + (3,), np.float32)
    normals[mask > 0] = (0.0, 0.6, 0.8)   # channels (nx, ny, nz)

    create_zarr(str(tmp / "img.zarr"), shape, np.uint8, (16,) * 3)[...] = img
    create_zarr(str(tmp / "sheet.zarr"), shape, np.uint8, (16,) * 3)[...] = \
        mask * np.uint8(255)
    nvol = create_zarr(str(tmp / "normals.zarr"), shape + (3,), np.uint16,
                       (16, 16, 16, 3))
    nvol[...] = encode_normals_u16(normals)

    cfg = {
        "tr_setup": {"model_name": "mt", "autoconfigure": False,
                     "tr_val_split": 0.9, "ckpt_out_base": str(tmp / "ck"),
                     "tensorboard_log_dir": str(tmp / "lg"), "seed": 0},
        "tr_config": {"optimizer": "AdamW", "initial_lr": 8e-3,
                      "patch_size": [16, 16, 16], "batch_size": 4,
                      "max_steps_per_epoch": 25, "max_val_steps_per_epoch": 1,
                      "max_epoch": 3, "num_dataloader_workers": 2,
                      # 1-device mesh: avoids the intermittent XLA:CPU
                      # 8-participant collective deadlock (docs/SIGABRT.md)
                      "mesh_shape": [1]},
        "model_config": {
            "basic_encoder_block": "BasicBlockD",
            "basic_decoder_block": "ConvBlock",
            "bottleneck_block": "BasicBlockD",
            "features_per_stage": [8, 16], "num_stages": 2,
            "n_blocks_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
            "kernel_sizes": [3, 3], "strides": [1, 2]},
        "dataset_config": {
            "min_bbox_percent": 0.1, "min_labeled_ratio": 0.05,
            "use_cache": False, "cache_folder": str(tmp / "c"),
            "in_channels": 1,
            "volume_paths": [{"input": str(tmp / "img.zarr"),
                              "sheet": str(tmp / "sheet.zarr"),
                              "normals": str(tmp / "normals.zarr"),
                              "ref_label": "sheet"}],
            "targets": {
                "sheet": {"channels": 1, "activation": "sigmoid",
                          "loss_fn": "BCEDiceLoss"},
                "normals": {"channels": 3, "activation": "none",
                            "loss_fn": "MaskedCosineLoss"}}},
        "inference_config": {
            "checkpoint_path": str(tmp / "ck" / "mt"),
            "input_path": str(tmp / "img.zarr"),
            "output_path": str(tmp / "out"),
            "overlap": 0.25, "patch_size": [16, 16, 16], "batch_size": 4,
            "normalization": "none", "load_all": True,
            "output_targets": ["sheet", "normals"]},
    }
    return tmp, cfg, mask, normals


def test_dataset_decodes_normals(setup):
    tmp, cfg, mask, normals = setup
    from mt3d_resenc_unet_tpu.core.config import ConfigManager
    from mt3d_resenc_unet_tpu.data.dataset import ZarrPatchDataset

    mgr = ConfigManager(config_dict=cfg)
    ds = ZarrPatchDataset(mgr, augment=False)
    assert len(ds) > 0
    sample = ds[0]
    assert sample["image"].shape == (16, 16, 16, 1)
    assert sample["normals"].shape == (16, 16, 16, 3)
    n = sample["normals"]
    nz = np.linalg.norm(n, axis=-1) > 0.5
    assert nz.any()
    # decoded normals are ~(0, .6, .8) where labeled
    np.testing.assert_allclose(n[nz].mean(axis=0), [0.0, 0.6, 0.8], atol=0.02)


def test_train_and_infer_multitask(setup, monkeypatch):
    tmp, cfg, mask, normals = setup
    monkeypatch.chdir(tmp)
    from mt3d_resenc_unet_tpu.train.trainer import Trainer
    from mt3d_resenc_unet_tpu.infer.engine import ZarrInferenceEngine

    # use the reference-style extension point (override one _configure_*)
    # to train without augmentation: the synthetic volume has ONE global
    # normal direction, which geometric augs would (correctly) randomize —
    # too hard for this tiny smoke model
    from mt3d_resenc_unet_tpu.data.dataset import ZarrPatchDataset

    class NoAugTrainer(Trainer):
        def _configure_dataset(self):
            return ZarrPatchDataset(self.mgr, augment=False,
                                    seed=self.mgr.seed)

    out = NoAugTrainer(config_dict=cfg, verbose=False).train()
    hist = out["history"]
    assert hist[-1]["train/normals_loss"] < hist[0]["train/normals_loss"]

    engine = ZarrInferenceEngine(config_dict=cfg, write_layers=True)
    store = engine.infer()

    # normals output: uint16 codec, unit vectors where covered
    fin = open_zarr(os.path.join(store, "normals_final"))
    assert fin.dtype == np.uint16
    assert fin.shape == (3, 32, 32, 32)
    dec = decode_normals(fin.read_all(), np.dtype(np.uint16))
    mag = np.sqrt((dec ** 2).sum(axis=0))
    assert (np.abs(mag - 1.0) < 0.05).mean() > 0.95  # renormalized

    # the dominant predicted direction should correlate with ground truth
    inside = mask > 0
    mean_vec = dec[:, inside].mean(axis=1)
    mean_vec /= np.linalg.norm(mean_vec) + 1e-9
    cos = float(mean_vec @ np.array([0.0, 0.6, 0.8]))
    assert cos > 0.7, f"mean normal direction off: {mean_vec} cos {cos}"

    # sheet output exists + JPEG slices written (write_layers)
    assert open_zarr(os.path.join(store, "sheet_final")).dtype == np.uint8
    jpegs = os.listdir(tmp / "out" / "z_slices" / "sheet")
    assert len(jpegs) == 32

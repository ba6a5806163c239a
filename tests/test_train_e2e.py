"""End-to-end training on a tiny synthetic zarr volume (SURVEY.md §4(d)):
train 2 epochs, verify loss improves, checkpoints exist, resume and
weights-only fine-tune both work."""

import os

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.data.zio import create_zarr

pytestmark = pytest.mark.slow



def _make_config(tmp_path, max_epoch=2, ckpt_path=None, load_weights_only=False):
    # synthetic volume: a dense labeled slab so the miner finds patches
    vol_dir = tmp_path / "vols"
    img_path = str(vol_dir / "img.zarr")
    lbl_path = str(vol_dir / "lbl.zarr")
    if not os.path.isdir(img_path):
        rng = np.random.default_rng(0)
        mask = np.zeros((32, 32, 32), np.uint8)
        mask[4:28, 4:28, 4:28] = (rng.random((24, 24, 24)) > 0.35).astype(np.uint8)
        img = (mask * 180 + rng.integers(0, 60, mask.shape)).astype(np.uint8)
        lbl = mask * np.uint8(255)  # 0/255 mask convention (scaled /255)
        create_zarr(img_path, img.shape, img.dtype, (16, 16, 16))[...] = img
        create_zarr(lbl_path, lbl.shape, lbl.dtype, (16, 16, 16))[...] = lbl

    return {
        "tr_setup": {
            "model_name": "tinytest",
            "autoconfigure": False,
            "tr_val_split": 0.8,
            "ckpt_out_base": str(tmp_path / "ckpts"),
            "tensorboard_log_dir": str(tmp_path / "logs"),
            "checkpoint_path": ckpt_path,
            "load_weights_only": load_weights_only,
            "seed": 0,
        },
        "tr_config": {
            "optimizer": "AdamW",
            "initial_lr": 3e-3,
            "patch_size": [16, 16, 16],
            "batch_size": 2,
            "gradient_accumulation": 2,
            "max_steps_per_epoch": 8,
            "max_val_steps_per_epoch": 2,
            "max_epoch": max_epoch,
            "num_dataloader_workers": 2,
            # 1-device mesh: avoids the intermittent XLA:CPU 8-participant
            # collective deadlock inside long trainer runs (docs/SIGABRT.md)
            "mesh_shape": [1],
        },
        "model_config": {
            "basic_encoder_block": "BasicBlockD",
            "basic_decoder_block": "ConvBlock",
            "bottleneck_block": "BasicBlockD",
            "features_per_stage": [8, 16],
            "num_stages": 2,
            "n_blocks_per_stage": [1, 1],
            "n_conv_per_stage_decoder": [1],
            "kernel_sizes": [3, 3],
            "strides": [1, 2],
            "squeeze_excitation": True,
        },
        "dataset_config": {
            "min_bbox_percent": 0.5,
            "min_labeled_ratio": 0.1,
            "use_cache": False,
            "cache_folder": str(tmp_path / "cache"),
            "in_channels": 1,
            "volume_paths": [
                {"input": img_path, "sheet": lbl_path, "ref_label": "sheet"},
            ],
            "targets": {
                "sheet": {"channels": 1, "activation": "sigmoid",
                          "loss_fn": "BCEDiceLoss",
                          "loss_kwargs": {"alpha": 0.5, "beta": 0.5}},
            },
        },
        "inference_config": {},
    }


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


def test_train_two_epochs_and_resume(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    from mt3d_resenc_unet_tpu.train.trainer import Trainer

    cfg = _make_config(workdir, max_epoch=2)
    out = Trainer(config_dict=cfg, verbose=False).train()
    hist = out["history"]
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train/sheet_loss"])
    # training on an easy synthetic target should improve the loss
    assert hist[-1]["train/sheet_loss"] < hist[0]["train/sheet_loss"] + 0.05
    # checkpoints exist (epochs 0 and 1)
    ckpt_root = workdir / "ckpts" / "tinytest"
    saved = sorted(int(p.name) for p in ckpt_root.iterdir()
                   if p.name.isdigit())
    assert saved == [0, 1]
    # final weights dump
    assert os.path.isdir(workdir / "tinytest_final")

    # ---- resume: continues at epoch 2 ----
    cfg3 = _make_config(workdir, max_epoch=3, ckpt_path=str(ckpt_root))
    out2 = Trainer(config_dict=cfg3, verbose=False).train()
    assert [h["epoch"] for h in out2["history"]] == [2]

    # ---- weights-only fine-tune: starts over at epoch 0 ----
    cfg_ft = _make_config(workdir, max_epoch=1, ckpt_path=str(ckpt_root),
                          load_weights_only=True)
    out3 = Trainer(config_dict=cfg_ft, verbose=False).train()
    assert [h["epoch"] for h in out3["history"]] == [0]

    # debug gif produced during validation
    assert os.path.exists(workdir / "tinytest_debug.gif")


def test_debug_dataloader_mode(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    from mt3d_resenc_unet_tpu.train.trainer import Trainer

    cfg = _make_config(workdir)
    Trainer(config_dict=cfg, verbose=False,
            debug_dataloader=True).train()
    dumps = os.listdir(workdir / "debug_dir")
    assert any(f.endswith(".tif") for f in dumps)


def test_ckpt_interval_and_no_validation(tmp_path, monkeypatch):
    """ckpt_interval_epochs=0 skips per-epoch checkpoints (the final
    weights dump still happens) and max_val_steps_per_epoch=0 skips
    validation entirely — the bench.py train-e2e segment relies on both."""
    monkeypatch.chdir(tmp_path)
    from mt3d_resenc_unet_tpu.train.trainer import Trainer

    cfg = _make_config(tmp_path, max_epoch=2)
    cfg["tr_setup"]["ckpt_interval_epochs"] = 0
    cfg["tr_config"]["max_val_steps_per_epoch"] = 0
    out = Trainer(config_dict=cfg, verbose=False).train()
    hist = out["history"]
    assert len(hist) == 2
    assert all(not k.startswith("val/") for h in hist for k in h)
    ckpt_root = tmp_path / "ckpts" / "tinytest"
    saved = [p.name for p in ckpt_root.iterdir() if p.name.isdigit()]
    assert saved == []
    assert os.path.isdir(tmp_path / "tinytest_final")

    # interval 2 over 3 epochs: saves after epoch 2 (index 1) and the
    # last epoch (index 2)
    cfg2 = _make_config(tmp_path, max_epoch=3)
    cfg2["tr_setup"]["ckpt_interval_epochs"] = 2
    cfg2["tr_setup"]["ckpt_out_base"] = str(tmp_path / "ckpts2")
    Trainer(config_dict=cfg2, verbose=False).train()
    saved = sorted(int(p.name) for p in (tmp_path / "ckpts2" / "tinytest").iterdir()
                   if p.name.isdigit())
    assert saved == [1, 2]

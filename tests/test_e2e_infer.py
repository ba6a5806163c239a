"""Full-loop test (SURVEY.md §4(d)): synthetic zarr volume -> short training
-> sliding-window inference -> Dice threshold on the final quantized output,
plus postprocess-only resume."""

import os
import shutil

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.data.zio import create_zarr, open_zarr

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e_infer")
    rng = np.random.default_rng(1)
    mask = np.zeros((32, 32, 32), np.uint8)
    # blobby slab: training patches contain BOTH classes so the model must
    # actually discriminate on intensity
    mask[:, 4:28, :] = (rng.random((32, 24, 32)) > 0.4).astype(np.uint8)
    img = (mask * 200 + rng.integers(0, 40, mask.shape)).astype(np.uint8)
    # uint8 masks follow the 0/255 convention (targets are scaled /255,
    # reference: dataset.py:157-161)
    lbl = mask * np.uint8(255)
    img_path = str(tmp / "img.zarr")
    lbl_path = str(tmp / "lbl.zarr")
    create_zarr(img_path, img.shape, img.dtype, (16, 16, 16))[...] = img
    create_zarr(lbl_path, lbl.shape, lbl.dtype, (16, 16, 16))[...] = lbl

    cfg = {
        "tr_setup": {"model_name": "e2einf", "autoconfigure": False,
                     "tr_val_split": 0.9,
                     "ckpt_out_base": str(tmp / "ckpts"),
                     "tensorboard_log_dir": str(tmp / "logs"), "seed": 0},
        "tr_config": {"optimizer": "AdamW", "initial_lr": 1e-2,
                      "patch_size": [16, 16, 16], "batch_size": 4,
                      "max_steps_per_epoch": 30, "max_val_steps_per_epoch": 1,
                      "max_epoch": 4, "num_dataloader_workers": 2,
                      # 1-device mesh: XLA:CPU 8-participant collectives
                      # intermittently deadlock inside one multi-epoch
                      # trainer run (docs/SIGABRT.md); data-parallel
                      # collectives are covered by test_sharding /
                      # test_distributed, which run short synchronous steps
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
            "use_cache": False, "cache_folder": str(tmp / "cache"),
            "in_channels": 1,
            "volume_paths": [{"input": img_path, "sheet": lbl_path,
                              "ref_label": "sheet"}],
            "targets": {"sheet": {"channels": 1, "activation": "sigmoid",
                                  "loss_fn": "BCEDiceLoss"}}},
        "inference_config": {
            "checkpoint_path": str(tmp / "ckpts" / "e2einf"),
            "input_path": img_path,
            "output_path": str(tmp / "out"),
            "overlap": 0.25, "patch_size": [16, 16, 16], "batch_size": 4,
            "normalization": "none",
            "output_targets": ["sheet"]},
    }
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        from mt3d_resenc_unet_tpu.train.trainer import Trainer
        Trainer(config_dict=cfg, verbose=False).train()
    finally:
        os.chdir(cwd)
    return tmp, cfg, img, lbl


def test_infer_end_to_end(trained):
    tmp, cfg, img, lbl = trained
    from mt3d_resenc_unet_tpu.infer.engine import ZarrInferenceEngine

    engine = ZarrInferenceEngine(config_dict=cfg)
    store = engine.infer()

    # structure parity: sum/count/final datasets exist
    for suffix in ("sum", "count", "final"):
        assert os.path.isdir(os.path.join(store, f"sheet_{suffix}"))

    final = open_zarr(os.path.join(store, "sheet_final")).read_all()
    assert final.dtype == np.uint8
    assert final.shape == img.shape
    pred = (final > 127).astype(np.float32)
    gt = lbl.astype(np.float32)
    dice = 2 * (pred * gt).sum() / (pred.sum() + gt.sum() + 1e-8)
    assert dice > 0.7, f"dice {dice}"

    # exists-guard parity (reference: inference.py:70-74)
    with pytest.raises(FileExistsError):
        ZarrInferenceEngine(config_dict=cfg).infer()


def test_postprocess_only(trained):
    tmp, cfg, img, lbl = trained
    from mt3d_resenc_unet_tpu.infer.engine import ZarrInferenceEngine

    store = os.path.join(cfg["inference_config"]["output_path"],
                         "predictions.zarr")
    before = open_zarr(os.path.join(store, "sheet_final")).read_all()
    # wipe final, rerun postprocess-only; averages are idempotent only via
    # sums, so rebuild from an un-averaged copy: here we just verify the mode
    # runs and reproduces a final dataset
    shutil.rmtree(os.path.join(store, "sheet_final"))
    engine = ZarrInferenceEngine(config_dict=cfg, postprocess_only=True)
    engine.infer()
    after = open_zarr(os.path.join(store, "sheet_final")).read_all()
    assert after.shape == before.shape

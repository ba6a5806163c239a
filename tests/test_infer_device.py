"""On-device accumulation mode (infer/engine.py _run_model_pass_device):
forward + Gaussian weighting + overlap scatter-add + finalize + quantize all
in HBM, finals-only output. Must agree with the host rolling path on the same
volume/checkpoint (reference end-to-end surface: inference.py:117-263)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mt3d_resenc_unet_tpu.data.zio import create_zarr, open_zarr
from mt3d_resenc_unet_tpu.infer.engine import ZarrInferenceEngine

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dev_accum")
    rng = np.random.default_rng(5)
    shape = (32, 32, 32)
    img = rng.integers(0, 255, shape).astype(np.uint8)
    img_path = str(tmp / "img.zarr")
    create_zarr(img_path, shape, np.uint8, (16, 16, 16))[...] = img

    # random-initialized two-head model saved as a checkpoint
    from mt3d_resenc_unet_tpu.core.config import ConfigManager
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.checkpoint import save_params

    def cfg(out, device_mode, write_sums=False):
        return {
            "tr_setup": {"model_name": "devacc", "autoconfigure": False},
            "tr_config": {"patch_size": [16, 16, 16], "batch_size": 4},
            "model_config": {
                "basic_encoder_block": "BasicBlockD",
                "basic_decoder_block": "ConvBlock",
                "bottleneck_block": "BasicBlockD",
                "features_per_stage": [8, 16], "num_stages": 2,
                "n_blocks_per_stage": [1, 1],
                "n_conv_per_stage_decoder": [1],
                "kernel_sizes": [3, 3], "strides": [1, 2]},
            "dataset_config": {
                "in_channels": 1,
                "volume_paths": [],
                "targets": {
                    "sheet": {"channels": 1, "activation": "sigmoid"},
                    "normals": {"channels": 3, "activation": "none"}}},
            "inference_config": {
                "checkpoint_path": str(tmp / "params"),
                "input_path": img_path,
                "output_path": str(tmp / out),
                "overlap": 0.5, "patch_size": [16, 16, 16],
                "batch_size": 4, "normalization": "standardize",
                "gaussian_blend": True,
                "device_accumulate": device_mode,
                "write_sums": write_sums,
                "output_targets": ["sheet", "normals"]},
        }

    mgr = ConfigManager(config_dict=cfg("x", False))
    plan = mgr.build_plan()
    model = ResEncUNet(plan=plan)
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    params = jax.device_get(jax.jit(lambda: model.init(
        {"params": jax.random.key(2)}, x, train=False))()["params"])
    save_params(str(tmp / "params"), params)
    return tmp, cfg, img


def test_device_accum_matches_host(setup):
    tmp, cfg, img = setup
    ZarrInferenceEngine(config_dict=cfg("host_out", False)).infer()
    store_d = ZarrInferenceEngine(config_dict=cfg("dev_out", True)).infer()

    host_store = str(tmp / "host_out" / "predictions.zarr")
    # device mode writes finals only (write_sums False by default)
    assert not os.path.isdir(os.path.join(store_d, "sheet_sum"))
    assert os.path.exists(os.path.join(store_d, ".finalized_sheet"))
    _assert_outputs_close(store_d, host_store)


def _assert_outputs_close(store_a, store_b):
    """The two paths reassociate float reductions (device standardize,
    scan-order accumulation) and the bf16 forward amplifies input ulps, so
    outputs agree to arithmetic noise, not bitwise: probabilities within a
    few u8 levels, normals (unit vectors after renormalize) within ~1e-2
    except a vanishing tail where near-parallel cancellation makes the
    direction ill-conditioned."""
    fd = open_zarr(os.path.join(store_a, "sheet_final")).read_all()
    fh = open_zarr(os.path.join(store_b, "sheet_final")).read_all()
    assert fd.dtype == np.uint8 and fd.shape == fh.shape
    diff = np.abs(fd.astype(np.int64) - fh.astype(np.int64))
    assert np.median(diff) <= 1, f"sheet: median {np.median(diff)}"
    assert (diff > 3).mean() < 5e-3, f"sheet: {(diff > 3).mean():.5f} > 3"

    nd = open_zarr(os.path.join(store_a, "normals_final")).read_all()
    nh = open_zarr(os.path.join(store_b, "normals_final")).read_all()
    assert nd.dtype == np.uint16 and nd.shape == nh.shape
    vd = nd.astype(np.float32) / 32767.5 - 1.0
    vh = nh.astype(np.float32) / 32767.5 - 1.0
    err = np.linalg.norm(vd - vh, axis=0)
    # a bf16 ulp is ~0.4% relative, so unit-direction differences of a few
    # 1e-2 between two differently-batched forwards are ordinary rounding;
    # the tight MEAN bound is what catches a systematic path bug
    assert float(err.mean()) < 1e-3, f"normals mean err {err.mean():.2e}"
    assert (err > 3e-2).mean() < 5e-3, \
        f"normals: {(err > 3e-2).mean():.5f} voxels err > 3e-2"


def test_device_accum_write_sums_postprocess(setup):
    """write_sums=True persists raw sums/counts from the device and defers
    finalize/quantize to the standard host pass."""
    tmp, cfg, img = setup
    store = ZarrInferenceEngine(
        config_dict=cfg("dev_sums_out", True, write_sums=True)).infer()
    for suffix in ("sum", "count", "final"):
        assert os.path.isdir(os.path.join(store, f"sheet_{suffix}"))
    host_store = str(tmp / "host_out" / "predictions.zarr")
    _assert_outputs_close(store, host_store)


def test_device_accum_exists_guard(setup):
    tmp, cfg, img = setup
    with pytest.raises(FileExistsError):
        ZarrInferenceEngine(config_dict=cfg("dev_out", True)).infer()

"""Tiled (host-RAM-bounded, resumable) and mesh-sharded inference:

* tiled accumulation == rolling accumulation on the same volume/checkpoint;
* peak slab allocation stays under the configured host-RAM budget even when
  the full-plane rolling slab would exceed it;
* a model pass killed after N tiles resumes (--resume) to BIT-IDENTICAL sums;
* the forward runs sharded over the 8-virtual-device CPU mesh (conftest) and
  matches.
"""

import os

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.data.zio import create_zarr, open_zarr
from mt3d_resenc_unet_tpu.infer.engine import ZarrInferenceEngine

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_manual_config
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.checkpoint import save_params

    tmp = tmp_path_factory.mktemp("tiled")
    rng = np.random.default_rng(3)
    vol = rng.integers(0, 255, (40, 40, 40)).astype(np.uint8)
    img_path = str(tmp / "img.zarr")
    create_zarr(img_path, vol.shape, vol.dtype, (20, 20, 20))[...] = vol

    model_config = dict(
        basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
        bottleneck_block="BasicBlockD", features_per_stage=[8, 16],
        num_stages=2, n_blocks_per_stage=[1, 1], n_conv_per_stage_decoder=[1],
        kernel_sizes=3, strides=[1, 2])
    plan = plan_from_manual_config(model_config, (16, 16, 16), 1,
                                   [TaskHead("sheet", 1, "sigmoid")])
    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = jax.device_get(model.init(
        {"params": jax.random.key(7)}, x, train=False)["params"])
    ckpt = str(tmp / "params")
    save_params(ckpt, params)
    return tmp, img_path, ckpt, model_config


def _cfg(setup, out_dir, budget_gb=8.0):
    tmp, img_path, ckpt, model_config = setup
    return {
        "tr_setup": {"model_name": "tiled", "autoconfigure": False},
        "tr_config": {"patch_size": [16, 16, 16], "batch_size": 4},
        "model_config": model_config,
        "dataset_config": {
            "in_channels": 1,
            "targets": {"sheet": {"channels": 1, "activation": "sigmoid"}},
            "volume_paths": []},
        "inference_config": {
            "checkpoint_path": ckpt, "input_path": img_path,
            "output_path": str(out_dir), "overlap": 0.25,
            "patch_size": [16, 16, 16], "batch_size": 4,
            "normalization": "none",
            "host_ram_budget_gb": budget_gb},
    }


# budget forcing tiles on the 40^3 volume: the rolling slab is
# (1+1)*2*16*40*40*4 = 819kB; 300kB forces (z, y-band) tiling while still
# fitting one 32-z x 19-row band tile
_TILE_BUDGET_GB = 300_000 / 2 ** 30


def test_tiled_matches_rolling_and_respects_budget(setup, tmp_path):
    tmp = tmp_path
    eng_roll = ZarrInferenceEngine(config_dict=_cfg(setup, tmp / "roll"))
    store_r = eng_roll.infer()
    eng_tile = ZarrInferenceEngine(
        config_dict=_cfg(setup, tmp / "tile", budget_gb=_TILE_BUDGET_GB))
    store_t = eng_tile.infer()

    assert eng_tile.max_slab_bytes <= 300_000
    assert eng_tile.max_slab_bytes < eng_roll.max_slab_bytes
    assert os.path.exists(os.path.join(store_t,
                                       ".model_pass_progress.json"))
    for ds in ("sheet_sum", "sheet_count", "sheet_final"):
        a = open_zarr(os.path.join(store_r, ds)).read_all()
        b = open_zarr(os.path.join(store_t, ds)).read_all()
        np.testing.assert_allclose(
            a.astype(np.float32), b.astype(np.float32), atol=2e-4,
            err_msg=ds)


def test_resume_bit_identical(setup, tmp_path):
    tmp = tmp_path

    # uninterrupted tiled reference
    eng_ref = ZarrInferenceEngine(
        config_dict=_cfg(setup, tmp / "ref", budget_gb=_TILE_BUDGET_GB))
    store_ref = eng_ref.infer()

    # killed after the first tile
    class _Kill(Exception):
        pass

    eng_a = ZarrInferenceEngine(
        config_dict=_cfg(setup, tmp / "res", budget_gb=_TILE_BUDGET_GB))
    tiles_seen = []

    def killer(tile):
        tiles_seen.append(tile)
        if len(tiles_seen) == 1:
            raise _Kill()

    eng_a.tile_callback = killer
    with pytest.raises(_Kill):
        eng_a.infer()

    # resume completes the remaining tiles
    eng_b = ZarrInferenceEngine(
        config_dict=_cfg(setup, tmp / "res", budget_gb=_TILE_BUDGET_GB),
        resume=True)
    store_res = eng_b.infer()

    for ds in ("sheet_sum", "sheet_count", "sheet_final"):
        a = open_zarr(os.path.join(store_ref, ds)).read_all()
        b = open_zarr(os.path.join(store_res, ds)).read_all()
        np.testing.assert_array_equal(a, b, err_msg=ds)


def test_rolling_budget_covers_actual_peak_at_high_overlap(setup, tmp_path):
    """overlap > 0.5 makes z-steps < patch_z/2; the static slab estimate used
    for rolling-vs-tiled mode selection must still bound the REAL peak
    allocation (max_slab_bytes now tracks actual numpy allocations)."""
    cfg = _cfg(setup, tmp_path / "hov")
    cfg["inference_config"]["overlap"] = 0.6
    eng = ZarrInferenceEngine(config_dict=cfg)
    eng.infer()
    est = eng._rolling_slab_bytes(eng.mgr.infer_output_targets,
                                  (40, 40, 40), (16, 16, 16), 0.6)
    assert 0 < eng.max_slab_bytes <= est


def test_rolling_store_cannot_resume(setup, tmp_path):
    """A rolling-mode store has no tile watermark; --resume must fail with a
    clear error instead of the tiled path's misleading FileExistsError."""
    cfg = _cfg(setup, tmp_path / "roll2")
    ZarrInferenceEngine(config_dict=cfg).infer()
    with pytest.raises(RuntimeError, match="rolling-mode"):
        ZarrInferenceEngine(config_dict=cfg, resume=True).infer()


def test_fresh_run_still_guards_overwrite(setup, tmp_path):
    cfg = _cfg(setup, tmp_path / "o", budget_gb=_TILE_BUDGET_GB)
    ZarrInferenceEngine(config_dict=cfg).infer()
    with pytest.raises(FileExistsError):
        ZarrInferenceEngine(config_dict=cfg).infer()


def test_sharded_forward_matches_single_device(setup, tmp_path, monkeypatch):
    """The mesh-sharded inference forward (8 virtual devices here) produces
    the same outputs as a single-device run of the identical engine."""
    import jax as _jax
    from mt3d_resenc_unet_tpu.infer import engine as engine_mod

    assert len(_jax.devices()) == 8  # conftest forces the virtual CPU mesh
    eng_multi = ZarrInferenceEngine(config_dict=_cfg(setup, tmp_path / "m"))
    store_m = eng_multi.infer()

    dev0 = _jax.devices()[0]
    monkeypatch.setattr(engine_mod.jax, "devices", lambda: [dev0])
    try:
        eng_single = ZarrInferenceEngine(
            config_dict=_cfg(setup, tmp_path / "s"))
        store_s = eng_single.infer()
    finally:
        monkeypatch.undo()

    for ds in ("sheet_sum", "sheet_count", "sheet_final"):
        a = open_zarr(os.path.join(store_m, ds)).read_all()
        b = open_zarr(os.path.join(store_s, ds)).read_all()
        np.testing.assert_allclose(a.astype(np.float32),
                                   b.astype(np.float32), atol=2e-4,
                                   err_msg=ds)

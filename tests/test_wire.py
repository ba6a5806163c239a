"""Wire-format transfer: compact stored dtypes host->device, decoded inside
the jitted step with arithmetic identical to the host LUT path (zio.py).

The wire mode exists because tunneled/weak TPU hosts move only a few hundred
MB/s host->device; shipping float32 samples (42 MB each at 128^3 with a
3-channel normals head) would cap training below the step rate. The decode
must be exactly equivalent so the mode changes performance, never numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mt3d_resenc_unet_tpu.core.config import ConfigManager
from mt3d_resenc_unet_tpu.data.dataset import ZarrPatchDataset
from mt3d_resenc_unet_tpu.data.zio import create_zarr, encode_normals_u16
from mt3d_resenc_unet_tpu.train.step import decode_wire


@pytest.fixture(scope="module")
def volume_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("wire_vols")
    rng = np.random.default_rng(7)
    shape = (48, 48, 48)
    img = rng.integers(0, 255, shape).astype(np.uint8)
    sheet = np.zeros(shape, np.uint8)
    sheet[8:40, 8:40, 8:40] = 255
    vec = rng.standard_normal(shape + (3,)).astype(np.float32)
    vec /= np.maximum(np.linalg.norm(vec, axis=-1, keepdims=True), 1e-6)
    create_zarr(str(root / "img.zarr"), shape, np.uint8, (16,) * 3)[...] = img
    create_zarr(str(root / "sheet.zarr"), shape, np.uint8, (16,) * 3)[...] = sheet
    nz = create_zarr(str(root / "normals.zarr"), shape + (3,), np.uint16,
                     (16, 16, 16, 3))
    nz[...] = encode_normals_u16(vec)
    return root


def _mgr(root, tmp_path):
    cfg = {
        "tr_setup": {"model_name": "wire_test", "autoconfigure": True},
        "tr_config": {"patch_size": [16, 16, 16], "batch_size": 2},
        "model_config": {},
        "dataset_config": {
            "min_bbox_percent": 0.1, "min_labeled_ratio": 0.05,
            "use_cache": False, "cache_folder": str(tmp_path / "cache"),
            "in_channels": 1,
            "volume_paths": [{
                "input": str(root / "img.zarr"),
                "sheet": str(root / "sheet.zarr"),
                "normals": str(root / "normals.zarr"),
                "ref_label": "sheet"}],
            "targets": {
                "sheet": {"channels": 1, "activation": "sigmoid",
                          "loss_fn": "BCEDiceLoss",
                          "loss_kwargs": {"alpha": 0.5, "beta": 0.5}},
                "normals": {"channels": 3, "activation": "none",
                            "loss_fn": "MaskedCosineLoss"}}},
        "inference_config": {},
    }
    return ConfigManager(config_dict=cfg)


def test_wire_dtypes_compact(volume_dir, tmp_path):
    ds = ZarrPatchDataset(_mgr(volume_dir, tmp_path), wire=True, seed=3)
    assert len(ds) > 0
    s = ds[0]
    assert s["sheet"].dtype == np.uint8
    assert s["normals"].dtype == np.uint16
    # image is uint8 when untouched by intensity ops, bf16 after them
    assert s["image"].dtype.itemsize <= 2


def test_wire_decode_matches_float_path(volume_dir, tmp_path):
    """dataset(wire) + decode_wire == dataset(float), for augmented samples
    (same seed => same rng draws) — exact for targets, bf16-cast for image."""
    mgr = _mgr(volume_dir, tmp_path)
    ds_f = ZarrPatchDataset(mgr, wire=False, seed=11)
    ds_w = ZarrPatchDataset(mgr, wire=True, seed=11)
    for idx in range(min(6, len(ds_f))):
        a = ds_f[idx]
        b = decode_wire({k: jnp.asarray(v) for k, v in ds_w[idx].items()},
                        normal_keys=("normals",), upcast_bf16=True)
        b = {k: np.asarray(v) for k, v in b.items()}
        np.testing.assert_array_equal(a["sheet"], b["sheet"],
                                      err_msg=f"sheet idx={idx}")
        np.testing.assert_array_equal(a["normals"], b["normals"],
                                      err_msg=f"normals idx={idx}")
        # image: identical after the bf16 rounding the model's stem applies
        # to BOTH paths (wire may legitimately ship the raw uint8 when no
        # intensity op fired; the stem's own input cast reconverges them)
        import ml_dtypes
        np.testing.assert_array_equal(
            a["image"].astype(ml_dtypes.bfloat16).astype(np.float32),
            b["image"].astype(ml_dtypes.bfloat16).astype(np.float32),
            err_msg=f"image idx={idx}")


def test_wire_decode_matches_unaugmented(volume_dir, tmp_path):
    mgr = _mgr(volume_dir, tmp_path)
    ds_f = ZarrPatchDataset(mgr, wire=False, augment=False)
    ds_w = ZarrPatchDataset(mgr, wire=True, augment=False)
    a = ds_f[1]
    b = decode_wire({k: jnp.asarray(v) for k, v in ds_w[1].items()},
                    upcast_bf16=True)
    for k in a:
        np.testing.assert_array_equal(a[k], np.asarray(b[k]), err_msg=k)


def test_wire_dilate_roundtrip(volume_dir, tmp_path):
    mgr = _mgr(volume_dir, tmp_path)
    mgr.dilate_label = True
    ds_f = ZarrPatchDataset(mgr, wire=False, augment=False)
    ds_w = ZarrPatchDataset(mgr, wire=True, augment=False)
    a, b = ds_f[0], ds_w[0]
    assert b["sheet"].dtype == np.uint8
    dec = np.asarray(decode_wire({"sheet": jnp.asarray(b["sheet"])})["sheet"])
    np.testing.assert_array_equal(a["sheet"], dec)


def test_encoded_normals_geometric_exact():
    """Sign flips on uint16-encoded normals (65535 - u) decode to exactly the
    negation of the decoded-then-flipped float path."""
    from mt3d_resenc_unet_tpu.data.augment import apply_geometric_ops
    from mt3d_resenc_unet_tpu.data.zio import decode_normals

    rng = np.random.default_rng(0)
    enc = rng.integers(0, 65536, (6, 6, 6, 3)).astype(np.uint16)
    dec = decode_normals(enc, np.uint16)
    ops = [("flip", 0), ("rot90", "z", 1), ("flip", 2)]
    out_enc = apply_geometric_ops({"normals": enc}, ops)["normals"]
    out_dec = apply_geometric_ops({"normals": dec}, ops)["normals"]
    assert out_enc.dtype == np.uint16
    np.testing.assert_allclose(decode_normals(out_enc, np.uint16), out_dec,
                               atol=1e-6)

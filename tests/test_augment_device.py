"""Device-side augmentation (data/augment_device.py): the stochastic sample
pipeline inside the jitted train step.

Strategy: the host pipeline (data/augment.py, itself reference-parity-tested
in test_augment.py) is the semantic definition. The deterministic cores —
flip geometry + normals negation, rot90 geometry + component rotation,
downscale arithmetic — are compared against the host implementations
directly; the stochastic stages are checked for gate correctness (p=0 is
identity, p=1 transforms), shape/dtype preservation, and jit/vmap safety.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mt3d_resenc_unet_tpu.data import augment as haug
from mt3d_resenc_unet_tpu.data.augment_device import (
    DeviceAugConfig, _cutout_mask, _downscale, _flip_batch, _rot90_tree,
    make_device_augment)


@pytest.fixture()
def batch(rng):
    shape = (2, 8, 8, 8)
    img = rng.random(shape + (1,), dtype=np.float32)
    sheet = (rng.random(shape + (1,)) > 0.5).astype(np.float32)
    vec = rng.standard_normal(shape + (3,)).astype(np.float32)
    vec /= np.maximum(np.linalg.norm(vec, axis=-1, keepdims=True), 1e-6)
    return {"image": jnp.asarray(img), "sheet": jnp.asarray(sheet),
            "normals": jnp.asarray(vec)}


# ---------------------------------------------------------------- geometric

@pytest.mark.parametrize("axis", [0, 1, 2])
def test_flip_matches_host(batch, axis):
    flags = np.zeros((2, 3), bool)
    flags[0, axis] = True     # sample 0 flipped, sample 1 untouched
    out = _flip_batch(batch, jnp.asarray(flags))
    host_in = {k: np.asarray(v[0]) for k, v in batch.items()}
    host_out = haug.flip_with_normals(host_in, axis)
    for k in batch:
        np.testing.assert_allclose(np.asarray(out[k][0]), host_out[k],
                                   rtol=0, atol=0, err_msg=k)
        np.testing.assert_array_equal(np.asarray(out[k][1]),
                                      np.asarray(batch[k][1]), err_msg=k)


@pytest.mark.parametrize("axis", ["z", "y", "x"])
@pytest.mark.parametrize("k", [1, 2, 3])
def test_rot90_matches_host(batch, axis, k):
    out = _rot90_tree(batch, axis, k)
    for s in range(2):
        host_in = {kk: np.asarray(v[s]) for kk, v in batch.items()}
        host_out = haug.rot90_with_normals(host_in, axis, k)
        for kk in batch:
            np.testing.assert_allclose(np.asarray(out[kk][s]), host_out[kk],
                                       rtol=0, atol=1e-6,
                                       err_msg=f"{kk} axis={axis} k={k}")


def test_downscale_box_average(batch):
    img = batch["image"]
    out = _downscale(img, None, 2)
    # the 4x4-block means of the output equal the 4x4-block means of the
    # input (box-average down + bilinear up preserves block means at the
    # subsampled grid points used by INTER_AREA)
    b, d, h, w, c = img.shape
    blocks_in = np.asarray(img, np.float32).reshape(
        b, d, h // 4, 4, w // 4, 4, c).mean(axis=(3, 5))
    assert out.shape == img.shape and out.dtype == img.dtype
    # bilinear upsample by 4 reproduces the source value at aligned centers
    up = np.asarray(out, np.float32).reshape(
        b, d, h // 4, 4, w // 4, 4, c)
    np.testing.assert_allclose(up.mean(axis=(3, 5)), blocks_in, atol=0.15)


def test_cutout_mask_geometry():
    key = jax.random.key(0)
    mask = _cutout_mask(key, 4, (8, 8, 8), (1, 4), (0.1, 0.4))
    assert mask.shape == (4, 8, 8, 8) and mask.dtype == jnp.bool_
    frac = np.asarray(mask, np.float32).mean(axis=(1, 2, 3))
    # 1-4 holes of extent 0.1-0.4 per axis: nonzero, far from everything
    assert (frac > 0).all() and (frac < 0.5).all()


# ---------------------------------------------------------------- pipeline

def test_p0_is_identity(batch):
    cfg = DeviceAugConfig(p_intensity_1=0, p_intensity_2=0, p_blur=0,
                          p_cutout=0, p_flip_transform=0, p_rot90=0)
    aug = make_device_augment(cfg)
    out = jax.jit(aug)(batch, jax.random.key(1))
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(batch[k]), err_msg=k)


def test_p1_transforms_image_not_targets_values(batch):
    """p=1 intensity+cutout must change the image; geometric stages off so
    targets are bitwise untouched."""
    cfg = DeviceAugConfig(p_intensity_1=1.0, p_intensity_2=1.0, p_blur=1.0,
                          p_cutout=1.0, p_flip_transform=0.0, p_rot90=0.0)
    aug = make_device_augment(cfg)
    out = jax.jit(aug)(batch, jax.random.key(2))
    assert not np.allclose(np.asarray(out["image"]),
                           np.asarray(batch["image"]))
    np.testing.assert_array_equal(np.asarray(out["sheet"]),
                                  np.asarray(batch["sheet"]))
    np.testing.assert_array_equal(np.asarray(out["normals"]),
                                  np.asarray(batch["normals"]))
    assert out["image"].shape == batch["image"].shape
    assert out["image"].dtype == batch["image"].dtype
    # intensity ops clip to [0, 1]
    img = np.asarray(out["image"], np.float32)
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_blur_types_all_compile(batch):
    """Every lax.switch branch (motion/defocus/downscale/advanced) traces and
    produces the right shape — exercised by running many keys."""
    cfg = DeviceAugConfig(p_intensity_1=0, p_intensity_2=0, p_blur=1.0,
                          p_cutout=0, p_flip_transform=0, p_rot90=0)
    aug = jax.jit(make_device_augment(cfg))
    seen_change = 0
    for i in range(8):   # blur type is drawn per step; 8 keys cover all 4
        out = aug(batch, jax.random.key(i))
        assert out["image"].shape == batch["image"].shape
        if not np.allclose(np.asarray(out["image"]),
                           np.asarray(batch["image"]), atol=1e-4):
            seen_change += 1
    assert seen_change >= 6   # blurs genuinely modify the image


def test_geometric_consistency_image_and_targets(batch):
    """Geometric-only pipeline applies the SAME spatial op to image and all
    targets: a distinctive corner voxel moves identically everywhere."""
    cfg = DeviceAugConfig(p_intensity_1=0, p_intensity_2=0, p_blur=0,
                          p_cutout=0, p_flip_transform=1.0, p_flip_axis=1.0,
                          p_rot90=0.0)
    marked = {k: np.asarray(v).copy() for k, v in batch.items()}
    for k in marked:
        marked[k][:, 0, 0, 0, :] = 9.0   # tag one corner in every array
    aug = make_device_augment(cfg)
    out = jax.jit(aug)({k: jnp.asarray(v) for k, v in marked.items()},
                       jax.random.key(5))
    # all axes flipped => corner moves to (-1,-1,-1) in every array
    for k in ("image", "sheet"):
        arr = np.asarray(out[k])
        assert (arr[:, -1, -1, -1, :] == 9.0).all(), k
    # normals: flipped on all 3 axes => all components negated
    arr = np.asarray(out["normals"])
    assert (arr[:, -1, -1, -1, :] == -9.0).all()


def test_wire_decoded_batch_roundtrip(batch):
    """The full pipeline accepts the decode_wire output dict and is
    jit-stable across calls (single compilation)."""
    aug = make_device_augment()
    jitted = jax.jit(aug)
    o1 = jitted(batch, jax.random.key(0))
    o2 = jitted(batch, jax.random.key(1))
    assert o1["image"].shape == o2["image"].shape
    # different keys => different draws somewhere in the pipeline
    assert any(not np.array_equal(np.asarray(o1[k]), np.asarray(o2[k]))
               for k in o1)


def test_train_step_with_device_augment(batch):
    """make_train_step(augment_fn=...) compiles and updates params."""
    import optax
    from mt3d_resenc_unet_tpu.train.losses import build_task_losses
    from mt3d_resenc_unet_tpu.train.step import TrainState, make_train_step

    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, apply_activations=True):
            h = nn.Conv(4, (3, 3, 3), padding="SAME")(x)
            return {"sheet": nn.Conv(1, (1, 1, 1))(h),
                    "normals": nn.Conv(3, (1, 1, 1))(h)}

    tasks = {"sheet": {"channels": 1, "activation": "sigmoid",
                       "loss_fn": "BCEDiceLoss"},
             "normals": {"channels": 3, "activation": "none",
                         "loss_fn": "MaskedCosineLoss"}}
    model = Tiny()
    params = model.init(jax.random.key(0), batch["image"])["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.adamw(1e-3), rng=jax.random.key(1))
    loss_fns = build_task_losses(tasks)
    step = make_train_step(model, loss_fns, {"sheet": 1.0, "normals": 1.0},
                           augment_fn=make_device_augment(), donate=False)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    changed = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: not np.array_equal(a, b),
                     state.params, new_state.params))
    assert changed


# ---------------------------------------------------------------- RAM cache

def test_ram_cached_dataset_identical(tmp_path, rng):
    """ram_cache_volumes=True serves bit-identical samples to the
    tensorstore path (data/zio.py RamVolume)."""
    from mt3d_resenc_unet_tpu.core.config import ConfigManager
    from mt3d_resenc_unet_tpu.data.dataset import ZarrPatchDataset
    from mt3d_resenc_unet_tpu.data.zio import create_zarr

    shape = (32, 32, 32)
    img = rng.integers(0, 255, shape).astype(np.uint8)
    sheet = np.zeros(shape, np.uint8)
    sheet[4:28, 4:28, 4:28] = 255
    create_zarr(str(tmp_path / "img.zarr"), shape, np.uint8,
                (16,) * 3)[...] = img
    create_zarr(str(tmp_path / "sheet.zarr"), shape, np.uint8,
                (16,) * 3)[...] = sheet

    def mgr(ram):
        return ConfigManager(config_dict={
            "tr_setup": {"model_name": "ramtest", "autoconfigure": True},
            "tr_config": {"patch_size": [16, 16, 16], "batch_size": 1},
            "model_config": {},
            "dataset_config": {
                "min_bbox_percent": 0.1, "min_labeled_ratio": 0.05,
                "use_cache": False, "cache_folder": str(tmp_path / "c"),
                "ram_cache_volumes": ram, "in_channels": 1,
                "volume_paths": [{"input": str(tmp_path / "img.zarr"),
                                  "sheet": str(tmp_path / "sheet.zarr"),
                                  "ref_label": "sheet"}],
                "targets": {"sheet": {"channels": 1,
                                      "activation": "sigmoid",
                                      "loss_fn": "BCEDiceLoss"}}},
            "inference_config": {},
        })

    ds_ts = ZarrPatchDataset(mgr(False), seed=3)
    ds_ram = ZarrPatchDataset(mgr(True), seed=3)
    from mt3d_resenc_unet_tpu.data.zio import RamVolume
    assert isinstance(ds_ram.volumes[0].input, RamVolume)
    assert not isinstance(ds_ts.volumes[0].input, RamVolume)
    assert len(ds_ts) == len(ds_ram) > 0
    for i in (0, len(ds_ts) // 2, len(ds_ts) - 1):
        a, b = ds_ts[i], ds_ram[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

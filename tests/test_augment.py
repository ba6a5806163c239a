"""Geometric-augmentation correctness: rotate/flip a synthetic normal field
and verify the component remapping by recomputing the field after the
transform (SURVEY.md §4: 'rotate-then-recompute')."""

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.data import augment as aug


def _gradient_field(shape=(8, 8, 8)):
    """A smooth scalar field and its gradient as a channels-last normal
    field: component order (nx, ny, nz) with x the last spatial axis."""
    z, y, x = np.meshgrid(np.linspace(0, 1, shape[0]),
                          np.linspace(0, 2, shape[1]),
                          np.linspace(0, 3, shape[2]), indexing="ij")
    phi = np.sin(2 * z) + np.cos(3 * y) * x + 0.5 * x * x * z
    gz, gy, gx = np.gradient(phi)
    normals = np.stack([gx, gy, gz], axis=-1).astype(np.float32)
    return phi.astype(np.float32), normals


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_flip_matches_recomputed_gradient(axis):
    phi, normals = _gradient_field()
    out = aug.flip_with_normals({"image": phi, "normals": normals}, axis)
    # recompute gradient of the flipped scalar field
    gz, gy, gx = np.gradient(out["image"])
    want = np.stack([gx, gy, gz], axis=-1)
    np.testing.assert_allclose(out["normals"], want, atol=1e-5)


@pytest.mark.parametrize("axis", ["z", "y", "x"])
@pytest.mark.parametrize("k", [1, 2, 3])
def test_rot90_matches_recomputed_gradient(axis, k):
    phi, normals = _gradient_field((8, 8, 8))
    out = aug.rot90_with_normals({"image": phi, "normals": normals}, axis, k)
    gz, gy, gx = np.gradient(out["image"])
    want = np.stack([gx, gy, gz], axis=-1)
    np.testing.assert_allclose(out["normals"], want, atol=1e-5)


def test_flip_involution():
    phi, normals = _gradient_field()
    d = {"image": phi, "normals": normals}
    twice = aug.flip_with_normals(aug.flip_with_normals(d, 1), 1)
    np.testing.assert_allclose(twice["normals"], normals)
    np.testing.assert_allclose(twice["image"], phi)


def test_rot90_full_turn_identity():
    phi, normals = _gradient_field()
    d = {"image": phi, "normals": normals}
    for _ in range(4):
        d = aug.rot90_with_normals(d, "y", 1)
    np.testing.assert_allclose(d["normals"], normals, atol=1e-6)


def test_intensity_augs_preserve_shape_and_range(rng):
    x = rng.random((16, 16, 16)).astype(np.float32)
    for fn in (aug.brightness_contrast, aug.illumination,
               aug.multiplicative_noise, aug.gaussian_noise,
               aug.motion_blur, aug.defocus, aug.downscale,
               aug.advanced_blur):
        y = fn(x, rng)
        assert y.shape == x.shape, fn.__name__
        assert np.isfinite(y).all(), fn.__name__


def test_coarse_dropout_fills(rng):
    x = np.ones((16, 16, 16), np.float32)
    y = aug.coarse_dropout_3d(x, rng, fill=0.5)
    assert (y == 0.5).any()
    assert y.shape == x.shape


def test_pipeline_applies_consistent_geometry(rng):
    """Image and labels must receive the SAME geometric transform."""
    phi, normals = _gradient_field((8, 8, 8))
    marker = np.zeros((8, 8, 8), np.float32)
    marker[0, 0, 0] = 1.0
    pipe = aug.AugmentationPipeline(
        p_intensity_1=0.0, p_intensity_2=0.0, p_blur=0.0, p_cutout=0.0,
        p_flip_transform=1.0, p_flip_axis=1.0, p_rot90=0.0)
    data = {"image": marker[..., None], "sheet": marker[..., None],
            "normals": normals}
    out = pipe(data, np.random.default_rng(0))
    # all three axes flipped: marker moves to the far corner in both arrays
    assert out["image"][-1, -1, -1, 0] == 1.0
    assert out["sheet"][-1, -1, -1, 0] == 1.0
    np.testing.assert_allclose(out["image"][..., 0], out["sheet"][..., 0])


def test_pipeline_image_only_intensity(rng):
    phi, normals = _gradient_field((8, 8, 8))
    lbl = (phi > 0).astype(np.float32)[..., None]
    pipe = aug.AugmentationPipeline(
        p_intensity_1=1.0, p_intensity_2=1.0, p_blur=1.0, p_cutout=1.0,
        enable_geometric=False)
    out = pipe({"image": phi[..., None], "sheet": lbl, "normals": normals},
               np.random.default_rng(1))
    np.testing.assert_array_equal(out["sheet"], lbl)      # labels untouched
    np.testing.assert_array_equal(out["normals"], normals)
    assert not np.allclose(out["image"][..., 0], phi)      # image changed


def test_parameter_ranges_pinned():
    """The intensity-transform magnitudes mirror the albumentations DEFAULTS
    the reference composes with (dataset.py:176-191 passes no kwargs);
    deliberate divergences are the documented constants here."""
    from mt3d_resenc_unet_tpu.data import augment as A

    assert A.BRIGHTNESS_LIMIT == (-0.2, 0.2)
    assert A.CONTRAST_LIMIT == (-0.2, 0.2)
    assert A.ILLUMINATION_INTENSITY == (0.01, 0.2)
    assert A.MULT_NOISE_RANGE == (0.9, 1.1)
    assert A.MOTION_BLUR_KERNELS == (3, 5, 7)
    assert A.DEFOCUS_RADIUS == (3, 10)
    assert A.DOWNSCALE_RANGE == (0.25, 0.25)
    assert A.ADVANCED_BLUR_SIGMA == (0.2, 1.0)
    # documented divergence: absolute gaussian-noise std, not albumentations'
    # relative (0.2, 0.44)
    assert A.GAUSS_NOISE_STD == (0.01, 0.05)


def test_intensity_distribution_sanity(rng):
    """Each intensity transform keeps [0,1] data bounded and actually
    perturbs it; multiplicative noise stays within its pinned envelope."""
    from mt3d_resenc_unet_tpu.data import augment as A

    x = rng.random((8, 16, 16)).astype(np.float32)
    for fn in (A.brightness_contrast, A.illumination, A.multiplicative_noise,
               A.gaussian_noise, A.motion_blur, A.defocus, A.downscale,
               A.advanced_blur):
        y = fn(x, np.random.default_rng(0))
        assert y.shape == x.shape, fn.__name__
        assert np.isfinite(y).all(), fn.__name__
        assert y.min() >= -1e-6 and y.max() <= 1.0 + 1e-6 or fn in (
            A.motion_blur, A.defocus, A.downscale, A.advanced_blur), fn.__name__
        assert not np.allclose(y, x), fn.__name__
    # multiplicative noise: exact envelope
    for seed in range(20):
        y = A.multiplicative_noise(x, np.random.default_rng(seed))
        ratio = y[x > 0.2] / x[x > 0.2]
        assert (ratio >= 0.9 - 1e-6).all() and (ratio <= 1.1 + 1e-6).all()


def test_composed_geometric_matches_sequential(rng):
    """apply_geometric_ops (single-copy composed path used by the pipeline)
    must be bit-identical to chaining flip_with_normals/rot90_with_normals."""
    from mt3d_resenc_unet_tpu.data import augment as A

    for seed in range(30):
        r = np.random.default_rng(seed)
        data = {
            "image": r.random((6, 6, 6, 1)).astype(np.float32),
            "sheet": (r.random((6, 6, 6, 1)) > 0.5).astype(np.float32),
            "normals": r.standard_normal((6, 6, 6, 3)).astype(np.float32),
        }
        ops = []
        for axis in (0, 1, 2):
            if r.random() < 0.5:
                ops.append(("flip", axis))
        if r.random() < 0.7:
            ops.append(("rot90", "zyx"[int(r.integers(0, 3))],
                        int(r.integers(1, 4))))
        if r.random() < 0.5:
            ops.append(("rot90", "zyx"[int(r.integers(0, 3))],
                        int(r.integers(1, 4))))
        if not ops:
            ops = [("flip", 0)]

        seq = {k: v.copy() for k, v in data.items()}
        for op in ops:
            if op[0] == "flip":
                seq = A.flip_with_normals(seq, op[1])
            else:
                seq = A.rot90_with_normals(seq, op[1], op[2])
        comp = A.apply_geometric_ops(data, ops)
        for k in data:
            np.testing.assert_array_equal(comp[k], seq[k], err_msg=f"{k} {ops}")
            assert comp[k].flags.c_contiguous

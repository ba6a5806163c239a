"""Device-side augmentation: the stochastic sample pipeline INSIDE the
jitted train step.

The reference augments on the host inside DataLoader worker processes
(reference: dataloading/dataset.py:176-209 intensity stack + CoarseDropout3D;
training/transforms/geometric/geometry.py:5-148 normals-aware flips/rot90,
unwired there). The host pipeline here (data/augment.py) reproduces that and
is the semantic definition — but on hosts with few cores the ~50 ms/sample of
NumPy augmentation work starves the chip: the flagship step consumes 4
patches every ~0.41 s while one core produces at best ~10 samples/s.

This module is the TPU-native alternative: the dataset ships RAW stored
bytes (wire format) and the augmentations run on device as part of the
compiled step — elementwise VPU work fused by XLA, costing a few ms where
the host path costs hundreds. Enabled with ``tr_config.augment_on_device``.

Semantics vs the host pipeline (data/augment.py):

* identical op set, probabilities, and parameter ranges (stage gates and the
  per-op parameter draws are per-sample);
* the blur stage (type AND its kernel parameters: angle, radius, sigma) and
  the rot90 choice (axis, k) are drawn per-STEP instead of per-sample — a
  ``lax.switch`` executes exactly one branch on device, whereas per-sample
  branching under ``vmap`` would compute every variant for every sample; and
  a per-step kernel means ONE shared depthwise convolution instead of a
  ``vmap`` of per-sample convolutions, which XLA compiled ~5x slower and
  lowered poorly (measured 2026-08-20: the vmap'd 21x21 defocus conv
  dominated step compile time). The blur gate stays per-sample. Flips remain
  fully per-sample (a reversed copy + select is cheap);
* kernel-edge handling uses reflect padding like the host path; downscale
  uses an exact 4x4 box average (cv2 INTER_AREA at scale 0.25) + bilinear
  upsample;
* randomness comes from the step's threefry key, not numpy — sequences
  differ from the host pipeline by construction; tests compare the
  deterministic cores (flip/rot90/cutout geometry) against the host
  implementations directly.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .augment import (ADVANCED_BLUR_SIGMA, BRIGHTNESS_LIMIT, CONTRAST_LIMIT,
                      DEFOCUS_RADIUS, GAUSS_NOISE_STD,
                      ILLUMINATION_INTENSITY, MULT_NOISE_RANGE,
                      _ROT_PLANES, _rotate_components)

_NORMAL_KEYS = ("normals",)


@dataclasses.dataclass(frozen=True)
class DeviceAugConfig:
    """Probabilities mirror AugmentationPipeline (data/augment.py),
    which mirrors the reference (dataloading/dataset.py:176-201)."""

    p_intensity_1: float = 0.3   # brightness/contrast | illumination
    p_intensity_2: float = 0.35  # mult noise | gauss noise
    p_blur: float = 0.4          # motion | defocus | downscale | advanced
    p_cutout: float = 0.5
    p_flip_axis: float = 0.5
    p_flip_transform: float = 0.5
    p_rot90: float = 0.25
    cutout_fill: float = 0.5
    cutout_holes: Tuple[int, int] = (1, 4)
    cutout_extent: Tuple[float, float] = (0.1, 0.4)
    normal_keys: Tuple[str, ...] = _NORMAL_KEYS


def _u(key, shape, lo, hi):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _per_sample(x, b):
    """Reshape a (B,) vector for broadcast against (B, D, H, W, C)."""
    return x.reshape((b,) + (1,) * 4)


# ----------------------------------------------------------------------
# intensity stages (image only)
# ----------------------------------------------------------------------

def _brightness_contrast(img, key, b):
    ka, kb = jax.random.split(key)
    alpha = _per_sample(1.0 + _u(ka, (b,), *CONTRAST_LIMIT), b)
    beta = _per_sample(_u(kb, (b,), *BRIGHTNESS_LIMIT), b)
    return jnp.clip(img * alpha + beta, 0.0, 1.0).astype(img.dtype)


def _illumination(img, key, b):
    """Linear multiplicative ramp along a random spatial axis (per sample),
    matching data/augment.py::illumination."""
    k1, k2, k3 = jax.random.split(key, 3)
    axis = jax.random.randint(k1, (b,), 0, 3)
    strength = _per_sample(_u(k2, (b,), *ILLUMINATION_INTENSITY), b)
    direction = _per_sample(
        jnp.where(jax.random.uniform(k3, (b,)) < 0.5, -1.0, 1.0), b)
    d, h, w = img.shape[1:4]
    # unit ramps in [-1, 1]; XLA fuses the broadcasts into the multiply
    rd = jnp.linspace(-1.0, 1.0, d).reshape(1, d, 1, 1, 1)
    rh = jnp.linspace(-1.0, 1.0, h).reshape(1, 1, h, 1, 1)
    rw = jnp.linspace(-1.0, 1.0, w).reshape(1, 1, 1, w, 1)
    ax = _per_sample(axis, b)
    ramp = jnp.where(ax == 0, rd, 0.0) + jnp.where(ax == 1, rh, 0.0) \
        + jnp.where(ax == 2, rw, 0.0)
    out = img * (1.0 + strength * direction * ramp)
    return jnp.clip(out, 0.0, 1.0).astype(img.dtype)


def _mult_noise(img, key, b):
    factor = _per_sample(_u(key, (b,), *MULT_NOISE_RANGE), b)
    return jnp.clip(img * factor, 0.0, 1.0).astype(img.dtype)


def _gauss_noise(img, key, b):
    k1, k2 = jax.random.split(key)
    std = _per_sample(_u(k1, (b,), *GAUSS_NOISE_STD), b)
    noise = jax.random.normal(k2, img.shape, jnp.float32)
    return jnp.clip(img.astype(jnp.float32) + std * noise,
                    0.0, 1.0).astype(img.dtype)


# ----------------------------------------------------------------------
# blur family: per-sample 2-D kernels applied to every Z slice
# ----------------------------------------------------------------------

def _apply_kernel_2d(img, kern):
    """img (B, D, H, W, C), kern (k, k) shared across the batch ->
    reflect-padded depthwise 2-D convolution over every (H, W) slice (host
    analog: data/augment.py::_filter2d_slices). One conv call on a
    (B*D, H, W, C) batch — no vmap, cheap to compile, MXU/VPU friendly."""
    b, d, h, w, c = img.shape
    k = kern.shape[-1]
    p = (k - 1) // 2
    x = img.astype(jnp.float32).reshape(b * d, h, w, c)
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    kern4 = jnp.broadcast_to(kern.astype(jnp.float32)[:, :, None, None],
                             (k, k, 1, c))
    out = lax.conv_general_dilated(
        x, kern4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32)
    return out.reshape(b, d, h, w, c).astype(img.dtype)


def _motion_blur(img, key, b):
    """Directional line kernel; per-step length in {3,5,7} and angle
    (host analog: data/augment.py::motion_blur, albumentations MotionBlur)."""
    del b
    k1, k2 = jax.random.split(key)
    ksz = 7
    c = (ksz - 1) / 2.0
    half = jax.random.randint(k1, (), 1, 4)              # (k-1)/2 in {1,2,3}
    angle = _u(k2, (), 0.0, np.pi)
    t = jnp.arange(-3, 4, dtype=jnp.float32)             # (7,)
    active = jnp.abs(t) <= half
    yy = jnp.clip(jnp.round(c + t * jnp.sin(angle)), 0, ksz - 1)
    xx = jnp.clip(jnp.round(c + t * jnp.cos(angle)), 0, ksz - 1)
    ii = jnp.arange(ksz, dtype=jnp.float32)
    hit = ((yy[:, None, None] == ii[None, :, None])
           & (xx[:, None, None] == ii[None, None, :])
           & active[:, None, None])
    # binary hit mask (line samples that round onto the same cell count
    # once), matching the host motion_blur / albumentations kernel
    kern = hit.any(axis=0).astype(jnp.float32)           # (7, 7)
    kern = kern / jnp.maximum(kern.sum(), 1.0)
    return _apply_kernel_2d(img, kern)


def _defocus(img, key, b):
    """Disk kernel, per-step radius in [3, 10] (host analog: defocus)."""
    del b
    r = jax.random.randint(key, (),
                           DEFOCUS_RADIUS[0], DEFOCUS_RADIUS[1] + 1)
    rad = DEFOCUS_RADIUS[1]
    ax = jnp.arange(-rad, rad + 1, dtype=jnp.float32)
    disk = (ax[:, None] ** 2 + ax[None, :] ** 2) <= (r * r)
    kern = disk.astype(jnp.float32)
    kern = kern / kern.sum()
    return _apply_kernel_2d(img, kern)


def _downscale(img, key, b):
    """Fixed 0.25 scale: exact 4x4 box average down (INTER_AREA at 1/4),
    bilinear back up (host analog: downscale)."""
    del key
    bsz, d, h, w, c = img.shape
    if h % 4 or w % 4:
        # arbitrary sizes: area-style resize down, bilinear up (the exact
        # 4x4 box average below needs multiple-of-4 extents)
        small = jax.image.resize(img.astype(jnp.float32),
                                 (bsz, d, max(1, h // 4), max(1, w // 4), c),
                                 method="linear")
        up = jax.image.resize(small, (bsz, d, h, w, c), method="bilinear")
        return up.astype(img.dtype)
    x = img.astype(jnp.float32).reshape(bsz, d, h // 4, 4, w // 4, 4, c)
    small = x.mean(axis=(3, 5))
    up = jax.image.resize(small, (bsz, d, h, w, c), method="bilinear")
    return up.astype(img.dtype)


def _advanced_blur(img, key, b):
    """Gaussian kernel with independent per-step sigma_y/sigma_x in
    [0.2, 1.0] (host analog: advanced_blur). Static 9x9 support covers
    4*sigma at the max sigma."""
    del b
    k1, k2 = jax.random.split(key)
    sy = _u(k1, (), *ADVANCED_BLUR_SIGMA)
    sx = _u(k2, (), *ADVANCED_BLUR_SIGMA)
    ax = jnp.arange(-4, 5, dtype=jnp.float32)
    kern = jnp.exp(-(ax[:, None] ** 2 / (2 * sy ** 2)
                     + ax[None, :] ** 2 / (2 * sx ** 2)))
    kern = kern / kern.sum()
    return _apply_kernel_2d(img, kern)


# ----------------------------------------------------------------------
# cutout (CoarseDropout3D; reference: dataset.py:193-201)
# ----------------------------------------------------------------------

def _cutout_mask(key, b, spatial, holes, extent):
    """Boolean (B, D, H, W) union of per-sample random boxes."""
    max_holes = holes[1]
    kn, kb = jax.random.split(key)
    n = jax.random.randint(kn, (b, 1), holes[0], holes[1] + 1)
    keys = jax.random.split(kb, 2 * len(spatial))
    box = None
    for a, size in enumerate(spatial):
        ke, ks = keys[2 * a], keys[2 * a + 1]
        ext = _u(ke, (b, max_holes), *extent)
        hs = jnp.maximum(1, jnp.floor(size * ext))            # hole size
        start = jnp.floor(jax.random.uniform(ks, (b, max_holes))
                          * jnp.maximum(1.0, size - hs + 1.0))
        ii = jnp.arange(size, dtype=jnp.float32)
        shape = [1, 1, 1, 1, 1]
        shape[a + 2] = size
        ii = ii.reshape(shape)
        lo = start[..., None, None, None]
        hi = (start + hs)[..., None, None, None]
        # move the per-axis bounds into position (B, holes, D, H, W)
        in_axis = (ii >= lo) & (ii < hi)
        box = in_axis if box is None else box & in_axis
    active = (jnp.arange(max_holes)[None, :] < n)[..., None, None, None]
    return jnp.any(box & active, axis=1)


def _cutout(img, key, b, cfg):
    mask = _cutout_mask(key, b, img.shape[1:4],
                        cfg.cutout_holes, cfg.cutout_extent)
    fill = jnp.asarray(cfg.cutout_fill, img.dtype)
    return jnp.where(mask[..., None], fill, img)


# ----------------------------------------------------------------------
# geometric: per-sample flips, per-step rot90 (normals-aware)
# ----------------------------------------------------------------------

def _flip_batch(data: Dict[str, jax.Array], flags: jax.Array,
                normal_keys=_NORMAL_KEYS) -> Dict[str, jax.Array]:
    """Per-sample flips. ``flags`` (B, 3) bools for spatial axes (Z, Y, X);
    normals components negate per the host table (Z->nz, Y->ny, X->nx;
    data/augment.py::flip_with_normals; reference: geometry.py:36-67)."""
    b = flags.shape[0]
    out = {}
    for k, arr in data.items():
        v = arr
        for axis in range(3):
            f = flags[:, axis].reshape((b,) + (1,) * (arr.ndim - 1))
            v = jnp.where(f, jnp.flip(v, axis=axis + 1), v)
        if k in normal_keys and arr.ndim == 5 and arr.shape[-1] == 3:
            # axis -> component: 0(Z)->nz(2), 1(Y)->ny(1), 2(X)->nx(0)
            sign = jnp.where(flags[:, ::-1], -1.0, 1.0).astype(v.dtype)
            v = v * sign[:, None, None, None, :]
        out[k] = v
    return out


def _rot90_tree(data: Dict[str, jax.Array], axis: str, k: int,
                normal_keys=_NORMAL_KEYS) -> Dict[str, jax.Array]:
    """np.rot90(arr, k, axes=plane) on every array (batch axis leading) with
    the normals component permutation of data/augment.py::rot90_with_normals."""
    a0, a1 = _ROT_PLANES[axis]
    out = {}
    for key, arr in data.items():
        v = jnp.rot90(arr, k=k, axes=(a0 + 1, a1 + 1))
        if key in normal_keys and arr.ndim == 5 and arr.shape[-1] == 3:
            rx, ry, rz = _rotate_components(
                v[..., 0], v[..., 1], v[..., 2], axis, k)
            v = jnp.stack([rx, ry, rz], axis=-1)
        out[key] = v
    return out


def _square_rot_choices(shape) -> Tuple[str, ...]:
    """Axes whose rotation plane is square for this patch shape (static)."""
    return tuple(a for a, (i, j) in _ROT_PLANES.items()
                 if shape[i + 1] == shape[j + 1])


# ----------------------------------------------------------------------
# composed pipeline
# ----------------------------------------------------------------------

def make_device_augment(cfg: DeviceAugConfig = DeviceAugConfig()
                        ) -> Callable[[Dict[str, jax.Array], jax.Array],
                                      Dict[str, jax.Array]]:
    """Returns ``augment(batch, rng) -> batch`` for use inside the jitted
    train step (train/step.py). ``batch`` is the decoded float batch
    ('image' plus task targets, all (B, *spatial, C))."""

    def augment(batch: Dict[str, jax.Array], rng: jax.Array):
        img = batch["image"]
        if img.ndim != 5:
            return batch  # 2-D nets etc.: host pipeline only
        b = img.shape[0]
        keys = jax.random.split(rng, 12)

        # ---- stage 1: brightness/contrast | illumination (p=0.3) ----
        gate = _per_sample(
            jax.random.bernoulli(keys[0], float(cfg.p_intensity_1), (b,)), b)
        pick = _per_sample(jax.random.bernoulli(keys[1], 0.5, (b,)), b)
        stage = jnp.where(pick, _brightness_contrast(img, keys[2], b),
                          _illumination(img, keys[2], b))
        img = jnp.where(gate, stage, img)

        # ---- stage 2: multiplicative | gaussian noise (p=0.35) ----
        gate = _per_sample(
            jax.random.bernoulli(keys[3], float(cfg.p_intensity_2), (b,)), b)
        pick = _per_sample(jax.random.bernoulli(keys[4], 0.5, (b,)), b)
        stage = jnp.where(pick, _mult_noise(img, keys[5], b),
                          _gauss_noise(img, keys[5], b))
        img = jnp.where(gate, stage, img)

        # ---- stage 3: blur family (p=0.4; type per step) ----
        gate = _per_sample(jax.random.bernoulli(keys[6], float(cfg.p_blur), (b,)), b)
        blur_t = jax.random.randint(keys[7], (), 0, 4)
        blurred = lax.switch(
            blur_t,
            [lambda x, k: _motion_blur(x, k, b),
             lambda x, k: _defocus(x, k, b),
             lambda x, k: _downscale(x, k, b),
             lambda x, k: _advanced_blur(x, k, b)],
            img, keys[8])
        img = jnp.where(gate, blurred, img)

        # ---- cutout (p=0.5) ----
        gate = _per_sample(jax.random.bernoulli(keys[9], float(cfg.p_cutout), (b,)), b)
        img = jnp.where(gate, _cutout(img, keys[10], b, cfg), img)

        batch = dict(batch)
        batch["image"] = img

        # ---- geometric: per-sample flips, per-step rot90 ----
        gk = jax.random.split(keys[11], 4)
        fgate = jax.random.bernoulli(gk[0], float(cfg.p_flip_transform), (b, 1))
        flags = jax.random.bernoulli(gk[1], float(cfg.p_flip_axis), (b, 3)) & fgate
        batch = _flip_batch(batch, flags, cfg.normal_keys)

        choices = _square_rot_choices(img.shape)
        if choices and cfg.p_rot90 > 0:
            rgate = jax.random.bernoulli(gk[2], float(cfg.p_rot90), ())
            pick = jax.random.randint(gk[3], (), 0, 3 * len(choices))
            branches = [lambda d: d]
            for axis in choices:
                for k in (1, 2, 3):
                    branches.append(
                        lambda d, a=axis, kk=k: _rot90_tree(
                            d, a, kk, cfg.normal_keys))
            idx = jnp.where(rgate, 1 + pick, 0)
            batch = lax.switch(idx, branches, batch)
        return batch

    return augment

"""Numerical golden-parity vs the ACTUAL reference torch code.

Feeds identical tensors through the reference's importable modules
(/root/reference/builders/simple_conv_blocks.py, training/losses/losses.py —
loaded at test time, skipped when absent) and this framework, asserting
fp32 agreement. Backs the voxel-level parity claims in PARITY.md with direct
measurements instead of re-derived formulas.

Layout bridge: reference is NCDHW, this framework NDHWC; tensors are
permuted at the boundary and conv kernels go through the real importer
(tools/import_torch._conv_kernel).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF = "/root/reference"
if not os.path.isdir(os.path.join(_REF, "builders")):
    pytest.skip("reference checkout not available", allow_module_level=True)
if _REF not in sys.path:
    sys.path.insert(0, _REF)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from mt3d_resenc_unet_tpu.tools.import_torch import _conv_kernel  # noqa: E402

ATOL = 2e-5


def _to_cl(x):  # NCDHW -> NDHWC
    return np.moveaxis(x, 1, -1)


def _to_cf(x):  # NDHWC -> NCDHW
    return np.moveaxis(x, -1, 1)


@pytest.mark.parametrize("stride", [1, 2])
def test_convnormact_value_parity(stride):
    """ConvDropoutNormReLU (reference: simple_conv_blocks.py:13-72) vs
    ConvNormAct: same kernel, same input, <=2e-5 fp32 agreement."""
    from builders.simple_conv_blocks import ConvDropoutNormReLU
    from torch import nn
    from mt3d_resenc_unet_tpu.models.blocks import ConvNormAct

    torch.manual_seed(0)
    ref = ConvDropoutNormReLU(
        nn.Conv3d, 4, 6, kernel_size=3, stride=stride, conv_bias=False,
        norm_op=nn.InstanceNorm3d,
        norm_op_kwargs={"eps": 1e-5, "affine": False},
        nonlin=nn.LeakyReLU, nonlin_kwargs={"inplace": True}).eval()
    # note: torch LeakyReLU default negative_slope is 0.01 — the value the
    # reference builder passes explicitly (build_network_from_config.py:210)

    x = np.random.default_rng(0).standard_normal((2, 4, 8, 10, 12)).astype(
        np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = ConvNormAct(features=6, kernel=(3, 3, 3), stride=(stride,) * 3,
                       dtype=jnp.float32)
    w = _conv_kernel(ref.conv.weight.detach().numpy())
    out = ours.apply({"params": {"conv": {"kernel": jnp.asarray(w)}}},
                     jnp.asarray(_to_cl(x)))
    np.testing.assert_allclose(_to_cf(np.asarray(out)), ref_out, atol=ATOL)


def test_stacked_conv_blocks_value_parity():
    """StackedConvBlocks (reference: simple_conv_blocks.py:82-148), stride in
    the first conv only, two blocks, full-stack agreement."""
    from builders.simple_conv_blocks import StackedConvBlocks
    from torch import nn
    from mt3d_resenc_unet_tpu.models.blocks import (
        StackedConvBlocks as OursStacked)

    torch.manual_seed(1)
    ref = StackedConvBlocks(
        2, nn.Conv3d, 3, 8, kernel_size=3, initial_stride=2, conv_bias=False,
        norm_op=nn.InstanceNorm3d,
        norm_op_kwargs={"eps": 1e-5, "affine": False},
        nonlin=nn.LeakyReLU, nonlin_kwargs={"inplace": True}).eval()
    x = np.random.default_rng(1).standard_normal((1, 3, 8, 8, 8)).astype(
        np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = OursStacked(n_convs=2, features=8, kernel=(3, 3, 3),
                       initial_stride=(2, 2, 2), dtype=jnp.float32)
    params = {}
    for i, conv in enumerate(ref.convs):
        params[f"conv{i}"] = {"conv": {"kernel": jnp.asarray(
            _conv_kernel(conv.conv.weight.detach().numpy()))}}
    out = ours.apply({"params": params}, jnp.asarray(_to_cl(x)))
    np.testing.assert_allclose(_to_cf(np.asarray(out)), ref_out, atol=ATOL)


@pytest.fixture
def pair():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((2, 1, 6, 8, 8)).astype(np.float32)
    target = (rng.random((2, 1, 6, 8, 8)) > 0.5).astype(np.float32)
    return logits, target


def _both(loss_ref, loss_ours, logits, target):
    with torch.no_grad():
        r = float(loss_ref(torch.from_numpy(logits), torch.from_numpy(target)))
    o = float(loss_ours(jnp.asarray(_to_cl(logits)),
                        jnp.asarray(_to_cl(target))))
    return r, o


def test_dice_loss_parity(pair):
    from training.losses.losses import DiceLoss as RefDice
    from mt3d_resenc_unet_tpu.train.losses import DiceLoss
    r, o = _both(RefDice(normalization="sigmoid"), DiceLoss(), *pair)
    assert abs(r - o) < ATOL


def test_generalized_dice_parity(pair):
    from training.losses.losses import GeneralizedDiceLoss as RefGDL
    from mt3d_resenc_unet_tpu.train.losses import GeneralizedDiceLoss
    r, o = _both(RefGDL(normalization="sigmoid"), GeneralizedDiceLoss(),
                 *pair)
    assert abs(r - o) < ATOL


def test_bce_label_smoothing_parity(pair):
    from training.losses.losses import (
        BCEWithLogitsLossLabelSmoothing as Ref)
    from mt3d_resenc_unet_tpu.train.losses import (
        BCEWithLogitsLossLabelSmoothing)
    r, o = _both(Ref(smoothing=0.2), BCEWithLogitsLossLabelSmoothing(0.2),
                 *pair)
    assert abs(r - o) < ATOL


def test_bce_zsmooth_parity(pair):
    from training.losses.losses import BCEWithLogitsLossZSmooth as Ref
    from mt3d_resenc_unet_tpu.train.losses import BCEWithLogitsLossZSmooth
    r, o = _both(Ref(0.1, 0.4), BCEWithLogitsLossZSmooth(0.1, 0.4), *pair)
    assert abs(r - o) < ATOL


def test_bcedice_parity(pair):
    from training.losses.losses import BCEDiceLoss as Ref
    from mt3d_resenc_unet_tpu.train.losses import BCEDiceLoss
    r, o = _both(Ref(0.3, 0.7), BCEDiceLoss(0.3, 0.7), *pair)
    assert abs(r - o) < ATOL


def test_masked_cosine_parity():
    from training.losses.losses import MaskedCosineLoss as Ref
    from mt3d_resenc_unet_tpu.train.losses import MaskedCosineLoss
    rng = np.random.default_rng(3)
    pred = rng.standard_normal((2, 3, 4, 6, 6)).astype(np.float32)
    tgt = rng.standard_normal((2, 3, 4, 6, 6)).astype(np.float32)
    tgt[:, :, :2] = 0.0  # masked-out region
    r, o = _both(Ref(), MaskedCosineLoss(), pred, tgt)
    assert abs(r - o) < ATOL


def test_normals_codec_parity():
    """uint16 normals decode matches the reference dataset rule
    (p / 32767.5) - 1 (reference: dataloading/dataset.py:147-155), and the
    encoder round-trips through it."""
    from mt3d_resenc_unet_tpu.data.zio import decode_normals, encode_normals_u16
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 65536, (4, 4, 4, 3)).astype(np.uint16)
    ref = (raw.astype(np.float32) / 32767.5) - 1.0
    np.testing.assert_allclose(decode_normals(raw, np.uint16), ref,
                               atol=1e-6)
    vec = rng.uniform(-1, 1, (4, 4, 4, 3)).astype(np.float32)
    rt = decode_normals(encode_normals_u16(vec), np.uint16)
    np.testing.assert_allclose(rt, vec, atol=1.0 / 32767.5 + 1e-6)

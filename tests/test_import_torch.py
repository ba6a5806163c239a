"""Torch-checkpoint importer: build the actual reference-shaped state_dict
with torch modules mirroring the reference naming, convert, and verify the
result loads into our model and matches forward-pass shapes."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mt3d_resenc_unet_tpu.tools.import_torch import convert_state_dict


def _reference_like_state_dict():
    """Minimal state_dict with the reference's key naming
    (encoder.py:81-134, decoder.py:68-135): stem + 2 stages (1 block each)
    + 1-task decoder with 1 upsample level."""
    sd = {}
    t = torch.randn
    # stem: 1->8
    sd["shared_encoder.stem.convs.0.conv.weight"] = t(8, 1, 3, 3, 3)
    # stage0 block0: 8->8 (no skip projection)
    sd["shared_encoder.stages.0.blocks.0.conv1.conv.weight"] = t(8, 8, 3, 3, 3)
    sd["shared_encoder.stages.0.blocks.0.conv2.conv.weight"] = t(8, 8, 3, 3, 3)
    # stage1 block0: 8->16 stride 2 (skip = avgpool + 1x1 proj at index 1)
    sd["shared_encoder.stages.1.blocks.0.conv1.conv.weight"] = t(16, 8, 3, 3, 3)
    sd["shared_encoder.stages.1.blocks.0.conv2.conv.weight"] = t(16, 16, 3, 3, 3)
    sd["shared_encoder.stages.1.blocks.0.skip.1.conv.weight"] = t(16, 8, 1, 1, 1)
    # decoder: transpconv 16->8, stage conv 16->8, seg 8->1
    sd["task_decoders.sheet.transpconvs.0.weight"] = t(16, 8, 2, 2, 2)
    sd["task_decoders.sheet.stages.0.convs.0.conv.weight"] = t(8, 16, 3, 3, 3)
    sd["task_decoders.sheet.seg_layers.0.weight"] = t(1, 8, 1, 1, 1)
    sd["task_decoders.sheet.seg_layers.0.bias"] = t(1)
    return sd


def test_convert_and_load():
    sd = _reference_like_state_dict()
    params = convert_state_dict(sd)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_manual_config
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.checkpoint import merge_params_nonstrict

    plan = plan_from_manual_config(
        dict(basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
             bottleneck_block="BasicBlockD", features_per_stage=[8, 16],
             num_stages=2, n_blocks_per_stage=[1, 1],
             n_conv_per_stage_decoder=[1], kernel_sizes=[3, 3],
             strides=[1, 2]),
        (8, 8, 8), 1, [TaskHead("sheet", 1, "sigmoid")])
    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 8, 1))
    fresh = model.init({"params": jax.random.key(0)}, x,
                       train=False)["params"]
    merged, stats = merge_params_nonstrict(jax.device_get(fresh), params)
    # every converted tensor must land in the fresh tree
    assert stats["shape_mismatch"] == 0
    assert stats["restored"] == len(sd)
    out = model.apply({"params": merged}, x, train=False)
    assert out["sheet"].shape == (1, 8, 8, 8, 1)


def test_conv_weight_permutation_semantics():
    """A torch conv and our layout produce identical outputs after the kernel
    permutation (voxel-level parity check, SURVEY.md §4(b))."""
    import torch.nn.functional as F
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 6, 6, 6)).astype(np.float32)  # NCDHW
    w = rng.standard_normal((5, 4, 3, 3, 3)).astype(np.float32)  # OIDHW
    ref = F.conv3d(torch.from_numpy(x), torch.from_numpy(w),
                   padding=1).numpy()

    x_cl = np.transpose(x, (0, 2, 3, 4, 1))  # NDHWC
    w_cl = np.transpose(w, (2, 3, 4, 1, 0))  # DHWIO
    out = lax.conv_general_dilated(
        jnp.array(x_cl), jnp.array(w_cl), window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    out_ncdhw = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out_ncdhw, ref, rtol=1e-4, atol=1e-4)


def test_transpconv_import_numerical_parity():
    """Imported torch ConvTranspose3d weights reproduce torch's output
    through UpsampleConv exactly (the importer must flip spatial axes to
    bridge torch's y[k*i+d]=x[i]@W[d] and flax's y[k*i+d]=x[i]@W[k-1-d])."""
    import torch.nn.functional as F
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mt3d_resenc_unet_tpu.models.network import UpsampleConv
    from mt3d_resenc_unet_tpu.tools.import_torch import _transp_kernel

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 3, 4, 5)).astype(np.float32)   # NCDHW
    w = rng.standard_normal((6, 4, 2, 2, 2)).astype(np.float32)   # (I,O,*k)
    ref = F.conv_transpose3d(torch.from_numpy(x), torch.from_numpy(w),
                             stride=2).numpy()                    # (1,4,6,8,10)

    x_cl = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))          # NDHWC
    mod = UpsampleConv(features=4, kernel_size=(2, 2, 2), use_bias=False,
                       dtype=jnp.float32)
    params = {"params": {"kernel": jnp.asarray(_transp_kernel(w))}}
    out = np.transpose(np.asarray(mod.apply(params, x_cl)), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

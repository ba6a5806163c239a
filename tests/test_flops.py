"""Analytic FLOP model (utils/flops.py): hand-computed small case + flagship
sanity range."""

import math

from mt3d_resenc_unet_tpu.core.plan import (TaskHead, plan_from_autoconfig,
                                            plan_from_manual_config)
from mt3d_resenc_unet_tpu.utils.flops import (forward_conv_flops, mfu,
                                              train_step_flops)


def test_small_case_hand_computed():
    plan = plan_from_manual_config(
        dict(basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
             bottleneck_block="BasicBlockD", features_per_stage=[8, 16],
             num_stages=2, n_blocks_per_stage=[1, 1],
             n_conv_per_stage_decoder=[1], kernel_sizes=3, strides=[1, 2],
             do_stem=False),
        (8, 8, 8), 1, [TaskHead("sheet", 1, "sigmoid")])
    v = 8 ** 3
    # stage0: conv1 1->8 + conv2 8->8 + 1x1 proj 1->8 (channel change)
    s0 = 2 * v * 27 * 1 * 8 + 2 * v * 27 * 8 * 8 + 2 * v * 1 * 8
    # stage1 @4^3: conv1 8->16 + conv2 16->16 + proj 8->16
    v1 = 4 ** 3
    s1 = 2 * v1 * 27 * 8 * 16 + 2 * v1 * 27 * 16 * 16 + 2 * v1 * 8 * 16
    # decoder: upsample GEMM 16 -> 8*8 cols @4^3, conv 16->8 @8^3, seg 8->1
    dec = 2 * v1 * 16 * 8 * 8 + 2 * v * 27 * 16 * 8 + 2 * v * 8 * 1
    assert forward_conv_flops(plan) == s0 + s1 + dec
    assert train_step_flops(plan) == 3 * (s0 + s1 + dec)


def test_flagship_range_and_mfu():
    plan = plan_from_autoconfig(
        (128, 128, 128), in_channels=1,
        tasks=[TaskHead("sheet", 1, "sigmoid"),
               TaskHead("normals", 3, "none")])
    fwd = forward_conv_flops(plan)
    # nnU-Net-ResEnc-M-class at 128^3 is ~1-3 TFLOPs forward per patch
    assert 5e11 < fwd < 5e12
    tf, util = mfu(10.0, 3 * fwd)
    assert math.isclose(tf, 10.0 * 3 * fwd / 1e12)
    assert 0 < util < 1

"""Golden tests for the autoconfig planner (SURVEY.md §4 test plan:
schedules for the patch sizes exercised by the reference's tasks/*.yaml)."""

import pytest

from mt3d_resenc_unet_tpu.core.plan import (
    NetworkPlan,
    TaskHead,
    compute_pool_and_conv_plan,
    default_blocks_per_stage,
    pad_shape_to_divisible,
    plan_from_autoconfig,
    plan_from_manual_config,
)


def test_pool_plan_128_cubed():
    npa, pools, convs, padded, must = compute_pool_and_conv_plan(
        (1.0, 1.0, 1.0), (128, 128, 128))
    assert npa == (5, 5, 5)
    assert len(pools) == 6
    assert pools[0] == (1, 1, 1)
    assert all(p == (2, 2, 2) for p in pools[1:])
    assert all(c == (3, 3, 3) for c in convs)
    assert padded == (128, 128, 128)
    assert must == (32, 32, 32)


def test_pool_plan_anisotropic_64_192_192():
    npa, pools, convs, padded, _ = compute_pool_and_conv_plan(
        (1.0, 1.0, 1.0), (64, 192, 192))
    assert npa == (4, 5, 5)
    # z axis stops pooling once it reaches 4 (< 2*min_feature_map_size)
    assert pools[-1] == (1, 2, 2)
    assert padded == (64, 192, 192)


def test_pool_plan_thin_z_14_256_256():
    npa, pools, convs, padded, _ = compute_pool_and_conv_plan(
        (1.0, 1.0, 1.0), (14, 256, 256))
    # 14 -> 7 (one pool), 7 < 8 stops; y/x pool 6 times (256->4)
    assert npa[0] == 1
    assert npa[1] == npa[2] == 6
    assert padded == (14, 256, 256)
    # patch padded to divisibility by (2, 64, 64)
    assert padded[0] % 2 == 0


def test_pad_shape():
    assert pad_shape_to_divisible((100, 100, 100), (32, 32, 32)) == (128, 128, 128)
    assert pad_shape_to_divisible((128,), 32) == (128,)


def test_blocks_per_stage():
    assert default_blocks_per_stage(6) == (1, 3, 4, 6, 6, 6)
    assert default_blocks_per_stage(2) == (1, 3)


def test_autoconfig_plan_features():
    plan = plan_from_autoconfig((128, 128, 128), 1, [TaskHead("sheet", 1)])
    assert plan.num_stages == 6
    assert plan.features_per_stage == (32, 64, 128, 256, 512, 512)
    assert plan.n_blocks_per_stage == (1, 3, 4, 6, 6, 6)
    assert plan.n_conv_per_stage_decoder == (1,) * 5
    assert plan.downsample_factor() == (32, 32, 32)
    plan.validate_patch((128, 128, 128))


def test_manual_plan_requires_keys():
    with pytest.raises(ValueError, match="missing"):
        plan_from_manual_config({}, (64, 64, 64), 1, [TaskHead("sheet", 1)])


def test_manual_plan_sheet_only_style():
    # mirror of the reference tasks/sheet_only.yaml model_config (with the
    # schema drift fixed: basic_encoder/decoder_block spelled out)
    cfg = dict(
        basic_encoder_block="ResidualBlock",
        basic_decoder_block="ConvBlock",
        bottleneck_block="BasicBlockD",
        features_per_stage=[32, 64, 128, 256, 512],
        num_stages=5,
        n_blocks_per_stage=[1, 3, 4, 6, 6],
        n_conv_per_stage_decoder=[1, 1, 1, 1],
        kernel_sizes=[3],
        strides=[1, 2, 2, 2, 2],
        conv_bias=False,
    )
    plan = plan_from_manual_config(cfg, (128, 128, 128), 1, [TaskHead("sheet", 1)])
    assert plan.basic_encoder_block == "BasicBlockD"  # ResidualBlock alias
    assert plan.kernel_sizes == ((3, 3, 3),) * 5
    assert plan.strides[0] == (1, 1, 1)
    assert plan.strides[1] == (2, 2, 2)
    plan.validate_patch((128, 128, 128))
    with pytest.raises(ValueError):
        plan.validate_patch((100, 100, 100))


def test_bottleneck_channels_derived():
    cfg = dict(
        basic_encoder_block="BottleneckBlockD",
        basic_decoder_block="ConvBlock",
        bottleneck_block="BottleneckBlockD",
        features_per_stage=[32, 64],
        num_stages=2,
        n_blocks_per_stage=[1, 1],
        n_conv_per_stage_decoder=[1],
        kernel_sizes=[3, 3],
        strides=[1, 2],
    )
    plan = plan_from_manual_config(cfg, (16, 16, 16), 1, [TaskHead("t", 1)])
    assert plan.bottleneck_channels == (8, 16)


def test_plan_is_hashable_static():
    p1 = plan_from_autoconfig((32, 32, 32), 1, [TaskHead("a", 1)])
    p2 = plan_from_autoconfig((32, 32, 32), 1, [TaskHead("a", 1)])
    assert hash(p1) == hash(p2)
    assert p1 == p2

"""ConfigManager parsing: five-section schema, defaults, task heads, plan
building, inference target resolution (reference schema:
configuration/config_manager.py:13-97 + intended README keys)."""

import pytest

from mt3d_resenc_unet_tpu.core.config import ConfigManager


def _minimal(**overrides):
    cfg = {
        "tr_setup": {"model_name": "m"},
        "tr_config": {"patch_size": [32, 32, 32], "batch_size": 2},
        "model_config": {},
        "dataset_config": {
            "targets": {"sheet": {"channels": 1, "activation": "sigmoid"},
                        "normals": {"channels": 3}},
            "volume_paths": [],
        },
        "inference_config": {},
    }
    for k, v in overrides.items():
        cfg[k].update(v) if isinstance(v, dict) else cfg.update({k: v})
    return cfg


def test_defaults():
    mgr = ConfigManager(config_dict=_minimal())
    assert mgr.model_name == "m"
    assert mgr.autoconfigure is True
    assert mgr.tr_val_split == 0.95
    assert mgr.optimizer == "AdamW"
    assert mgr.initial_lr == 1e-3
    assert mgr.train_patch_size == (32, 32, 32)
    assert mgr.gradient_accumulation == 1
    assert mgr.max_steps_per_epoch == 500
    assert mgr.out_channels == (1, 3)
    assert mgr.num_tasks == 2
    assert mgr.min_bbox_percent == 0.95
    assert mgr.infer_overlap == 0.25
    assert mgr.infer_gaussian_blend is True
    assert mgr.compute_dtype == "bfloat16"


def test_missing_section_raises():
    cfg = _minimal()
    del cfg["tr_config"]
    with pytest.raises(ValueError, match="missing sections"):
        ConfigManager(config_dict=cfg)


def test_no_targets_raises():
    cfg = _minimal()
    cfg["dataset_config"]["targets"] = {}
    with pytest.raises(ValueError, match="at least one task"):
        ConfigManager(config_dict=cfg)


def test_task_heads_and_plan():
    mgr = ConfigManager(config_dict=_minimal())
    heads = mgr.task_heads()
    assert [h.name for h in heads] == ["sheet", "normals"]
    assert heads[0].activation == "sigmoid"
    plan = mgr.build_plan()
    assert plan.task_names == ("sheet", "normals")
    assert plan.patch_size == (32, 32, 32)
    # CPU test process -> pallas auto-disabled
    assert plan.use_pallas_conv is False


def test_output_target_resolution_forms():
    # list of names resolved against training targets
    cfg = _minimal()
    cfg["inference_config"]["output_targets"] = ["sheet"]
    mgr = ConfigManager(config_dict=cfg)
    assert list(mgr.infer_output_targets) == ["sheet"]
    assert mgr.infer_output_targets["sheet"]["channels"] == 1

    # reference's quirky list-of-single-key-dicts `targets:` form
    cfg = _minimal()
    cfg["inference_config"]["targets"] = [
        {"sheet": {"channels": 1, "activation": "sigmoid"}}]
    mgr = ConfigManager(config_dict=cfg)
    assert list(mgr.infer_output_targets) == ["sheet"]

    # default: all training targets
    mgr = ConfigManager(config_dict=_minimal())
    assert set(mgr.infer_output_targets) == {"sheet", "normals"}


def test_yaml_file_roundtrip(tmp_path):
    import yaml
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(_minimal()))
    mgr = ConfigManager(str(path))
    assert mgr.model_name == "m"


def test_example_task_configs_parse():
    import glob
    for f in glob.glob("tasks/*.yaml"):
        mgr = ConfigManager(f)
        plan = mgr.build_plan()
        plan.validate_patch(plan.patch_size or mgr.train_patch_size)


def test_autoconfig_patch_padding_reconciled():
    """Autoconfig pads the patch to pooling divisibility; dataset patch size
    must follow (the reference computes final_patch_size but never reconciles
    — SURVEY.md §2.6)."""
    cfg = _minimal()
    cfg["tr_config"]["patch_size"] = [100, 100, 100]
    mgr = ConfigManager(config_dict=cfg)
    plan = mgr.build_plan()
    assert tuple(mgr.train_patch_size) == tuple(plan.patch_size)
    plan.validate_patch(mgr.train_patch_size)


def test_infer_patch_size_follows_padding_when_defaulted():
    """A config trained with an autoconfig-padded patch must infer with the
    same padded patch unless inference_config.patch_size is explicit."""
    cfg = _minimal()
    cfg["tr_config"]["patch_size"] = [100, 100, 100]
    mgr = ConfigManager(config_dict=cfg)
    plan = mgr.build_plan()
    assert tuple(mgr.infer_patch_size) == tuple(plan.patch_size)
    plan.validate_patch(mgr.infer_patch_size)
    # explicit inference patch size is preserved verbatim
    cfg2 = _minimal()
    cfg2["tr_config"]["patch_size"] = [100, 100, 100]
    cfg2["inference_config"]["patch_size"] = [64, 64, 64]
    mgr2 = ConfigManager(config_dict=cfg2)
    mgr2.build_plan()
    assert tuple(mgr2.infer_patch_size) == (64, 64, 64)


def test_deep_supervision_exposed_in_yaml():
    """model_config.deep_supervision reaches the plan in both autoconfig and
    manual modes (reference builds DS-capable decoders at decoder.py:97-100
    but offers no config switch)."""
    cfg = _minimal(model_config={"deep_supervision": True,
                                 "squeeze_excitation": True,
                                 "squeeze_excitation_reduction_ratio": 0.25,
                                 "stochastic_depth_p": 0.1})
    mgr = ConfigManager(config_dict=cfg)
    plan = mgr.build_plan()
    assert plan.deep_supervision is True
    assert plan.squeeze_excitation is True
    assert plan.squeeze_excitation_reduction_ratio == 0.25
    assert plan.stochastic_depth_p == 0.1

    manual = _minimal(model_config={
        "basic_encoder_block": "BasicBlockD",
        "basic_decoder_block": "ConvBlock",
        "bottleneck_block": "BasicBlockD",
        "features_per_stage": [8, 16],
        "num_stages": 2, "n_blocks_per_stage": [1, 1],
        "n_conv_per_stage_decoder": [1], "kernel_sizes": 3,
        "strides": [1, 2], "deep_supervision": True,
    })
    manual["tr_setup"]["autoconfigure"] = False
    mgr2 = ConfigManager(config_dict=manual)
    assert mgr2.build_plan().deep_supervision is True

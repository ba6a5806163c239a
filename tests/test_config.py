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

"""Model structure tests: shapes, param counts, block variants, 2D nets,
deep supervision, eval-mode activations (SURVEY.md §4 plan (b))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mt3d_resenc_unet_tpu.core.plan import (
    NetworkPlan,
    TaskHead,
    plan_from_autoconfig,
    plan_from_manual_config,
)
from mt3d_resenc_unet_tpu.models.network import ResEncUNet, count_params
from mt3d_resenc_unet_tpu.utils.memory import estimate_hbm


def _tiny_plan(**over):
    cfg = dict(
        basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
        bottleneck_block="BasicBlockD", features_per_stage=[4, 8],
        num_stages=2, n_blocks_per_stage=[1, 1], n_conv_per_stage_decoder=[1],
        kernel_sizes=[3, 3], strides=[1, 2])
    cfg.update(over)
    tasks = over.pop("tasks", [TaskHead("sheet", 1, "sigmoid")])
    return plan_from_manual_config(
        {k: v for k, v in cfg.items() if k != "tasks"}, (8, 8, 8), 1, tasks)


def _init_and_run(plan, shape, train=False):
    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).random(shape, np.float32))
    params = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(params, x, train=train,
                      rngs={"dropout": jax.random.key(1),
                            "droppath": jax.random.key(2)} if train else None)
    return model, params, out


def test_multitask_output_shapes():
    plan = plan_from_autoconfig(
        (16, 16, 16), 2,
        [TaskHead("sheet", 1, "sigmoid"), TaskHead("normals", 3, "none"),
         TaskHead("multi", 4, "softmax")],
        base_features=4, max_features=8)
    _, _, out = _init_and_run(plan, (2, 16, 16, 16, 2))
    assert out["sheet"].shape == (2, 16, 16, 16, 1)
    assert out["normals"].shape == (2, 16, 16, 16, 3)
    assert out["multi"].shape == (2, 16, 16, 16, 4)
    # eval-mode activations applied
    assert out["sheet"].min() >= 0 and out["sheet"].max() <= 1
    np.testing.assert_allclose(np.asarray(out["multi"]).sum(-1), 1.0,
                               atol=1e-5)


def test_train_mode_returns_logits():
    plan = _tiny_plan()
    _, _, out = _init_and_run(plan, (1, 8, 8, 8, 1), train=True)
    v = np.asarray(out["sheet"])
    assert v.min() < 0 or v.max() > 1  # raw logits, overwhelmingly likely


def test_2d_network():
    """op_dims=2 capability (reference: build_network_from_config.py:188-205)."""
    plan = plan_from_manual_config(
        dict(basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
             bottleneck_block="BasicBlockD", features_per_stage=[4, 8],
             num_stages=2, n_blocks_per_stage=[1, 1],
             n_conv_per_stage_decoder=[1], kernel_sizes=[3, 3],
             strides=[1, 2]),
        (16, 16), 1, [TaskHead("seg", 2, "softmax")])
    assert plan.dim == 2
    _, _, out = _init_and_run(plan, (1, 16, 16, 1))
    assert out["seg"].shape == (1, 16, 16, 2)


def test_bottleneck_blocks():
    plan = _tiny_plan(basic_encoder_block="BottleneckBlockD",
                      bottleneck_block="BottleneckBlockD")
    _, params, out = _init_and_run(plan, (1, 8, 8, 8, 1))
    assert out["sheet"].shape == (1, 8, 8, 8, 1)


def test_residual_decoder():
    plan = _tiny_plan(basic_decoder_block="ResidualBlock")
    _, _, out = _init_and_run(plan, (1, 8, 8, 8, 1))
    assert out["sheet"].shape == (1, 8, 8, 8, 1)


def test_squeeze_excitation_and_droppath():
    plan = _tiny_plan(squeeze_excitation=True, stochastic_depth_p=0.5)
    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    x = jnp.ones((2, 8, 8, 8, 1))
    params = model.init({"params": jax.random.key(0)}, x, train=False)
    se_keys = str(jax.tree_util.tree_structure(params))
    assert "se" in se_keys and "reduce" in se_keys
    # droppath active in train mode: two rng keys give different outputs
    o1 = model.apply(params, x, train=True,
                     rngs={"droppath": jax.random.key(1),
                           "dropout": jax.random.key(0)})
    o2 = model.apply(params, x, train=True,
                     rngs={"droppath": jax.random.key(2),
                           "dropout": jax.random.key(0)})
    assert not np.allclose(np.asarray(o1["sheet"]), np.asarray(o2["sheet"]))


def test_deep_supervision_outputs():
    plan = _tiny_plan()
    plan = type(plan)(**{**plan.__dict__, "deep_supervision": True,
                         "num_stages": 3,
                         "features_per_stage": (4, 8, 8),
                         "n_blocks_per_stage": (1, 1, 1),
                         "n_conv_per_stage_decoder": (1, 1),
                         "kernel_sizes": ((3,) * 3,) * 3,
                         "strides": ((1,) * 3, (2,) * 3, (2,) * 3)})
    _, _, out = _init_and_run(plan, (1, 8, 8, 8, 1))
    assert isinstance(out["sheet"], list)
    assert out["sheet"][0].shape == (1, 8, 8, 8, 1)       # full res first
    assert out["sheet"][1].shape == (1, 4, 4, 4, 1)


def test_ds_checkpoint_compat():
    """Non-DS and DS variants of the same plan share the param structure
    (reference: decoder.py:97-100 'always build seg layers')."""
    base = _tiny_plan(num_stages=3, features_per_stage=[4, 8, 8],
                      n_blocks_per_stage=[1, 1, 1],
                      n_conv_per_stage_decoder=[1, 1],
                      kernel_sizes=[3, 3, 3], strides=[1, 2, 2])
    ds = type(base)(**{**base.__dict__, "deep_supervision": True})
    x = jnp.zeros((1, 8, 8, 8, 1))
    p1 = ResEncUNet(plan=base, dtype=jnp.float32).init(
        {"params": jax.random.key(0)}, x, train=False)
    p2 = ResEncUNet(plan=ds, dtype=jnp.float32).init(
        {"params": jax.random.key(0)}, x, train=False)
    s1 = jax.tree_util.tree_structure(p1)
    s2 = jax.tree_util.tree_structure(p2)
    assert s1 == s2


def test_param_count_vs_estimate():
    plan = plan_from_autoconfig((32, 32, 32), 1, [TaskHead("t", 1)],
                                base_features=8, max_features=32)
    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 32, 1))
    params = model.init({"params": jax.random.key(0)}, x, train=False)
    n = count_params(params["params"])
    est = estimate_hbm(plan, (32, 32, 32), 1)
    # closed-form estimate within 20% (seg-layer/bias detail differs)
    assert abs(est.params_bytes / 4 - n) / n < 0.2


def test_flagship_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # shrink for CPU test speed: use the helper with a small patch
    plan, model = mod._flagship(patch=(16, 16, 16), base_features=4,
                                max_features=8)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init({"params": jax.random.key(0)}, x, train=False)
    out = jax.jit(lambda p, x: model.apply(p, x, train=False))(params, x)
    assert set(out) == {"sheet", "normals"}


def test_1d_network():
    """op_dims=1 capability (reference: builders/utils.py:8-66
    convert_dim_to_conv_op supports 1/2/3-D)."""
    plan = plan_from_manual_config(
        dict(basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
             bottleneck_block="BasicBlockD", features_per_stage=[4, 8],
             num_stages=2, n_blocks_per_stage=[1, 1],
             n_conv_per_stage_decoder=[1], kernel_sizes=[3, 3],
             strides=[1, 2]),
        (16,), 1, [TaskHead("seg", 2, "softmax")])
    assert plan.dim == 1
    _, _, out = _init_and_run(plan, (2, 16, 1))
    assert out["seg"].shape == (2, 16, 2)


def test_upsample_packed_path_matches_generic():
    """The packed full-lane upsample GEMM (co<=64, qn*ci==128) must equal
    flax nn.ConvTranspose exactly (same flip semantics)."""
    from flax import linen as fnn
    from mt3d_resenc_unet_tpu.models.network import UpsampleConv

    rng = np.random.default_rng(3)
    for ci, co in ((64, 32), (128, 64)):
        x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, ci)).astype(np.float32))
        mod = UpsampleConv(features=co, kernel_size=(2, 2, 2),
                           use_bias=False, dtype=jnp.float32)
        params = mod.init({"params": jax.random.key(0)}, x)
        ref_mod = fnn.ConvTranspose(features=co, kernel_size=(2, 2, 2),
                                    strides=(2, 2, 2), use_bias=False,
                                    dtype=jnp.float32)
        out = mod.apply(params, x)
        ref = ref_mod.apply(params, x)
        assert out.shape == (2, 8, 12, 16, co)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

"""Train-step unit tests: cosine schedule, optimizer factory, deep-supervision
loss weighting, multitask weighting."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mt3d_resenc_unet_tpu.train.losses import MSELoss
from mt3d_resenc_unet_tpu.train.step import (
    build_optimizer,
    cosine_epoch_schedule,
    multitask_loss,
)


def test_cosine_schedule_epoch_quantized():
    sched = cosine_epoch_schedule(1.0, max_epoch=10, steps_per_epoch=5)
    # constant within an epoch
    assert float(sched(0)) == float(sched(4)) == pytest.approx(1.0)
    # half amplitude at half the epochs
    assert float(sched(5 * 5)) == pytest.approx(0.5, abs=1e-6)
    # zero at the end
    assert float(sched(10 * 5)) == pytest.approx(0.0, abs=1e-6)


def test_optimizer_factories_run():
    import optax
    for name in ("AdamW", "SGD"):
        tx = build_optimizer(name, cosine_epoch_schedule(1e-3, 10, 5),
                             weight_decay=1e-4, grad_clip_norm=3.0)
        params = {"w": jnp.ones((4,))}
        state = tx.init(params)
        grads = {"w": jnp.full((4,), 100.0)}  # should get clipped
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()


def test_multitask_weighting():
    out = {"a": jnp.ones((1, 2, 2, 2, 1)), "b": jnp.zeros((1, 2, 2, 2, 1))}
    tgt = {"a": jnp.zeros((1, 2, 2, 2, 1)), "b": jnp.zeros((1, 2, 2, 2, 1))}
    fns = {"a": MSELoss(), "b": MSELoss()}
    total, per = multitask_loss(out, tgt, fns, {"a": 0.5, "b": 2.0})
    assert float(per["a"]) == pytest.approx(0.5)   # mse 1 * weight .5
    assert float(per["b"]) == pytest.approx(0.0)
    assert float(total) == pytest.approx(0.5)


def test_deep_supervision_loss():
    """DS list outputs combine with halving weights on strided targets."""
    full = jnp.ones((1, 4, 4, 4, 1))
    half = jnp.ones((1, 2, 2, 2, 1))
    tgt = jnp.zeros((1, 4, 4, 4, 1))
    out = {"t": [full, half * 3.0]}
    fns = {"t": MSELoss()}
    total, per = multitask_loss(out, {"t": tgt}, fns, {})
    # weights 2/3 and 1/3; losses 1 and 9
    assert float(total) == pytest.approx(2 / 3 * 1.0 + 1 / 3 * 9.0)


def test_create_optimizer_factory():
    from mt3d_resenc_unet_tpu.train.optimizers import create_optimizer
    params = {"w": jnp.ones((8,))}
    grads = {"w": jnp.full((8,), 0.1)}
    for name in ("adam", "adamw", "sgd", "rmsprop", "adagrad", "adafactor",
                 "lamb", "lion", "novograd", "nadam", "radam", "yogi"):
        tx = create_optimizer(name, 1e-3, weight_decay=1e-4,
                              grad_clip_norm=3.0)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all(), name
    with pytest.raises(ValueError, match="Unknown optimizer"):
        create_optimizer("nope", 1e-3)


def test_ds_train_step_from_yaml_config():
    """End-to-end: a YAML config with deep_supervision trains — config ->
    plan -> model -> jitted step, loss decreases over a few steps."""
    from mt3d_resenc_unet_tpu.core.config import ConfigManager
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.losses import build_task_losses
    from mt3d_resenc_unet_tpu.train.step import TrainState, make_train_step

    cfg = {
        "tr_setup": {"model_name": "ds", "autoconfigure": False},
        "tr_config": {"patch_size": [8, 8, 8], "batch_size": 2},
        "model_config": {
            "basic_encoder_block": "BasicBlockD",
            "basic_decoder_block": "ConvBlock",
            "bottleneck_block": "BasicBlockD",
            "features_per_stage": [4, 8, 8], "num_stages": 3,
            "n_blocks_per_stage": [1, 1, 1],
            "n_conv_per_stage_decoder": [1, 1],
            "kernel_sizes": 3, "strides": [1, 2, 2],
            "deep_supervision": True,
        },
        "dataset_config": {
            "targets": {"sheet": {"channels": 1, "activation": "sigmoid",
                                  "loss_fn": "BCEDiceLoss"}},
            "volume_paths": [],
        },
        "inference_config": {},
    }
    mgr = ConfigManager(config_dict=cfg)
    plan = mgr.build_plan()
    assert plan.deep_supervision
    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.random((2, 8, 8, 8, 1), np.float32)),
        "sheet": jnp.asarray(
            (rng.random((2, 8, 8, 8, 1)) > 0.5).astype(np.float32)),
    }
    params = model.init({"params": jax.random.key(0)}, batch["image"],
                        train=False)["params"]
    tx = build_optimizer("AdamW", cosine_epoch_schedule(1e-2, 10, 5))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              rng=jax.random.key(1))
    step = make_train_step(model, build_task_losses(mgr.tasks), {"sheet": 1.0})
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

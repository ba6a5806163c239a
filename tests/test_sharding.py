"""Multi-device data-parallel tests on the 8-way virtual CPU mesh
(SURVEY.md §4(c)): sharded-batch training must be numerically equivalent to
single-device training, and the graft dryrun must execute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_autoconfig
from mt3d_resenc_unet_tpu.models.network import ResEncUNet
from mt3d_resenc_unet_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_devices,
    replicate,
    shard_batch,
)
from mt3d_resenc_unet_tpu.train.losses import build_task_losses
from mt3d_resenc_unet_tpu.train.step import (
    TrainState,
    build_optimizer,
    cosine_epoch_schedule,
    make_train_step,
)


def _tiny_setup(n_dev, seed=0, grad_accum=1):
    patch = (8, 8, 8)
    plan = plan_from_autoconfig(
        patch, 1, [TaskHead("sheet", 1, "sigmoid")],
        base_features=4, max_features=8)
    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    x = jnp.zeros((1,) + patch + (1,), jnp.float32)
    params = model.init({"params": jax.random.key(seed)}, x,
                        train=False)["params"]
    loss_fns = build_task_losses({"sheet": {"loss_fn": "BCEWithLogitsLoss"}})
    tx = build_optimizer(
        "SGD", cosine_epoch_schedule(1e-2, 10, 10), grad_clip_norm=3.0)
    step = make_train_step(model, loss_fns, {"sheet": 1.0},
                           grad_accum_steps=grad_accum, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((8,) + patch + (1,)).astype(np.float32),
        "sheet": (rng.random((8,) + patch + (1,)) > 0.5).astype(np.float32),
    }
    return model, params, tx, step, batch


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_matches_single_device():
    model, params, tx, step, batch = _tiny_setup(8)

    # single device
    state1 = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                               rng=jax.random.key(42))
    s1, m1 = step(state1, {k: jnp.asarray(v) for k, v in batch.items()})

    # 8-way data parallel
    mesh = make_mesh((8,), ("data",))
    state8 = TrainState.create(
        apply_fn=model.apply, params=replicate(params, mesh), tx=tx,
        rng=jax.random.key(42))
    s8, m8 = step(state8, shard_batch(batch, mesh, "data"))

    assert float(m1["total_loss"]) == pytest.approx(
        float(m8["total_loss"]), rel=1e-5)
    # parameters after the update must agree
    l1 = jax.tree.leaves(jax.device_get(s1.params))
    l8 = jax.tree.leaves(jax.device_get(s8.params))
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_grad_accum_matches_full_batch():
    """scan-accumulated microbatches == one big batch (same effective batch)."""
    model, params, tx, step1, batch = _tiny_setup(1, grad_accum=1)
    _, _, _, step4, _ = _tiny_setup(1, grad_accum=4)

    state_a = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                                rng=jax.random.key(7))
    state_b = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                                rng=jax.random.key(7))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    sa, ma = step1(state_a, jb)
    sb, mb = step4(state_b, jb)
    # losses: mean over full batch vs mean of microbatch means — equal here
    # because all microbatches have the same size
    assert float(ma["total_loss"]) == pytest.approx(
        float(mb["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(sa.params)),
                    jax.tree.leaves(jax.device_get(sb.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_pad_batch():
    assert pad_batch_to_devices(3, 8) == 8
    assert pad_batch_to_devices(8, 8) == 8
    assert pad_batch_to_devices(9, 8) == 16


def test_graft_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

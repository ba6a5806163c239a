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

"""Loss goldens vs hand-computed values and torch semantics (SURVEY.md §4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mt3d_resenc_unet_tpu.train import losses as L


@pytest.fixture
def binary_case(rng):
    pred = rng.standard_normal((2, 8, 8, 8, 1)).astype(np.float32)
    tgt = (rng.random((2, 8, 8, 8, 1)) > 0.5).astype(np.float32)
    return jnp.array(pred), jnp.array(tgt)


def _np_bce_logits(x, t):
    return np.mean(np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x))))


def test_bce_with_logits(binary_case):
    pred, tgt = binary_case
    ours = float(L.BCEWithLogitsLoss()(pred, tgt))
    ref = _np_bce_logits(np.asarray(pred), np.asarray(tgt))
    assert abs(ours - ref) < 1e-5


def test_bce_label_smoothing(binary_case):
    pred, tgt = binary_case
    ours = float(L.BCEWithLogitsLossLabelSmoothing(0.1)(pred, tgt))
    sm = np.asarray(tgt) * 0.8 + 0.1
    ref = _np_bce_logits(np.asarray(pred), sm)
    assert abs(ours - ref) < 1e-5


def test_dice_formula(binary_case):
    pred, tgt = binary_case
    p = 1.0 / (1.0 + np.exp(-np.asarray(pred)))
    t = np.asarray(tgt)
    pf = np.moveaxis(p, -1, 0).reshape(1, -1)
    tf = np.moveaxis(t, -1, 0).reshape(1, -1)
    inter = (pf * tf).sum(-1)
    den = (pf * pf).sum(-1) + (tf * tf).sum(-1)
    ref = 1.0 - np.mean(2 * inter / np.maximum(den, 1e-6))
    ours = float(L.DiceLoss()(pred, tgt))
    assert abs(ours - ref) < 1e-5


def test_dice_perfect_prediction():
    t = jnp.ones((1, 4, 4, 4, 1))
    big_logits = jnp.full((1, 4, 4, 4, 1), 50.0)
    assert float(L.DiceLoss()(big_logits, t)) < 1e-4


def test_bcedice_defaults_work(binary_case):
    # the reference's BCEDiceLoss() crashes without alpha/beta kwargs
    # (its train.py:60-64 default path vs losses.py:310); ours defaults 0.5/0.5
    pred, tgt = binary_case
    v = float(L.BCEDiceLoss()(pred, tgt))
    a = float(L.BCEWithLogitsLossLabelSmoothing(0.1)(pred, tgt))
    b = float(L.DiceLoss()(pred, tgt))
    assert abs(v - 0.5 * (a + b)) < 1e-6


def test_masked_cosine_ignores_zero_targets(rng):
    pred = rng.standard_normal((1, 4, 4, 4, 3)).astype(np.float32)
    tgt = np.zeros((1, 4, 4, 4, 3), np.float32)
    # only one valid voxel, aligned with pred -> loss ~ 0
    tgt[0, 0, 0, 0] = pred[0, 0, 0, 0] / np.linalg.norm(pred[0, 0, 0, 0])
    loss = float(L.MaskedCosineLoss()(jnp.array(pred), jnp.array(tgt)))
    assert loss < 1e-3


def test_masked_cosine_opposite_vectors():
    pred = np.zeros((1, 2, 2, 2, 3), np.float32)
    pred[..., 0] = 1.0
    tgt = np.zeros_like(pred)
    tgt[..., 0] = -1.0
    loss = float(L.MaskedCosineLoss()(jnp.array(pred), jnp.array(tgt)))
    assert abs(loss - 2.0) < 1e-5


def test_zsmooth_center_vs_edge(binary_case):
    pred, tgt = binary_case
    # with center == edge smoothing it must equal plain smoothed BCE
    same = float(L.BCEWithLogitsLossZSmooth(0.1, 0.1)(pred, tgt))
    plain = float(L.BCEWithLogitsLossLabelSmoothing(0.1)(pred, tgt))
    assert abs(same - plain) < 1e-6


def test_zsmooth_alpha_profile():
    d = 8
    pred = jnp.zeros((1, d, 1, 1, 1))
    tgt = jnp.ones((1, d, 1, 1, 1))
    # loss per slice = BCE(0, 1-alpha(z)) = log(2) ... constant in logits=0;
    # instead verify monotonicity via targets=1 and large positive logits:
    big = jnp.full((1, d, 1, 1, 1), 10.0)
    zl = L.BCEWithLogitsLossZSmooth(0.0, 0.4)
    edge_heavy = float(zl(big, tgt))
    plain = float(L.BCEWithLogitsLoss()(big, tgt))
    assert edge_heavy > plain  # smoothing at edges raises loss for confident preds


def test_generalized_dice_binary(binary_case):
    pred, tgt = binary_case
    v = float(L.GeneralizedDiceLoss()(pred, tgt))
    assert 0.0 <= v <= 1.0


def test_mse_and_ce(rng):
    p = rng.standard_normal((2, 4, 4, 4, 3)).astype(np.float32)
    t = rng.standard_normal((2, 4, 4, 4, 3)).astype(np.float32)
    assert abs(float(L.MSELoss()(jnp.array(p), jnp.array(t)))
               - np.mean((p - t) ** 2)) < 1e-5
    onehot = np.zeros_like(p)
    onehot[..., 1] = 1.0
    logp = p - np.log(np.exp(p).sum(-1, keepdims=True))
    ref = -np.mean((onehot * logp).sum(-1))
    assert abs(float(L.CrossEntropyLoss()(jnp.array(p), jnp.array(onehot))) - ref) < 1e-4


def test_masking_wrapper():
    pred = jnp.array(np.full((1, 2, 2, 2, 1), 3.0, np.float32))
    tgt = np.ones((1, 2, 2, 2, 1), np.float32)
    tgt[0, 0] = -1.0  # ignore region
    wrapped = L.MaskingLossWrapper(L.MSELoss(), ignore_index=-1.0)
    v = float(wrapped(pred, jnp.array(tgt)))
    # masked voxels contribute (3*0 - 0)^2 = 0... but MSE mean includes them;
    # matching the reference wrapper which multiplies both by the mask
    n_total = 8
    n_valid = 4
    assert abs(v - (n_valid * (3 - 1) ** 2) / n_total) < 1e-5


def test_skip_last_channel_wrapper(rng):
    p = jnp.array(rng.standard_normal((1, 2, 2, 2, 1)).astype(np.float32))
    t = jnp.array(rng.random((1, 2, 2, 2, 2)).astype(np.float32))
    wrapped = L.SkipLastTargetChannelWrapper(L.MSELoss())
    v = float(wrapped(p, t))
    ref = float(L.MSELoss()(p, t[..., :1]))
    assert abs(v - ref) < 1e-6


def test_registry_and_builder():
    tasks = {
        "sheet": {"loss_fn": "BCEDiceLoss", "loss_kwargs": {"alpha": 0.5, "beta": 0.5}},
        "normals": {"loss_fn": "MaskedCosineLoss"},
        "default": {},
    }
    fns = L.build_task_losses(tasks)
    assert set(fns) == {"sheet", "normals", "default"}
    with pytest.raises(ValueError, match="not found"):
        L.build_task_losses({"x": {"loss_fn": "NopeLoss"}})


def test_expand_as_one_hot_and_ce_index_targets(rng):
    from mt3d_resenc_unet_tpu.train.losses import (CrossEntropyLoss,
                                                   expand_as_one_hot)
    import jax.numpy as jnp

    pred = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 3)).astype(np.float32))
    labels = rng.integers(0, 3, size=(2, 4, 4, 4, 1))
    onehot = expand_as_one_hot(jnp.asarray(labels), 3)
    assert onehot.shape == (2, 4, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(onehot).sum(-1), 1.0)
    ce = CrossEntropyLoss()
    l_idx = float(ce(pred, jnp.asarray(labels.astype(np.float32))))
    l_hot = float(ce(pred, onehot))
    assert abs(l_idx - l_hot) < 1e-6
    # channel-less index targets work too
    l_sq = float(ce(pred, jnp.asarray(labels[..., 0])))
    assert abs(l_sq - l_hot) < 1e-6


def test_loss_only_on_label_wrapper():
    from mt3d_resenc_unet_tpu.train.losses import (LossOnLabelWrapper,
                                                   MSELoss, build_task_losses)
    import jax.numpy as jnp

    pred = jnp.ones((1, 2, 2, 2, 1), jnp.float32) * 3.0
    tgt = np.zeros((1, 2, 2, 2, 1), np.float32)
    tgt[0, 0] = 1.0  # half the voxels labeled
    wrapped = LossOnLabelWrapper(MSELoss())
    # labeled half: (3-1)^2 = 4; unlabeled half: pred masked to 0 -> 0
    assert abs(float(wrapped(pred, jnp.asarray(tgt))) - 2.0) < 1e-6
    losses = build_task_losses(
        {"t": {"loss_fn": "MSELoss"}}, loss_only_on_label=True)
    assert isinstance(losses["t"], LossOnLabelWrapper)

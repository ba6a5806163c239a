"""Multi-task loss library in pure JAX, channels-last.

Reimplements the reference loss set (reference: training/losses/losses.py:1-333
and the torch builtins wired in train.py:47-56) for NDHWC tensors:

  BCEDiceLoss, DiceLoss, GeneralizedDiceLoss, BCEWithLogitsLoss, BCELoss,
  CrossEntropyLoss, MSELoss, BCEWithLogitsLossLabelSmoothing,
  BCEWithLogitsLossZSmooth, MaskedCosineLoss, plus the masking / skip-channel
  wrappers.

All reductions run in fp32 regardless of input dtype. Every loss is a plain
callable ``loss(pred, target) -> scalar`` usable inside ``jax.jit``/``grad``.

Unlike the reference, ``BCEDiceLoss`` has working defaults (alpha=beta=0.5);
the reference crashes when instantiated without kwargs (its train.py:60-64 vs
losses.py:310 — SURVEY.md §2.6.7).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

Loss = Callable[[jax.Array, jax.Array], jax.Array]

_EPS_DICE = 1e-6


def _f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def label_smooth(target: jax.Array, smooth_factor: float) -> jax.Array:
    """Binary label smoothing 1 -> 1-f, 0 -> f (reference: losses.py:7-15)."""
    return target * (1.0 - smooth_factor) + (1.0 - target) * smooth_factor


def _flatten_channels_first(x: jax.Array) -> jax.Array:
    """(N, *spatial, C) -> (C, N * prod(spatial)) — the channel-major flatten
    used by dice computations (reference: losses.py:321-333)."""
    c = x.shape[-1]
    return jnp.moveaxis(x, -1, 0).reshape(c, -1)


def sigmoid_binary_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically stable elementwise BCE-with-logits."""
    logits, targets = _f32(logits, targets)
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def compute_per_channel_dice(probs: jax.Array, target: jax.Array,
                             weight: Optional[jax.Array] = None,
                             epsilon: float = _EPS_DICE) -> jax.Array:
    """V-Net-style per-channel dice 2*(p.t)/(p^2+t^2)
    (reference: losses.py:17-43)."""
    probs, target = _f32(probs, target)
    p = _flatten_channels_first(probs)
    t = _flatten_channels_first(target)
    intersect = jnp.sum(p * t, axis=-1)
    if weight is not None:
        intersect = weight * intersect
    denominator = jnp.sum(p * p, axis=-1) + jnp.sum(t * t, axis=-1)
    return 2.0 * intersect / jnp.clip(denominator, min=epsilon)


@dataclasses.dataclass(frozen=True)
class DiceLoss:
    """1 - mean per-channel dice, logits normalized by sigmoid/softmax
    (reference: losses.py:93-138)."""

    normalization: str = "sigmoid"  # sigmoid | softmax | none
    smooth_factor: float = 0.0
    weight: Optional[tuple] = None

    def __call__(self, pred, target):
        pred, target = _f32(pred, target)
        if self.normalization == "sigmoid":
            probs = jax.nn.sigmoid(pred)
        elif self.normalization == "softmax":
            probs = jax.nn.softmax(pred, axis=-1)
        else:
            probs = pred
        if self.smooth_factor > 0.0:
            target = label_smooth(target, self.smooth_factor)
        w = jnp.asarray(self.weight, jnp.float32) if self.weight is not None else None
        return 1.0 - jnp.mean(compute_per_channel_dice(probs, target, weight=w))


@dataclasses.dataclass(frozen=True)
class GeneralizedDiceLoss:
    """GDL with inverse-volume class weights (reference: losses.py:141-173)."""

    normalization: str = "sigmoid"
    epsilon: float = 1e-6

    def __call__(self, pred, target):
        pred, target = _f32(pred, target)
        if self.normalization == "sigmoid":
            probs = jax.nn.sigmoid(pred)
        elif self.normalization == "softmax":
            probs = jax.nn.softmax(pred, axis=-1)
        else:
            probs = pred
        p = _flatten_channels_first(probs)
        t = _flatten_channels_first(target)
        if p.shape[0] == 1:
            p = jnp.concatenate([p, 1.0 - p], axis=0)
            t = jnp.concatenate([t, 1.0 - t], axis=0)
        w = jnp.sum(t, axis=-1)
        w = 1.0 / jnp.clip(w * w, min=self.epsilon)
        w = jax.lax.stop_gradient(w)
        intersect = jnp.sum(p * t, axis=-1) * w
        denominator = jnp.clip(jnp.sum(p + t, axis=-1) * w, min=self.epsilon)
        dice = 2.0 * jnp.sum(intersect) / jnp.sum(denominator)
        return 1.0 - dice


@dataclasses.dataclass(frozen=True)
class BCEWithLogitsLoss:
    reduction: str = "mean"

    def __call__(self, pred, target):
        loss = sigmoid_binary_cross_entropy(pred, target)
        return jnp.mean(loss) if self.reduction == "mean" else jnp.sum(loss)


@dataclasses.dataclass(frozen=True)
class BCELoss:
    """BCE on probabilities (inputs already in [0,1])."""

    reduction: str = "mean"
    eps: float = 1e-12

    def __call__(self, pred, target):
        pred, target = _f32(pred, target)
        p = jnp.clip(pred, self.eps, 1.0 - self.eps)
        loss = -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))
        return jnp.mean(loss) if self.reduction == "mean" else jnp.sum(loss)


def expand_as_one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    """Integer class labels ``(N, *spatial)`` or ``(N, *spatial, 1)`` ->
    one-hot ``(N, *spatial, num_classes)`` float32, channels-last
    (reference: builders/utils.py expand_as_one_hot, which emits NCDHW)."""
    if labels.ndim and labels.shape[-1] == 1:
        labels = labels[..., 0]
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes,
                          dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class CrossEntropyLoss:
    """Softmax cross entropy over the channel axis.

    Targets may be dense (soft or one-hot, same shape as ``pred``) or integer
    class indices with a trailing singleton channel / no channel axis —
    matching torch's ``nn.CrossEntropyLoss`` accepting index targets
    (reference wires it at train.py:47-56)."""

    reduction: str = "mean"

    def __call__(self, pred, target):
        pred = pred.astype(jnp.float32)
        # integer dtype decides index-vs-dense (not shape alone: a C==1 head
        # with (N,...,1) integer targets would otherwise be silently treated
        # as dense soft targets)
        if (jnp.issubdtype(target.dtype, jnp.integer)
                or target.shape != pred.shape):
            target = expand_as_one_hot(target, pred.shape[-1])
        else:
            target = target.astype(jnp.float32)
        logp = jax.nn.log_softmax(pred, axis=-1)
        loss = -jnp.sum(target * logp, axis=-1)
        return jnp.mean(loss) if self.reduction == "mean" else jnp.sum(loss)


@dataclasses.dataclass(frozen=True)
class MSELoss:
    reduction: str = "mean"

    def __call__(self, pred, target):
        pred, target = _f32(pred, target)
        loss = jnp.square(pred - target)
        return jnp.mean(loss) if self.reduction == "mean" else jnp.sum(loss)


@dataclasses.dataclass(frozen=True)
class BCEWithLogitsLossLabelSmoothing:
    """BCE with smoothed targets y*(1-2a)+a (reference: losses.py:217-238)."""

    smoothing: float = 0.1
    reduction: str = "mean"

    def __call__(self, pred, target):
        target = jax.lax.stop_gradient(
            target.astype(jnp.float32) * (1.0 - 2.0 * self.smoothing) + self.smoothing)
        loss = sigmoid_binary_cross_entropy(pred, target)
        return jnp.mean(loss) if self.reduction == "mean" else jnp.sum(loss)


@dataclasses.dataclass(frozen=True)
class BCEWithLogitsLossZSmooth:
    """Label smoothing growing linearly from the center Z slice outward
    (reference: losses.py:240-304). Tensors are (N, D, H, W, C); D is Z."""

    center_smoothing: float = 0.1
    edge_smoothing: float = 0.4
    reduction: str = "mean"

    def __call__(self, pred, target):
        pred, target = _f32(pred, target)
        d = pred.shape[1]
        mid = (d - 1) / 2.0
        z = jnp.arange(d, dtype=jnp.float32)
        dist = jnp.abs(z - mid)
        max_dist = max(d // 2, 1)
        alpha = self.center_smoothing + (
            self.edge_smoothing - self.center_smoothing) * dist / max_dist
        alpha = alpha.reshape(1, d, 1, 1, 1)
        smoothed = jax.lax.stop_gradient(target * (1.0 - 2.0 * alpha) + alpha)
        loss = sigmoid_binary_cross_entropy(pred, smoothed)
        return jnp.mean(loss) if self.reduction == "mean" else jnp.sum(loss)


@dataclasses.dataclass(frozen=True)
class MaskedCosineLoss:
    """1 - mean cosine similarity between unit-normalized predictions and
    target normals, masked to voxels with nonzero target magnitude
    (reference: losses.py:187-215). Channel axis is last: (N,D,H,W,3)."""

    mag_threshold: float = 1e-6
    eps: float = 1e-8

    def __call__(self, pred, target):
        pred, target = _f32(pred, target)
        target_mag = jnp.linalg.norm(target, axis=-1)
        mask = (target_mag > self.mag_threshold).astype(jnp.float32)
        pred_mag = jnp.clip(jnp.linalg.norm(pred, axis=-1, keepdims=True), min=self.eps)
        pred_unit = pred / pred_mag
        # cosine_similarity(pred_unit, target): both magnitudes clamped
        tgt_mag = jnp.clip(target_mag, min=self.eps)
        cos = jnp.sum(pred_unit * target, axis=-1) / tgt_mag
        valid = jnp.sum(mask) + self.eps
        return 1.0 - jnp.sum(cos * mask) / valid


@dataclasses.dataclass(frozen=True)
class BCEDiceLoss:
    """alpha * BCE(label-smoothed 0.1) + beta * Dice
    (reference: losses.py:307-318)."""

    alpha: float = 0.5
    beta: float = 0.5

    def __call__(self, pred, target):
        bce = BCEWithLogitsLossLabelSmoothing(smoothing=0.1)(pred, target)
        dice = DiceLoss()(pred, target)
        return self.alpha * bce + self.beta * dice


@dataclasses.dataclass(frozen=True)
class MaskingLossWrapper:
    """Zero out loss where target == ignore_index
    (reference: losses.py:46-66)."""

    loss: Loss
    ignore_index: float

    def __call__(self, pred, target):
        mask = jax.lax.stop_gradient(
            (target != self.ignore_index).astype(pred.dtype))
        return self.loss(pred * mask, target * mask)


@dataclasses.dataclass(frozen=True)
class LossOnLabelWrapper:
    """Restrict the loss to labeled voxels (any target channel nonzero).

    Implements the ``loss_only_on_label`` capability the reference declares
    in its YAML but never wired (tasks/example.yaml:26; no implementation
    anywhere in the reference — SURVEY.md §5.6). Masking follows the
    reference's _MaskingLossWrapper convention (losses.py:46-66): both pred
    and target are zeroed outside the mask, so unlabeled voxels contribute a
    constant, zero-gradient term."""

    loss: Loss

    def __call__(self, pred, target):
        labeled = jnp.sum(jnp.abs(target.astype(jnp.float32)), axis=-1,
                          keepdims=True) > 0
        mask = jax.lax.stop_gradient(labeled.astype(pred.dtype))
        return self.loss(pred * mask, target * mask.astype(target.dtype))


@dataclasses.dataclass(frozen=True)
class SkipLastTargetChannelWrapper:
    """Drop the last target channel before computing the loss
    (reference: losses.py:69-90). Channel axis is last."""

    loss: Loss

    def __call__(self, pred, target):
        if target.shape[-1] <= 1:
            raise ValueError("Target has a singleton channel dim; cannot skip")
        return self.loss(pred, target[..., :-1])


LOSS_FN_MAP: Dict[str, Callable[..., Loss]] = {
    "BCEDiceLoss": BCEDiceLoss,
    "BCEWithLogitsLossLabelSmoothing": BCEWithLogitsLossLabelSmoothing,
    "BCEWithLogitsLossZSmooth": BCEWithLogitsLossZSmooth,
    "BCEWithLogitsLoss": BCEWithLogitsLoss,
    "BCELoss": BCELoss,
    "CrossEntropyLoss": CrossEntropyLoss,
    "MSELoss": MSELoss,
    "MaskedCosineLoss": MaskedCosineLoss,
    "DiceLoss": DiceLoss,
    "GeneralizedDiceLoss": GeneralizedDiceLoss,
}


def build_task_losses(tasks: Dict[str, dict],
                      ignore_label: Optional[float] = None,
                      loss_only_on_label: bool = False) -> Dict[str, Loss]:
    """Per-task loss construction from config (reference: train.py:43-66),
    with optional ignore-label masking and labeled-region restriction (the
    reference declares ``ignore_label`` / ``loss_only_on_label`` in its YAML
    but never implements either — tasks/example.yaml:25-26)."""
    losses: Dict[str, Loss] = {}
    for name, info in tasks.items():
        loss_name = info.get("loss_fn", "BCEDiceLoss")
        if loss_name not in LOSS_FN_MAP:
            raise ValueError(
                f"Loss function {loss_name} not found in LOSS_FN_MAP. "
                f"Known: {sorted(LOSS_FN_MAP)}")
        kwargs = info.get("loss_kwargs", {}) or {}
        loss = LOSS_FN_MAP[loss_name](**kwargs)
        if ignore_label is not None:
            loss = MaskingLossWrapper(loss, float(ignore_label))
        if loss_only_on_label:
            loss = LossOnLabelWrapper(loss)
        losses[name] = loss
    return losses

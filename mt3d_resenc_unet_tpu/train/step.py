"""Jitted training/eval steps: multi-task loss, gradient accumulation,
clipping, cosine schedule.

Reimplements the reference training semantics (reference: train.py:175-240)
the XLA way:

* the whole optimizer step — forward, backward, per-task weighting, gradient
  accumulation, global-norm clip, parameter update — is ONE compiled program;
* gradient accumulation is a ``lax.scan`` over microbatches inside the step
  (reference divides the loss by ``grad_accumulate_n`` and calls
  ``optimizer.step`` every N python iterations — train.py:222-230);
* mixed precision is bf16 compute / fp32 params+optimizer state, so no
  GradScaler is needed (TPU bf16 has fp32-range exponents, unlike fp16);
* the LR schedule is cosine over epochs with eta_min=0
  (reference: train.py:87-91 CosineAnnealingLR stepped once per epoch).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from .losses import Loss


class TrainState(train_state.TrainState):
    """Carries the droppath/dropout RNG key alongside params/opt state."""

    rng: jax.Array = None

    @classmethod
    def create(cls, **kwargs):
        state = super().create(**kwargs)
        # flax sets step=0 (a WEAK-typed python int). The first jitted
        # train_step call then traces with a weak int32 step, and the
        # second call — whose input is step 1's STRONG int32 output —
        # retraces AND recompiles the whole program (measured: a second
        # 125 s XLA compile on the first e2e step 2, 2026-08-20). A strong
        # dtype from the start makes every call signature identical (and
        # lets the abstract prelower trace be the only trace).
        return state.replace(step=jnp.asarray(state.step, jnp.int32))


def cosine_epoch_schedule(initial_lr: float, max_epoch: int,
                          steps_per_epoch: int) -> optax.Schedule:
    """lr(step) = 0.5 * lr0 * (1 + cos(pi * epoch / max_epoch)), epoch-quantized
    to match torch CosineAnnealingLR stepped per epoch
    (reference: train.py:87-91, 336)."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, max_epoch)
        return 0.5 * initial_lr * (1.0 + jnp.cos(jnp.pi * epoch / max_epoch))

    return schedule


def build_optimizer(
    optimizer_name: str,
    schedule: optax.Schedule,
    weight_decay: float = 0.0,
    grad_clip_norm: float = 3.0,
) -> optax.GradientTransformation:
    """AdamW (default) or SGD+nesterov(momentum .9), preceded by global-norm
    clipping at 3 (reference: train.py:69-84, 227)."""
    if optimizer_name.lower() == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(learning_rate=schedule, momentum=0.9, nesterov=True),
        )
    else:
        opt = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    # (optax.flatten measured 4% SLOWER end-to-end, 2026-08-18: the
    # ravel/unravel concats and lost donation aliasing outweigh the ~90
    # per-leaf fusion dispatches they remove)
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)


def decode_wire(batch: Mapping[str, jax.Array],
                normal_keys: Tuple[str, ...] = ("normals",),
                upcast_bf16: bool = False) -> Dict[str, jax.Array]:
    """Decode a compact 'wire format' batch on device.

    The dataset's wire mode (data/dataset.py) ships samples host->device in
    their stored dtypes — uint8 masks, uint16-encoded normals, bf16 images —
    cutting H2D bytes 2-4x on hosts where the transfer link is the training
    bottleneck. This decode reproduces the host LUT arithmetic of
    data/zio.py bit-for-bit in fp32 (u8/255, u16/65535, normals
    u/32767.5 - 1; reference codecs: dataloading/dataset.py:125-131,147-155).
    Float arrays pass through, so non-wire batches are unchanged.
    """
    out = {}
    for k, v in batch.items():
        if v.dtype == jnp.uint16 and k in normal_keys:
            # grouping matches the zio.py host LUT bit-for-bit (and makes
            # encoded-space negation exact — see decode_normals)
            out[k] = (v.astype(jnp.float32) - 32767.5) / 32767.5
        elif v.dtype == jnp.uint16:
            out[k] = v.astype(jnp.float32) / 65535.0
        elif v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 255.0
        elif upcast_bf16 and v.dtype == jnp.bfloat16:
            out[k] = v.astype(jnp.float32)
        else:
            out[k] = v
    return out


def _downsample_target(t: jax.Array, factor: Tuple[int, ...]) -> jax.Array:
    """Strided subsampling of a target for deep supervision. Handles both
    channel-last dense targets ``(N, *spatial, C)`` and channel-less integer
    index targets ``(N, *spatial)`` (the CE index form)."""
    idx = (slice(None),) + tuple(slice(None, None, f) for f in factor)
    if t.ndim == len(factor) + 2:   # trailing channel axis present
        idx = idx + (slice(None),)
    return t[idx]


def multitask_loss(
    outputs: Mapping[str, Any],
    targets: Mapping[str, jax.Array],
    loss_fns: Mapping[str, Loss],
    task_weights: Mapping[str, float],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Weighted sum of per-task losses (reference: train.py:208-218).

    When a decoder returns a deep-supervision list (highest resolution
    first), losses are combined with nnU-Net-style halving weights
    (1, 1/2, 1/4, ...) normalized to sum 1 — the reference builds
    DS-capable decoders but never trains with them (decoder.py:97-100,
    build_network_from_config.py:274); here the capability is usable.
    """
    total = jnp.zeros((), jnp.float32)
    per_task: Dict[str, jax.Array] = {}
    for name, fn in loss_fns.items():
        out = outputs[name]
        tgt = targets[name]
        if isinstance(out, (list, tuple)):
            ws = [0.5 ** i for i in range(len(out))]
            ws = [w / sum(ws) for w in ws]
            l = jnp.zeros((), jnp.float32)
            for w, o in zip(ws, out):
                spatial = o.shape[1:-1]
                # channel-less integer index targets (N, *spatial) have one
                # fewer axis than the prediction — their LAST axis is spatial
                tgt_spatial = (tgt.shape[1:-1] if tgt.ndim == o.ndim
                               else tgt.shape[1:])
                factor = tuple(t // s for t, s in zip(tgt_spatial, spatial))
                t_ds = _downsample_target(tgt, factor) \
                    if any(f != 1 for f in factor) else tgt
                l = l + w * fn(o, t_ds)
        else:
            l = fn(out, tgt)
        l = l * task_weights.get(name, 1.0)
        per_task[name] = l
        total = total + l
    return total, per_task


def make_train_step(
    model,
    loss_fns: Mapping[str, Loss],
    task_weights: Mapping[str, float],
    grad_accum_steps: int = 1,
    donate: bool = True,
    augment_fn: Optional[Callable[[Dict[str, jax.Array], jax.Array],
                                  Dict[str, jax.Array]]] = None,
) -> Callable[[TrainState, Dict[str, jax.Array]], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted train step.

    The batch dict must contain 'image' plus one entry per task, each with
    leading dimension ``grad_accum_steps * microbatch``.

    ``augment_fn(batch, rng) -> batch`` (e.g. data/augment_device.py) runs
    INSIDE the compiled step, per microbatch, after the wire decode — the
    TPU-native home of the stochastic sample pipeline the reference executes
    in DataLoader workers (reference: dataloading/dataset.py:176-209).
    """
    loss_fns = dict(loss_fns)
    task_weights = dict(task_weights)
    normal_keys = tuple(k for k in loss_fns if k.lower() == "normals")

    def loss_for_micro(params, micro, rng):
        # wire-format decode happens per-microbatch INSIDE the scan so the
        # fp32 expansion never materializes for the whole accumulated batch
        micro = decode_wire(micro, normal_keys)
        if augment_fn is not None:
            rng, a_rng = jax.random.split(rng)
            micro = augment_fn(micro, a_rng)
        d_rng, p_rng = jax.random.split(rng)
        outputs = model.apply(
            {"params": params}, micro["image"], train=True,
            rngs={"dropout": d_rng, "droppath": p_rng})
        targets = {k: v for k, v in micro.items() if k != "image"}
        return multitask_loss(outputs, targets, loss_fns, task_weights)

    grad_fn = jax.value_and_grad(loss_for_micro, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        step_rng = jax.random.fold_in(state.rng, state.step)
        if grad_accum_steps == 1:
            (total, per_task), grads = grad_fn(state.params, batch, step_rng)
        else:
            def split_micro(x):
                # INTERLEAVED split: microbatch k = samples [k::accum]. With
                # the batch axis sharded over the data mesh axis, each
                # device's contiguous shard contributes rows to EVERY
                # microbatch, so the per-microbatch slice stays device-local
                # (a plain (accum, micro) reshape would make microbatch k a
                # contiguous block living on a subset of devices and force an
                # all-to-all each scan iteration). For per-voxel additive
                # losses (BCE/CE/MSE) the accumulated gradient is identical
                # either way; Dice-family losses pool statistics over the
                # whole microbatch (reference flatten, losses.py), so
                # regrouping changes them slightly — but the reference's own
                # contiguous microbatching has the same property under its
                # shuffled sampler, so this is a wash, not a divergence.
                micro = x.shape[0] // grad_accum_steps
                x = x.reshape((micro, grad_accum_steps) + x.shape[1:])
                return jnp.swapaxes(x, 0, 1)

            micros = jax.tree.map(split_micro, batch)

            def body(carry, inp):
                grads_acc, total_acc, pt_acc = carry
                micro, idx = inp
                rng = jax.random.fold_in(step_rng, idx)
                (total, per_task), grads = grad_fn(state.params, micro, rng)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                pt_acc = jax.tree.map(jnp.add, pt_acc, per_task)
                return (grads_acc, total_acc + total, pt_acc), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            zero_pt = {k: jnp.zeros((), jnp.float32) for k in loss_fns}
            (grads, total, per_task), _ = jax.lax.scan(
                body,
                (zero_grads, jnp.zeros((), jnp.float32), zero_pt),
                (micros, jnp.arange(grad_accum_steps)),
            )
            inv = 1.0 / grad_accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            total = total * inv
            per_task = jax.tree.map(lambda l: l * inv, per_task)

        new_state = state.apply_gradients(grads=grads)
        metrics = dict(per_task)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        # one packed vector so the trainer's device-side running sum is a
        # SINGLE tiny op per step instead of one per metric (each dispatch
        # costs ~26 ms of round-trip overhead on tunneled runtimes); key
        # order is the sorted metric names
        metrics["_vec"] = jnp.stack(
            [metrics[k].astype(jnp.float32) for k in sorted(metrics)])
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    loss_fns: Mapping[str, Loss],
) -> Callable[[Any, Dict[str, jax.Array]], Dict[str, jax.Array]]:
    """Validation: unweighted per-task losses on train-mode logits
    (reference: train.py:268-297 computes val losses without task weights,
    under model.eval() — the reference therefore computes val losses on
    ACTIVATED outputs, double-applying sigmoid inside BCE/Dice, a quirk we
    treat as unintended: validation here runs the deterministic eval path
    but with activations suppressed, so losses see logits exactly as in
    training)."""
    loss_fns = dict(loss_fns)
    normal_keys = tuple(k for k in loss_fns if k.lower() == "normals")

    def eval_step(params, batch):
        batch = decode_wire(batch, normal_keys)
        outputs = model.apply({"params": params}, batch["image"],
                              train=False, apply_activations=False)
        targets = {k: v for k, v in batch.items() if k != "image"}
        metrics = {}
        total = jnp.zeros((), jnp.float32)
        for name, fn in loss_fns.items():
            out_h = outputs[name]
            if isinstance(out_h, (list, tuple)):
                # deep supervision: validate on the full-resolution head only
                out_h = out_h[0]
                outputs = dict(outputs)
                outputs[name] = out_h
            l = fn(out_h, targets[name])
            metrics[name] = l
            total = total + l
            # quality metrics alongside losses (the BASELINE.md headline
            # metrics): hard Dice for binary heads, masked cosine similarity
            # for normals
            out = outputs[name]
            tgt = targets[name]
            if not isinstance(out, (list, tuple)):
                if name.lower() == "normals" and out.shape[-1] == 3:
                    from .losses import MaskedCosineLoss
                    metrics[f"{name}_cosine"] = 1.0 - MaskedCosineLoss()(
                        out, tgt)
                elif out.shape[-1] == 1:
                    pred = (out > 0).astype(jnp.float32)  # sigmoid(x)>.5
                    t = (tgt > 0.5).astype(jnp.float32)
                    inter = jnp.sum(pred * t)
                    metrics[f"{name}_dice"] = (
                        2.0 * inter / jnp.clip(jnp.sum(pred) + jnp.sum(t),
                                               min=1e-8))
        metrics["total_loss"] = total
        return metrics

    return jax.jit(eval_step)


def make_predict_step(model) -> Callable[[Any, jax.Array], Dict[str, jax.Array]]:
    """Eval-mode forward with per-task activations applied (reference model
    forward in eval: build_network_from_config.py:321-323)."""

    def predict(params, image):
        image = decode_wire({"image": image})["image"]
        outs = model.apply({"params": params}, image, train=False)
        # deep supervision: expose only the full-resolution head
        return {k: (v[0] if isinstance(v, (list, tuple)) else v)
                for k, v in outs.items()}

    return jax.jit(predict)

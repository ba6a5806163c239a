"""Shared-encoder / multi-decoder ResEnc U-Net, plan-driven, channels-last.

TPU-native rework of the reference's NetworkFromConfig
(reference: builders/build_network_from_config.py:20-326,
builders/encoder.py:27-170, builders/decoder.py:16-193):

* the architecture is fully described by an immutable
  :class:`~mt3d_resenc_unet_tpu.core.plan.NetworkPlan` that rides through
  ``jax.jit`` as static data — no Python-side mutation, a single retrace per
  plan;
* layout is NDHWC so 3D convolutions map straight onto the MXU;
* ``__call__`` returns ``{task_name: logits}`` and applies the per-task
  activation only when ``train=False``, matching the reference forward
  (build_network_from_config.py:312-326).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.plan import NetworkPlan
from ..ops.instance_norm import norm_apply_packed, stats_to_scale_shift
from .blocks import (
    ConvNormAct,
    StackedConvBlocks,
    StackedResidualBlocks,
    torch_bias_init,
    torch_conv_kernel_init,
)

Dtype = jnp.dtype


class UpsampleConv(nn.Module):
    """Transposed conv with kernel == stride (the only form this
    architecture uses — reference: decoder.py:76-79), computed as ONE
    pointwise GEMM + depth-to-space instead of ``lax.conv_transpose``.

    With kernel==stride every output voxel receives exactly one input
    contribution, so y[.., k*i+di, ..] = x[.., i, ..] @ W[di, ..]: a GEMM
    with N = prod(k) * C_out output columns (full MXU lanes even for small
    C_out; XLA's transposed conv runs at <10% MXU here). Parameter layout
    matches flax ``nn.ConvTranspose`` (kernel: (*k, in, out)) for checkpoint
    compatibility."""

    features: int
    kernel_size: Tuple[int, ...]
    use_bias: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        ci = x.shape[-1]
        co = self.features
        # torch ConvTranspose default init: kaiming_uniform(a=sqrt(5)) with
        # fan_in = c_out * prod(k) (torch weight layout (ci, co, *k) makes
        # size(1) = co the "input fmaps") — the reference upsamples with
        # nn.ConvTranspose3d at torch defaults (builders/decoder.py:76-79)
        fan = co
        for kk in k:
            fan *= kk
        bound = 1.0 / (fan ** 0.5)
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            k + (ci, co), self.param_dtype)
        bias = (self.param("bias", torch_bias_init(fan), (co,),
                           self.param_dtype) if self.use_bias else None)
        x = x.astype(self.dtype)
        nd = len(k)
        # flax ConvTranspose applies the kernel spatially flipped:
        # y[k*i + di] = x[i] @ W[k-1-di] (verified against nn.ConvTranspose)
        wflip = jnp.flip(kernel.astype(self.dtype), axis=tuple(range(nd)))
        n = x.shape[0]
        spatial = x.shape[1:-1]
        # Packed path for the 2x cube upsample at small channel counts: the
        # generic depth-to-space interleave below ends in a minor-dims
        # (W, k2, co) transpose that Mosaic lowers to a T(2,128) relayout
        # copy — ~13 ms per task at full res (profiled). Instead pack
        # g = 128//co output x-positions on lanes: per (di, dj) ONE
        # full-lane GEMM on rows that pack q input x-positions with
        # channels, then a major-dims-only (D, H) interleave.
        g_o = 128 // co if co <= 64 and 128 % co == 0 else 0
        qn = g_o // 2
        if (nd == 3 and k == (2, 2, 2) and g_o >= 2 and qn * ci == 128
                and spatial[2] % max(qn, 1) == 0):
            di_, hi_, wi_ = spatial
            wg = wi_ // qn
            xp = x.reshape(n, di_, hi_, wg, qn * ci)
            # W'[(q, cin), (dk, q', c)] = wflip[di, dj, dk, cin, c] iff q==q'
            # output lane l = (2q + dk)*co + c  (w_out = 2*(qn*wg+q) + dk)
            wb = jnp.zeros((2, 2, qn, ci, 2 * qn, co), self.dtype)
            for q in range(qn):
                for dk in range(2):
                    wb = wb.at[:, :, q, :, 2 * q + dk, :].set(
                        wflip[:, :, dk])
            wb = wb.reshape(2, 2, qn * ci, g_o * co)
            if self.use_pallas and qn * ci == 128:
                # fused GEMM + (D, H)-interleaved write: the kernel emits
                # (N, Di, 2, Hi, 2, Wg, 128) so both reshapes below are
                # free views — no stack, no transpose pass
                # (ops/pallas_upsample.py)
                from ..ops.pallas_upsample import upsample2x_packed
                y = upsample2x_packed(xp, wb)
                y = y.reshape(n, 2 * di_, 2 * hi_, 2 * wi_, co)
            else:
                ys = [jnp.dot(xp, wb[di, dj],
                              preferred_element_type=self.dtype)
                      for di in range(2) for dj in range(2)]
                y = jnp.stack(ys, axis=0).reshape(2, 2, n, di_, hi_, wg, 128)
                # (di,dj,N,D,H,Wg,L) -> (N,D,di,H,dj,Wg,L): minor dims
                # untouched (strided .at[::2].set scatters measured 6%
                # SLOWER end-to-end than this stack + major-dims transpose)
                y = y.transpose(2, 3, 0, 4, 1, 5, 6)
                y = y.reshape(n, 2 * di_, 2 * hi_, 2 * wi_, co)
        else:
            # (k..., ci, co) -> (ci, prod(k)*co)
            w2 = jnp.moveaxis(wflip, nd, 0)
            w2 = w2.reshape(ci, -1)
            y = jnp.dot(x, w2, preferred_element_type=self.dtype)
            # (N, *s, prod(k)*co) -> (N, *(s_i, k_i)..., co) -> upsampled
            y = y.reshape((n,) + spatial + k + (co,))
            # interleave: (N, s0, s1, s2, k0, k1, k2, co) -> (N, s0,k0, ...)
            perm = [0]
            for i in range(nd):
                perm += [1 + i, 1 + nd + i]
            perm += [1 + 2 * nd]
            y = y.transpose(perm)
            y = y.reshape((n,) + tuple(s * kk for s, kk in zip(spatial, k))
                          + (co,))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class SegLayer(nn.Module):
    """1x1(x1) segmentation head as a plain channel matmul.

    Parameter layout matches flax ``nn.Conv`` with kernel_size (1,)*dim
    (kernel (*1, ci, co) + bias), so checkpoints are interchangeable with
    the previous nn.Conv seg layers. A dot avoids conv_general_dilated's
    layout constraints: with co in {1, 3} XLA's conv dW transpose
    materialized a 4x lane-padded batch-minor copy of the input activation
    (2 GB for a 512 MB tensor at batch 4) — the GEMM formulation compiles
    with zero layout-change temps (reference: builders/decoder.py:97-100
    seg_layers)."""

    features: int
    dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        # torch Conv default init (the reference's seg layers are plain
        # nn.ConvNd(1x1, bias=True) at torch defaults, decoder.py:97-100)
        kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (1,) * self.dim + (ci, self.features), self.param_dtype)
        bias = self.param("bias", torch_bias_init(ci), (self.features,),
                          self.param_dtype)
        w2 = kernel.reshape(ci, self.features).astype(self.dtype)
        y = jnp.dot(x.astype(self.dtype), w2,
                    preferred_element_type=self.dtype)
        return y + bias.astype(self.dtype)


class Encoder(nn.Module):
    """Shared trunk: optional 1-conv stem + N stages of residual/conv stacks,
    returning all per-stage skips (reference: builders/encoder.py:27-158)."""

    plan: NetworkPlan
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> List[jax.Array]:
        p = self.plan
        common = dict(
            conv_bias=p.conv_bias, norm_affine=p.norm_affine,
            norm_eps=p.norm_eps, negative_slope=p.nonlin_negative_slope,
            dropout_p=p.dropout_p, remat=p.remat,
            use_pallas=p.use_pallas_conv, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        residual_encoder = p.basic_encoder_block in ("BasicBlockD", "BottleneckBlockD")
        pre0 = None
        if p.do_stem:
            # stem handoff: emit the stem conv's packed output + IN stats
            # and let stage0's first fused conv apply the stem norm as its
            # in-kernel pre-op (reference applies it standalone,
            # builders/encoder.py:84-88)
            stem_fuse = (p.use_pallas_conv and residual_encoder
                         and p.dim == 3 and not p.conv_bias
                         and not p.norm_affine and p.dropout_p == 0.0)
            out = StackedConvBlocks(
                n_convs=1, features=p.stem_width, kernel=p.kernel_sizes[0],
                initial_stride=(1,) * p.dim, name="stem",
                emit_pre=stem_fuse, **common,
            )(x, train)
            if isinstance(out, tuple):
                yp, st = out
                gc = yp.shape[-1]
                g0 = gc // p.stem_width
                cnt = yp.shape[1] * yp.shape[2] * yp.shape[3] * g0
                pre0 = stats_to_scale_shift(st, g0, cnt, p.norm_eps)
                x = yp.reshape(yp.shape[:3]
                               + (yp.shape[3] * g0, p.stem_width))
            else:
                x = out

        skips: List[jax.Array] = []
        for s in range(p.num_stages):
            if residual_encoder:
                bn = (p.bottleneck_channels[s]
                      if p.bottleneck_channels is not None else None)
                x = StackedResidualBlocks(
                    n_blocks=p.n_blocks_per_stage[s],
                    features=p.features_per_stage[s],
                    kernel=p.kernel_sizes[s],
                    initial_stride=p.strides[s],
                    block_type=p.bottleneck_block
                    if p.basic_encoder_block == "BottleneckBlockD"
                    else "BasicBlockD",
                    bottleneck_features=bn,
                    squeeze_excitation=p.squeeze_excitation,
                    se_ratio=p.squeeze_excitation_reduction_ratio,
                    stochastic_depth_p=p.stochastic_depth_p,
                    name=f"stage{s}", **common,
                )(x, train, None, pre0 if s == 0 else None)
            else:
                if s == 0 and pre0 is not None:
                    # plain-conv encoder cannot consume the handoff
                    gc = pre0[0].shape[-1]
                    g0 = gc // x.shape[-1]
                    xp0 = x.reshape(x.shape[:3]
                                    + (x.shape[3] // g0, gc))
                    x = norm_apply_packed(
                        xp0, pre0[0], pre0[1], p.nonlin_negative_slope,
                        act=True).reshape(x.shape)
                x = StackedConvBlocks(
                    n_convs=p.n_blocks_per_stage[s],
                    features=p.features_per_stage[s],
                    kernel=p.kernel_sizes[s],
                    initial_stride=p.strides[s],
                    name=f"stage{s}", **common,
                )(x, train)
            skips.append(x)
        return skips


class Decoder(nn.Module):
    """Per-task head: transpconv upsample + skip concat + conv stack per
    resolution, 1x1 seg layer per stage (always instantiated so checkpoints
    stay compatible across deep-supervision settings — reference:
    builders/decoder.py:97-100) (reference: builders/decoder.py:16-162)."""

    plan: NetworkPlan
    num_classes: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skips: List[jax.Array], *, train: bool = False):
        p = self.plan
        n = p.num_stages
        common = dict(
            conv_bias=p.conv_bias, norm_affine=p.norm_affine,
            norm_eps=p.norm_eps, negative_slope=p.nonlin_negative_slope,
            dropout_p=p.dropout_p, remat=p.remat,
            use_pallas=p.use_pallas_conv, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = skips[-1]
        seg_outputs: List[jax.Array] = []
        for s in range(1, n):
            skip_features = p.features_per_stage[n - 1 - s]
            stride = p.strides[n - s]
            # upsample: transposed conv with kernel == stride == encoder
            # stride at that level (reference: decoder.py:76-79), computed
            # as a pointwise GEMM + depth-to-space
            x = UpsampleConv(
                features=skip_features, kernel_size=stride,
                use_bias=p.conv_bias, use_pallas=p.use_pallas_conv,
                dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"up{s - 1}",
            )(x)
            # the skip concat (reference: decoder.py:137-162) is never
            # materialized: the stage's first conv consumes the
            # (upsampled, skip) pair with split weights (models/blocks.py
            # Conv.__call__ x2 path)
            skip = skips[n - 1 - s]
            if p.basic_decoder_block == "ResidualBlock":
                x = StackedResidualBlocks(
                    n_blocks=p.n_conv_per_stage_decoder[s - 1],
                    features=skip_features,
                    kernel=p.kernel_sizes[n - 1 - s],
                    initial_stride=(1,) * p.dim,
                    name=f"stage{s - 1}", **common,
                )(x, train, skip)
            else:
                x = StackedConvBlocks(
                    n_convs=p.n_conv_per_stage_decoder[s - 1],
                    features=skip_features,
                    kernel=p.kernel_sizes[n - 1 - s],
                    initial_stride=(1,) * p.dim,
                    name=f"stage{s - 1}", **common,
                )(x, train, skip)
            # seg layers are built for every stage (checkpoint compat);
            # computed only when needed.
            seg = SegLayer(
                features=self.num_classes, dim=p.dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"seg{s - 1}",
            )
            if p.deep_supervision or s == n - 1:
                seg_outputs.append(seg(x))
            elif self.is_initializing():
                # Create this stage's seg params on a 1-voxel slice (1x1 conv
                # params depend only on channel count) so deep-supervision
                # checkpoints stay loadable either way, without paying the
                # full-resolution compute (reference: decoder.py:97-100).
                tiny = x[(slice(None),) + (slice(0, 1),) * p.dim + (slice(None),)]
                _ = seg(tiny)
        if p.deep_supervision:
            return seg_outputs[::-1]
        return seg_outputs[0]


def _apply_activation(x: jax.Array, activation: str) -> jax.Array:
    a = activation.lower()
    if a == "sigmoid":
        return jax.nn.sigmoid(x)
    if a == "softmax":
        return jax.nn.softmax(x, axis=-1)
    return x


class ResEncUNet(nn.Module):
    """Multi-task network: shared Encoder, one Decoder per task.

    forward(x: [N, D, H, W, C_in]) -> {task: [N, D, H, W, C_task]}
    (reference: builders/build_network_from_config.py:312-326; activations
    applied in eval mode only).
    """

    plan: NetworkPlan
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 apply_activations: Optional[bool] = None
                 ) -> Dict[str, jax.Array]:
        # default matches the reference: activations only outside training
        # (build_network_from_config.py:321-323); an explicit override lets
        # validation compute deterministic LOGITS without enabling the
        # stochastic train-mode paths
        if apply_activations is None:
            apply_activations = not train
        x = x.astype(self.dtype)
        skips = Encoder(plan=self.plan, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="encoder")(
            x, train=train)
        results: Dict[str, jax.Array] = {}
        for task in self.plan.tasks:
            logits = Decoder(
                plan=self.plan, num_classes=task.channels, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"decoder_{task.name}",
            )(skips, train=train)
            if isinstance(logits, list):
                logits = [l.astype(jnp.float32) for l in logits]
                if apply_activations:
                    logits = [_apply_activation(l, task.activation) for l in logits]
            else:
                logits = logits.astype(jnp.float32)
                if apply_activations:
                    logits = _apply_activation(logits, task.activation)
            results[task.name] = logits
        return results


def count_params(params) -> int:
    """Total learnable parameter count
    (reference: builders/utils.py:8-9 get_number_of_learnable_parameters)."""
    return sum(int(x.size) for x in jax.tree.leaves(params))

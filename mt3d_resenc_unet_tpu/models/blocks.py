"""Building blocks for the ResEnc U-Net, in Flax linen, channels-last.

TPU-first redesign of the reference's block zoo
(reference: builders/simple_conv_blocks.py:13-148, builders/resblocks.py:15-353):

* NDHWC layout throughout — XLA tiles channels-last 3D convolutions onto the
  MXU directly; NCDHW (the torch layout) would force transposes.
* InstanceNorm statistics in fp32, activations in the configured compute
  dtype (bf16 by default) — the TPU analog of the reference's AMP autocast.
* No in-place ops / no module mutability: blocks are pure functions of
  (params, x, rng).

Block semantics match the reference exactly:
  ConvNormAct       = Conv(same-pad) -> [Dropout] -> InstanceNorm -> [LeakyReLU]
  BasicBlockD       = ResNet-D basic: conv1(stride) -> conv2, skip =
                      AvgPool(stride) + 1x1 Conv+Norm when shape changes,
                      optional DropPath & SqueezeExcite on the branch,
                      post-add LeakyReLU.
  BottleneckD       = 1x1 reduce -> kxk(stride) -> 1x1 expand, same skip.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.gemm_conv import (conv3d_stem_cf, conv3d_tapsum, stem_supported,
                             tapsum_supported)
from ..ops.instance_norm import (_instance_norm_act_impl,
                                 instance_norm_act_packed,
                                 instance_norm_act_packed_io,
                                 norm_apply_packed, packed_stats_xla,
                                 stats_to_scale_shift)
from ..ops.pallas_conv import (conv3d_packed, conv3d_packed_dual_stats,
                               conv3d_packed_ns,
                               conv3d_packed_stats, conv3d_s2,
                               conv3d_small_c,
                               is_supported as _pallas_conv_ok,
                               s2_supported as _pallas_s2_ok)

Dtype = jnp.dtype


def torch_conv_kernel_init(key, shape, dtype):
    """torch Conv default init — ``kaiming_uniform_(a=sqrt(5))`` ==
    U(-b, b) with b = 1/sqrt(fan_in), fan_in = prod(kernel) * c_in
    (kernel layout (*k, ci, co)).

    The reference never overrides torch's parameter init, so its trained
    behavior starts from exactly this distribution; matching it closed a
    measured normals-accuracy gap vs he_normal (scripts/exp_init_parity.py,
    2026-08-20: held-out cosine 0.85 vs 0.81 at equal seeds)."""
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """torch Conv/Linear bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    with fan_in taken from the weight it accompanies."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _fan_in(kshape) -> int:
    f = 1
    for s in kshape[:-1]:
        f *= s
    return f


class Conv(nn.Module):
    """Drop-in conv that dispatches stride-1 3x3x3 small-C cases to the
    banded Pallas kernel (ops/pallas_conv.py) and everything else to XLA.
    Parameter naming/shape matches flax ``nn.Conv`` (kernel: (*k, I, O)) so
    checkpoints are interchangeable."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Sequence[Tuple[int, int]]
    use_bias: bool = False
    use_pallas: bool = False
    packed_g: int = 0     # >0: x is packed (N,D,H,W/g,g*ci); returns packed
    packed_out: bool = False  # stem path may return packed (caller checks)
    pre_pool: Tuple[int, ...] = ()  # fused AvgPool(s) before a 1x1 conv
    negative_slope: float = 1e-2  # LeakyReLU slope of the fused pre-op
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def _dispatch(self, x, k):
        """Route one conv to the best backend for its shape class."""
        kshape = k.shape
        nd = len(self.kernel_size)
        same_pad = all(p == ((kk - 1) // 2,) * 2
                       for p, kk in zip(self.padding, self.kernel_size))
        fast = (
            self.use_pallas
            and all(s == 1 for s in self.strides)
            and all(p == (1, 1) for p in self.padding)
            and _pallas_conv_ok(x.shape, kshape)
        )
        if fast:
            return conv3d_small_c(x, k)
        if (self.use_pallas and tuple(self.strides) == (2, 2, 2)
                and all(p == (1, 1) for p in self.padding)
                and _pallas_s2_ok(x.shape, kshape)):
            # banded stride-2 kernel for the encoder's downsampling convs
            return conv3d_s2(x, k)
        if (self.use_pallas and nd == 3 and same_pad
                and tapsum_supported(x.shape, kshape)):
            # deep stages (>=256 ch at small extents): 27 accumulated GEMMs
            return conv3d_tapsum(x, k, tuple(self.strides))
        if (self.use_pallas and all(s == 1 for s in self.strides)
                and same_pad and stem_supported(x.shape, kshape)):
            # Cin=1 stem: channels-first GEMM over a leading-dim patch
            # stack (every intermediate keeps W minor -> no lane padding).
            # Emits the x-packed layout when the caller can norm packed.
            return conv3d_stem_cf(x, k, packed_out=self.packed_out)
        spec = {3: ("NDHWC", "DHWIO", "NDHWC"),
                2: ("NHWC", "HWIO", "NHWC"),
                1: ("NWC", "WIO", "NWC")}[nd]
        return jax.lax.conv_general_dilated(
            x, k, tuple(self.strides), tuple(self.padding),
            dimension_numbers=spec, preferred_element_type=self.dtype)

    @nn.compact
    def __call__(self, x, x2=None, pre=None, emit_stats: bool = False):
        if self.packed_g:
            g = self.packed_g
            ci = x.shape[-1] // g
            ci_tot = ci + (x2.shape[-1] // g if x2 is not None else 0)
            kshape = tuple(self.kernel_size) + (ci_tot, self.features)
            kernel = self.param("kernel", torch_conv_kernel_init,
                                kshape, self.param_dtype)
            kk = kernel.astype(self.dtype)
            st = None
            if x2 is None:
                xd = x.astype(self.dtype)
                if pre is not None:
                    # previous conv's instance norm + LeakyReLU applied
                    # tile-wise INSIDE this conv's kernel (fused pipeline)
                    y, st = conv3d_packed_ns(xd, kk, pre[0], pre[1], g,
                                             self.negative_slope)
                elif emit_stats:
                    y, st = conv3d_packed_stats(xd, kk, g)
                else:
                    y = conv3d_packed(xd, kk, g)
            elif emit_stats and not self.use_bias:
                # packed split-weight pair (decoder skip concat): the add and
                # the summed tensor's stats run inside the second half's
                # kernel (no standalone XLA add or reduction pass)
                assert pre is None
                y, st = conv3d_packed_dual_stats(
                    x.astype(self.dtype), x2.astype(self.dtype), kk, g)
            else:
                assert pre is None
                y = (conv3d_packed(x.astype(self.dtype), kk[..., :ci, :], g)
                     + conv3d_packed(x2.astype(self.dtype), kk[..., ci:, :],
                                     g))
                if emit_stats:
                    st = packed_stats_xla(y)
            # (packed-path conv outputs are named INSIDE the custom-VJP
            # forward rules, ops/pallas_conv.py — naming here again would
            # save the same buffer twice under the save-convs remat policy)
            if self.use_bias:
                # kernel stats are pre-bias — callers only fuse bias-free
                # convs (the architecture default, conv_bias=False)
                assert st is None
                bias = self.param("bias", torch_bias_init(_fan_in(kshape)),
                                  (self.features,), self.param_dtype)
                y = y + jnp.tile(bias.astype(self.dtype), g)
            return (y, st) if emit_stats else y
        assert pre is None and not emit_stats  # fusions are packed-path only
        ci = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        kshape = tuple(self.kernel_size) + (ci, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init,
                            kshape, self.param_dtype)
        bias = (self.param("bias", torch_bias_init(_fan_in(kshape)),
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        k = kernel.astype(self.dtype)
        if self.pre_pool:
            y = _pool_proj(x.astype(self.dtype), k, tuple(self.pre_pool),
                           self.dtype)
        elif x2 is None:
            y = self._dispatch(x.astype(self.dtype), k)
        else:
            # split-weight concat elimination: conv(concat(x, x2), W) ==
            # conv(x, W[:c1]) + conv(x2, W[c1:]). The parameter keeps the
            # concat shape so checkpoints are interchangeable; skipping the
            # concat avoids materializing the doubled-channel tensor and
            # lets each half use the small-C banded kernel
            # (reference decoder concat: builders/decoder.py:137-162).
            c1 = x.shape[-1]
            y = (self._dispatch(x.astype(self.dtype), k[..., :c1, :])
                 + self._dispatch(x2.astype(self.dtype), k[..., c1:, :]))
        y = checkpoint_name(y, "mt3d_conv")
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def _pool_proj(x, k, p, dtype):
    """AvgPool(p) -> 1x1 projection as elementwise pair-sums plus ONE
    full-lane GEMM on the packed layout.

    XLA lowers both reduce_window and the equivalent tiled stride-2 conv on
    small-C inputs through pathological batch-minor layouts (~9 ms of
    relayout copies at full res, profiled). Here D/H pooling is two strided
    adds on major dims; W pooling folds into the projection GEMM via a
    block-structured (g*ci, (g//2)*co) matrix on the x-packed view, so every
    intermediate keeps 128 lanes. k is the (1,)*nd + (ci, co) projection."""
    nd = x.ndim - 2
    ci, co = k.shape[-2], k.shape[-1]
    w2 = k.reshape(ci, co)
    scale = 1.0
    for s in p:
        scale *= s
    if (nd == 3 and tuple(p) == (2, 2, 2) and ci <= 64 and 128 % ci == 0
            and x.shape[3] % (128 // ci) == 0
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and (128 // ci) >= 2):
        n, d, h, w, _ = x.shape
        g = 128 // ci
        xp = x.reshape(n, d, h, w // g, g * ci)
        t = xp[:, ::2] + xp[:, 1::2]
        t = t[:, :, ::2] + t[:, :, 1::2]
        go = g // 2
        m = jnp.zeros((g, ci, go, co), dtype)
        for q in range(go):
            m = m.at[2 * q, :, q].set(w2.astype(dtype) / scale)
            m = m.at[2 * q + 1, :, q].set(w2.astype(dtype) / scale)
        m = m.reshape(g * ci, go * co)
        y = jnp.dot(t, m, preferred_element_type=dtype)
        return y.reshape(n, d // 2, h // 2, w // 2, co)
    # generic fallback: tiled-kernel strided conv
    k_eff = jnp.broadcast_to(
        k.reshape((1,) * nd + (ci, co)) / scale, tuple(p) + (ci, co))
    spec = {3: ("NDHWC", "DHWIO", "NDHWC"),
            2: ("NHWC", "HWIO", "NHWC"),
            1: ("NWC", "WIO", "NWC")}[nd]
    return jax.lax.conv_general_dilated(
        x, k_eff.astype(dtype), tuple(p), ((0, 0),) * nd,
        dimension_numbers=spec, preferred_element_type=dtype)


# Selective rematerialization: only stages whose per-sample block-boundary
# activation is at least this many elements are worth recomputing in the
# backward pass. Deep stages (16^3 x 256 and smaller) hold most of the
# network's blocks but tiny tensors; storing them outright is strictly
# better. (Raising this to 2^24 — storing 32^3 x 128 stages too — measured
# 6% SLOWER: without remat XLA keeps every in-block intermediate, and the
# extra backward reads outweigh the saved recompute.)
REMAT_MIN_ELEMS = 2 ** 22


def _remat_worthwhile(x) -> bool:
    per_sample = 1
    for s in x.shape[1:]:
        per_sample *= s
    return per_sample >= REMAT_MIN_ELEMS


def _remat_wrap(base, static_argnums, x):
    """nn.remat with the save-convs policy: the named raw conv outputs
    (Conv.__call__ checkpoint_name) are SAVED for backward, so the block's
    backward recomputes only the cheap elementwise tail — zero conv
    re-executions — at the memory cost of one bf16 tensor per conv instead
    of one per block. MT3D_REMAT_SAVE_CONVS=0 restores save-nothing remat;
    MT3D_REMAT_SAVE_MAX (per-sample elements) bounds which resolutions
    keep their conv outputs (larger stages fall back to full remat)."""
    import os
    if os.environ.get("MT3D_REMAT_SAVE_CONVS", "1") == "1":
        per_sample = 1
        for s in x.shape[1:]:
            per_sample *= s
        cap = int(os.environ.get("MT3D_REMAT_SAVE_MAX", str(1 << 62)))
        if per_sample <= cap:
            # with the convs saved, the only recompute is cheap elementwise
            # work — CSE barriers would just materialize extra copies of
            # the saved tensors (measured +30 ms/step at b4, 2026-08-18)
            prevent_cse = os.environ.get("MT3D_REMAT_CSE", "0") == "1"
            return nn.remat(
                base, static_argnums=static_argnums,
                prevent_cse=prevent_cse,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "mt3d_conv"))
    return nn.remat(base, static_argnums=static_argnums)


def _pad_same(kernel: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """Torch-style symmetric same padding: (k-1)//2 on both sides
    (reference: simple_conv_blocks.py:48). For odd k and any stride this
    selects the same conv windows as torch's Conv3d."""
    return tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel)


def _make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding used by squeeze-excitation reduction (timm-style,
    mirroring dynamic_network_architectures' SqueezeExcite rd_divisor=8)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InstanceNorm(nn.Module):
    """Per-(sample, channel) normalization over all spatial axes.

    fp32 statistics; optional affine (the reference default is affine=False,
    build_network_from_config.py:172)."""

    affine: bool = False
    eps: float = 1e-5
    negative_slope: float = 1e-2
    act: bool = False
    packed_g: int = 0
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        scale = bias = None
        if self.affine:
            c = (x.shape[-1] // self.packed_g) if self.packed_g else x.shape[-1]
            scale = self.param(
                "scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param(
                "bias", nn.initializers.zeros, (c,), self.param_dtype)
        # packed-view implementation: avoids lane padding for small C and
        # can fuse a pre-activation residual add (ops/instance_norm.py)
        if self.packed_g:
            return instance_norm_act_packed_io(
                x, self.packed_g, scale, bias, self.eps,
                self.negative_slope, self.act, residual=residual)
        return instance_norm_act_packed(
            x, scale, bias, self.eps, self.negative_slope, self.act,
            residual=residual)


class ConvNormAct(nn.Module):
    """Conv -> [Dropout] -> [InstanceNorm] -> [LeakyReLU]
    (reference: simple_conv_blocks.py:13-72 ConvDropoutNormReLU)."""

    features: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]
    use_bias: bool = False
    norm: bool = True
    norm_affine: bool = False
    norm_eps: float = 1e-5
    act: bool = True
    negative_slope: float = 1e-2
    dropout_p: float = 0.0
    use_pallas: bool = False
    packed_g: int = 0
    pre_pool: Tuple[int, ...] = ()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, residual=None, x2=None,
                 pre=None, fused_stats: bool = False):
        in_shape = x.shape
        x = Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=_pad_same(self.kernel),
            use_bias=self.use_bias,
            use_pallas=self.use_pallas,
            packed_g=self.packed_g,
            packed_out=(self.norm and not self.packed_g
                        and self.dropout_p == 0.0),
            pre_pool=self.pre_pool,
            negative_slope=self.negative_slope,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x, x2, pre=pre, emit_stats=fused_stats and self.packed_g > 0)
        if fused_stats:
            # fused pipeline: the caller applies this conv's norm via the
            # emitted stats (as the next conv's pre-op or a tail pass); the
            # norm module would hold no params anyway (affine=False only)
            assert self.norm and not self.norm_affine \
                and self.dropout_p == 0.0
            if (not self.packed_g and x.ndim == 5
                    and x.shape[-1] != self.features):
                # stem path emitted the x-packed layout: hand the caller
                # (packed y, stats) so the stem norm runs as the next
                # conv's in-kernel pre-op instead of a standalone pass
                return x, packed_stats_xla(x)
            return x
        if not self.packed_g and x.ndim == 5 and x.shape[-1] != self.features:
            # the stem path emitted the x-packed layout: norm packed, then
            # unpack (the unpack cancels with the next stage's pack)
            g = x.shape[-1] // self.features
            x = InstanceNorm(
                affine=self.norm_affine, eps=self.norm_eps,
                negative_slope=self.negative_slope, act=self.act,
                packed_g=g, param_dtype=self.param_dtype, name="norm")(
                x, residual)
            return x.reshape(in_shape[:-1] + (self.features,))
        if self.dropout_p > 0.0:
            x = nn.Dropout(rate=self.dropout_p, deterministic=not train,
                           name="dropout")(x)
        if self.norm:
            x = InstanceNorm(
                affine=self.norm_affine, eps=self.norm_eps,
                negative_slope=self.negative_slope, act=self.act,
                packed_g=self.packed_g,
                param_dtype=self.param_dtype, name="norm")(x, residual)
        else:
            if residual is not None:
                x = x + residual
            if self.act:
                x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        return x


class SqueezeExcite(nn.Module):
    """Channel SE: global-avg-pool -> 1x1 reduce -> ReLU -> 1x1 expand ->
    sigmoid gate (reference imports this from dynamic_network_architectures,
    resblocks.py:11,84-87; reimplemented, rd_divisor=8)."""

    rd_ratio: float = 1.0 / 16
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rd = _make_divisible(c * self.rd_ratio, 8)
        spatial_axes = tuple(range(1, x.ndim - 1))
        # fp32 pooling for stable statistics on long reductions
        s = jnp.mean(x.astype(jnp.float32), axis=spatial_axes)
        # torch Linear default init (the upstream SqueezeExcite the
        # reference imports uses nn.Linear with torch defaults)
        s = nn.Dense(rd, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=torch_conv_kernel_init,
                     bias_init=torch_bias_init(c),
                     name="reduce")(s.astype(self.dtype))
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=torch_conv_kernel_init,
                     bias_init=torch_bias_init(rd),
                     name="expand")(s)
        gate = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        gate = gate.reshape(gate.shape[:1] + (1,) * (x.ndim - 2) + gate.shape[-1:])
        return x * gate


def drop_path(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Stochastic depth: zero the residual branch per sample, rescaled
    (reference: resblocks.py:79-81 via DropPath)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class _ResidualSkip(nn.Module):
    """ResNet-D skip path: AvgPool(stride) when strided, then 1x1 Conv+Norm
    when projecting channels (reference: resblocks.py:89-104)."""

    features: int
    stride: Tuple[int, ...]
    in_features: int
    norm_affine: bool = False
    norm_eps: float = 1e-5
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2=None):
        has_stride = any(s != 1 for s in self.stride)
        needs_proj = self.in_features != self.features
        if has_stride and needs_proj and x2 is None:
            # AvgPool(s) then 1x1 Conv == ONE stride-s conv whose kernel is
            # the 1x1 projection tiled over the window and scaled by
            # 1/prod(s). XLA's reduce_window on the channels-minor layout
            # costs ~9 ms in relayout copies at full res (profiled); the
            # fused conv has K = prod(s)*ci and reads x once. The parameter
            # stays the 1x1 kernel (checkpoint-compatible: Conv.pre_pool).
            nd = x.ndim - 2
            return ConvNormAct(
                features=self.features, kernel=(1,) * nd,
                stride=(1,) * nd, use_bias=False,
                norm_affine=self.norm_affine, norm_eps=self.norm_eps,
                act=False, pre_pool=tuple(self.stride),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="proj")(x)
        if has_stride:
            window = self.stride
            x = nn.avg_pool(x, window_shape=window, strides=self.stride,
                            padding="VALID")
            if x2 is not None:
                x2 = nn.avg_pool(x2, window_shape=window,
                                 strides=self.stride, padding="VALID")
        if needs_proj:
            x = ConvNormAct(
                features=self.features, kernel=(1,) * (x.ndim - 2),
                stride=(1,) * (x.ndim - 2), use_bias=False,
                norm_affine=self.norm_affine, norm_eps=self.norm_eps,
                act=False, dtype=self.dtype, param_dtype=self.param_dtype,
                name="proj")(x, False, None, x2)
        elif x2 is not None:
            x = jnp.concatenate([x, x2], axis=-1)
        return x


class BasicBlockD(nn.Module):
    """ResNet-D basic block (reference: resblocks.py:15-132)."""

    features: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]
    conv_bias: bool = False
    norm_affine: bool = False
    norm_eps: float = 1e-5
    negative_slope: float = 1e-2
    dropout_p: float = 0.0
    squeeze_excitation: bool = False
    se_ratio: float = 1.0 / 16
    stochastic_depth_p: float = 0.0
    use_pallas: bool = False
    packed_g: int = 0     # >0: packed io; caller guarantees stride 1, ci==co
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, x2=None, pre=None):
        if self.packed_g:
            # identity skip; conv -> norm+act -> conv -> norm+add+act, all
            # on the packed layout (no lane padding, no boundary relayouts)
            g = self.packed_g
            pk = dict(features=self.features, kernel=self.kernel,
                      stride=(1,) * len(self.stride),
                      use_bias=self.conv_bias,
                      norm_affine=self.norm_affine, norm_eps=self.norm_eps,
                      negative_slope=self.negative_slope,
                      use_pallas=True, packed_g=g,
                      dtype=self.dtype, param_dtype=self.param_dtype)
            if (not self.conv_bias and not self.norm_affine
                    and self.dropout_p == 0.0):
                # FUSED pipeline: conv1 emits its output's IN statistics
                # in-kernel; conv2 applies conv1's norm+act tile-wise as its
                # pre-op AND emits its own stats; one elementwise tail pass
                # does norm2 + residual add + LeakyReLU. Zero standalone
                # stats passes, one apply pass per block (was two of each).
                # ``pre``: an upstream producer's (scale, shift) — e.g. the
                # stem's statistics — applied as conv1's pre-op. NOTE: the
                # residual added by the tail is then the PRE-ACTIVATION
                # input, so callers only pass ``pre`` for the stem handoff
                # where the reference applies the stem norm before stage0
                # anyway (builders/encoder.py:84-88).
                _, d_, h_, wg_, _ = x.shape
                count = d_ * h_ * wg_ * g
                y1, s1 = ConvNormAct(act=True, name="conv1", **pk)(
                    x, train, pre=pre, fused_stats=True)
                a1, b1 = stats_to_scale_shift(s1, g, count, self.norm_eps)
                y2, s2 = ConvNormAct(act=True, name="conv2", **pk)(
                    y1, train, pre=(a1, b1), fused_stats=True)
                a2, b2 = stats_to_scale_shift(s2, g, count, self.norm_eps)
                return norm_apply_packed(y2, a2, b2, self.negative_slope,
                                         act=True, residual=x,
                                         residual_pre=pre)
            assert pre is None
            out = ConvNormAct(act=True, dropout_p=self.dropout_p,
                              name="conv1", **pk)(x, train)
            return ConvNormAct(act=True, name="conv2", **pk)(out, train, x)
        assert pre is None  # stem handoff targets the packed fused chain
        in_features = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        residual = _ResidualSkip(
            features=self.features, stride=self.stride,
            in_features=in_features, norm_affine=self.norm_affine,
            norm_eps=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="skip")(x, x2)
        fuse_tail = not (self.squeeze_excitation
                         or (train and self.stochastic_depth_p > 0.0))
        c = self.features
        k2shape = (3, 3, 3) + (c, c)
        fuse_entry = (
            fuse_tail and self.use_pallas and len(self.stride) == 3
            and tuple(self.kernel) == (3, 3, 3)
            and not self.conv_bias and not self.norm_affine
            and self.dropout_p == 0.0
            and (c <= 64 or c >= 256))
        if fuse_entry:
            # strided ENTRY block fusion: conv1 (s2/XLA/tapsum backend)
            # skips its norm pass — one read-only stats reduction feeds
            # conv2's in-kernel pre-op; conv2 emits its own stats and the
            # tail applies norm2 + residual add + LeakyReLU in one pass
            out = ConvNormAct(
                features=c, kernel=self.kernel, stride=self.stride,
                use_bias=False, norm=False, act=False,
                use_pallas=self.use_pallas,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="conv1")(x, train, None, x2)
            n, d_, h_, w_, _ = out.shape
            g = 128 // c if c <= 64 else 1
            if w_ % g == 0 and _pallas_conv_ok(out.shape, k2shape):
                outp = out.reshape(n, d_, h_, w_ // g, g * c)
                count = d_ * h_ * w_
                st1 = packed_stats_xla(outp)
                a1, b1 = stats_to_scale_shift(st1, g, count, self.norm_eps)
                y2, st2 = ConvNormAct(
                    features=c, kernel=self.kernel,
                    stride=(1,) * 3, use_bias=False,
                    norm_eps=self.norm_eps, act=True,
                    negative_slope=self.negative_slope,
                    use_pallas=True, packed_g=g,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv2")(outp, train, pre=(a1, b1),
                                  fused_stats=True)
                a2, b2 = stats_to_scale_shift(st2, g, count, self.norm_eps)
                out = norm_apply_packed(
                    y2, a2, b2, self.negative_slope, act=True,
                    residual=residual.reshape(y2.shape))
                return out.reshape(n, d_, h_, w_, c)
            # conv2 class unsupported: apply conv1's norm standalone and
            # fall through to the plain conv2 path
            out = InstanceNorm(
                affine=False, eps=self.norm_eps,
                negative_slope=self.negative_slope, act=True,
                param_dtype=self.param_dtype, name="norm1x")(out)
        else:
            out = ConvNormAct(
                features=c, kernel=self.kernel, stride=self.stride,
                use_bias=self.conv_bias, norm_affine=self.norm_affine,
                norm_eps=self.norm_eps, act=True,
                negative_slope=self.negative_slope,
                dropout_p=self.dropout_p,
                use_pallas=self.use_pallas,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="conv1")(x, train, None, x2)
        conv2 = ConvNormAct(
            features=self.features, kernel=self.kernel,
            stride=(1,) * len(self.stride), use_bias=self.conv_bias,
            norm_affine=self.norm_affine, norm_eps=self.norm_eps,
            act=fuse_tail,  # post-add LeakyReLU fused into the norm pass
            negative_slope=self.negative_slope,
            use_pallas=self.use_pallas,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )
        if fuse_tail:
            # norm -> (+residual) -> LeakyReLU in one packed pass
            return conv2(out, train, residual)
        out = conv2(out, train)
        if train and self.stochastic_depth_p > 0.0:
            out = drop_path(out, self.stochastic_depth_p,
                            self.make_rng("droppath"))
        if self.squeeze_excitation:
            out = SqueezeExcite(rd_ratio=self.se_ratio, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="se")(out)
        out = out + residual
        return nn.leaky_relu(out, negative_slope=self.negative_slope)


class BottleneckD(nn.Module):
    """ResNet-D bottleneck: 1x1 -> kxk(stride) -> 1x1, stride in the middle
    conv (reference: resblocks.py:135-259)."""

    features: int
    bottleneck_features: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]
    conv_bias: bool = False
    norm_affine: bool = False
    norm_eps: float = 1e-5
    negative_slope: float = 1e-2
    dropout_p: float = 0.0
    squeeze_excitation: bool = False
    se_ratio: float = 1.0 / 16
    stochastic_depth_p: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = len(self.stride)
        ones = (1,) * dim
        in_features = x.shape[-1]
        residual = _ResidualSkip(
            features=self.features, stride=self.stride,
            in_features=in_features, norm_affine=self.norm_affine,
            norm_eps=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="skip")(x)
        out = ConvNormAct(
            features=self.bottleneck_features, kernel=ones, stride=ones,
            use_bias=self.conv_bias, norm_affine=self.norm_affine,
            norm_eps=self.norm_eps, act=True,
            negative_slope=self.negative_slope, use_pallas=self.use_pallas,
            dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv1")(x, train)
        out = ConvNormAct(
            features=self.bottleneck_features, kernel=self.kernel,
            stride=self.stride, use_bias=self.conv_bias,
            norm_affine=self.norm_affine, norm_eps=self.norm_eps, act=True,
            negative_slope=self.negative_slope, dropout_p=self.dropout_p,
            use_pallas=self.use_pallas,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )(out, train)
        out = ConvNormAct(
            features=self.features, kernel=ones, stride=ones,
            use_bias=self.conv_bias, norm_affine=self.norm_affine,
            norm_eps=self.norm_eps, act=False, use_pallas=self.use_pallas,
            dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv3")(out, train)
        if train and self.stochastic_depth_p > 0.0:
            out = drop_path(out, self.stochastic_depth_p,
                            self.make_rng("droppath"))
        if self.squeeze_excitation:
            out = SqueezeExcite(rd_ratio=self.se_ratio, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="se")(out)
        out = out + residual
        return nn.leaky_relu(out, negative_slope=self.negative_slope)


class StackedResidualBlocks(nn.Module):
    """N residual blocks; stride only in the first
    (reference: resblocks.py:262-353)."""

    n_blocks: int
    features: int
    kernel: Tuple[int, ...]
    initial_stride: Tuple[int, ...]
    block_type: str = "BasicBlockD"  # BasicBlockD | BottleneckBlockD
    bottleneck_features: Optional[int] = None
    conv_bias: bool = False
    norm_affine: bool = False
    norm_eps: float = 1e-5
    negative_slope: float = 1e-2
    dropout_p: float = 0.0
    squeeze_excitation: bool = False
    se_ratio: float = 1.0 / 16
    stochastic_depth_p: float = 0.0
    remat: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, x2=None, pre=None):
        ones = (1,) * len(self.initial_stride)
        # Rematerialization: store only block boundaries for backward and
        # recompute in-block activations — the TPU trade of HBM for FLOPs
        # that replaces the reference's reliance on 24GB GPUs
        # (SURVEY.md §7.3.2; 3D U-Net activations dominate memory).
        do_remat = self.remat and _remat_worthwhile(x)
        basic_cls = _remat_wrap(BasicBlockD, (2,), x) \
            if do_remat else BasicBlockD
        bottleneck_cls = _remat_wrap(BottleneckD, (2,), x) \
            if do_remat else BottleneckD
        if pre is not None:
            # stem handoff (models/network.py Encoder): consumable only by
            # the packed fused chain's first conv — otherwise apply the
            # producer's norm here in one packed pass
            will_fuse = (
                self.use_pallas and self.block_type != "BottleneckBlockD"
                and not self.squeeze_excitation
                and self.stochastic_depth_p == 0.0
                and tuple(self.kernel) == (3, 3, 3)
                and all(st == 1 for st in self.initial_stride)
                and x2 is None and x.shape[-1] == self.features
                and not self.conv_bias and not self.norm_affine
                and self.dropout_p == 0.0
                and _pallas_conv_ok(
                    x.shape,
                    (3, 3, 3, self.features, self.features)))
            if not will_fuse:
                gc0 = pre[0].shape[-1]
                g0 = gc0 // x.shape[-1]
                n_, d_, h_, w_, _ = x.shape
                x = norm_apply_packed(
                    x.reshape(n_, d_, h_, w_ // g0, gc0), pre[0], pre[1],
                    self.negative_slope, act=True).reshape(x.shape)
                pre = None
        common = dict(
            features=self.features, kernel=self.kernel,
            conv_bias=self.conv_bias, norm_affine=self.norm_affine,
            norm_eps=self.norm_eps, negative_slope=self.negative_slope,
            dropout_p=self.dropout_p,
            squeeze_excitation=self.squeeze_excitation, se_ratio=self.se_ratio,
            stochastic_depth_p=self.stochastic_depth_p,
            use_pallas=self.use_pallas, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        # packed fast path: run the stride-1 identity-skip suffix of the
        # stack on the x-packed layout (conv + norm + adds all avoid XLA's
        # lane padding; remat then saves UNPADDED block boundaries)
        packed_from = None
        if (self.use_pallas and self.block_type != "BottleneckBlockD"
                and not self.squeeze_excitation
                and self.stochastic_depth_p == 0.0
                and tuple(self.kernel) == (3, 3, 3)):
            first_ok = (all(st == 1 for st in self.initial_stride)
                        and x2 is None
                        and x.shape[-1] == self.features)
            packed_from = 0 if first_ok else 1

        for i in range(self.n_blocks):
            if packed_from is not None and i == packed_from:
                kshape = (3, 3, 3, self.features, self.features)
                # packing requires g = 128/C >= 2; the deep 256/512-channel
                # stages run the same FUSED chain at g = 1 (dense band,
                # sample-batched tiles, stats/pre-op in-kernel); C = 128
                # stays on XLA convs (measured faster at 32^3)
                if _pallas_conv_ok(x.shape, kshape):
                    g = 128 // self.features if self.features <= 64 else 1
                    n, d, h, w, c = x.shape
                    xp = x.reshape(n, d, h, w // g, g * c)
                    for j in range(i, self.n_blocks):
                        xp = basic_cls(
                            stride=ones, packed_g=g,
                            name=f"block{j}", **common)(
                            xp, train, None, pre if j == i else None)
                        pre = None
                    return xp.reshape(n, d, h, w, c)
            stride = self.initial_stride if i == 0 else ones
            if self.block_type == "BottleneckBlockD":
                if i == 0 and x2 is not None:
                    x = jnp.concatenate([x, x2], axis=-1)
                x = bottleneck_cls(
                    bottleneck_features=self.bottleneck_features or self.features // 4,
                    stride=stride, name=f"block{i}", **common)(x, train)
            else:
                x = basic_cls(stride=stride, name=f"block{i}", **common)(
                    x, train, x2 if i == 0 else None)
        return x


class StackedConvBlocks(nn.Module):
    """N plain conv blocks; stride only in the first
    (reference: simple_conv_blocks.py:82-148)."""

    n_convs: int
    features: int
    kernel: Tuple[int, ...]
    initial_stride: Tuple[int, ...]
    conv_bias: bool = False
    norm_affine: bool = False
    norm_eps: float = 1e-5
    negative_slope: float = 1e-2
    dropout_p: float = 0.0
    remat: bool = False
    use_pallas: bool = False
    emit_pre: bool = False  # stem: return (packed y, stats) when possible
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, x2=None):
        ones = (1,) * len(self.initial_stride)
        if (self.emit_pre and self.n_convs == 1 and self.use_pallas
                and not self.conv_bias and not self.norm_affine
                and self.dropout_p == 0.0):
            # stem handoff: emit (packed conv output, IN stats) so the
            # consumer applies the stem norm as its first conv's in-kernel
            # pre-op. Falls back to a standalone norm when the stem conv
            # did not produce the packed layout (InstanceNorm holds no
            # params, so the extra module keeps checkpoints identical).
            y = ConvNormAct(
                features=self.features, kernel=self.kernel,
                stride=self.initial_stride, use_bias=False,
                norm_eps=self.norm_eps, act=True,
                negative_slope=self.negative_slope, use_pallas=True,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="conv0")(x, train, None, x2, None, True)
            if isinstance(y, tuple):
                return y
            return InstanceNorm(
                affine=False, eps=self.norm_eps,
                negative_slope=self.negative_slope, act=True,
                param_dtype=self.param_dtype, name="norm0x")(y)
        conv_cls = _remat_wrap(ConvNormAct, (2,), x) \
            if self.remat and _remat_worthwhile(x) else ConvNormAct
        # packed fast path (mirrors StackedResidualBlocks): stride-1 stacks
        # whose convs are all banded-kernel shapes run on the x-packed
        # layout end to end — incl. the decoder's split (up, skip) pair —
        # avoiding per-conv pack/unpack relayouts
        c = self.features
        kshape = (3, 3, 3, c, c)
        # deep g=1 stages join the fused chain when the per-plane GEMM M
        # stays MXU-sized (the split-weight dual kernel cannot batch
        # samples, so tiny extents would run at poor MXU fill)
        deep_ok = (c >= 256 and x.shape[1] * x.shape[2] * x.shape[3] >= 4096)
        if (self.use_pallas and tuple(self.kernel) == (3, 3, 3)
                and all(s == 1 for s in self.initial_stride)
                and (c <= 64 or deep_ok)
                and x.shape[-1] == c
                and (x2 is None or x2.shape[-1] == c)
                and _pallas_conv_ok(x.shape, kshape)):
            g = 128 // c if c <= 64 else 1
            n, d, h, w, _ = x.shape
            xp = x.reshape(n, d, h, w // g, g * c)
            xp2 = (x2.reshape(n, d, h, w // g, g * c)
                   if x2 is not None else None)
            pk = dict(features=c, kernel=self.kernel, stride=ones,
                      use_bias=self.conv_bias, norm_affine=self.norm_affine,
                      norm_eps=self.norm_eps, act=True,
                      negative_slope=self.negative_slope,
                      use_pallas=True, packed_g=g,
                      dtype=self.dtype, param_dtype=self.param_dtype)
            if (not self.conv_bias and not self.norm_affine
                    and self.dropout_p == 0.0):
                # FUSED chain (see BasicBlockD): each conv emits its stats
                # in-kernel and applies the previous conv's norm+act as its
                # pre-op; one elementwise tail pass finishes the stack.
                # conv0's split (up, skip) pair falls back to an XLA stats
                # reduction (halves' sumsq don't combine) but still skips
                # the standalone apply pass.
                cls = _remat_wrap(ConvNormAct, (2, 6), x) \
                    if self.remat and _remat_worthwhile(x) else ConvNormAct
                count = d * h * (w // g) * g
                y, st = xp, None
                for i in range(self.n_convs):
                    pre_i = (stats_to_scale_shift(st, g, count,
                                                  self.norm_eps)
                             if st is not None else None)
                    y, st = cls(name=f"conv{i}", **pk)(
                        y, train, None, xp2 if i == 0 else None,
                        pre_i, True)
                a, b = stats_to_scale_shift(st, g, count, self.norm_eps)
                y = norm_apply_packed(y, a, b, self.negative_slope,
                                      act=True)
                return y.reshape(n, d, h, w, c)
            for i in range(self.n_convs):
                xp = conv_cls(
                    dropout_p=self.dropout_p,
                    name=f"conv{i}", **pk)(xp, train, None,
                                           xp2 if i == 0 else None)
            return xp.reshape(n, d, h, w, c)
        for i in range(self.n_convs):
            x = conv_cls(
                features=self.features, kernel=self.kernel,
                stride=self.initial_stride if i == 0 else ones,
                use_bias=self.conv_bias, norm_affine=self.norm_affine,
                norm_eps=self.norm_eps, act=True,
                negative_slope=self.negative_slope, dropout_p=self.dropout_p,
                use_pallas=self.use_pallas,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"conv{i}")(x, train, None, x2 if i == 0 else None)
        return x

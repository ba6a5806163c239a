"""XLA GEMM reformulations of 3-D convolutions for the shape classes where
XLA's direct conv lowering underuses the MXU (measured on v5e, b2, per conv;
scripts/profile_convs.py):

* ``conv3d_im2col`` — tiny input channel counts (the stem's Cin=1 conv runs
  at 1.4 TF/s under XLA: the implicit GEMM has K=1). Materializing the
  27-tap patch matrix turns it into ONE (M, 27*ci) x (27*ci, co) GEMM; the
  op becomes bandwidth-bound instead of MXU-starved.
* ``conv3d_tapsum`` — large channel counts at small spatial extents (XLA
  measures 12-31 TF/s for 256/512-channel convs at 16^3/8^3). 27 accumulated
  (M, C) x (C, C') GEMMs keep both MXU dimensions full; backward transposes
  to GEMMs with the huge spatial dim as K.

Both are pure XLA (jax.grad differentiates through them), used by
models.blocks.Conv dispatch. Reference surface: the conv stacks of
builders/resblocks.py:15-353.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _same_pads(kernel):
    return tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel)


def conv3d_im2col(x: jax.Array, w: jax.Array,
                  strides=(1, 1, 1)) -> jax.Array:
    """Same-padded conv as one GEMM over a materialized patch matrix.
    NDHWC / DHWIO. Intended for 27*ci <~ 128 (e.g. the 1->32 stem)."""
    n, d, h, wd, ci = x.shape
    kd, kh, kw, _, co = w.shape
    sd, sh, sw = strides
    od, oh, ow = d // sd, h // sh, wd // sw
    pads = _same_pads((kd, kh, kw))
    xp = jnp.pad(x, ((0, 0),) + pads + ((0, 0),))
    slices = []
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                slices.append(jax.lax.slice(
                    xp, (0, dz, dy, dx, 0),
                    (n, dz + (od - 1) * sd + 1, dy + (oh - 1) * sh + 1,
                     dx + (ow - 1) * sw + 1, ci),
                    (1, sd, sh, sw, 1)))
    patches = jnp.concatenate(slices, axis=-1)
    y = jnp.dot(patches.reshape(-1, kd * kh * kw * ci),
                w.reshape(-1, co), preferred_element_type=jnp.float32)
    return y.reshape(n, od, oh, ow, co).astype(x.dtype)


def conv3d_tapsum(x: jax.Array, w: jax.Array,
                  strides=(1, 1, 1)) -> jax.Array:
    """Same-padded conv as one accumulated GEMM per kernel tap.
    NDHWC / DHWIO. Intended for min(ci, co) >= 256 at small spatial size."""
    n, d, h, wd, ci = x.shape
    kd, kh, kw, _, co = w.shape
    sd, sh, sw = strides
    od, oh, ow = d // sd, h // sh, wd // sw
    pads = _same_pads((kd, kh, kw))
    xp = jnp.pad(x, ((0, 0),) + pads + ((0, 0),))
    acc = None
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                sl = jax.lax.slice(
                    xp, (0, dz, dy, dx, 0),
                    (n, dz + (od - 1) * sd + 1, dy + (oh - 1) * sh + 1,
                     dx + (ow - 1) * sw + 1, ci),
                    (1, sd, sh, sw, 1))
                t = jnp.dot(sl.reshape(-1, ci), w[dz, dy, dx],
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
    return acc.reshape(n, od, oh, ow, co).astype(x.dtype)


def conv3d_stem(x: jax.Array, w: jax.Array) -> jax.Array:
    """Cin=1 3x3x3 same-pad stride-1 conv as one full-lane GEMM over a
    GROUP-packed patch matrix.

    XLA's direct lowering of the stem conv (1 input channel) runs at
    ~1.4 TF/s: the implicit GEMM has K=1. A plain im2col patch matrix
    (M, 27) lane-pads 27->128 (4.7x memory). Packing g = 128//co output
    x-positions per row instead gives patches (M/g, 9*(g+2)): the g
    positions of a group share taps, so per (dz, dy) only g+2 unique input
    values are needed, and the GEMM (M/g, 9*(g+2)) x (9*(g+2), g*co) fills
    all 128 output lanes. ~2x structural-zero FLOPs; the op becomes
    bandwidth-bound. Pure XLA, so jax.grad differentiates it (dx is dead:
    the stem input carries no gradient).
    """
    n, d, h, wd, ci = x.shape
    kd, kh, kw, _, co = w.shape
    g = 128 // co
    wg = wd // g
    span = g + 2
    xq = x.reshape(n, d, h, wd)
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (1, 1)))
    cols = []
    for dz in range(kd):
        for dy in range(kh):
            for o in range(span):
                sl = jax.lax.slice(
                    xp, (0, dz, dy, o),
                    (n, dz + d, dy + h, o + (wg - 1) * g + 1),
                    (1, 1, 1, g))
                cols.append(sl)
    patches = jnp.stack(cols, axis=-1)          # (N, D, H, W/g, 9*span)
    # W'[(dz*3+dy)*span + o, s*co + c] = w[dz, dy, o - s, 0, c] for
    # 0 <= o - s < 3 (patch row o covers output offset s at tap o - s)
    zeros = jnp.zeros_like(w[0, 0, 0, 0])       # (co,)
    blocks = []
    for dz in range(kd):
        for dy in range(kh):
            for o in range(span):
                row = []
                for s in range(g):
                    t = o - s
                    row.append(w[dz, dy, t, 0] if 0 <= t < kw else zeros)
                blocks.append(jnp.concatenate(row, axis=-1))
    wmat = jnp.stack(blocks, axis=0)            # (9*span, g*co)
    y = jnp.dot(patches.reshape(-1, kd * kh * span), wmat,
                preferred_element_type=jnp.float32)
    return y.reshape(n, d, h, wg * g, co).astype(x.dtype)


def _stem_window_rows(x, g: int, kd: int, kh: int, dt):
    """Group-windowed patch stack (M/g, kd*kh*(g+2)): row (n,d,h,q) holds,
    per (dz, dy) tap, the g+2 x-values covering output group q's receptive
    field along W — built from unit-stride shifted views (a stride-g slice
    compiles to a ~40 ms gather on v5e, see _stem_cf_impl docstring)."""
    n, d, h, wd, _ = x.shape
    wg = wd // g
    xg = x.reshape(n, d, h, wg, g).astype(dt)
    zpad = ((0, 0), (0, 0), (0, 0))
    prev_last = jnp.pad(xg[:, :, :, :-1, g - 1:g], zpad + ((1, 0), (0, 0)))
    next_first = jnp.pad(xg[:, :, :, 1:, 0:1], zpad + ((0, 1), (0, 0)))
    win = jnp.concatenate([prev_last, xg, next_first], -1)  # (..., wg, g+2)
    winp = jnp.pad(win, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    cols = []
    for dz in range(kd):
        for dy in range(kh):
            cols.append(jax.lax.slice(
                winp, (0, dz, dy, 0, 0), (n, dz + d, dy + h, wg, g + 2)))
    return jnp.concatenate(cols, -1).reshape(
        n * d * h * wg, kd * kh * (g + 2))


def _stem_packed_impl(x: jax.Array, w: jax.Array,
                      packed_out: bool = False) -> jax.Array:
    """Cin=1 stem conv as ONE group-windowed GEMM that emits the x-packed
    layout DIRECTLY: rows (M/g, 9*(g+2)) against a banded weight matrix
    (9*(g+2), g*co). The earlier channels-first form cost ~13 ms/step of
    data formatting around its GEMM (a layout copy of the transposed
    output + one reshape per consumer view, trace 2026-08-17); here the
    (M/g, g*co) product IS the packed tensor, so every consumer view is a
    free reshape. 2x structural-zero FLOPs on a 29-GFLOP op (~0.2 ms)."""
    n, d, h, wd, _ = x.shape
    kd, kh, kw, _, co = w.shape
    g = 128 // co
    dt = x.dtype
    pg = _stem_window_rows(x, g, kd, kh, dt)
    # B[(dzdy)*(g+2)+o, s*co+c] = w[dz, dy, o-s] (window offset o feeds
    # output offset s at x-tap t = o - s)
    wt = w.reshape(kd * kh, kw, co).astype(dt)
    zeros = jnp.zeros_like(wt[:, 0])
    b = jnp.stack([jnp.stack(
        [wt[:, o - s_] if 0 <= o - s_ < kw else zeros
         for s_ in range(g)], axis=1)
        for o in range(g + 2)], axis=1)            # (9, g+2, g, co)
    b = b.reshape(kd * kh * (g + 2), g * co)
    y = jnp.dot(pg, b, preferred_element_type=jnp.float32).astype(dt)
    if packed_out:
        return y.reshape(n, d, h, wd // g, g * co)
    return y.reshape(n, d, h, wd, co)


def _stem_cf_impl(x: jax.Array, w: jax.Array,
                  packed_out: bool = False) -> jax.Array:
    """Cin=1 3x3x3 same-pad stride-1 conv via a LEADING-dim patch stack and
    a channels-first GEMM.

    All intermediates keep the (large) W axis minor, so nothing lane-pads:
    patches P (27, N, D, H, W) is a major-dim stack of 27 compact shifted
    views; y_cf (co, N*D*H*W) = W'(co, 27) @ P is a compact GEMM; one final
    transpose emits channels-last. Contrast: a minor-dim patch matrix
    (M, 27) lane-pads 27->128/4.7x and its 54 strided slices compile to
    ~40 ms at batch 4 on v5e.
    """
    n, d, h, wd, ci = x.shape
    kd, kh, kw, _, co = w.shape
    xq = x.reshape(n, d, h, wd).astype(x.dtype)
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (1, 1)))
    taps = []
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                taps.append(jax.lax.slice(
                    xp, (0, dz, dy, dx), (n, dz + d, dy + h, dx + wd)))
    p = jnp.stack(taps, axis=0).reshape(kd * kh * kw, -1)
    wcf = w.reshape(kd * kh * kw, co).astype(x.dtype)     # (27, co)
    # contract the leading tap dim: output is (M, co) with no explicit
    # transpose (XLA places the relayout, if any, inside the GEMM)
    y = jax.lax.dot_general(
        p, wcf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if packed_out and co <= 64 and 128 % co == 0 and wd % (128 // co) == 0:
        # (M, co) -> (M/g, g*co): g consecutive w-rows are consecutive in M,
        # so this is the x-packed layout directly — the consumer's packed
        # instance norm reads it without an unpack/repack round trip
        g = 128 // co
        return y.reshape(n, d, h, wd // g, g * co)
    return y.reshape(n, d, h, wd, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_stem_cf(x: jax.Array, w: jax.Array,
                   packed_out: bool = False) -> jax.Array:
    """:func:`_stem_cf_impl` with a hand-written weight gradient.

    XLA's autodiff of the channels-first stem GEMM contracts a narrow
    (M, co) cotangent: on v5e that operand costs two ~4 ms full-tensor
    layout copies per step (trace 2026-08-17). The custom backward instead
    contracts the cotangent in its NATIVE x-packed (M/g, g*co) 128-lane
    form against a group-windowed patch matrix (M/g, 9*(g+2)) built from
    unit-stride views — no narrow-lane relayouts anywhere."""
    if _stem_packed_ok(x.shape[3], w.shape[-1]):
        return _stem_packed_impl(x, w, packed_out)
    return _stem_cf_impl(x, w, packed_out)


def _stem_packed_ok(wd: int, co: int) -> bool:
    return co <= 64 and 128 % co == 0 and wd % (128 // co) == 0


def _stem_cf_fwd(x, w, packed_out):
    co = w.shape[-1]
    if _stem_packed_ok(x.shape[3], co):
        return _stem_packed_impl(x, w, packed_out), (x, w)
    return _stem_cf_impl(x, w, packed_out), (x, w)


def _stem_cf_bwd(packed_out, res, gy):
    x, w = res
    n, d, h, wd, ci = x.shape
    kd, kh, kw, _, co = w.shape
    g = max(1, 128 // co) if (co <= 128 and 128 % co == 0
                              and wd % max(1, 128 // co) == 0) else 1
    wg = wd // g
    dt = gy.dtype
    gyp = gy.reshape(n * d * h * wg, g * co)        # free view of either form

    pg = _stem_window_rows(x, g, kd, kh, dt)

    # dWmat[(dzdy)*(g+2)+o, s*co+c]: window offset o feeds output offset s
    # at x-tap t = o - s
    dwmat = jax.lax.dot_general(
        pg, gyp.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dm = dwmat.reshape(kd * kh, g + 2, g, co)
    dw = jnp.stack([sum(dm[:, s + t, s] for s in range(g))
                    for t in range(kw)], axis=1)    # (9, kw, co)
    dw = dw.reshape(kd, kh, kw, 1, co).astype(w.dtype)

    # dx: the stem consumes the input image, so this branch is dead code in
    # training (XLA DCEs it); kept correct for completeness
    gy5 = gy.reshape(n, d, h, wd, co)
    w_flip = jnp.flip(w, (0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = jax.lax.conv_general_dilated(
        gy5.astype(dt), w_flip.astype(dt), (1, 1, 1), _same_pads((kd, kh, kw)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return dx, dw


conv3d_stem_cf.defvjp(_stem_cf_fwd, _stem_cf_bwd)


def stem_supported(x_shape, w_shape) -> bool:
    """Group-packed stem path: Cin=1, 3^3, co dividing 128, W % g == 0."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    kd, kh, kw, ci, co = w_shape
    if (kd, kh, kw) != (3, 3, 3) or ci != 1 or co > 128 or 128 % co:
        return False
    g = 128 // co
    return x_shape[-1] == 1 and x_shape[3] % g == 0


def im2col_supported(x_shape, w_shape) -> bool:
    """Small-K GEMM path: pays off when the patch matrix K is tiny (stem)."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    kd, kh, kw, ci, _ = w_shape
    return kd * kh * kw * ci <= 32


def tapsum_supported(x_shape, w_shape) -> bool:
    """Per-tap GEMM path: big channels, small spatial (measured crossover:
    wins for min(ci,co) >= 256; loses badly at large spatial extents)."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    _, _, _, ci, co = w_shape
    spatial = int(np.prod(x_shape[1:4]))
    return min(ci, co) >= 256 and spatial <= 32 ** 3

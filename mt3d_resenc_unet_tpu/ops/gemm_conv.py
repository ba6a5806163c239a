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

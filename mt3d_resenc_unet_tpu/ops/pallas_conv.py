"""Pallas TPU kernel: 3D convolution for SMALL channel counts.

Why this exists: XLA's 3D convs are MXU-bound by the output-channel
dimension — measured on v5e: C=32 runs at ~16 TFLOP/s (8% of peak), C=64 at
~63, C=128 at ~160. A 3D U-Net burns most of its FLOPs in the
full-resolution stages with C=32/64 (SURVEY.md §7.3), so those stages run at
<10% of the machine.

The trick (output x-packing with banded weights): pack G = 128 // C
consecutive x-positions into the GEMM output columns so every MXU pass
produces 128 useful lanes. With y[x] = sum_t W[t] x[x + t - 1], a packed
output group (base x = G*g, offsets s in [0, G)) decomposes into

  mid   : inputs of the same group  -> B_mid[(xofs, ci), (s, co)]
          = W[dz, dy, xofs - s + 1, ci, co]  when 0 <= xofs - s + 1 < 3
  left  : last position of group g-1 -> feeds only s = 0 with tap 0
  right : first position of group g+1 -> feeds only s = G-1 with tap 2

so the kernel runs, per (dz, dy) of the 3x3 (depth, height) taps, one dense
(M, G*C) x (G*C, G*C) GEMM plus two skinny side GEMMs — no lane-axis
concatenation of differently-offset windows (which the Mosaic compiler on
this platform rejects).

Kernel structure: grid over (N, D/bd, H/bh) output tiles; each instance DMAs
a halo'd input tile from the pre-padded packed input in HBM into VMEM
(BlockSpec windows cannot overlap, so halos use the manual-DMA stencil
pattern), then accumulates 27 MXU contractions in fp32.

Scope: stride 1, kernel (3,3,3), same padding, NDHWC, C_in == C_out in
{16, 32, 64}, no bias (the architecture's convs are bias-free by default,
reference: build_network_from_config.py:176). ``conv3d_small_c`` wires a
custom VJP: dx reuses this kernel with spatially-flipped transposed weights;
dW uses XLA's standard reverse conv (its contraction is the huge spatial
extent — efficient without packing).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_g(co: int) -> int:
    """x-positions packed per GEMM output row: 128 lanes for small C,
    1 (no packing — the kernel degenerates to a dense per-tap GEMM conv
    with ZERO structural-zero FLOPs) for C > 128."""
    return max(1, 128 // co)


def is_supported(x_shape, w_shape) -> bool:
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    kd, kh, kw, ci, co = w_shape
    if (kd, kh, kw) != (3, 3, 3):
        return False
    n, d, h, w, c = x_shape
    if co in (256, 512) and ci % 128 == 0 and ci <= 512:
        # dense g=1 class: deep stages (XLA's tapsum alternative runs as
        # ~2000 tiny dispatched GEMMs per step, ~70 ms of the round-3 trace)
        return w >= 2 and d >= 2 and h >= 2
    if co not in (16, 32, 64):
        return False
    if ci % 8 or ci > 128:
        return False
    g = 128 // co
    # side contributions use 128-lane-aligned slices of the packed input
    if (g * ci) % 128 != 0:
        return False
    return w % g == 0 and w // g >= 2 and d >= 2 and h >= 2


def build_banded_weights(w: jax.Array, g: int):
    """(3,3,3,C,C) -> (B_mid (3,3,g*C,g*C), B_left (3,3,C,g*C),
    B_right (3,3,C,g*C)). XLA ops only, so gradients can flow."""
    kd, kh, kw, ci, co = w.shape
    gc = g * co
    zeros = jnp.zeros_like(w[:, :, 0])                 # (3,3,ci,co)

    mid_cols = []
    for s in range(g):
        taps = []
        for xofs in range(g):
            t = xofs - s + 1
            taps.append(w[:, :, t] if 0 <= t < kw else zeros)
        mid_cols.append(jnp.stack(taps, axis=2))       # (3,3,g,ci,co)
    b_mid = jnp.stack(mid_cols, axis=4)                # (3,3,g,ci,g,co)
    b_mid = b_mid.reshape(kd, kh, g * ci, gc)

    # Side contributions:
    #   left : the last packed x-position of group g-1 carries tap t=0 into
    #          output offset s=0
    #   right: the first packed x-position of group g+1 carries tap t=2 into
    #          output offset s=g-1
    # When the packed input spans multiple 128-lane tiles (g*ci > 128),
    # Mosaic requires 128-aligned lane slices, so the side operands are
    # zero-extended to 128 contraction rows; within a single tile the narrow
    # ci-row form is used (4x fewer side FLOPs). At g == 1 the sides are the
    # FULL-row dx=0/dx=2 tap matrices (slices are whole -> trivially aligned).
    narrow = g == 1 or (g * ci) <= 128
    left_cols = [w[:, :, 0] if s == 0 else zeros for s in range(g)]
    b_left = jnp.stack(left_cols, axis=3).reshape(kd, kh, ci, gc)
    right_cols = [w[:, :, 2] if s == g - 1 else zeros for s in range(g)]
    b_right = jnp.stack(right_cols, axis=3).reshape(kd, kh, ci, gc)
    if not narrow:
        b_left = jnp.pad(b_left, ((0, 0), (0, 0), (128 - ci, 0), (0, 0)))
        b_right = jnp.pad(b_right, ((0, 0), (0, 0), (0, 128 - ci), (0, 0)))
    return b_mid, b_left, b_right


# Mosaic's default scoped-VMEM stack limit is 16 MB; the fused pre-op's
# normalized-tile temp pushes the banded kernel ~100 KB over it at the
# best tile size (measured OOM 2026-08-17). v5e has 128 MB VMEM — raise
# the per-kernel cap instead of shrinking tiles.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _pick_tile(d: int, h: int, wga: int, gc: int, itemsize: int,
               budget_bytes: int = None,
               cat_row_bytes: int = 0) -> Tuple[int, int]:
    """(bd, bh) dividing (d, h) with the halo'd input tile under budget.
    ``cat_row_bytes``: per-(bd*bh) bytes of the concat-GEMM scratch (CAT
    mode), capped at 3x the tile budget so total VMEM stays bounded."""
    if budget_bytes is None:
        import os
        budget_bytes = int(os.environ.get("MT3D_CONV_TILE_BUDGET",
                                          (5 << 20) // 2))
    row_bytes = wga * gc * itemsize

    def fits(bd, bh):
        if (bd + 2) * (bh + 2) * row_bytes > budget_bytes:
            return False
        return bd * bh * cat_row_bytes <= 3 * budget_bytes

    best = (1, 1)
    for bd in [x for x in (16, 12, 8, 6, 4, 2, 1) if d % x == 0]:
        for bh in [x for x in (16, 12, 8, 6, 4, 2, 1) if h % x == 0]:
            if fits(bd, bh) and bd * bh > best[0] * best[1]:
                best = (bd, bh)
    return best


def _pick_tile_flat(d: int, h: int, wg: int, gc: int, itemsize: int,
                    budget_bytes: int = None) -> Tuple[int, int]:
    """(bd, bh) for the flattened layout: tile is (bd+2, (bh+4)*wg, gc)."""
    if budget_bytes is None:
        import os
        budget_bytes = int(os.environ.get("MT3D_CONV_TILE_BUDGET",
                                          (5 << 20) // 2))
    row_bytes = wg * gc * itemsize

    best, best_eff = (1, 1), float("inf")
    for bd in [x for x in (32, 16, 12, 8, 6, 4, 2, 1) if d % x == 0]:
        for bh in [x for x in (32, 16, 12, 8, 6, 4, 2, 1) if h % x == 0]:
            if (bd + 2) * (bh + 4) * row_bytes > budget_bytes:
                continue
            # minimize halo'd bytes per output row (DMA efficiency), then
            # prefer the larger tile (fewer GEMM issues)
            eff = (bd + 2) * (bh + 4) / (bd * bh)
            if eff < best_eff or (eff == best_eff
                                  and bd * bh > best[0] * best[1]):
                best, best_eff = (bd, bh), eff
    return best


def _tile_norm(x_s, pre_ref, di, hi, bd, bh, wg, neg_slope):
    """Apply ``leaky(x * scale - shift)`` to a halo'd input tile, zeroing
    the pad positions (halo rows outside the volume and the x-axis
    pad/alignment groups must stay zero for same-padding semantics).
    Handles both (bd+2, bh+2, wga, gci) tiles and sample-batched
    (bn, bd+2, bh+2, wga, gci) tiles (per-sample scale/shift rows)."""
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    shp = x_s.shape
    dt = x_s.dtype
    bnd = len(shp) == 5                  # leading sample-batch dim
    o = 1 if bnd else 0
    if bnd:
        sc = pre_ref[:, 0].astype(dt)[:, None, None, None, :]
        sh = pre_ref[:, 1].astype(dt)[:, None, None, None, :]
    else:
        sc = pre_ref[0, 0].astype(dt)[None, None, None, :]
        sh = pre_ref[0, 1].astype(dt)[None, None, None, :]
    r = lax.broadcasted_iota(jnp.int32, shp, o + 0) + di * bd
    hq = lax.broadcasted_iota(jnp.int32, shp, o + 1) + hi * bh
    wq = lax.broadcasted_iota(jnp.int32, shp, o + 2)
    valid = ((r >= 1) & (r <= nd * bd) & (hq >= 1) & (hq <= nh * bh)
             & (wq >= 1) & (wq <= wg))
    u = x_s[...] * sc - sh
    # Mosaic on v5e rejects cmpf on bf16 vectors ("Target does not support
    # this comparison"); compare in f32
    pos = u.astype(jnp.float32) >= 0.0
    u = jnp.where(pos, u, u * jnp.asarray(neg_slope, dt))
    return jnp.where(valid, u, jnp.zeros_like(u))


def _flat_env() -> bool:
    """MT3D_CONV_FLAT=0 disables the flattened-(H*W/g) tile layout.

    The 5-D layout DMAs halo'd tiles whose second-minor extent is
    wga = align(wg + 2, 16) — a 41% byte tax at wg = 32 (48 transferred
    for 34 used) because Mosaic rejects unaligned second-minor DMA tiles.
    Flattening (H, W/g) -> H*W/g makes every tile window wg-aligned with
    NO alignment tail: the x-halo of group c is simply the previous flat
    element (with the wrap rows at x-volume edges masked to zero in the
    shared side buffer), and the H halo becomes whole wg-rows. Tiles move
    ~25-33% fewer bytes and the input pre-pad shrinks the same amount."""
    import os
    return os.environ.get("MT3D_CONV_FLAT", "1") == "1"


def _side_mask(bh: int, wg: int, side_k: int, dtype):
    """((bh+2)*wg, 2*side_k) multiplier zeroing the x-volume-edge wrap rows
    of the shared side buffer: in flat layout the 'left halo' of group 0 of
    each H row aliases the previous row's last group (and symmetrically for
    the right halo of group wg-1) — real data, wrong tap."""
    p = jnp.arange((bh + 2) * wg) % wg
    left = (p != 0).astype(dtype)[:, None]
    right = (p != wg - 1).astype(dtype)[:, None]
    return jnp.concatenate([jnp.broadcast_to(left, (p.size, side_k)),
                            jnp.broadcast_to(right, (p.size, side_k))],
                           axis=1)


def _flat_valid(shape4, di, hi, bd, bh):
    """Validity mask for a flat halo'd tile viewed 4-D as
    (bd+2, bh+4, wg, gci): True on rows inside the volume."""
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    r = lax.broadcasted_iota(jnp.int32, shape4, 0) + di * bd
    hq = lax.broadcasted_iota(jnp.int32, shape4, 1) + hi * bh
    return (r >= 1) & (r <= nd * bd) & (hq >= 2) & (hq < nh * bh + 2)


def _tile_corr_flat(gy_val, yp_val, gs_ref, di, hi, bd, bh, wg):
    """Fold the stats cotangents into the output cotangent tile-wise:
    ``gyb = gy + gs[0] + 2*yp*gs[1]`` (fp32), zeroing the halo rows (the
    +gs[0] term would otherwise contaminate the same-padding zeros)."""
    bd2, p4, gci = gy_val.shape
    g0 = gs_ref[0, 0][None, None, None, :]
    g1 = gs_ref[0, 1][None, None, None, :]
    v4g = gy_val.reshape(bd2, p4 // wg, wg, gci).astype(jnp.float32)
    v4y = yp_val.reshape(bd2, p4 // wg, wg, gci).astype(jnp.float32)
    u = v4g + g0 + 2.0 * v4y * g1
    valid = _flat_valid(v4g.shape, di, hi, bd, bh)
    u = jnp.where(valid, u, jnp.zeros_like(u))
    return u.astype(gy_val.dtype).reshape(bd2, p4, gci)


def _tile_norm_flat(x_val, pre_ref, di, hi, bd, bh, wg, neg_slope):
    """Flat-layout variant of ``_tile_norm``: the tile is
    (bd+2, (bh+4)*wg, gci) with a 2-row H halo and no x pad (all wg
    positions per row are real data; x same-padding is handled by the
    side-buffer mask)."""
    bd2, p4, gci = x_val.shape
    dt = x_val.dtype
    # 4-D view (free: splits contiguous sublane dims) for the row iotas —
    # avoids a vector integer division by wg
    v4 = x_val.reshape(bd2, p4 // wg, wg, gci)
    sc = pre_ref[0, 0].astype(dt)[None, None, None, :]
    sh = pre_ref[0, 1].astype(dt)[None, None, None, :]
    valid = _flat_valid(v4.shape, di, hi, bd, bh)
    u = v4 * sc - sh
    pos = u.astype(jnp.float32) >= 0.0
    u = jnp.where(pos, u, u * jnp.asarray(neg_slope, dt))
    return jnp.where(valid, u, jnp.zeros_like(u)).reshape(bd2, p4, gci)


def _halo_dma(x_hbm, buf, sem, sl, a, b, c, bd, bh, wg, ndp, nhp, op):
    """Issue (op='start') or retire (op='wait') the halo'd tile copy from
    the UNPADDED flat input (n, d, h*wg, gci): the window [b*bd-1, b*bd+bd+1)
    x [(c*bh-2)*wg, (c*bh+bh+2)*wg) is clamped at the volume edges, copied
    into an offset region of the buffer, and the uncovered halo rows are
    zeroed separately (``_halo_zero``) — no jnp.pad pass over HBM at all.
    Exactly one (D-case, H-case) branch fires per call; start/wait construct
    the identical copy under the same conditions."""
    if ndp == 1:
        d_cases = [(None, 0, bd, 1)]
    else:
        d_cases = [
            (b == 0, 0, bd + 1, 1),
            (b == ndp - 1, b * bd - 1, bd + 1, 0),
            ((b > 0) & (b < ndp - 1), b * bd - 1, bd + 2, 0),
        ]
    if nhp == 1:
        h_cases = [(None, 0, bh * wg, 2 * wg)]
    else:
        h_cases = [
            (c == 0, 0, (bh + 2) * wg, 2 * wg),
            (c == nhp - 1, (c * bh - 2) * wg, (bh + 2) * wg, 0),
            ((c > 0) & (c < nhp - 1), (c * bh - 2) * wg, (bh + 4) * wg, 0),
        ]
    for dc, ds_, dsz, dd in d_cases:
        for hc, hs, hsz, hd in h_cases:
            cond = dc if hc is None else (hc if dc is None else dc & hc)

            def body(ds_=ds_, dsz=dsz, dd=dd, hs=hs, hsz=hsz, hd=hd):
                cp = pltpu.make_async_copy(
                    x_hbm.at[a, pl.ds(ds_, dsz), pl.ds(hs, hsz)],
                    buf.at[pl.ds(dd, dsz), pl.ds(hd, hsz)],
                    sem.at[sl])
                cp.start() if op == "start" else cp.wait()

            if cond is None:
                body()
            else:
                pl.when(cond)(body)


def _halo_zero(buf, b, c, bd, bh, wg, ndp, nhp):
    """Zero the buffer rows the clamped copy left uncovered (the volume-edge
    halo). D-edge rows span the full flat extent, so corners are covered."""
    p4 = (bh + 4) * wg

    def zrows(lo, hi):
        buf[lo:hi] = jnp.zeros((hi - lo,) + buf.shape[1:], buf.dtype)

    def zflat(lo, hi):
        buf[:, lo:hi] = jnp.zeros(
            (buf.shape[0], hi - lo, buf.shape[2]), buf.dtype)

    if ndp == 1:
        zrows(0, 1)
        zrows(bd + 1, bd + 2)
    else:
        pl.when(b == 0)(lambda: zrows(0, 1))
        pl.when(b == ndp - 1)(lambda: zrows(bd + 1, bd + 2))
    if nhp == 1:
        zflat(0, 2 * wg)
        zflat((bh + 2) * wg, p4)
    else:
        pl.when(c == 0)(lambda: zflat(0, 2 * wg))
        pl.when(c == nhp - 1)(lambda: zflat((bh + 2) * wg, p4))


def _cat_env() -> bool:
    """MT3D_CONV_CAT=1: run the 9 mid contractions of each tile as ONE
    long-K GEMM against the stacked band matrix (K = 9*g*ci) instead of 9
    GEMMs + 9 fp32 accumulates. Same raw FLOPs; trades 9 VPU accumulate
    passes for one VMEM concat scratch. Off by default until measured
    faster on the target chip."""
    import os
    return os.environ.get("MT3D_CONV_CAT", "0") == "1"


def _sideshare_env() -> bool:
    """MT3D_CONV_SIDESHARE=0 disables the shared side-concat buffer.

    Side GEMMs are MXU-issue-latency-bound (~0.6us/issue regardless of
    operand form — kernel-anatomy measurement, 2026-08-17), so 18 of them
    dominate per-tile compute. This path builds ONE (bd+2, bh+2, wg,
    2*side_k) buffer per tile holding (left-lane-block, right-lane-block
    pre-shifted by the +2 w-offset) so every (dz, dy) gets its combined
    side operand as a plain slice — 9 side issues instead of 18 for two
    buffer writes per tile. The earlier per-(dz, dy) concat variant
    (SIDEPAIR) rebuilt the operand 18 times and measured 3% slower; the
    shared buffer amortizes the copies 9x. Only applies at g >= 2 (at
    g = 1 the sides are already full-K)."""
    import os
    return os.environ.get("MT3D_CONV_SIDESHARE", "1") == "1"


def _pick_bn(n: int, d: int, h: int, wga: int, gc: int, itemsize: int,
             budget_bytes: int = 6 << 20) -> int:
    """Batch-block for whole-plane tiles (g=1 deep stages): the spatial
    extent is tiny, so GEMM M = bd*bh*wg alone is MXU-fill-dominated;
    batching bn samples per tile multiplies M."""
    per_n = (d + 2) * (h + 2) * wga * gc * itemsize
    bn = max(1, budget_bytes // per_n)
    while n % bn:
        bn -= 1
    return bn


def _conv_kernel(*refs, g: int, ci: int, co: int, bd: int, bh: int,
                 pre: bool = False, stats: bool = False,
                 neg_slope: float = 1e-2, cat: bool = False,
                 addin: bool = False, bn: int = 1, sideshare: bool = False,
                 flat: bool = False, corr: bool = False,
                 post: bool = False):
    """Double-buffered: the halo tile for grid step k+1 streams in while
    step k computes. The two buffers are distinct scratch refs selected with
    static ``pl.when`` branches — a dynamic leading-index slice of one
    buffer defeats Mosaic's address optimization (measured 3x slower).

    Optional fusions (VERDICT r2 perf item 1a):
    * ``pre``: the input tile is normalized + LeakyReLU'd in VMEM right
      after the DMA (per-(sample, lane) scale/shift vectors), replacing a
      full XLA read+write pass over the tensor in HBM;
    * ``stats``: per-(sample, lane) sum / sum-of-squares of the fp32 output
      accumulate into a revolving (1, 2, gco) output window — the instance
      norm statistics of this conv's output come out for free.
    """
    it = iter(refs)
    x_hbm = next(it)
    yp_hbm = next(it) if corr else None
    bm_ref = next(it)
    if sideshare:
        bs_ref, bl_ref, br_ref = next(it), None, None
    else:
        bs_ref, bl_ref, br_ref = None, next(it), next(it)
    mask_ref = next(it) if flat else None
    gs_ref = next(it) if corr else None
    pre_ref = next(it) if (pre or post) else None
    xq_ref = next(it) if post else None
    add_ref = next(it) if addin else None
    y_ref = next(it)
    stats_ref = next(it) if stats else None
    x_s0, x_s1, sem = next(it), next(it), next(it)
    if corr:
        yp_s0, yp_s1, sem2 = next(it), next(it), next(it)
    else:
        yp_s0 = yp_s1 = sem2 = None
    xcat = next(it) if cat else None
    scat = next(it) if sideshare else None
    assert not (pre and post) and (not corr or flat)

    ni = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    gci = g * ci
    gco = g * co
    wg = y_ref.shape[3]
    m = bn * bd * bh * wg
    dn = (((1,), (0,)), ((), ()))
    side_k = gci if g == 1 else (ci if gci <= 128 else 128)
    assert bn == 1 or not (addin or cat)

    def dma(sl, a, b, c, op):
        buf = (x_s0, x_s1)[sl]
        if flat:
            _halo_dma(x_hbm, buf, sem, sl, a, b, c, bd, bh, wg, nd, nh, op)
            if corr:
                _halo_dma(yp_hbm, (yp_s0, yp_s1)[sl], sem2, sl, a, b, c,
                          bd, bh, wg, nd, nh, op)
            return
        if bn > 1:
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(a * bn, bn), pl.ds(b * bd, bd + 2),
                         pl.ds(c * bh, bh + 2)],
                buf, sem.at[sl])
        else:
            cp = pltpu.make_async_copy(
                x_hbm.at[a, pl.ds(b * bd, bd + 2), pl.ds(c * bh, bh + 2)],
                buf, sem.at[sl])
        cp.start() if op == "start" else cp.wait()

    k = (ni * nd + di) * nh + hi
    total = pl.num_programs(0) * nd * nh

    @pl.when(k == 0)
    def _():
        dma(0, ni, di, hi, "start")

    nk = k + 1
    n_ni = nk // (nd * nh)
    rem = nk % (nd * nh)
    n_di = rem // nh
    n_hi = rem % nh

    @pl.when((nk < total) & (nk % 2 == 0))
    def _():
        dma(0, n_ni, n_di, n_hi, "start")

    @pl.when((nk < total) & (nk % 2 == 1))
    def _():
        dma(1, n_ni, n_di, n_hi, "start")

    if stats:
        @pl.when((di == 0) & (hi == 0))
        def _():
            stats_ref[...] = jnp.zeros_like(stats_ref)

    def compute(x_buf, yp_buf=None):
        if flat:
            # flattened (H*W/g) tile: (bd+2, (bh+4)*wg, gci), 2-row H halo,
            # no x pad. Mids slice whole wg-aligned row bands; sides come
            # from the shared buffer whose x-edge wrap rows are masked.
            if corr:
                x_s = _tile_corr_flat(x_buf[...], yp_buf[...], gs_ref,
                                      di, hi, bd, bh, wg)
            elif pre:
                x_s = _tile_norm_flat(x_buf[...], pre_ref, di, hi, bd, bh,
                                      wg, neg_slope)
            else:
                x_s = x_buf[...]
            p2 = (bh + 2) * wg
            scat[:, :, 0:side_k] = (
                x_s[:, wg - 1:wg - 1 + p2, gci - side_k:gci]
                * mask_ref[:, 0:side_k])
            scat[:, :, side_k:] = (
                x_s[:, wg + 1:wg + 1 + p2, 0:side_k]
                * mask_ref[:, side_k:])
            acc = jnp.zeros((m, gco), jnp.float32)
            for dz in range(3):
                for dy in range(3):
                    mid = x_s[dz:dz + bd, (dy + 1) * wg:
                              (dy + 1 + bh) * wg].reshape(m, gci)
                    acc += lax.dot_general(
                        mid, bm_ref[dz, dy], dn,
                        preferred_element_type=jnp.float32)
                    side = scat[dz:dz + bd,
                                dy * wg:(dy + bh) * wg].reshape(
                        m, 2 * side_k)
                    acc += lax.dot_general(
                        side, bs_ref[dz, dy], dn,
                        preferred_element_type=jnp.float32)
            finish(acc)
            return
        if pre:
            x_s = _tile_norm(x_buf, pre_ref, di, hi, bd, bh, wg, neg_slope)
        else:
            x_s = x_buf[...]
        if sideshare:
            # one shared (left, right-shifted-by-2) buffer per tile: every
            # (dz, dy)'s combined side operand is then a plain slice, so the
            # two narrow side GEMMs merge into one K=2*side_k issue
            scat[:, :, :, 0:side_k] = x_s[:, :, 0:wg, gci - side_k:gci]
            scat[:, :, :, side_k:] = x_s[:, :, 2:wg + 2, 0:side_k]
        if cat:
            # single long-K mid GEMM: stack the 9 shifted operands along
            # lanes (128-aligned slots) and contract against the stacked
            # band matrix (bm_ref here is (9*gci, gco))
            for dz in range(3):
                for dy in range(3):
                    rows = x_s[dz:dz + bd, dy:dy + bh]
                    idx = dz * 3 + dy
                    xcat[:, idx * gci:(idx + 1) * gci] = (
                        rows[:, :, 1:wg + 1, :].reshape(m, gci))
            acc = lax.dot_general(xcat[...], bm_ref[...], dn,
                                  preferred_element_type=jnp.float32)
            for dz in range(3):
                for dy in range(3):
                    if sideshare:
                        side = scat[dz:dz + bd, dy:dy + bh].reshape(
                            m, 2 * side_k)
                        acc += lax.dot_general(
                            side, bs_ref[dz, dy], dn,
                            preferred_element_type=jnp.float32)
                        continue
                    rows = x_s[dz:dz + bd, dy:dy + bh]
                    left = rows[:, :, 0:wg, gci - side_k:gci].reshape(
                        m, side_k)
                    right = rows[:, :, 2:wg + 2, 0:side_k].reshape(m, side_k)
                    acc += lax.dot_general(
                        left, bl_ref[dz, dy], dn,
                        preferred_element_type=jnp.float32)
                    acc += lax.dot_general(
                        right, br_ref[dz, dy], dn,
                        preferred_element_type=jnp.float32)
        else:
            nb = (slice(None),) if bn > 1 else ()
            acc = jnp.zeros((m, gco), jnp.float32)
            for dz in range(3):
                for dy in range(3):
                    # ([bn,] bd, bh, wga, g*ci)
                    rows = x_s[nb + (slice(dz, dz + bd),
                                     slice(dy, dy + bh))]
                    mid = rows[nb + (slice(None), slice(None),
                                     slice(1, wg + 1))].reshape(m, gci)
                    acc += lax.dot_general(
                        mid, bm_ref[dz, dy], dn,
                        preferred_element_type=jnp.float32)
                    if sideshare:
                        side = scat[dz:dz + bd, dy:dy + bh].reshape(
                            m, 2 * side_k)
                        acc += lax.dot_general(
                            side, bs_ref[dz, dy], dn,
                            preferred_element_type=jnp.float32)
                        continue
                    left = rows[nb + (slice(None), slice(None), slice(0, wg),
                                      slice(gci - side_k, gci))].reshape(
                        m, side_k)
                    right = rows[nb + (slice(None), slice(None),
                                       slice(2, wg + 2),
                                       slice(0, side_k))].reshape(m, side_k)
                    acc += lax.dot_general(
                        left, bl_ref[dz, dy], dn,
                        preferred_element_type=jnp.float32)
                    acc += lax.dot_general(
                        right, br_ref[dz, dy], dn,
                        preferred_element_type=jnp.float32)
        finish(acc)

    def finish(acc):
        if post:
            # pre-op backward fused as the dx kernel's epilogue: the
            # cotangent wrt the RAW input is du*scale with du = gxn *
            # leaky'(u), and the scale/shift cotangents reduce into the
            # revolving stats output ([sum du*x; sum du])
            xf = xq_ref[0].reshape(m, gci).astype(jnp.float32)
            sc = pre_ref[0, 0][None, :]
            sh = pre_ref[0, 1][None, :]
            u = xf * sc - sh
            du = acc * jnp.where(u >= 0.0, 1.0, neg_slope)
            stats_ref[0, 0, :] += jnp.sum(du * xf, axis=0)
            stats_ref[0, 1, :] += jnp.sum(du, axis=0)
            y_ref[0] = (du * sc).reshape(bd, bh, wg, gco).astype(y_ref.dtype)
            return
        if addin:
            # split-weight pair: the first half's conv output is added
            # in-kernel so the (summed) tensor's statistics can be emitted
            # without a standalone XLA add + reduction pass
            acc = acc + add_ref[0].reshape(m, gco).astype(jnp.float32)
        if stats:
            if bn > 1:
                a3 = acc.reshape(bn, bd * bh * wg, gco)
                stats_ref[:, 0, :] += jnp.sum(a3, axis=1)
                stats_ref[:, 1, :] += jnp.sum(a3 * a3, axis=1)
            else:
                stats_ref[0, 0, :] += jnp.sum(acc, axis=0)
                stats_ref[0, 1, :] += jnp.sum(acc * acc, axis=0)
        if bn > 1:
            y_ref[...] = acc.reshape(bn, bd, bh, wg, gco).astype(y_ref.dtype)
        else:
            y_ref[0] = acc.reshape(bd, bh, wg, gco).astype(y_ref.dtype)

    @pl.when(k % 2 == 0)
    def _():
        dma(0, ni, di, hi, "wait")
        if flat and not corr:
            _halo_zero(x_s0, di, hi, bd, bh, wg, nd, nh)
        compute(x_s0, yp_s0 if corr else None)

    @pl.when(k % 2 == 1)
    def _():
        dma(1, ni, di, hi, "wait")
        if flat and not corr:
            _halo_zero(x_s1, di, hi, bd, bh, wg, nd, nh)
        compute(x_s1, yp_s1 if corr else None)


def _conv3d_banded_packed_f(xp: jax.Array, w: jax.Array, g: int,
                            pre_vec=None, emit_stats: bool = False,
                            neg_slope: float = 1e-2, add_to=None):
    """Packed-in/packed-out banded conv: xp (N, D, H, W/g, g*ci) ->
    (N, D, H, W/g, g*co). Keeping tensors packed between ops avoids XLA's
    lane padding on small-C activations entirely.

    ``pre_vec``: optional (N, 2, g*ci) fp32 [scale; shift] — the input is
    normalized + LeakyReLU'd tile-wise in VMEM (the previous conv's instance
    norm applied as this conv's pre-op). ``emit_stats``: additionally return
    (N, 2, g*co) fp32 per-lane [sum; sumsq] of the output."""
    n, d, h, wg, gci = xp.shape
    ci = gci // g
    co = w.shape[-1]
    gco = g * co
    cat = _cat_env()
    # second-minor dim of DMA'd tiles must be tiling-aligned
    sub = 16 if xp.dtype == jnp.bfloat16 else 8
    wga = ((wg + 2 + sub - 1) // sub) * sub
    # g=1 deep stages: tiny spatial extents -> whole-plane tiles, batched
    # over samples so the GEMM M dim stays MXU-pipeline-sized
    # fused pre/stats compose with sample batching (per-sample scale/shift
    # rows, per-sample stats accumulation); only addin/cat do not
    batchable = add_to is None and not cat
    # flat tile windows are wg-aligned in the flattened dim; Mosaic requires
    # 16-sublane (bf16) alignment of second-minor DMA offsets
    flat = _flat_env() and g >= 2 and not cat and wg % sub == 0
    if g == 1 and batchable:
        bd, bh = _pick_tile(d, h, wga, max(gci, gco), xp.dtype.itemsize,
                            budget_bytes=6 << 20)
        bn = (_pick_bn(n, d, h, wga, gci, xp.dtype.itemsize)
              if (bd, bh) == (d, h) else 1)
    elif flat:
        bd, bh = _pick_tile_flat(d, h, wg, max(gci, gco),
                                 xp.dtype.itemsize)
        bn = 1
    else:
        bd, bh = _pick_tile(d, h, wga, max(gci, gco), xp.dtype.itemsize,
                            cat_row_bytes=(wg * 9 * gci * xp.dtype.itemsize
                                           if cat else 0))
        bn = 1

    if flat:
        # flatten (H, W/g) — a free reshape; NO pad pass: the kernel's
        # clamped halo DMA + edge zero-fill provides same-padding in-VMEM
        xpp = xp.reshape(n, d, h * wg, gci)
    else:
        # halo-pad: 1 in D/H, one packed group in W, alignment tail
        xpp = jnp.pad(xp,
                      ((0, 0), (1, 1), (1, 1), (1, wga - (wg + 1)), (0, 0)))

    b_mid, b_left, b_right = build_banded_weights(w.astype(xp.dtype), g)
    if cat:
        b_mid = b_mid.reshape(9 * gci, gco)
    sideshare = flat or (_sideshare_env() and g >= 2 and bn == 1)
    side_k = gci if g == 1 else (ci if gci <= 128 else 128)

    kernel = functools.partial(_conv_kernel, g=g, ci=ci, co=co, bd=bd, bh=bh,
                               pre=pre_vec is not None, stats=emit_stats,
                               neg_slope=neg_slope, cat=cat,
                               addin=add_to is not None, bn=bn,
                               sideshare=sideshare, flat=flat)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, di, hi: (0,) * len(shape),
        memory_space=pltpu.VMEM)
    if sideshare:
        b_side = jnp.concatenate([b_left, b_right], axis=2)
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),   # packed input (HBM)
            const_spec(b_mid.shape),
            const_spec(b_side.shape),
        ]
        operands = [xpp, b_mid, b_side]
        if flat:
            m2 = _side_mask(bh, wg, side_k, xp.dtype)
            in_specs.append(const_spec(m2.shape))
            operands.append(m2)
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),   # packed input (HBM)
            const_spec(b_mid.shape),
            const_spec(b_left.shape),
            const_spec(b_right.shape),
        ]
        operands = [xpp, b_mid, b_left, b_right]
    if pre_vec is not None:
        in_specs.append(pl.BlockSpec((bn, 2, gci),
                                     lambda ni, di, hi: (ni, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(pre_vec)
    if add_to is not None:
        in_specs.append(pl.BlockSpec((1, bd, bh, wg, gco),
                                     lambda ni, di, hi: (ni, di, hi, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(add_to)
    out_specs = pl.BlockSpec((bn, bd, bh, wg, gco),
                             lambda ni, di, hi: (ni, di, hi, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, d, h, wg, gco), xp.dtype)
    if emit_stats:
        out_specs = (out_specs,
                     pl.BlockSpec((bn, 2, gco),
                                  lambda ni, di, hi: (ni, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, 2, gco), jnp.float32))
    if flat:
        buf_shape = (bd + 2, (bh + 4) * wg, gci)
    else:
        buf_shape = ((bn, bd + 2, bh + 2, wga, gci) if bn > 1
                     else (bd + 2, bh + 2, wga, gci))
    scratch = [
        pltpu.VMEM(buf_shape, xp.dtype),
        pltpu.VMEM(buf_shape, xp.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if cat:
        scratch.append(pltpu.VMEM((bd * bh * wg, 9 * gci), xp.dtype))
    if sideshare:
        scratch.append(
            pltpu.VMEM((bd + 2, (bh + 2) * wg, 2 * side_k), xp.dtype)
            if flat else
            pltpu.VMEM((bd + 2, bh + 2, wg, 2 * side_k), xp.dtype))
    return pl.pallas_call(
        kernel,
        grid=(n // bn, d // bd, h // bh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_VMEM_LIMIT,
    )(*operands)


def _conv3d_banded_packed(xp: jax.Array, w: jax.Array, g: int) -> jax.Array:
    return _conv3d_banded_packed_f(xp, w, g)


def _flat_eligible(wg: int, g: int, dtype) -> bool:
    sub = 16 if dtype == jnp.bfloat16 else 8
    return _flat_env() and g >= 2 and wg % sub == 0


def _conv3d_dx_fused_f(gy, yp, gs, w_flip, g, xq=None, pre_vec=None,
                       neg_slope: float = 1e-2):
    """Fused dx for the stats-emitting convs (flat layout only): builds the
    corrected cotangent ``gyb = gy + gs[0] + 2*yp*gs[1]`` tile-wise in VMEM
    (never materialized in HBM), runs the banded transpose conv, and — when
    ``xq``/``pre_vec`` are given — applies the pre-op backward as the
    epilogue, returning ``(dxp, [sum du*x; sum du])`` so dscale/dshift need
    no standalone XLA pass either."""
    n, d, h, wg, gci = gy.shape
    ci = gci // g
    co = w_flip.shape[-1]
    gco = g * co
    post = xq is not None
    bd, bh = _pick_tile_flat(d, h, wg, max(gci, gco), gy.dtype.itemsize)
    gyf = gy.reshape(n, d, h * wg, gci)
    ypf = yp.reshape(n, d, h * wg, gci)
    b_mid, b_left, b_right = build_banded_weights(w_flip.astype(gy.dtype), g)
    side_k = ci
    b_side = jnp.concatenate([b_left, b_right], axis=2)
    m2 = _side_mask(bh, wg, side_k, gy.dtype)
    kernel = functools.partial(
        _conv_kernel, g=g, ci=ci, co=co, bd=bd, bh=bh, pre=False,
        stats=post, neg_slope=neg_slope, cat=False, addin=False, bn=1,
        sideshare=True, flat=True, corr=True, post=post)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, di, hi: (0,) * len(shape),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 2, gci), lambda ni, di, hi: (ni, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                const_spec(b_mid.shape), const_spec(b_side.shape),
                const_spec(m2.shape), vec_spec]
    operands = [gyf, ypf, b_mid, b_side, m2, gs]
    if post:
        in_specs.append(vec_spec)
        operands.append(pre_vec)
        in_specs.append(pl.BlockSpec((1, bd, bh, wg, gci),
                                     lambda ni, di, hi: (ni, di, hi, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(xq)
    out_specs = pl.BlockSpec((1, bd, bh, wg, gco),
                             lambda ni, di, hi: (ni, di, hi, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, d, h, wg, gco), gy.dtype)
    if post:
        out_specs = (out_specs, vec_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, 2, gci), jnp.float32))
    buf = (bd + 2, (bh + 4) * wg, gci)
    scratch = [
        pltpu.VMEM(buf, gy.dtype), pltpu.VMEM(buf, gy.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM(buf, gy.dtype), pltpu.VMEM(buf, gy.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((bd + 2, (bh + 2) * wg, 2 * side_k), gy.dtype),
    ]
    return pl.pallas_call(
        kernel,
        grid=(n, d // bd, h // bh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_VMEM_LIMIT,
    )(*operands)


def _conv3d_banded_fwd(x: jax.Array, w: jax.Array) -> jax.Array:
    n, d, h, w_dim, ci = x.shape
    co = w.shape[-1]
    g = _pack_g(co)
    xp = x.reshape(n, d, h, w_dim // g, g * ci)
    yp = _conv3d_banded_packed(xp, w, g)
    return yp.reshape(n, d, h, w_dim, co)


# ----------------------------------------------------------------------
# weight gradient: banded correlation kernel
# ----------------------------------------------------------------------

def _dw_kernel(*refs, g: int, ci: int, co: int, bd: int, bh: int,
               side_k: int, pre: bool = False, neg_slope: float = 1e-2,
               cat: bool = False, bn: int = 1, sideshare: bool = False,
               flat: bool = False, corr: bool = False):
    """dB[dz, dy] += patches^T @ gy, accumulated in fp32 VMEM scratch across
    the sequential grid; the banded gradients are written at the last step.
    The contraction runs over the (huge) spatial dim with BOTH output dims
    MXU-sized (g*ci x g*co), unlike XLA's reverse conv whose output tile is
    (ci, co) — the reason this is ~3x faster for small C.

    ``pre``: normalize+activate the x tiles in VMEM exactly as the fused
    forward did (the dW contraction needs the conv's ACTUAL input)."""
    it = iter(refs)
    x_hbm, gy_ref = next(it), next(it)
    if corr:
        ypq_ref, gs_ref = next(it), next(it)
    mask_ref = next(it) if flat else None
    pre_ref = next(it) if pre else None
    if sideshare:
        dbm_ref, dbs_ref = next(it), next(it)
        dbl_ref = dbr_ref = None
    else:
        dbm_ref, dbl_ref, dbr_ref = next(it), next(it), next(it)
        dbs_ref = None
    x_s0, x_s1, sem = next(it), next(it), next(it)
    xcat = next(it) if cat else None
    scat = next(it) if sideshare else None
    # fp32 accumulation happens directly in the (constant-index, hence
    # VMEM-revolving) output blocks — separate scratch accumulators would
    # double the banded-gradient VMEM (28 MB at C=512)
    acc_m, acc_l, acc_r, acc_s = dbm_ref, dbl_ref, dbr_ref, dbs_ref

    ni = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    gci = g * ci
    gco = g * co
    wg = gy_ref.shape[3]
    m = bn * bd * bh * wg
    dn = (((0,), (0,)), ((), ()))  # contract over rows (spatial)
    assert bn == 1 or not cat

    def dma(buf, sl, a, b, c, op):
        if flat:
            _halo_dma(x_hbm, buf, sem, sl, a, b, c, bd, bh, wg, nd, nh, op)
            return
        if bn > 1:
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(a * bn, bn), pl.ds(b * bd, bd + 2),
                         pl.ds(c * bh, bh + 2)],
                buf, sem.at[sl])
        else:
            cp = pltpu.make_async_copy(
                x_hbm.at[a, pl.ds(b * bd, bd + 2), pl.ds(c * bh, bh + 2)],
                buf, sem.at[sl])
        cp.start() if op == "start" else cp.wait()

    k = (ni * nd + di) * nh + hi
    total = pl.num_programs(0) * nd * nh

    @pl.when(k == 0)
    def _():
        dma(x_s0, 0, ni, di, hi, "start")
        acc_m[...] = jnp.zeros_like(acc_m)
        if sideshare:
            acc_s[...] = jnp.zeros_like(acc_s)
        else:
            acc_l[...] = jnp.zeros_like(acc_l)
            acc_r[...] = jnp.zeros_like(acc_r)

    nk = k + 1
    n_ni = nk // (nd * nh)
    rem = nk % (nd * nh)
    n_di = rem // nh
    n_hi = rem % nh

    @pl.when((nk < total) & (nk % 2 == 0))
    def _():
        dma(x_s0, 0, n_ni, n_di, n_hi, "start")

    @pl.when((nk < total) & (nk % 2 == 1))
    def _():
        dma(x_s1, 1, n_ni, n_di, n_hi, "start")

    gy = gy_ref[...].reshape(m, gco) if bn > 1 else gy_ref[0].reshape(m, gco)
    if corr:
        # fold the stats cotangents into gy tile-wise (the blocks carry no
        # halo, so no masking is needed here)
        ypv = ypq_ref[0].reshape(m, gco).astype(jnp.float32)
        gy = (gy.astype(jnp.float32) + gs_ref[0, 0][None, :]
              + 2.0 * ypv * gs_ref[0, 1][None, :]).astype(gy_ref.dtype)
    nb = (slice(None),) if bn > 1 else ()

    def accumulate(x_buf):
        if flat:
            if pre:
                x_s = _tile_norm_flat(x_buf[...], pre_ref, di, hi, bd, bh,
                                      wg, neg_slope)
            else:
                x_s = x_buf[...]
            p2 = (bh + 2) * wg
            scat[:, :, 0:side_k] = (
                x_s[:, wg - 1:wg - 1 + p2, gci - side_k:gci]
                * mask_ref[:, 0:side_k])
            scat[:, :, side_k:] = (
                x_s[:, wg + 1:wg + 1 + p2, 0:side_k]
                * mask_ref[:, side_k:])
            for dz in range(3):
                for dy in range(3):
                    mid = x_s[dz:dz + bd, (dy + 1) * wg:
                              (dy + 1 + bh) * wg].reshape(m, gci)
                    acc_m[dz, dy] += lax.dot_general(
                        mid, gy, dn, preferred_element_type=jnp.float32)
                    side = scat[dz:dz + bd,
                                dy * wg:(dy + bh) * wg].reshape(
                        m, 2 * side_k)
                    acc_s[dz, dy] += lax.dot_general(
                        side, gy, dn, preferred_element_type=jnp.float32)
            return
        if pre:
            x_s = _tile_norm(x_buf, pre_ref, di, hi, bd, bh, wg, neg_slope)
        else:
            x_s = x_buf[...]
        if cat:
            # all 9 dB mid taps in ONE GEMM: (m, 9*gci)^T @ (m, gco)
            for dz in range(3):
                for dy in range(3):
                    rows = x_s[dz:dz + bd, dy:dy + bh]
                    idx = dz * 3 + dy
                    xcat[:, idx * gci:(idx + 1) * gci] = (
                        rows[:, :, 1:wg + 1, :].reshape(m, gci))
            acc_m[...] += lax.dot_general(
                xcat[...], gy, dn, preferred_element_type=jnp.float32)
            for dz in range(3):
                for dy in range(3):
                    rows = x_s[dz:dz + bd, dy:dy + bh]
                    left = rows[:, :, 0:wg, gci - side_k:gci].reshape(
                        m, side_k)
                    acc_l[dz, dy] += lax.dot_general(
                        left, gy, dn, preferred_element_type=jnp.float32)
                    right = rows[:, :, 2:wg + 2, 0:side_k].reshape(m, side_k)
                    acc_r[dz, dy] += lax.dot_general(
                        right, gy, dn, preferred_element_type=jnp.float32)
            return
        if sideshare:
            scat[:, :, :, 0:side_k] = x_s[:, :, 0:wg, gci - side_k:gci]
            scat[:, :, :, side_k:] = x_s[:, :, 2:wg + 2, 0:side_k]
        for dz in range(3):
            for dy in range(3):
                rows = x_s[nb + (slice(dz, dz + bd), slice(dy, dy + bh))]
                mid = rows[nb + (slice(None), slice(None),
                                 slice(1, wg + 1))].reshape(m, gci)
                acc_m[dz, dy] += lax.dot_general(
                    mid, gy, dn, preferred_element_type=jnp.float32)
                if sideshare:
                    side = scat[dz:dz + bd, dy:dy + bh].reshape(
                        m, 2 * side_k)
                    acc_s[dz, dy] += lax.dot_general(
                        side, gy, dn, preferred_element_type=jnp.float32)
                    continue
                left = rows[nb + (slice(None), slice(None), slice(0, wg),
                                  slice(gci - side_k, gci))].reshape(
                    m, side_k)
                right = rows[nb + (slice(None), slice(None),
                                   slice(2, wg + 2),
                                   slice(0, side_k))].reshape(m, side_k)
                acc_l[dz, dy] += lax.dot_general(
                    left, gy, dn, preferred_element_type=jnp.float32)
                acc_r[dz, dy] += lax.dot_general(
                    right, gy, dn, preferred_element_type=jnp.float32)

    @pl.when(k % 2 == 0)
    def _():
        dma(x_s0, 0, ni, di, hi, "wait")
        if flat:
            _halo_zero(x_s0, di, hi, bd, bh, wg, nd, nh)
        accumulate(x_s0)

    @pl.when(k % 2 == 1)
    def _():
        dma(x_s1, 1, ni, di, hi, "wait")
        if flat:
            _halo_zero(x_s1, di, hi, bd, bh, wg, nd, nh)
        accumulate(x_s1)


def _dw_from_banded(dbm, dbl, dbr, g, ci, co, side_k, dtype):
    """Recover dW (3,3,3,ci,co) from the banded gradients by summing the
    band positions that replicate each tap (the linear transpose of
    build_banded_weights)."""
    dw = jnp.zeros((3, 3, 3, ci, co), jnp.float32)
    dbm = dbm.reshape(3, 3, g, ci, g, co)
    for s in range(g):
        for xofs in range(g):
            t = xofs - s + 1
            if 0 <= t < 3:
                dw = dw.at[:, :, t].add(dbm[:, :, xofs, :, s])
    dbl = dbl.reshape(3, 3, side_k, g, co)
    dbr = dbr.reshape(3, 3, side_k, g, co)
    # left: rows are the LAST ci of the side slice -> tap 0, offset s=0
    dw = dw.at[:, :, 0].add(dbl[:, :, side_k - ci:, 0])
    # right: rows are the FIRST ci -> tap 2, offset s=g-1
    dw = dw.at[:, :, 2].add(dbr[:, :, :ci, g - 1])
    return dw.astype(dtype)


def conv3d_dw_packed(xp: jax.Array, gyp: jax.Array, g: int,
                     w_shape, pre_vec=None,
                     neg_slope: float = 1e-2, corr=None) -> jax.Array:
    """Weight gradient for the banded conv, both operands packed.
    ``pre_vec``: apply the fused forward's normalize+act to x in-kernel.
    ``corr``: optional (yp, gs) pair — fold the stats cotangents into gyp
    tile-wise (``gyp + gs[0] + 2*yp*gs[1]``) instead of materializing the
    corrected cotangent in HBM."""
    n, d, h, wg, gci = xp.shape
    ci = gci // g
    co = w_shape[-1]
    gco = g * co
    cat = _cat_env()
    sub = 16 if xp.dtype == jnp.bfloat16 else 8
    wga = ((wg + 2 + sub - 1) // sub) * sub
    flat = _flat_env() and g >= 2 and not cat and wg % sub == 0
    if flat:
        bd, bh = _pick_tile_flat(d, h, wg, max(gci, gco),
                                 xp.dtype.itemsize)
    else:
        bd, bh = _pick_tile(d, h, wga, max(gci, gco), xp.dtype.itemsize,
                            cat_row_bytes=(wg * 9 * gci * xp.dtype.itemsize
                                           if cat else 0))
    # g=1 deep stages with whole-plane tiles: batch samples to keep the
    # contraction's spatial (K) dim MXU-pipeline-sized (see _pick_bn);
    # the fused pre-op composes (per-sample scale/shift rows)
    if g == 1 and corr is None and not cat and (bd, bh) == (d, h):
        bn = _pick_bn(n, d, h, wga, gci, xp.dtype.itemsize)
    else:
        bn = 1
    side_k = gci if g == 1 else (ci if gci <= 128 else 128)
    sideshare = flat or (_sideshare_env() and g >= 2 and not cat
                         and bn == 1)

    if flat:
        xpp = xp.reshape(n, d, h * wg, gci)
    else:
        xpp = jnp.pad(xp,
                      ((0, 0), (1, 1), (1, 1), (1, wga - (wg + 1)), (0, 0)))

    kernel = functools.partial(_dw_kernel, g=g, ci=ci, co=co, bd=bd, bh=bh,
                               side_k=side_k, pre=pre_vec is not None,
                               neg_slope=neg_slope, cat=cat, bn=bn,
                               sideshare=sideshare, flat=flat,
                               corr=corr is not None)
    out_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, di, hi: (0,) * len(shape),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((bn, bd, bh, wg, gco),
                     lambda ni, di, hi: (ni, di, hi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xpp, gyp]
    if corr is not None:
        ypq, gsq = corr
        assert bn == 1
        in_specs.append(pl.BlockSpec((1, bd, bh, wg, gco),
                                     lambda ni, di, hi: (ni, di, hi, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(ypq)
        in_specs.append(pl.BlockSpec((1, 2, gco),
                                     lambda ni, di, hi: (ni, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(gsq)
    if flat:
        m2 = _side_mask(bh, wg, side_k, xp.dtype)
        in_specs.append(pl.BlockSpec(
            m2.shape, lambda ni, di, hi: (0, 0), memory_space=pltpu.VMEM))
        operands.append(m2)
    if pre_vec is not None:
        in_specs.append(pl.BlockSpec((bn, 2, gci),
                                     lambda ni, di, hi: (ni, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(pre_vec)
    dbm_shape = (9 * gci, gco) if cat else (3, 3, gci, gco)
    if flat:
        buf_shape = (bd + 2, (bh + 4) * wg, gci)
    else:
        buf_shape = ((bn, bd + 2, bh + 2, wga, gci) if bn > 1
                     else (bd + 2, bh + 2, wga, gci))
    scratch = [
        pltpu.VMEM(buf_shape, xp.dtype),
        pltpu.VMEM(buf_shape, xp.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if cat:
        scratch.append(pltpu.VMEM((bd * bh * wg, 9 * gci), xp.dtype))
    if sideshare:
        scratch.append(
            pltpu.VMEM((bd + 2, (bh + 2) * wg, 2 * side_k), xp.dtype)
            if flat else
            pltpu.VMEM((bd + 2, bh + 2, wg, 2 * side_k), xp.dtype))
        out_specs = (out_spec(dbm_shape), out_spec((3, 3, 2 * side_k, gco)))
        out_shape = (jax.ShapeDtypeStruct(dbm_shape, jnp.float32),
                     jax.ShapeDtypeStruct((3, 3, 2 * side_k, gco),
                                          jnp.float32))
    else:
        out_specs = (out_spec(dbm_shape),
                     out_spec((3, 3, side_k, gco)),
                     out_spec((3, 3, side_k, gco)))
        out_shape = (jax.ShapeDtypeStruct(dbm_shape, jnp.float32),
                     jax.ShapeDtypeStruct((3, 3, side_k, gco), jnp.float32),
                     jax.ShapeDtypeStruct((3, 3, side_k, gco), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(n // bn, d // bd, h // bh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_VMEM_LIMIT,
    )(*operands)
    if sideshare:
        dbm, dbs = outs
        dbl, dbr = dbs[:, :, :side_k], dbs[:, :, side_k:]
    else:
        dbm, dbl, dbr = outs
    if cat:
        dbm = dbm.reshape(3, 3, gci, gco)
    return _dw_from_banded(dbm, dbl, dbr, g, ci, co, side_k, jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_packed(xp: jax.Array, w: jax.Array, g: int) -> jax.Array:
    """Packed-io conv for ci == co (so dx shares the packing factor)."""
    return _conv3d_banded_packed(xp, w, g)


def _fwd_packed(xp, w, g):
    return conv3d_packed(xp, w, g), (xp, w)


def _bwd_packed(g, res, gyp):
    xp, w = res
    gyp = gyp.astype(xp.dtype)
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dxp = _conv3d_banded_packed(gyp, w_flip, g)
    dw = conv3d_dw_packed(xp, gyp, g, w.shape).astype(w.dtype)
    return dxp, dw


conv3d_packed.defvjp(_fwd_packed, _bwd_packed)


# ----------------------------------------------------------------------
# fused conv + instance-norm ops (VERDICT r2 perf item 1a)
#
# The building blocks for running a whole residual stack with ZERO
# standalone norm passes over HBM:
#   conv3d_packed_stats : conv that also emits per-(sample, lane) sum/sumsq
#                         of its output (the IN statistics, free in-kernel);
#   conv3d_packed_ns    : conv whose input is normalized + LeakyReLU'd
#                         tile-wise inside the kernel (the PREVIOUS conv's
#                         norm applied as this conv's pre-op) — and which
#                         also emits its own output stats.
# The tiny (N, C) mean/inv math between convs stays in XLA
# (ops/instance_norm.py stats_to_scale_shift) so gradients flow through the
# statistics chain automatically; the custom VJPs below handle the tensor-
# level terms, saving (xp, w, scale, shift, yp) as residuals — under block
# remat these are recomputed, not stored.
# ----------------------------------------------------------------------


def _stats_grad_correction(gy, gs, yp):
    """d(sum)/dy = 1, d(sumsq)/dy = 2y: fold the stats cotangents into the
    output cotangent (one fused XLA elementwise pass)."""
    f = jnp.float32
    return (gy.astype(f)
            + gs[:, 0][:, None, None, None, :]
            + 2.0 * yp.astype(f) * gs[:, 1][:, None, None, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_packed_stats(xp: jax.Array, w: jax.Array, g: int):
    """Packed banded conv returning ``(yp, stats)`` with stats =
    (N, 2, g*co) fp32 [sum; sumsq] over all spatial positions per lane."""
    return _conv3d_banded_packed_f(xp, w, g, emit_stats=True)


def _stats_fwd(xp, w, g):
    yp, st = conv3d_packed_stats(xp, w, g)
    # name the residual-carried outputs: under the save-convs remat policy
    # (models/blocks.py _remat_wrap) they are SAVED, so block-level remat
    # does not re-run the conv in the backward pass to regenerate them
    yp = checkpoint_name(yp, "mt3d_conv")
    st = checkpoint_name(st, "mt3d_conv")
    return (yp, st), (xp, w, yp)


def _stats_bwd(g, res, cts):
    xp, w, yp = res
    gy, gs = cts
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    if _flat_eligible(xp.shape[3], g, xp.dtype):
        # corrected cotangent built tile-wise inside both kernels — no
        # HBM materialization, no standalone correction pass
        gyb16 = gy.astype(xp.dtype)
        dxp = _conv3d_dx_fused_f(gyb16, yp, gs, w_flip, g)
        dw = conv3d_dw_packed(xp, gyb16, g, w.shape,
                              corr=(yp, gs)).astype(w.dtype)
        return dxp, dw
    gyb = _stats_grad_correction(gy, gs, yp).astype(xp.dtype)
    dxp = _conv3d_banded_packed(gyb, w_flip, g)
    dw = conv3d_dw_packed(xp, gyb, g, w.shape).astype(w.dtype)
    return dxp, dw


conv3d_packed_stats.defvjp(_stats_fwd, _stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3d_packed_ns(xp: jax.Array, w: jax.Array, scale: jax.Array,
                     shift: jax.Array, g: int, neg_slope: float = 1e-2):
    """``conv(leaky(xp * scale - shift), w)`` with the normalize+act applied
    tile-wise INSIDE the kernel (replacing a standalone norm pass over HBM),
    returning ``(yp, stats)``. scale/shift: (N, g*ci) fp32 per-lane vectors
    (a channel-tiled instance-norm inv / mean*inv)."""
    pre = jnp.stack([scale, shift], axis=1)  # (N, 2, g*ci)
    return _conv3d_banded_packed_f(xp, w, g, pre_vec=pre, emit_stats=True,
                                   neg_slope=neg_slope)


def _ns_fwd(xp, w, scale, shift, g, neg_slope):
    yp, st = conv3d_packed_ns(xp, w, scale, shift, g, neg_slope)
    yp = checkpoint_name(yp, "mt3d_conv")   # see _stats_fwd
    st = checkpoint_name(st, "mt3d_conv")
    return (yp, st), (xp, w, scale, shift, yp)


def _ns_bwd(g, neg_slope, res, cts):
    xp, w, scale, shift, yp = res
    gy, gs = cts
    f = jnp.float32
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    if _flat_eligible(xp.shape[3], g, xp.dtype):
        # ONE kernel: correction pre-op + transpose conv + pre-op backward
        # epilogue (dxp plus the dscale/dshift reductions as stats outputs)
        gyb16 = gy.astype(xp.dtype)
        pre = jnp.stack([scale, shift], axis=1)
        dxp, dst = _conv3d_dx_fused_f(gyb16, yp, gs, w_flip, g, xq=xp,
                                      pre_vec=pre, neg_slope=neg_slope)
        dscale = dst[:, 0]
        dshift = -dst[:, 1]
        dw = conv3d_dw_packed(xp, gyb16, g, w.shape, pre_vec=pre,
                              neg_slope=neg_slope,
                              corr=(yp, gs)).astype(w.dtype)
        return dxp, dw, dscale, dshift
    gyb = _stats_grad_correction(gy, gs, yp).astype(xp.dtype)
    # dx through the conv, wrt the NORMALIZED input
    gxn = _conv3d_banded_packed(gyb, w_flip, g)
    # through the pre-op: u = x*a - b, xn = leaky(u)
    scb = scale[:, None, None, None, :]
    shb = shift[:, None, None, None, :]
    xf = xp.astype(f)
    u = xf * scb - shb
    du = gxn.astype(f) * jnp.where(u >= 0, 1.0, neg_slope)
    dxp = (du * scb).astype(xp.dtype)
    dscale = jnp.sum(du * xf, axis=(1, 2, 3))
    dshift = -jnp.sum(du, axis=(1, 2, 3))
    # dW contracts the ACTUAL (normalized) input — recomputed in-kernel
    pre = jnp.stack([scale, shift], axis=1)
    dw = conv3d_dw_packed(xp, gyb, g, w.shape, pre_vec=pre,
                          neg_slope=neg_slope).astype(w.dtype)
    return dxp, dw, dscale, dshift


conv3d_packed_ns.defvjp(_ns_fwd, _ns_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3d_packed_dual_stats(x1: jax.Array, x2: jax.Array, w: jax.Array,
                             g: int):
    """Split-weight pair ``conv(x1, w[:ci]) + conv(x2, w[ci:])`` returning
    ``(y, stats)`` — the decoder's skip-concat conv. The add AND the summed
    tensor's instance-norm statistics run inside the second half's kernel,
    replacing a standalone XLA add pass + stats reduction pass (the halves'
    sumsq values cannot be combined after the fact)."""
    ci = x1.shape[-1] // g
    y1 = _conv3d_banded_packed(x1, w[..., :ci, :], g)
    return _conv3d_banded_packed_f(x2, w[..., ci:, :], g, emit_stats=True,
                                   add_to=y1)


def _dual_fwd(x1, x2, w, g):
    y, st = conv3d_packed_dual_stats(x1, x2, w, g)
    y = checkpoint_name(y, "mt3d_conv")     # see _stats_fwd
    st = checkpoint_name(st, "mt3d_conv")
    return (y, st), (x1, x2, w, y)


def _dual_bwd(g, res, cts):
    x1, x2, w, y = res
    gy, gs = cts
    ci = x1.shape[-1] // g
    w1, w2 = w[..., :ci, :], w[..., ci:, :]
    f1 = jnp.flip(w1, (0, 1, 2)).transpose(0, 1, 2, 4, 3)
    f2 = jnp.flip(w2, (0, 1, 2)).transpose(0, 1, 2, 4, 3)
    if _flat_eligible(x1.shape[3], g, x1.dtype):
        gyb16 = gy.astype(x1.dtype)
        dx1 = _conv3d_dx_fused_f(gyb16, y, gs, f1, g)
        dx2 = _conv3d_dx_fused_f(gyb16, y, gs, f2, g)
        dw1 = conv3d_dw_packed(x1, gyb16, g, w1.shape, corr=(y, gs))
        dw2 = conv3d_dw_packed(x2, gyb16, g, w2.shape, corr=(y, gs))
        dw = jnp.concatenate([dw1, dw2], axis=-2).astype(w.dtype)
        return dx1, dx2, dw
    gyb = _stats_grad_correction(gy, gs, y).astype(x1.dtype)
    dx1 = _conv3d_banded_packed(gyb, f1, g)
    dx2 = _conv3d_banded_packed(gyb, f2, g)
    dw1 = conv3d_dw_packed(x1, gyb, g, w1.shape)
    dw2 = conv3d_dw_packed(x2, gyb, g, w2.shape)
    dw = jnp.concatenate([dw1, dw2], axis=-2).astype(w.dtype)
    return dx1, dx2, dw


conv3d_packed_dual_stats.defvjp(_dual_fwd, _dual_bwd)


def _ref_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


# ----------------------------------------------------------------------
# stride-2 banded kernels: the encoder's downsampling convs
# ----------------------------------------------------------------------
# For stride 2 / kernel 3 the packing factors halve across the op:
# g_in = 2 * g_out, and with the channel-doubling schedule of the ResEnc
# encoder (32->64 at 128^3, 64->128 at 64^3 — reference resblocks.py:15-132
# with the stride plan of build_network_from_config.py:47-53) BOTH the packed
# input (g_in*ci) and packed output (g_out*co) fill exactly 128 lanes.
# Output offset s reads input offsets {2s-1, 2s, 2s+1}: only a LEFT halo
# exists (the last position of the previous group feeds s=0 at tap 0); the
# right edge never crosses the group boundary.
# The D/H strides use a parity-split scratch: the padded input is viewed as
# (..., (D+2)/2, 2, (H+2)/2, 2, ...) so every tap (dz, dy) maps to a
# CONTIGUOUS leading-dim slice (d0:d0+bd, parity) — no strided VMEM access.


def s2_supported(x_shape, w_shape) -> bool:
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    kd, kh, kw, ci, co = w_shape
    if (kd, kh, kw) != (3, 3, 3) or 128 % co:
        return False
    g_out = 128 // co
    g_in = 2 * g_out
    if g_in * ci != 128:
        return False
    n, d, h, w, c = x_shape
    return (c == ci and d % 2 == 0 and h % 2 == 0 and w % g_in == 0
            and w // g_in >= 1 and d >= 4 and h >= 4)


def build_banded_weights_s2(w: jax.Array, g_out: int):
    """(3,3,3,ci,co) -> B_mid (3,3,g_in*ci,g_out*co), B_left (3,3,ci,g_out*co)
    with B_mid[(xofs, ci), (s, co)] = W[.., xofs - 2s + 1] (XLA ops only)."""
    kd, kh, kw, ci, co = w.shape
    g_in = 2 * g_out
    zeros = jnp.zeros_like(w[:, :, 0])
    mid_cols = []
    for s in range(g_out):
        taps = []
        for xofs in range(g_in):
            t = xofs - 2 * s + 1
            taps.append(w[:, :, t] if 0 <= t < kw else zeros)
        mid_cols.append(jnp.stack(taps, axis=2))   # (3,3,g_in,ci,co)
    b_mid = jnp.stack(mid_cols, axis=4)            # (3,3,g_in,ci,g_out,co)
    b_mid = b_mid.reshape(kd, kh, g_in * ci, g_out * co)
    left_cols = [w[:, :, 0] if s == 0 else zeros for s in range(g_out)]
    b_left = jnp.stack(left_cols, axis=3).reshape(kd, kh, ci, g_out * co)
    return b_mid, b_left


# tap -> (leading-group offset, parity) in the parity-split scratch:
# padded input row for output do at tap dz is 2*do + dz = 2*(do + (dz==2)) + dz%2
_S2_SEL = {0: (0, 0), 1: (0, 1), 2: (1, 0)}


def _pick_tile_s2(od: int, oh: int, wga: int, lanes: int, itemsize: int,
                  budget_bytes: int = (5 << 20) // 2) -> Tuple[int, int]:
    row_bytes = wga * lanes * itemsize

    def fits(bd, bh):
        return (bd + 1) * 2 * (bh + 1) * 2 * row_bytes <= budget_bytes

    best = (1, 1)
    for bd in [x for x in (16, 12, 8, 6, 4, 2, 1) if od % x == 0]:
        for bh in [x for x in (16, 12, 8, 6, 4, 2, 1) if oh % x == 0]:
            if fits(bd, bh) and bd * bh > best[0] * best[1]:
                best = (bd, bh)
    return best


def _s2_fwd_kernel(x_hbm, bm_ref, bl_ref, y_ref, x_s0, x_s1, sem, *,
                   ci: int, bd: int, bh: int):
    ni = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    gci = x_s0.shape[-1]
    gco = y_ref.shape[4]
    wg = y_ref.shape[3]
    m = bd * bh * wg
    dn = (((1,), (0,)), ((), ()))

    def tile_dma(buf, sl, a, b, c):
        return pltpu.make_async_copy(
            x_hbm.at[a, pl.ds(b * bd, bd + 1), slice(None),
                     pl.ds(c * bh, bh + 1)],
            buf, sem.at[sl])

    k = (ni * nd + di) * nh + hi
    total = pl.num_programs(0) * nd * nh

    @pl.when(k == 0)
    def _():
        tile_dma(x_s0, 0, ni, di, hi).start()

    nk = k + 1
    n_ni = nk // (nd * nh)
    rem = nk % (nd * nh)
    n_di = rem // nh
    n_hi = rem % nh

    @pl.when((nk < total) & (nk % 2 == 0))
    def _():
        tile_dma(x_s0, 0, n_ni, n_di, n_hi).start()

    @pl.when((nk < total) & (nk % 2 == 1))
    def _():
        tile_dma(x_s1, 1, n_ni, n_di, n_hi).start()

    def compute(x_s):
        acc = jnp.zeros((m, gco), jnp.float32)
        for dz in range(3):
            d0, pd = _S2_SEL[dz]
            for dy in range(3):
                h0, ph = _S2_SEL[dy]
                rows = x_s[d0:d0 + bd, pd, h0:h0 + bh, ph]
                mid = rows[:, :, 1:wg + 1, :].reshape(m, gci)
                acc += lax.dot_general(mid, bm_ref[dz, dy], dn,
                                       preferred_element_type=jnp.float32)
                left = rows[:, :, 0:wg, gci - ci:gci].reshape(m, ci)
                acc += lax.dot_general(left, bl_ref[dz, dy], dn,
                                       preferred_element_type=jnp.float32)
        y_ref[0] = acc.reshape(bd, bh, wg, gco).astype(y_ref.dtype)

    @pl.when(k % 2 == 0)
    def _():
        tile_dma(x_s0, 0, ni, di, hi).wait()
        compute(x_s0)

    @pl.when(k % 2 == 1)
    def _():
        tile_dma(x_s1, 1, ni, di, hi).wait()
        compute(x_s1)


def _s2_prepare_input(xp: jax.Array):
    """Pad (halo 1 in D/H, one packed group left in x, alignment tail) and
    reshape to the parity-split view (N, (D+2)/2, 2, (H+2)/2, 2, wga, gci)."""
    n, d, h, wg, gci = xp.shape
    sub = 16 if xp.dtype == jnp.bfloat16 else 8
    wga = ((wg + 1 + sub - 1) // sub) * sub
    xpp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (1, wga - (wg + 1)), (0, 0)))
    xv = xpp.reshape(n, (d + 2) // 2, 2, (h + 2) // 2, 2, wga, gci)
    return xv, wga


def _conv3d_s2_packed_impl(xp: jax.Array, w: jax.Array, g_out: int) -> jax.Array:
    n, d, h, wg, gci = xp.shape
    g_in = 2 * g_out
    ci = gci // g_in
    co = w.shape[-1]
    gco = g_out * co
    od, oh = d // 2, h // 2
    xv, wga = _s2_prepare_input(xp)
    bd, bh = _pick_tile_s2(od, oh, wga, gci, xp.dtype.itemsize)
    b_mid, b_left = build_banded_weights_s2(w.astype(xp.dtype), g_out)

    kernel = functools.partial(_s2_fwd_kernel, ci=ci, bd=bd, bh=bh)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, di, hi: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, od // bd, oh // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            const_spec((3, 3, gci, gco)),
            const_spec(b_left.shape),
        ],
        out_specs=pl.BlockSpec((1, bd, bh, wg, gco),
                               lambda ni, di, hi: (ni, di, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, od, oh, wg, gco), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((bd + 1, 2, bh + 1, 2, wga, gci), xp.dtype),
            pltpu.VMEM((bd + 1, 2, bh + 1, 2, wga, gci), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xv, b_mid, b_left)


def _s2_dw_kernel(x_hbm, gy_ref, dbm_ref, dbl_ref,
                  x_s0, x_s1, sem, acc_m, acc_l, *,
                  ci: int, bd: int, bh: int):
    ni = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    gci = x_s0.shape[-1]
    gco = gy_ref.shape[4]
    wg = gy_ref.shape[3]
    m = bd * bh * wg
    dn = (((0,), (0,)), ((), ()))   # contract over spatial rows

    def tile_dma(buf, sl, a, b, c):
        return pltpu.make_async_copy(
            x_hbm.at[a, pl.ds(b * bd, bd + 1), slice(None),
                     pl.ds(c * bh, bh + 1)],
            buf, sem.at[sl])

    k = (ni * nd + di) * nh + hi
    total = pl.num_programs(0) * nd * nh

    @pl.when(k == 0)
    def _():
        tile_dma(x_s0, 0, ni, di, hi).start()
        acc_m[...] = jnp.zeros_like(acc_m)
        acc_l[...] = jnp.zeros_like(acc_l)

    nk = k + 1
    n_ni = nk // (nd * nh)
    rem = nk % (nd * nh)
    n_di = rem // nh
    n_hi = rem % nh

    @pl.when((nk < total) & (nk % 2 == 0))
    def _():
        tile_dma(x_s0, 0, n_ni, n_di, n_hi).start()

    @pl.when((nk < total) & (nk % 2 == 1))
    def _():
        tile_dma(x_s1, 1, n_ni, n_di, n_hi).start()

    gy = gy_ref[0].reshape(m, gco)

    def accumulate(x_s):
        for dz in range(3):
            d0, pd = _S2_SEL[dz]
            for dy in range(3):
                h0, ph = _S2_SEL[dy]
                rows = x_s[d0:d0 + bd, pd, h0:h0 + bh, ph]
                mid = rows[:, :, 1:wg + 1, :].reshape(m, gci)
                acc_m[dz, dy] += lax.dot_general(
                    mid, gy, dn, preferred_element_type=jnp.float32)
                left = rows[:, :, 0:wg, gci - ci:gci].reshape(m, ci)
                acc_l[dz, dy] += lax.dot_general(
                    left, gy, dn, preferred_element_type=jnp.float32)

    @pl.when(k % 2 == 0)
    def _():
        tile_dma(x_s0, 0, ni, di, hi).wait()
        accumulate(x_s0)

    @pl.when(k % 2 == 1)
    def _():
        tile_dma(x_s1, 1, ni, di, hi).wait()
        accumulate(x_s1)

    @pl.when(k == total - 1)
    def _():
        dbm_ref[...] = acc_m[...]
        dbl_ref[...] = acc_l[...]


def _conv3d_s2_dw_impl(xp: jax.Array, gyp: jax.Array, g_out: int,
                       w_shape) -> jax.Array:
    n, d, h, wg, gci = xp.shape
    g_in = 2 * g_out
    ci = gci // g_in
    co = w_shape[-1]
    gco = g_out * co
    od, oh = d // 2, h // 2
    xv, wga = _s2_prepare_input(xp)
    bd, bh = _pick_tile_s2(od, oh, wga, gci, xp.dtype.itemsize)

    kernel = functools.partial(_s2_dw_kernel, ci=ci, bd=bd, bh=bh)
    out_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, di, hi: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    dbm, dbl = pl.pallas_call(
        kernel,
        grid=(n, od // bd, oh // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, bd, bh, wg, gco),
                         lambda ni, di, hi: (ni, di, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec((3, 3, gci, gco)), out_spec((3, 3, ci, gco))),
        out_shape=(jax.ShapeDtypeStruct((3, 3, gci, gco), jnp.float32),
                   jax.ShapeDtypeStruct((3, 3, ci, gco), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((bd + 1, 2, bh + 1, 2, wga, gci), xp.dtype),
            pltpu.VMEM((bd + 1, 2, bh + 1, 2, wga, gci), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((3, 3, gci, gco), jnp.float32),
            pltpu.VMEM((3, 3, ci, gco), jnp.float32),
        ],
    )(xv, gyp)

    # recover dW: sum the band positions replicating each tap (the linear
    # transpose of build_banded_weights_s2)
    dw = jnp.zeros((3, 3, 3, ci, co), jnp.float32)
    dbm = dbm.reshape(3, 3, g_in, ci, g_out, co)
    for s in range(g_out):
        for xofs in range(g_in):
            t = xofs - 2 * s + 1
            if 0 <= t < 3:
                dw = dw.at[:, :, t].add(dbm[:, :, xofs, :, s])
    dbl = dbl.reshape(3, 3, ci, g_out, co)
    dw = dw.at[:, :, 0].add(dbl[:, :, :, 0])
    return dw


# dx of the stride-2 conv: a fractionally-strided (transposed) banded kernel.
# dx row r receives gy rows by parity: r=2q   -> gy[q]   via tap dz=1
#                                      r=2q+1 -> gy[q+1] via dz=0, gy[q] via dz=2
# and in x only a RIGHT gy halo exists (transpose of the forward's left).
_S2_DX_TAPS = {0: ((1, 0),), 1: ((0, 1), (2, 0))}


def _s2_dx_kernel(gy_hbm, bmt_ref, brt_ref, dx_ref, g_s0, g_s1, sem, *,
                  co: int, bd: int, bh: int):
    ni = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    nd = pl.num_programs(1)
    nh = pl.num_programs(2)
    gco = g_s0.shape[-1]
    gci = dx_ref.shape[6]
    wg = dx_ref.shape[5]
    m = bd * bh * wg
    dn = (((1,), (0,)), ((), ()))

    def tile_dma(buf, sl, a, b, c):
        return pltpu.make_async_copy(
            gy_hbm.at[a, pl.ds(b * bd, bd + 1), pl.ds(c * bh, bh + 1)],
            buf, sem.at[sl])

    k = (ni * nd + di) * nh + hi
    total = pl.num_programs(0) * nd * nh

    @pl.when(k == 0)
    def _():
        tile_dma(g_s0, 0, ni, di, hi).start()

    nk = k + 1
    n_ni = nk // (nd * nh)
    rem = nk % (nd * nh)
    n_di = rem // nh
    n_hi = rem % nh

    @pl.when((nk < total) & (nk % 2 == 0))
    def _():
        tile_dma(g_s0, 0, n_ni, n_di, n_hi).start()

    @pl.when((nk < total) & (nk % 2 == 1))
    def _():
        tile_dma(g_s1, 1, n_ni, n_di, n_hi).start()

    def compute(g_s):
        for pd in range(2):
            for ph in range(2):
                acc = jnp.zeros((m, gci), jnp.float32)
                for dz, offd in _S2_DX_TAPS[pd]:
                    for dy, offh in _S2_DX_TAPS[ph]:
                        rows = g_s[offd:offd + bd, offh:offh + bh]
                        mid = rows[:, :, 0:wg, :].reshape(m, gco)
                        acc += lax.dot_general(
                            mid, bmt_ref[dz, dy], dn,
                            preferred_element_type=jnp.float32)
                        right = rows[:, :, 1:wg + 1, 0:co].reshape(m, co)
                        acc += lax.dot_general(
                            right, brt_ref[dz, dy], dn,
                            preferred_element_type=jnp.float32)
                dx_ref[0, :, pd, :, ph] = acc.reshape(
                    bd, bh, wg, gci).astype(dx_ref.dtype)

    @pl.when(k % 2 == 0)
    def _():
        tile_dma(g_s0, 0, ni, di, hi).wait()
        compute(g_s0)

    @pl.when(k % 2 == 1)
    def _():
        tile_dma(g_s1, 1, ni, di, hi).wait()
        compute(g_s1)


def _conv3d_s2_dx_impl(gyp: jax.Array, w: jax.Array, g_out: int) -> jax.Array:
    """gyp (N, OD, OH, wg, g_out*co) -> dxp (N, 2*OD, 2*OH, wg, g_in*ci)."""
    n, od, oh, wg, gco = gyp.shape
    co = w.shape[-1]
    ci = w.shape[-2]
    g_in = 2 * g_out
    gci = g_in * ci
    sub = 16 if gyp.dtype == jnp.bfloat16 else 8
    wga = ((wg + 1 + sub - 1) // sub) * sub
    # halo at the END of D/H (dz=0 reads gy[q+1]) and RIGHT of x
    gypp = jnp.pad(gyp, ((0, 0), (0, 1), (0, 1), (0, wga - wg), (0, 0)))
    bd, bh = _pick_tile_s2(od, oh, wga, gco, gyp.dtype.itemsize)

    b_mid, b_left = build_banded_weights_s2(w.astype(gyp.dtype), g_out)
    bmt = jnp.swapaxes(b_mid, 2, 3)                       # (3,3,gco,gci)
    # right contribution: gy s=0 of group g+1 -> dx xofs = g_in-1 via tap 0
    brt = jnp.zeros((3, 3, co, g_in, ci), gyp.dtype)
    brt = brt.at[:, :, :, g_in - 1, :].set(
        jnp.swapaxes(w[:, :, 0], 2, 3).astype(gyp.dtype))
    brt = brt.reshape(3, 3, co, gci)

    kernel = functools.partial(_s2_dx_kernel, co=co, bd=bd, bh=bh)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda ni, di, hi: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    dxv = pl.pallas_call(
        kernel,
        grid=(n, od // bd, oh // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            const_spec((3, 3, gco, gci)),
            const_spec((3, 3, co, gci)),
        ],
        out_specs=pl.BlockSpec(
            (1, bd, 2, bh, 2, wg, gci),
            lambda ni, di, hi: (ni, di, 0, hi, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, od, 2, oh, 2, wg, gci),
                                       gyp.dtype),
        scratch_shapes=[
            pltpu.VMEM((bd + 1, bh + 1, wga, gco), gyp.dtype),
            pltpu.VMEM((bd + 1, bh + 1, wga, gco), gyp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(gypp, bmt, brt)
    return dxv.reshape(n, 2 * od, 2 * oh, wg, gci)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_s2_packed(xp: jax.Array, w: jax.Array, g_out: int) -> jax.Array:
    """Stride-2 3x3x3 banded conv on packed io:
    (N, D, H, W/g_in, g_in*ci) -> (N, D/2, H/2, W/g_in, g_out*co)."""
    return _conv3d_s2_packed_impl(xp, w, g_out)


def _s2_fwd_rule(xp, w, g_out):
    return conv3d_s2_packed(xp, w, g_out), (xp, w)


def _s2_bwd_rule(g_out, res, gyp):
    xp, w = res
    gyp = gyp.astype(xp.dtype)
    dxp = _conv3d_s2_dx_impl(gyp, w, g_out)
    dw = _conv3d_s2_dw_impl(xp, gyp, g_out, w.shape).astype(w.dtype)
    return dxp, dw


conv3d_s2_packed.defvjp(_s2_fwd_rule, _s2_bwd_rule)


def conv3d_s2(x: jax.Array, w: jax.Array) -> jax.Array:
    """Unpacked-io stride-2 banded conv (packs/unpacks at the edges)."""
    n, d, h, w_dim, ci = x.shape
    co = w.shape[-1]
    g_out = 128 // co
    g_in = 2 * g_out
    xp = x.reshape(n, d, h, w_dim // g_in, g_in * ci)
    yp = conv3d_s2_packed(xp, w, g_out)
    return yp.reshape(n, d // 2, h // 2, w_dim // 2, co)


@jax.custom_vjp
def conv3d_small_c(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3x3 stride-1 same-pad conv, NDHWC, for C in {16, 32, 64}."""
    return _conv3d_banded_fwd(x, w)


def _fwd(x, w):
    return conv3d_small_c(x, w), (x, w)


def _bwd(res, gy):
    x, w = res
    gy = gy.astype(x.dtype)
    # dx = conv(gy, flip(W)^T): usually the same banded shape class; falls
    # back to XLA when the transposed channel count is not kernel-supported
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    if is_supported(gy.shape, w_flip.shape):
        dx = _conv3d_banded_fwd(gy, w_flip)
    else:
        dx = _ref_conv(gy, w_flip)
    # dW via the banded correlation kernel (packed operands)
    n, d, h, w_dim, ci = x.shape
    co = w.shape[-1]
    g = _pack_g(co)
    xp = x.reshape(n, d, h, w_dim // g, g * ci)
    gyp = gy.reshape(n, d, h, w_dim // g, g * co)
    dw = conv3d_dw_packed(xp, gyp, g, w.shape).astype(w.dtype)
    return dx, dw


conv3d_small_c.defvjp(_fwd, _bwd)


def conv3d_auto(x: jax.Array, w: jax.Array) -> jax.Array:
    """Dispatch: banded Pallas kernel when supported, XLA otherwise."""
    if is_supported(x.shape, w.shape):
        return conv3d_small_c(x, w)
    return _ref_conv(x, w)

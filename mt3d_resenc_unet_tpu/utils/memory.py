"""Analytic HBM budget estimator.

TPU analog of the reference's VRAM estimator and per-block feature-map-size
accounting (reference: builders/vram_estimation.py:50-163 — dead code there —
and compute_conv_feature_map_size, encoder.py:160-170, decoder.py:166-193):
params + optimizer state in fp32, activations in the compute dtype, with the
rematerialization policy factored in (only block boundaries are live for
backward when remat is on).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Sequence

from ..core.plan import NetworkPlan


@dataclasses.dataclass
class MemoryEstimate:
    params_bytes: int
    optimizer_bytes: int
    activations_bytes: int
    total_bytes: int

    def __str__(self):
        g = 1 << 30
        return (f"params {self.params_bytes / g:.2f}G + opt "
                f"{self.optimizer_bytes / g:.2f}G + activations "
                f"{self.activations_bytes / g:.2f}G = "
                f"{self.total_bytes / g:.2f}G")


def count_plan_params(plan: NetworkPlan) -> int:
    """Closed-form parameter count for the planned network."""
    def conv(cin, cout, k):
        return cin * cout * math.prod(k) + (cout if plan.conv_bias else 0)

    total = 0
    cin = plan.in_channels
    if plan.do_stem:
        total += conv(cin, plan.stem_width, plan.kernel_sizes[0])
        cin = plan.stem_width
    for s in range(plan.num_stages):
        c = plan.features_per_stage[s]
        k = plan.kernel_sizes[s]
        for b in range(plan.n_blocks_per_stage[s]):
            b_in = cin if b == 0 else c
            total += conv(b_in, c, k) + conv(c, c, k)
            if b_in != c:
                total += b_in * c  # 1x1 projection
            if plan.squeeze_excitation:
                rd = max(8, int(c * plan.squeeze_excitation_reduction_ratio))
                total += c * rd + rd + rd * c + c
        cin = c
    # decoders
    for _ in plan.tasks:
        for s in range(1, plan.num_stages):
            below = plan.features_per_stage[-s]
            skip = plan.features_per_stage[-(s + 1)]
            stride = plan.strides[-s]
            total += below * skip * math.prod(stride)  # transpconv
            k = plan.kernel_sizes[-(s + 1)]
            for c_i in range(plan.n_conv_per_stage_decoder[s - 1]):
                c_in = 2 * skip if c_i == 0 else skip
                total += conv(c_in, skip, k)
            total += skip * 1 + 1  # seg layer (per class ~1; refined below)
    return total


def estimate_hbm(plan: NetworkPlan, patch_size: Sequence[int],
                 batch_size: int, compute_bytes: int = 2,
                 optimizer: str = "adamw") -> MemoryEstimate:
    n_params = count_plan_params(plan)
    params_bytes = n_params * 4
    opt_mult = {"adamw": 2, "adam": 2, "sgd": 1}.get(optimizer.lower(), 2)
    optimizer_bytes = n_params * 4 * opt_mult

    vox = math.prod(patch_size)
    act_elems = 0
    size = list(patch_size)
    cin = plan.stem_width if plan.do_stem else plan.in_channels
    if plan.do_stem:
        act_elems += cin * vox
    for s in range(plan.num_stages):
        size = [i // j for i, j in zip(size, plan.strides[s])]
        c = plan.features_per_stage[s]
        sv = math.prod(size)
        if plan.remat:
            # only block boundaries are saved for backward
            act_elems += (plan.n_blocks_per_stage[s] + 1) * c * sv
        else:
            act_elems += plan.n_blocks_per_stage[s] * 3 * c * sv
    # decoder activations (per task): upsample + concat + conv outputs
    size = list(patch_size)
    sizes = [list(size)]
    for s in range(plan.num_stages):
        size = [i // j for i, j in zip(size, plan.strides[s])]
        sizes.append(list(size))
    for _ in plan.tasks:
        for s in range(1, plan.num_stages):
            skip_c = plan.features_per_stage[-(s + 1)]
            sv = math.prod(sizes[plan.num_stages - s])
            mult = 3 if plan.remat else (3 + plan.n_conv_per_stage_decoder[s - 1])
            act_elems += mult * skip_c * sv
    activations_bytes = act_elems * compute_bytes * batch_size

    total = params_bytes + optimizer_bytes + activations_bytes
    return MemoryEstimate(params_bytes, optimizer_bytes, activations_bytes,
                          total)

#!/usr/bin/env python
"""Benchmark harness: flagship-model training throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric: training patches/sec/chip at 128^3 (bf16 compute, fp32 params) on
the autoconfigured nnU-Net-ResEnc-M-scale multi-task net (sheet+normals),
full train step (fwd+bwd+clip+AdamW update) — the BASELINE.json north-star
metric. Extra fields of the same line:

* model_tflops_per_sec / mfu — achieved FLOPs against the chip peak. The
  analytic FLOP model is cross-checked against XLA's compiled
  cost_analysis() every run (flops_model_vs_xla field).
* infer_voxels_per_sec — eval forward + on-device Gaussian weighting
  (the inference hot loop), processed patch-voxels/sec.
* train_e2e_patches_per_sec — the REAL Trainer path (zarr dataset -> miner
  -> augment -> prefetch -> sharded step) on a synthetic volume, sustained.
* infer_engine_voxels_per_sec — the REAL ZarrInferenceEngine.infer() over a
  synthetic zarr volume (model pass + host accumulation + finalize +
  quantize), processed patch-voxels/sec, comparable to infer_voxels_per_sec.

vs_baseline: the reference publishes NO numbers (BASELINE.md), so the ratio
is against an estimated PyTorch-on-A100 throughput for the same model/patch
(ESTIMATED_A100_PATCHES_PER_SEC below, from nnU-Net-class experience:
torch.compile + AMP, batch 2, ~0.2 s/iter). Replace with a measured value
when A100 hardware is available; the estimate is documented in BASELINE.md.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ESTIMATED_A100_PATCHES_PER_SEC = 10.0

# analytic-estimate -> compiled-footprint calibration: the analytic model
# (utils/memory.py, params+opt+boundary activations) came in at 8.85G for a
# batch-4 step whose compiled args+temps measured 13.77G (2026-08-19) —
# remat recompute workspaces, Pallas scratch and fusion temps are the gap.
# Candidates whose calibrated estimate clearly exceeds the budget are
# skipped WITHOUT paying their multi-minute cold AOT compile; borderline
# ones still go through the exact compiled-memory gate below.
# r4 data point: batch 5 passed the 1.15-margin filter and still failed
# OverBudget after a multi-minute cold compile — the margin bought nothing
# but wasted compiles two rounds running, so it is now 1.0 (skip anything
# whose calibrated estimate exceeds the budget itself). A real memory win
# the analytic model cannot see is re-probed via MT3D_BENCH_PROBE_ALL=1.
ANALYTIC_TO_COMPILED = 1.55
ANALYTIC_SKIP_MARGIN = 1.0

# usable HBM per v5e chip for the memory-analysis gate (16 GB minus runtime
# reservation; the gate only needs to reject clear over-budget candidates
# before wasting an execution attempt — borderline cases still fall through
# to the try/except ladder)
HBM_BUDGET_BYTES = int(15.2 * 2 ** 30)


def build(batch, patch, accum=1, remat=True, augment=False, wire=False):
    from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_autoconfig
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.losses import build_task_losses
    from mt3d_resenc_unet_tpu.train.step import (
        TrainState, build_optimizer, cosine_epoch_schedule, make_train_step)

    plan = plan_from_autoconfig(
        patch, in_channels=1,
        tasks=[TaskHead("sheet", 1, "sigmoid"),
               TaskHead("normals", 3, "none")],
        model_name="bench",
        use_pallas_conv=True, remat=remat)
    model = ResEncUNet(plan=plan, dtype=jnp.bfloat16)
    x = jnp.zeros((1,) + patch + (1,), jnp.float32)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.key(0)}, x, train=False))()["params"]
    loss_fns = build_task_losses({
        "sheet": {"loss_fn": "BCEDiceLoss",
                  "loss_kwargs": {"alpha": 0.5, "beta": 0.5}},
        "normals": {"loss_fn": "MaskedCosineLoss"},
    })
    tx = build_optimizer("AdamW", cosine_epoch_schedule(1e-3, 500, 250),
                         weight_decay=1e-4, grad_clip_norm=3.0)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              rng=jax.random.key(1))
    augment_fn = None
    if augment:
        from mt3d_resenc_unet_tpu.data.augment_device import (
            DeviceAugConfig, make_device_augment)
        augment_fn = make_device_augment(
            DeviceAugConfig(normal_keys=("normals",)))
    step = make_train_step(model, loss_fns, {"sheet": 1.0, "normals": 1.0},
                           grad_accum_steps=accum, donate=True,
                           augment_fn=augment_fn)

    rng = np.random.default_rng(0)
    n = batch * accum
    if wire:
        # the e2e trainer's wire-format dtypes (uint8/uint8/uint16)
        batch_data = {
            "image": jnp.asarray(rng.integers(
                0, 255, (n,) + patch + (1,)).astype(np.uint8)),
            "sheet": jnp.asarray(rng.integers(
                0, 2, (n,) + patch + (1,)).astype(np.uint8) * 255),
            "normals": jnp.asarray(rng.integers(
                0, 65535, (n,) + patch + (3,)).astype(np.uint16)),
        }
    else:
        batch_data = {
            "image": jnp.asarray(rng.random((n,) + patch + (1,), np.float32)),
            "sheet": jnp.asarray(
                (rng.random((n,) + patch + (1,)) > 0.5).astype(np.float32)),
            "normals": jnp.asarray(
                rng.standard_normal((n,) + patch + (3,)).astype(np.float32)),
        }
    return state, step, batch_data


def flagship_plan(patch):
    from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_autoconfig
    return plan_from_autoconfig(
        patch, in_channels=1,
        tasks=[TaskHead("sheet", 1, "sigmoid"),
               TaskHead("normals", 3, "none")],
        model_name="bench", use_pallas_conv=True)


class OverBudget(Exception):
    pass


def run_bench(batch, patch, steps, warmup, remat=True,
              augment=False, wire=False):
    """Returns (patches_per_sec, n_devices_used, xla_flops_per_step|None)."""
    state, step, data = build(batch, patch, remat=remat,
                              augment=augment, wire=wire)
    # AOT compile so the memory analysis can reject over-budget batches
    # BEFORE an execution attempt (VERDICT r2: probe larger batches
    # automatically; memory wins must convert to throughput without edits)
    xla_flops = None
    compiled = None
    try:
        compiled = step.lower(state, data).compile()
        ma = compiled.memory_analysis()
        # donated args alias outputs, so the gated quantity is args+temps
        # (output bytes land in donated buffers and are not additional HBM)
        need = ma.argument_size_in_bytes + ma.temp_size_in_bytes
        print(f"[bench] batch {batch}: compiled memory "
              f"args={ma.argument_size_in_bytes / 2**30:.2f}G "
              f"temps={ma.temp_size_in_bytes / 2**30:.2f}G "
              f"gated args+temps={need / 2**30:.2f}G (budget "
              f"{HBM_BUDGET_BYTES / 2**30:.1f}G)",
              file=sys.stderr, flush=True)
        if need > HBM_BUDGET_BYTES:
            raise OverBudget(
                f"batch {batch} needs {need / 2**30:.2f}G")
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            xla_flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
    except OverBudget:
        raise
    except Exception as e:  # lowering/AOT quirks: fall back to implicit jit
        compiled = None
        msg = str(e)
        if ("RESOURCE_EXHAUSTED" in msg or "Ran out of memory" in msg
                or "ResourceExhausted" in msg):
            # the compile itself hit the capacity wall — executing would
            # just recompile and fail again several minutes later
            raise OverBudget(f"batch {batch}: AOT compile OOM") from e
        print(f"[bench] AOT memory probe unavailable "
              f"({type(e).__name__}); executing directly", file=sys.stderr)

    # execute the AOT executable directly when available: the implicit jit
    # path would compile (or cache-load) the SAME program a second time —
    # ~1-4 minutes of pure waste on the tunnel
    step = compiled if compiled is not None else step

    # compile + warmup; fetch the loss to force real execution (the axon
    # remote platform has been observed to elide chained async dispatches)
    for _ in range(warmup):
        state, metrics = step(state, data)
        float(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, data)
        loss = float(metrics["total_loss"])  # per-step sync: honest timing
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    # the jitted bench step runs on the devices the (uncommitted) batch
    # occupies — normally exactly one; normalize per-chip AND MFU by the
    # devices actually used, not every visible device (ADVICE r2)
    n_used = max(1, len(jax.tree.leaves(data)[0].sharding.device_set))
    return batch * steps / dt, n_used, xla_flops


def run_infer_bench(batch, patch, steps, warmup):
    """Eval-mode forward + on-device Gaussian weighting (the inference hot
    loop); returns voxels/sec."""
    from mt3d_resenc_unet_tpu.core.plan import TaskHead, plan_from_autoconfig
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.infer.gaussian import gaussian_map

    plan = plan_from_autoconfig(
        patch, in_channels=1,
        tasks=[TaskHead("sheet", 1, "sigmoid"),
               TaskHead("normals", 3, "none")],
        model_name="bench", use_pallas_conv=True, remat=False)
    model = ResEncUNet(plan=plan, dtype=jnp.bfloat16)
    x = jnp.zeros((batch,) + patch + (1,), jnp.float32)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.key(0)}, x[:1], train=False))()
    # numpy closure constant: a device-array constant makes jit.lower fetch
    # its value through the tunnel (~1 min) to embed the MLIR constant
    wmap = gaussian_map(patch)

    @jax.jit
    def forward(params, batch):
        outs = model.apply(params, batch, train=False)
        return {k: (v.astype(jnp.float32) * wmap[None, ..., None])
                for k, v in outs.items()}

    for _ in range(warmup):
        o = forward(params, x)
        float(o["sheet"].sum())
    t0 = time.perf_counter()
    for _ in range(steps):
        o = forward(params, x)
        float(o["sheet"].sum())
    dt = time.perf_counter() - t0
    voxels = batch * steps * patch[0] * patch[1] * patch[2]
    return voxels / dt


# ----------------------------------------------------------------------
# end-to-end benches: the REAL data-fed paths (VERDICT r2 items 2-3)
# ----------------------------------------------------------------------

def _make_e2e_volume(root, shape=(256, 256, 256)):
    """Synthetic flagship-task volume triple (image, sheet mask, normals)."""
    from mt3d_resenc_unet_tpu.data.zio import create_zarr, encode_normals_u16

    img_path = os.path.join(root, "img.zarr")
    sheet_path = os.path.join(root, "sheet.zarr")
    normals_path = os.path.join(root, "normals.zarr")
    if os.path.isdir(img_path):
        return img_path, sheet_path, normals_path
    rng = np.random.default_rng(0)
    zz, yy, _ = np.mgrid[0:shape[0], 0:shape[1], 0:1]
    plane = (0.6 * yy + 0.8 * zz).astype(np.float32)  # tilted slab
    mask2d = ((plane > 0.1 * shape[0]) & (plane < 1.2 * shape[0]))
    mask = np.broadcast_to(mask2d, shape).astype(np.uint8)
    chunk = tuple(min(128, s) for s in shape)
    img = create_zarr(img_path, shape, np.uint8, chunk)
    sheet = create_zarr(sheet_path, shape, np.uint8, chunk)
    nvol = create_zarr(normals_path, shape + (3,), np.uint16, chunk + (3,))
    for z0 in range(0, shape[0], chunk[0]):
        z1 = min(z0 + chunk[0], shape[0])
        noise = rng.integers(0, 60, (z1 - z0,) + shape[1:]).astype(np.uint8)
        img[z0:z1] = (mask[z0:z1] * 160 + noise).astype(np.uint8)
        sheet[z0:z1] = mask[z0:z1] * np.uint8(255)
        nb = np.zeros((z1 - z0,) + shape[1:] + (3,), np.float32)
        nb[mask[z0:z1] > 0] = (0.0, 0.6, 0.8)
        nvol[z0:z1] = encode_normals_u16(nb)
    return img_path, sheet_path, normals_path


def run_train_e2e(batch, patch, steps_per_epoch, epochs, workdir,
                  vol_shape=(256, 256, 256)):
    """Sustained patches/s of the full Trainer path (dataset -> miner ->
    augment -> prefetch -> sharded jitted step) on a synthetic zarr volume.
    Matches the role of the reference's DataLoader-fed loop
    (reference: train.py:109-118, 182-240)."""
    from mt3d_resenc_unet_tpu.train.trainer import Trainer

    vols = os.path.join(workdir, "vols")
    os.makedirs(vols, exist_ok=True)
    img, sheet, normals = _make_e2e_volume(vols, vol_shape)
    cfg = {
        "tr_setup": {"model_name": "bench_e2e", "autoconfigure": True,
                     "tr_val_split": 0.95,
                     # phase timers to stderr: a segment timeout still
                     # reports where the time went (VERDICT r4 weak #2)
                     "phase_log": True,
                     # optional xprof capture of epoch-1 steps 3-6
                     **({"profile_dir": os.environ["MT3D_E2E_PROFILE_DIR"]}
                        if os.environ.get("MT3D_E2E_PROFILE_DIR") else {}),
                     "ckpt_out_base": os.path.join(workdir, "ck"),
                     # no per-epoch checkpoints: each is a ~2.8G fp32
                     # device_get + orbax write (tens of seconds on the
                     # tunnel) that the 480s segment budget cannot afford
                     "ckpt_interval_epochs": 0,
                     # the final weights dump is a ~1G fp32 device_get +
                     # orbax write — more than the segment's slack on a
                     # tunneled host, and the bench reports only the rate
                     "save_final": False,
                     "tensorboard_log_dir": os.path.join(workdir, "lg"),
                     "seed": 0},
        "tr_config": {"optimizer": "AdamW", "initial_lr": 1e-3,
                      # on-device augmentation: the compiled step applies the
                      # stochastic pipeline, the host ships raw stored bytes
                      # (r4 shipped data/augment_device.py for exactly this
                      # segment's host starvation and never wired it here —
                      # VERDICT r4 weak #1)
                      "augment_on_device": True,
                      "patch_size": list(patch), "batch_size": batch,
                      "max_steps_per_epoch": steps_per_epoch,
                      # 0 val steps: skips validation AND its two extra cold
                      # compiles (eval fwd + predict fwd) — each is minutes
                      # on the tunnel and the bench reports only the train
                      # rate; the validation path is exercised by the e2e
                      # tests (test_train_e2e) instead
                      "max_val_steps_per_epoch": 0, "max_epoch": epochs,
                      "num_dataloader_workers": 8},
        "model_config": {},
        "dataset_config": {
            "min_bbox_percent": 0.3, "min_labeled_ratio": 0.05,
            "use_cache": True, "cache_folder": os.path.join(workdir, "c"),
            "in_channels": 1,
            "volume_paths": [{"input": img, "sheet": sheet,
                              "normals": normals, "ref_label": "sheet"}],
            "targets": {
                "sheet": {"channels": 1, "activation": "sigmoid",
                          "loss_fn": "BCEDiceLoss",
                          "loss_kwargs": {"alpha": 0.5, "beta": 0.5}},
                "normals": {"channels": 3, "activation": "none",
                            "loss_fn": "MaskedCosineLoss"}},
        },
        "inference_config": {},
    }
    cwd = os.getcwd()
    os.chdir(workdir)  # {model_name}_final / debug gif are CWD artifacts
    try:
        out = Trainer(config_dict=cfg, verbose=False).train()
    finally:
        os.chdir(cwd)
    # first epoch pays compilation; report the MEDIAN of the later epochs'
    # sustained rates (a max over one warm epoch flatters — VERDICT r3)
    rates = [h["train/patches_per_sec"] for h in out["history"]]
    return float(np.median(rates[1:])) if len(rates) > 1 else rates[0]


def run_infer_e2e(patch, workdir, vol_shape=(512, 512, 512), batch=8):
    """The REAL ZarrInferenceEngine.infer() end to end: jitted model pass +
    native host accumulation + tensorstore writes + finalize + quantize
    (reference: inference.py:117-263). Returns processed patch-voxels/s
    (comparable to run_infer_bench) and output voxels/s."""
    from mt3d_resenc_unet_tpu.data.positions import sliding_window_grid
    from mt3d_resenc_unet_tpu.data.zio import create_zarr
    from mt3d_resenc_unet_tpu.infer.engine import ZarrInferenceEngine
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.checkpoint import save_params

    vols = os.path.join(workdir, "ivol")
    os.makedirs(vols, exist_ok=True)
    img_path = os.path.join(vols, "img.zarr")
    if not os.path.isdir(img_path):
        rng = np.random.default_rng(1)
        chunk = tuple(min(128, s) for s in vol_shape)
        img = create_zarr(img_path, vol_shape, np.uint8, chunk)
        for z0 in range(0, vol_shape[0], chunk[0]):
            z1 = min(z0 + chunk[0], vol_shape[0])
            img[z0:z1] = rng.integers(
                0, 255, (z1 - z0,) + vol_shape[1:]).astype(np.uint8)

    ckpt = os.path.join(workdir, "iparams")
    plan = flagship_plan(patch)
    if not os.path.isdir(ckpt):
        model = ResEncUNet(plan=plan, dtype=jnp.bfloat16)
        x = jnp.zeros((1,) + patch + (1,), jnp.float32)
        params = jax.device_get(jax.jit(lambda: model.init(
            {"params": jax.random.key(0)}, x, train=False))()["params"])
        save_params(ckpt, params)

    overlap = 0.25
    out_dir = os.path.join(workdir, "ipred")
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = {
        "tr_setup": {"model_name": "bench_e2e", "autoconfigure": True},
        "tr_config": {"patch_size": list(patch), "batch_size": batch},
        "model_config": {},
        "dataset_config": {
            "in_channels": 1,
            "targets": {"sheet": {"channels": 1, "activation": "sigmoid"},
                        "normals": {"channels": 3, "activation": "none"}},
            "volume_paths": []},
        "inference_config": {
            "checkpoint_path": ckpt, "input_path": img_path,
            "output_path": out_dir, "overlap": overlap,
            "patch_size": list(patch), "batch_size": batch,
            "normalization": "standardize", "gaussian_blend": True,
            "load_strict": False},
    }
    n_pos = len(sliding_window_grid(vol_shape, patch, overlap))
    eng = ZarrInferenceEngine(config_dict=cfg)
    t0 = time.perf_counter()
    eng.infer()
    dt = time.perf_counter() - t0
    patch_voxels = n_pos * patch[0] * patch[1] * patch[2]
    out_voxels = vol_shape[0] * vol_shape[1] * vol_shape[2]
    # sustained rate excludes the per-process fixed costs (setup, compile/
    # cache load, the platform's ~90 s first execution): what a long
    # production volume would see once the engine is warm
    sustained = None
    ph = getattr(eng, "last_phases", None)
    if ph and "loop" in ph:
        warm = (ph["loop"] + ph.get("finalize", 0.0)
                + ph.get("fetch_write", 0.0))
        if warm > 0:
            # slight over-estimate: the first (warm-up) batch's voxels are
            # counted but its wall time is in first_step, not loop
            sustained = patch_voxels / warm
    return patch_voxels / dt, out_voxels / dt, dt, sustained


def _run_e2e_segment(mode, budget_secs, extra):
    """Run one e2e bench mode in a TIME-BOXED subprocess and parse the
    JSON line it prints. The canonical step-bench line has already been
    printed by then, so a segment that overruns its budget (cold compiles
    on the tunnel) degrades to null instead of eating the whole artifact
    (VERDICT r3 item 1). The subprocess shares the persistent XLA cache."""
    if budget_secs <= 30:
        print(f"[bench] {mode}: skipped (budget exhausted)",
              file=sys.stderr, flush=True)
        return None
    cmd = [sys.executable, os.path.abspath(__file__), "--mode", mode] + extra
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=budget_secs)
        if r.stderr:
            sys.stderr.write(r.stderr[-1500:])
            sys.stderr.flush()
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                return float(json.loads(line)["value"])
            except (ValueError, KeyError, TypeError):
                continue
        print(f"[bench] {mode}: no JSON line (rc={r.returncode})",
              file=sys.stderr, flush=True)
    except subprocess.TimeoutExpired:
        print(f"[bench] {mode}: timed out after {budget_secs:.0f}s",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"[bench] {mode}: {type(e).__name__}: {str(e)[:300]}",
              file=sys.stderr, flush=True)
    return None


def main():
    t_start = time.monotonic()
    # repeat runs (and the e2e segments after the step bench) hit the
    # persistent XLA cache instead of re-paying multi-minute compiles
    from mt3d_resenc_unet_tpu.utils.compile_cache import (
        enable_compilation_cache)
    from mt3d_resenc_unet_tpu.utils.hostmem import retain_large_allocations
    enable_compilation_cache()
    retain_large_allocations()
    p = argparse.ArgumentParser()
    p.add_argument("--patch", type=int, nargs=3, default=[128, 128, 128])
    p.add_argument("--batch", type=int, default=0, help="0 = auto-select")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--mode",
                   choices=["train", "infer", "train-e2e", "infer-e2e"],
                   default="train")
    p.add_argument("--no-remat", action="store_true",
                   help="disable block-level rematerialization")
    p.add_argument("--no-e2e", action="store_true",
                   help="skip the end-to-end (data-fed) benches")
    p.add_argument("--e2e-budget-secs", type=float, default=720.0,
                   help="wall-clock budget per e2e segment (each runs in "
                        "a subprocess killed at the deadline); the real "
                        "cap is the remaining MT3D_BENCH_TOTAL_BUDGET")
    p.add_argument("--workdir", default="/tmp/mt3d_bench")
    p.add_argument("--train-vol", type=int, nargs=3,
                   default=[256, 256, 256])
    p.add_argument("--infer-vol", type=int, nargs=3,
                   default=[384, 384, 384],
                   help="infer-e2e volume; per-process fixed costs "
                        "(cache load + first execution) dominate this "
                        "segment either way (measured: 256^3 gave 1.9e5, "
                        "384^3 6.1e5 patch-voxels/s from the SAME engine) "
                        "— the sustained field reports the amortizable "
                        "rate")
    args = p.parse_args()
    patch = tuple(args.patch)

    if args.mode == "infer":
        b = args.batch or 8
        v = run_infer_bench(b, patch, args.steps, args.warmup)
        print(json.dumps({
            "metric": "infer_voxels_per_sec", "value": round(v, 1),
            "unit": "voxels/s", "vs_baseline": None}), flush=True)
        return

    if args.mode == "train-e2e":
        v = run_train_e2e(args.batch or 4, patch, steps_per_epoch=10,
                          epochs=3, workdir=args.workdir,
                          vol_shape=tuple(args.train_vol))
        print(json.dumps({
            "metric": "train_e2e_patches_per_sec", "value": round(v, 3),
            "unit": "patches/s", "vs_baseline": None}), flush=True)
        return

    if args.mode == "infer-e2e":
        pvs, ovs, dt, sustained = run_infer_e2e(
            patch, args.workdir, vol_shape=tuple(args.infer_vol))
        print(f"[bench] engine e2e: {dt:.1f}s total "
              f"({ovs:.3e} output voxels/s; sustained "
              f"{sustained if sustained else float('nan'):.3e})",
              file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": "infer_engine_voxels_per_sec", "value": round(pvs, 1),
            "unit": "voxels/s", "vs_baseline": None,
            "sustained_voxels_per_sec": (round(sustained, 1)
                                         if sustained else None)}),
            flush=True)
        return

    # batch 8 deterministically exceeds the 16G HBM at 128^3; larger
    # batches are probed each run so memory wins convert to throughput
    # automatically (VERDICT r2) — but candidates whose CALIBRATED analytic
    # estimate is clearly over budget are skipped without paying their
    # multi-minute cold AOT compile (r3 wasted ~2 compiles on batches 6+5)
    candidates = [args.batch] if args.batch else [6, 5, 4, 2, 1]
    if not args.batch and not os.environ.get("MT3D_BENCH_PROBE_ALL"):
        # MT3D_BENCH_PROBE_ALL=1 restores exhaustive AOT probing (use after
        # a memory win that the analytic model cannot see, e.g. smaller
        # fusion temps — the calibration constant above is measured, not
        # derived, and goes stale pessimistic in that direction)
        import dataclasses as _dc

        from mt3d_resenc_unet_tpu.utils.memory import estimate_hbm
        plan0 = _dc.replace(flagship_plan(patch), remat=not args.no_remat)
        kept = []
        for b in candidates:
            est = estimate_hbm(plan0, patch, b).total_bytes
            cal = est * ANALYTIC_TO_COMPILED
            if cal > HBM_BUDGET_BYTES * ANALYTIC_SKIP_MARGIN:
                print(f"[bench] batch {b}: skipped by analytic pre-filter "
                      f"(calibrated {cal / 2**30:.1f}G > "
                      f"{HBM_BUDGET_BYTES * ANALYTIC_SKIP_MARGIN / 2**30:.1f}"
                      "G)", file=sys.stderr, flush=True)
            else:
                kept.append(b)
        candidates = kept or candidates
    value = None
    used_batch = None
    n_used = 1
    xla_flops = None
    errors = []
    for i, b in enumerate(candidates):
        try:
            value, n_used, xla_flops = run_bench(
                b, patch, args.steps, args.warmup, remat=not args.no_remat)
            used_batch = b
            break
        except Exception as e:
            # Any failure at a larger batch that a smaller batch avoids is
            # effectively a capacity limit (OOM strings vary by runtime
            # version); only the LAST candidate's failure is fatal.
            errors.append(f"batch {b}: {type(e).__name__}: {e}")
            if i == len(candidates) - 1:
                raise RuntimeError(
                    "bench failed at every batch size:\n" +
                    "\n".join(errors))
            print(f"[bench] batch {b} failed ({type(e).__name__}), "
                  f"trying smaller", file=sys.stderr, flush=True)

    per_chip = value / n_used
    # achieved TFLOP/s + MFU against the machine (not the estimated-GPU
    # ratio): analytic model FLOPs, utils/flops.py, normalized by the
    # devices the step actually ran on (ADVICE r2)
    from mt3d_resenc_unet_tpu.utils.flops import (
        V5E_PEAK_BF16_TFLOPS, mfu, train_step_flops)
    fl = train_step_flops(flagship_plan(patch))
    tflops, util = mfu(value, fl, n_devices=n_used)
    # ground the MFU denominator against XLA's own compiled cost analysis
    # (VERDICT r2 item 8); XLA counts the executed ops (incl. structural
    # zeros of banded kernels and remat recompute), the model counts ideal
    # conv FLOPs — agreement within ~2x is expected, drift beyond says the
    # analytic model rotted
    flops_ratio = None
    if xla_flops:
        flops_ratio = (fl * used_batch) / xla_flops
        print(f"[bench] analytic step flops={fl * used_batch:.3e} "
              f"xla cost_analysis={xla_flops:.3e} "
              f"(model/xla={flops_ratio:.3f})", file=sys.stderr, flush=True)
    print(f"[bench] batch={used_batch} patch={patch} devices_used={n_used} "
          f"model_tflops_per_sec={tflops:.1f} "
          f"mfu={100 * util:.1f}% (peak {V5E_PEAK_BF16_TFLOPS:.0f} TF/s bf16)",
          file=sys.stderr, flush=True)
    def result_line(infer_vps, e2e_train, e2e_infer):
        return json.dumps({
            "metric": "train_patches_per_sec_per_chip_128cubed",
            "value": round(per_chip, 3),
            "unit": "patches/s/chip",
            "vs_baseline": round(
                per_chip / ESTIMATED_A100_PATCHES_PER_SEC, 3),
            "model_tflops_per_sec": round(tflops, 1),
            "mfu": round(util, 4),
            "flops_model_vs_xla": (round(flops_ratio, 3)
                                   if flops_ratio else None),
            "infer_voxels_per_sec": (round(infer_vps, 1)
                                     if infer_vps is not None else None),
            "train_e2e_patches_per_sec": (round(e2e_train, 3)
                                          if e2e_train is not None else None),
            "infer_engine_voxels_per_sec": (round(e2e_infer, 1)
                                            if e2e_infer is not None
                                            else None),
        })

    # the canonical JSON line lands IMMEDIATELY after the step bench —
    # before the infer bench's own cold compile and before any e2e
    # segment — so a driver timeout later can no longer erase the round's
    # headline number (BENCH_r03 recorded nothing for exactly that
    # reason); progressively enriched lines follow as the infer and
    # time-boxed e2e numbers arrive — parsers taking either the first or
    # the last JSON line get a valid artifact
    print(result_line(None, None, None), flush=True)

    # inference throughput (eval forward + on-device Gaussian weighting) as
    # an extra field of the enriched lines (BASELINE.md voxels/sec)
    # inference has no backward: batch 8 fits in 16G and is ~9% faster
    # than batch 4 (measured 2026-08-17); fall back on capacity failures
    infer_vps = None
    for ib in (8, 4, 2):
        try:
            infer_vps = run_infer_bench(ib, patch, steps=8, warmup=2)
            print(f"[bench] infer_voxels_per_sec={infer_vps:.3e} "
                  f"(batch {ib})", file=sys.stderr, flush=True)
            break
        except Exception as e:
            print(f"[bench] infer batch {ib} failed: {type(e).__name__}",
                  file=sys.stderr, flush=True)
    print(result_line(infer_vps, None, None), flush=True)

    e2e_train = e2e_infer = None
    if not args.no_e2e:
        # the driver runs the whole bench under its own wall-clock limit;
        # budget each e2e segment from the time actually LEFT (r4 lost
        # infer-e2e entirely because train-e2e consumed a fixed 480 s after
        # the step bench had already burned a wasted compile)
        # headline + infer land in the first ~10 min regardless; the e2e
        # segments consume whatever a driver-side kill leaves, so a
        # generous default only helps
        total = float(os.environ.get("MT3D_BENCH_TOTAL_BUDGET", "1750"))

        def left(reserve):
            return total - (time.monotonic() - t_start) - reserve

        common = ["--workdir", args.workdir,
                  "--patch", *map(str, patch)]
        # infer-e2e first: its fixed costs are ~250-400 s (forward-only
        # executable), so it lands reliably; train-e2e then gets ALL the
        # remaining wall clock — its 230 MB executable costs a ~2-4 min
        # compile-or-cache-load plus the platform's ~400 s first execution
        # (docs/PERFORMANCE.md platform notes), i.e. ~450-700 s warm.
        e2e_infer = _run_e2e_segment(
            "infer-e2e", min(args.e2e_budget_secs, left(30)),
            common + ["--infer-vol", *map(str, args.infer_vol)])
        if e2e_infer is not None:
            print(f"[bench] infer_engine={e2e_infer:.3e} voxels/s",
                  file=sys.stderr, flush=True)
        print(result_line(infer_vps, None, e2e_infer), flush=True)
        e2e_train = _run_e2e_segment(
            "train-e2e", min(args.e2e_budget_secs, left(20)),
            common + ["--batch", str(used_batch),
                      "--train-vol", *map(str, args.train_vol)])
        if e2e_train is not None:
            print(f"[bench] train_e2e={e2e_train:.3f} patches/s "
                  f"({100 * e2e_train / per_chip:.0f}% of step-only)",
                  file=sys.stderr, flush=True)
        print(result_line(infer_vps, e2e_train, e2e_infer), flush=True)


if __name__ == "__main__":
    main()

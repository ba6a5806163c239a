"""Trainer: config-driven multi-task training under pjit data parallelism.

Parity with the reference BaseTrainer (reference: train.py:19-350), keeping
the same seven extension points (_build_model/_configure_dataset/_build_loss/
_get_optimizer/_get_scheduler/_configure_dataloaders plus _build_plan), the
same loop semantics (max_steps_per_epoch batches, per-task weighted losses,
gradient accumulation, clip-grad-norm 3, cosine LR per epoch, per-epoch
checkpoints with keep-10 GC, per-epoch validation with batch size 1 and a
debug GIF on the first val batch, final weights dump) — rebuilt the TPU way:

* ONE jitted train step contains forward+backward+accumulation+clip+update;
* bf16 compute / fp32 params replaces AMP GradScaler (no scaler on TPU);
* batches are sharded over the ``data`` mesh axis; XLA inserts the gradient
  all-reduce over ICI (the reference is single-GPU — SURVEY.md §2.4);
* checkpoints are Orbax (resume / weights-only / non-strict modes).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ConfigManager
from ..core.plan import NetworkPlan
from ..data.dataset import ZarrPatchDataset
from ..data.pipeline import batch_iterator, device_prefetch, train_val_split
from ..models.network import ResEncUNet, count_params
from ..parallel.distributed import (global_mesh, is_main_process,
                                    process_batch_slice, sync_global_devices)
from ..parallel.mesh import make_mesh, pad_batch_to_devices, replicate
from ..utils.compile_cache import prelower
from .checkpoint import CheckpointManager, save_params
from .losses import build_task_losses
from .metrics import MetricsWriter
from .step import (
    TrainState,
    build_optimizer,
    cosine_epoch_schedule,
    make_eval_step,
    make_predict_step,
    make_train_step,
)
from .visualization import (export_data_dict_as_tif,
                            log_3d_slices_as_images, save_debug_gif)

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
           "float16": jnp.float16}


class Trainer:
    """Config-driven trainer. Subclass and override any _build/_get/_configure
    method to customize (reference extension model: train.py:29-120)."""

    def __init__(self, config_file: Optional[str] = None, verbose: bool = True,
                 debug_dataloader: bool = False,
                 config_dict: Optional[Dict[str, Any]] = None):
        from ..utils.compile_cache import enable_compilation_cache
        from ..utils.hostmem import retain_large_allocations
        enable_compilation_cache()
        retain_large_allocations()
        self.mgr = ConfigManager(config_file, config_dict, verbose=verbose)
        self.debug_dataloader = debug_dataloader
        self._prelowered = False
        self._prelowered_eval = False
        self._t0 = time.time()

    def _phase(self, name: str) -> None:
        """Timestamped phase marker to stderr (mgr.phase_log): a time-boxed
        caller that kills this process mid-run still learns where the wall
        clock went (mining vs compile vs epochs)."""
        if self.mgr.phase_log:
            import sys
            print(f"[phase +{time.time() - self._t0:7.1f}s] {name}",
                  file=sys.stderr, flush=True)

    # ------------------------------------------------------------- builders
    def _build_plan(self) -> NetworkPlan:
        return self.mgr.build_plan()

    def _build_model(self, plan: NetworkPlan) -> ResEncUNet:
        return ResEncUNet(
            plan=plan,
            dtype=_DTYPES[self.mgr.compute_dtype],
            param_dtype=_DTYPES[self.mgr.param_dtype],
        )

    def _configure_dataset(self) -> ZarrPatchDataset:
        # with device-side augmentation the host ships raw stored bytes and
        # the compiled step applies the pipeline (data/augment_device.py)
        return ZarrPatchDataset(self.mgr, seed=self.mgr.seed,
                                wire=self.mgr.wire_format,
                                augment=not self.mgr.augment_on_device)

    def _build_loss(self):
        return build_task_losses(self.mgr.tasks, self.mgr.ignore_label,
                                 loss_only_on_label=self.mgr.loss_only_on_label)

    def _get_scheduler(self, opt_steps_per_epoch: int):
        return cosine_epoch_schedule(
            self.mgr.initial_lr, self.mgr.max_epoch, opt_steps_per_epoch)

    def _get_optimizer(self, schedule):
        return build_optimizer(
            self.mgr.optimizer, schedule,
            weight_decay=self.mgr.weight_decay,
            grad_clip_norm=self.mgr.grad_clip_norm)

    def _configure_dataloaders(self, dataset) -> Tuple[List[int], List[int]]:
        return train_val_split(len(dataset), self.mgr.tr_val_split,
                               seed=self.mgr.seed)

    # --------------------------------------------------------------- helpers
    def _init_state(self, model, plan, tx, mesh) -> TrainState:
        patch = tuple(plan.patch_size) or tuple(self.mgr.train_patch_size)
        sample = jnp.zeros((1,) + patch + (plan.in_channels,), jnp.float32)
        rng = jax.random.key(self.mgr.seed)

        @jax.jit
        def init(rng, sample):
            variables = model.init({"params": rng}, sample, train=False)
            return variables["params"]

        params = init(rng, sample)
        params = replicate(params, mesh)
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=tx,
            rng=jax.random.key(self.mgr.seed + 1))
        # Canonicalize tracing avals: replicate()'s device_put tags param
        # avals with the mesh's Auto-axis sharding ({Auto: ('data',)}),
        # while jit OUTPUTS carry plain avals ({}). Without this identity
        # pass, train_step traces+compiles TWO programs — one for the
        # freshly-initialized state (call 1) and one for every state
        # thereafter — measured as a second 125 s XLA compile on e2e
        # step 2, with both 240 MB executables resident
        # (jax_explain_cache_misses, 2026-08-21). Donation makes it a
        # zero-copy alias pass.
        state = jax.jit(lambda s: s, donate_argnums=(0,))(state)
        return state

    def _microbatch_size(self, mesh) -> int:
        n_dev = mesh.devices.size
        b = pad_batch_to_devices(self.mgr.train_batch_size, n_dev)
        if b != self.mgr.train_batch_size:
            print(f"[trainer] batch_size {self.mgr.train_batch_size} rounded "
                  f"up to {b} for {n_dev}-device data parallelism")
        return b

    # ------------------------------------------------------------------ train
    def train(self) -> Dict[str, Any]:
        mgr = self.mgr
        plan = self._build_plan()
        model = self._build_model(plan)
        loss_fns = self._build_loss()
        task_weights = {name: float(info.get("weight", 1.0))
                        for name, info in mgr.tasks.items()}
        self._phase("model+losses built; mining patches")
        dataset = self._configure_dataset()
        self._phase(f"dataset ready ({len(dataset)} patches)")

        if self.debug_dataloader:
            export_data_dict_as_tif(dataset, num_batches=25,
                                    out_dir="debug_dir")
            print("Debug dataloader dumps written to debug_dir/; "
                  "exiting before training (parity with --debug_dataloader).")
            return {}

        # multi-process (multi-host pod/pod-slice): mesh over GLOBAL devices,
        # per-host batch feeding, process-0-only writes. The reference has no
        # distributed runtime at all (SURVEY.md §2.5).
        n_proc = jax.process_count()
        if n_proc > 1:
            mesh = global_mesh(mgr.dp_axis, mgr.mesh_shape)
        else:
            mesh = make_mesh(mgr.mesh_shape, (mgr.dp_axis,))
        main = is_main_process()
        micro_bs = self._microbatch_size(mesh)
        accum = max(1, mgr.gradient_accumulation)
        opt_steps_per_epoch = max(1, mgr.max_steps_per_epoch // accum)

        schedule = self._get_scheduler(opt_steps_per_epoch)
        tx = self._get_optimizer(schedule)
        state = self._init_state(model, plan, tx, mesh)
        self._phase("params initialized")
        print(f"[trainer] model '{plan.model_name}': "
              f"{count_params(state.params):,} params, "
              f"{mesh.devices.size} device(s), patch {plan.patch_size}, "
              f"microbatch {micro_bs} x accum {accum}")

        ckpt = CheckpointManager(mgr.ckpt_out_base, mgr.model_name,
                                 keep=mgr.ckpt_keep)
        start_epoch = 0
        if mgr.checkpoint_path is not None and Path(mgr.checkpoint_path).exists():
            state, start_epoch = self._restore(
                mgr.checkpoint_path, state, mgr)
        elif ckpt.latest_epoch() is not None and mgr.checkpoint_path is None \
                and mgr.tr_info.get("auto_resume", False):
            restored = ckpt.restore(template=_state_template(state))
            state = state.replace(
                params=restored["params"], opt_state=restored["opt_state"],
                step=jnp.asarray(restored["step"], jnp.int32))
            start_epoch = int(restored["epoch"]) + 1
            print(f"[trainer] auto-resumed from epoch {start_epoch}")

        augment_fn = None
        if mgr.augment_on_device:
            from ..data.augment_device import (DeviceAugConfig,
                                               make_device_augment)
            augment_fn = make_device_augment(DeviceAugConfig(
                normal_keys=tuple(k for k in mgr.tasks
                                  if k.lower() == "normals")))
        train_step = make_train_step(model, loss_fns, task_weights,
                                     grad_accum_steps=accum,
                                     donate=mgr.donate_state,
                                     augment_fn=augment_fn)
        eval_step = make_eval_step(model, loss_fns)
        predict_step = make_predict_step(model)

        writer = MetricsWriter(mgr.tensorboard_log_dir, mgr.model_name)
        train_idx, val_idx = self._configure_dataloaders(dataset)
        ep_rng = np.random.default_rng(mgr.seed)

        history = []
        for epoch in range(start_epoch, mgr.max_epoch):
            dataset.set_seed(mgr.seed * 100003 + epoch)
            perm = ep_rng.permutation(len(train_idx)).tolist()
            epoch_indices = [train_idx[i] for i in perm]
            # each optimizer step consumes micro_bs * accum samples (GLOBAL)
            step_samples = micro_bs * accum
            need = opt_steps_per_epoch * step_samples
            while len(epoch_indices) < need and epoch_indices:
                epoch_indices = epoch_indices + epoch_indices
            epoch_indices = epoch_indices[:need]
            if n_proc > 1:
                # per-host feeding: every process derives the SAME global
                # permutation (seeded) and loads only its slice of each
                # step's samples; make_global_batch (via device_prefetch)
                # assembles the logically-global sharded batch.
                sl = process_batch_slice(step_samples)
                epoch_indices = [
                    idx for s in range(opt_steps_per_epoch)
                    for idx in epoch_indices[s * step_samples:(s + 1) * step_samples][sl]
                ]
                host_step_samples = step_samples // n_proc
            else:
                host_step_samples = step_samples

            running = None  # device-side packed loss sums (one add/step)
            metric_names = None
            steps = 0
            t_start = time.time()
            t_fetch = t_step = t_acc = 0.0
            batches = batch_iterator(
                dataset, epoch_indices, host_step_samples,
                num_threads=mgr.train_num_dataloader_workers)
            profile_dir = self.mgr.tr_info.get("profile_dir")
            batch_it = iter(device_prefetch(batches, mesh, mgr.dp_axis))
            while True:
                t0 = time.perf_counter()
                batch = next(batch_it, None)
                t_fetch += time.perf_counter() - t0
                if batch is None:
                    break
                # optional xprof capture of steps 3-6 of the first epoch
                # (tracing/profiling is absent in the reference, SURVEY.md §5.1)
                if profile_dir and epoch == start_epoch and steps == 3:
                    jax.profiler.start_trace(profile_dir)
                if not self._prelowered:
                    self._phase("first batch on device; lowering train step")
                    # abstract-aval trace first: process-stable persistent
                    # cache key (see utils/compile_cache.prelower)
                    prelower(train_step, state, batch)
                    self._prelowered = True
                t0 = time.perf_counter()
                state, metrics = train_step(state, batch)
                t_step += time.perf_counter() - t0
                if (epoch == start_epoch
                        or os.environ.get("MT3D_SYNC_STEPS") == "1"):
                    # Sync EVERY step of the first epoch with a real VALUE
                    # fetch: on the tunneled runtime the first unsynced
                    # dispatch burst after a fresh compile executes at
                    # ~30 s/step (measured 2026-08-21: epoch-1 steps 4-10
                    # took 288 s unsynced, while all later epochs run at
                    # the normal ~0.5 s) — and ``block_until_ready`` is NOT
                    # a sync on this platform (it returns early on chained
                    # dispatches; docs/PERFORMANCE.md platform notes). The
                    # scalar fetch costs one ~26 ms round trip per step and
                    # only applies to the first epoch; steady-state epochs
                    # keep the async dispatch queue. MT3D_SYNC_STEPS=1
                    # syncs every step of every epoch (diagnostics).
                    float(metrics["total_loss"])
                    if mgr.phase_log and steps < 3:
                        self._phase(
                            "train step compiled + step 1 done"
                            if steps == 0 and epoch == start_epoch
                            else f"epoch {epoch + 1} step {steps + 1} done")
                elif mgr.phase_log and steps < 3 and epoch == start_epoch + 1:
                    jax.block_until_ready(metrics["total_loss"])
                    self._phase(f"epoch {epoch + 1} step {steps + 1} done")
                steps += 1
                if profile_dir and epoch == start_epoch and steps == 6:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                # accumulate losses ON DEVICE: a float() here would block the
                # host on every step (a full round-trip on the tunneled TPU)
                # and cap pipelining; ONE packed-vector add per step keeps
                # the dispatch queue full, and the single fetch happens at
                # epoch end.
                t0 = time.perf_counter()
                if metric_names is None:
                    metric_names = sorted(k for k in metrics if k != "_vec")
                vec = metrics["_vec"]
                running = vec if running is None else running + vec
                t_acc += time.perf_counter() - t0
                if steps >= opt_steps_per_epoch:
                    break
            if steps == 0:
                raise RuntimeError("No training batches produced — "
                                   "check dataset/patch mining results")
            # the fetch below transitively waits for every step of the epoch,
            # so the throughput clock stops only after real device completion
            t0 = time.perf_counter()
            vals = np.asarray(jax.device_get(running), np.float32)
            running = {name: float(v)
                       for name, v in zip(metric_names, vals)}
            t_drain = time.perf_counter() - t0
            dt = time.time() - t_start
            self._phase(f"epoch {epoch + 1} done "
                        f"({steps * step_samples / max(dt, 1e-9):.2f} p/s; "
                        f"fetch {t_fetch:.1f}s dispatch {t_step:.1f}s "
                        f"acc {t_acc:.1f}s drain {t_drain:.1f}s)")

            epoch_means = {f"train/{t}_loss": running[t] / steps
                           for t in mgr.tasks}
            epoch_means["train/patches_per_sec"] = steps * step_samples / max(dt, 1e-9)
            if main:
                writer.write(epoch, epoch_means)
                print(f"[epoch {epoch + 1}/{mgr.max_epoch}] " +
                      " | ".join(f"{t}: {running[t] / steps:.4f}"
                                 for t in mgr.tasks) +
                      f" | {epoch_means['train/patches_per_sec']:.2f} patches/s")

            # ---- checkpoint (keep-N GC handled by orbax) ----
            # params/opt_state are replicated: process 0 is the only writer;
            # ckpt_interval_epochs=0 disables per-epoch saves (a device_get
            # of the full fp32 state is expensive on tunneled hosts), >1
            # saves every Nth epoch plus always the last
            interval = mgr.ckpt_interval_epochs
            due = interval > 0 and ((epoch + 1) % interval == 0
                                    or epoch == mgr.max_epoch - 1)
            if main and due:
                ckpt.save(epoch, {
                    "params": jax.device_get(state.params),
                    "opt_state": jax.device_get(state.opt_state),
                    "step": int(state.step),
                    "epoch": epoch,
                })

            # ---- validation ----
            val_metrics = self._validate(
                dataset, val_idx, state, eval_step, predict_step,
                mesh, epoch, writer)
            history.append({"epoch": epoch, **epoch_means, **val_metrics})

        if main and mgr.save_final:
            save_params(Path(f"{mgr.model_name}_final").absolute(),
                        jax.device_get(state.params))
        writer.close()
        ckpt.close()
        sync_global_devices("train_done")
        if main:
            print("Training Finished!")
        return {"state": state, "history": history, "plan": plan}

    # ------------------------------------------------------------------ utils
    def _restore(self, path, state, mgr):
        from .checkpoint import restore_flexible
        if mgr.load_weights_only:
            restored = restore_flexible(
                path, _state_template(state), params_only_ok=True)
            state = state.replace(params=restored["params"])
            print("[trainer] loaded model weights only; fresh optimizer "
                  "state (fine-tune mode)")
            return state, 0
        restored = restore_flexible(path, _state_template(state))
        state = state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], jnp.int32))
        start_epoch = int(restored["epoch"]) + 1
        print(f"[trainer] resuming from epoch {start_epoch + 1}")
        return state, start_epoch

    def _validate(self, dataset, val_idx, state, eval_step, predict_step,
                  mesh, epoch, writer) -> Dict[str, float]:
        mgr = self.mgr
        if not val_idx:
            return {}
        was_aug = dataset.augment
        dataset.augment = False
        main = is_main_process()
        try:
            # validation rides the SAME data-parallel mesh as training: one
            # patch per device per eval step (the reference evals at batch 1
            # on its single GPU, train.py:268-327 — replicating that here
            # would idle every chip but one)
            n_dev = mesh.devices.size
            n_proc = jax.process_count()
            n = min(mgr.max_val_steps_per_epoch * n_dev, len(val_idx))
            idx = list(val_idx[:n])
            k = 0
            while len(idx) % n_dev:   # pad to a full batch by wrapping
                idx.append(val_idx[k % len(val_idx)])
                k += 1
            if n_proc > 1:
                sl = process_batch_slice(n_dev)
                idx = [i for s in range(len(idx) // n_dev)
                       for i in idx[s * n_dev:(s + 1) * n_dev][sl]]
                host_bs = n_dev // n_proc
            else:
                host_bs = n_dev
            running = None
            steps = 0
            first_batch = None
            for batch in device_prefetch(
                    batch_iterator(dataset, idx, host_bs, drop_last=False,
                                   num_threads=mgr.train_num_dataloader_workers),
                    mesh, mgr.dp_axis):
                if not self._prelowered_eval:
                    prelower(eval_step, state.params, batch)
                    self._prelowered_eval = True
                m = eval_step(state.params, batch)
                # accumulate ON DEVICE like the train loop: a float() per
                # metric per batch is a host round-trip that stalls the
                # dispatch queue (25 steps x ~8 metrics on a tunneled TPU);
                # the single fetch below waits for the whole epoch at once
                running = m if running is None else jax.tree.map(
                    jnp.add, running, m)
                if first_batch is None:
                    first_batch = batch
                steps += 1
            if steps == 0:
                return {}
            running = jax.device_get(running)
            out = {}
            for key, v in running.items():
                name = f"val/{key}_loss" if key in mgr.tasks else f"val/{key}"
                out[name] = float(v) / steps
            if main:
                writer.write(epoch, out)
                print("[val] " + " | ".join(
                    f"{k.removeprefix('val/')}: {v:.4f}" for k, v in out.items()
                    if k != "val/total_loss"))
            # debug GIF on the first val batch (reference: train.py:299-320);
            # the global batch is not fully host-addressable multi-process,
            # so visualization is a single-process feature
            if not main or jax.process_count() > 1:
                return out
            try:
                preds = predict_step(state.params, first_batch["image"])
                # wire-format batches carry compact dtypes; decode for the
                # float-consuming visualization path
                from .step import decode_wire
                viz_batch = jax.device_get(decode_wire(
                    first_batch, upcast_bf16=True))
                for t in mgr.tasks:
                    log_3d_slices_as_images(
                        writer, f"val/{t}_pred", np.asarray(preds[t]), epoch,
                        is_normals=t.lower() == "normals")
                save_debug_gif(
                    input_volume=np.asarray(viz_batch["image"]),
                    targets_dict={t: np.asarray(viz_batch[t])
                                  for t in mgr.tasks},
                    outputs_dict={t: np.asarray(preds[t]) for t in mgr.tasks},
                    tasks_dict=mgr.tasks,
                    epoch=epoch,
                    save_path=f"{mgr.model_name}_debug.gif")
            except Exception as e:  # visualization must never kill training
                print(f"[val] debug gif skipped: {e}")
            return out
        finally:
            dataset.augment = was_aug


def _state_template(state: TrainState) -> Dict[str, Any]:
    return {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0,
        "epoch": 0,
    }


# Back-compat alias matching the reference class name (train.py:19)
BaseTrainer = Trainer

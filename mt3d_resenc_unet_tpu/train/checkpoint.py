"""Orbax checkpointing with the reference's three load modes.

Parity with the reference (reference: train.py:146-168, 249-265, 339 and
inference.py:39-44):

* per-epoch checkpoints of {params, opt_state, epoch, step} with
  keep-newest-N garbage collection (N=10 default);
* full resume (params + optimizer + schedule position + epoch);
* ``load_weights_only`` fine-tune mode (params only, fresh everything else);
* non-strict loading for partial / multi-task reuse (``load_strict: false``):
  parameters present in the checkpoint and shape-compatible are restored,
  everything else keeps its fresh initialization.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager."""

    def __init__(self, directory, model_name: str, keep: int = 10):
        self.directory = Path(directory).absolute() / model_name
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=False)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state: Dict[str, Any]) -> None:
        """state: {'params': ..., 'opt_state': ..., 'step': int, 'epoch': int}"""
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, epoch: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(
                epoch, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(epoch)

    def close(self):
        self._mgr.close()


def restore_flexible(path, template: Dict[str, Any],
                     params_only_ok: bool = False) -> Dict[str, Any]:
    """Restore a training-state dict from either a CheckpointManager root
    (numbered epoch subdirectories) or a direct StandardCheckpointer path.
    With ``params_only_ok`` a params-only dump (the final-weights file,
    reference: train.py:339) is also accepted."""
    path = Path(path).absolute()
    steps = []
    if path.is_dir():
        steps = [int(p.name) for p in path.iterdir()
                 if p.is_dir() and p.name.isdigit()]
    if steps:
        mgr = ocp.CheckpointManager(path)
        try:
            return mgr.restore(max(steps),
                               args=ocp.args.StandardRestore(template))
        finally:
            mgr.close()
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(path, target=template)
    except Exception:
        if not params_only_ok:
            raise
        params = ckptr.restore(path, target=template["params"])
        out = dict(template)
        out["params"] = params
        return out


def load_params_any(path) -> Any:
    """Extract a params tree from any checkpoint layout we produce:
    a CheckpointManager root (numbered epoch dirs, full training state), a
    single manager step dir, or a StandardCheckpointer params dump. Restores
    without a template (raw arrays) and picks out ``params`` when present."""
    path = Path(path).absolute()
    steps = []
    if path.is_dir():
        steps = [int(p.name) for p in path.iterdir()
                 if p.is_dir() and p.name.isdigit()]
    if steps:
        mgr = ocp.CheckpointManager(path)
        try:
            raw = mgr.restore(max(steps))
        finally:
            mgr.close()
    elif (path / "default").is_dir():
        # a single CheckpointManager step dir (e.g. ckpts/model/3): the
        # pytree lives under the 'default' item
        raw = ocp.StandardCheckpointer().restore(path / "default")
    else:
        raw = ocp.StandardCheckpointer().restore(path)
    if isinstance(raw, dict) and "params" in raw:
        return raw["params"]
    return raw


def save_params(path, params) -> None:
    """Standalone final-weights dump (reference: train.py:339)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path, template=None):
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(Path(path).absolute(), target=template)
    return ckptr.restore(Path(path).absolute())


def merge_params_nonstrict(fresh, loaded) -> Tuple[Any, Dict[str, int]]:
    """Overlay ``loaded`` onto ``fresh`` wherever paths exist and shapes match
    (the TPU analog of torch ``load_state_dict(strict=False)``,
    reference: inference.py:41-44)."""
    stats = {"restored": 0, "kept_fresh": 0, "shape_mismatch": 0}

    fresh_flat = _flatten(fresh)
    loaded_flat = _flatten(loaded)
    out = {}
    for key, fval in fresh_flat.items():
        lval = loaded_flat.get(key)
        if lval is not None and tuple(np.shape(lval)) == tuple(np.shape(fval)):
            out[key] = jax.numpy.asarray(lval, dtype=fval.dtype) if hasattr(fval, "dtype") else lval
            stats["restored"] += 1
        else:
            out[key] = fval
            if lval is None:
                stats["kept_fresh"] += 1
            else:
                stats["shape_mismatch"] += 1
    return _unflatten(out), stats


def merge_params_lazy(abs_fresh, loaded, init_fn) -> Tuple[Any, Dict[str, int]]:
    """``merge_params_nonstrict`` against an ABSTRACT fresh tree (from
    ``jax.eval_shape`` of ``model.init``). Checkpoint leaves with matching
    shapes are used directly on host; only genuinely missing / mismatched
    leaves materialize initializer values — ``init_fn()`` runs once (on
    device) and ONLY those leaves are fetched. This avoids initializing and
    then ``device_get``-ing the full fresh tree, which for the flagship is
    ~1 GB over a ~10 MB/s tunneled D2H link (~100 s measured 2026-08-18)."""
    stats = {"restored": 0, "kept_fresh": 0, "shape_mismatch": 0}
    fresh_flat = _flatten(abs_fresh)
    loaded_flat = _flatten(loaded)
    out: Dict[Any, Any] = {}
    missing = []
    for key, aval in fresh_flat.items():
        lval = loaded_flat.get(key)
        if lval is not None and tuple(np.shape(lval)) == tuple(aval.shape):
            out[key] = np.asarray(lval, dtype=aval.dtype)
            stats["restored"] += 1
        else:
            missing.append(key)
            if lval is None:
                stats["kept_fresh"] += 1
            else:
                stats["shape_mismatch"] += 1
    if missing:
        fresh_real = _flatten(init_fn())
        for key in missing:
            out[key] = np.asarray(jax.device_get(fresh_real[key]))
    return _unflatten(out), stats


def _flatten(tree, prefix=()):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, prefix + (k,)))
    else:
        flat[prefix] = tree
    return flat


def _unflatten(flat):
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value
    return tree

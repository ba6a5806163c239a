"""Persistent XLA compilation cache.

Flagship-step compiles cost minutes on the axon-tunneled v5e; every CLI
entry point (train, inference, bench) enables the on-disk cache so repeat
runs — reruns, --resume, the e2e benches that build a Trainer after the
step bench already compiled the same model — pay compilation once per
machine instead of once per process.

Knob: ``MT3D_COMPILE_CACHE_DIR`` (env). Default ``/tmp/mt3d_xla_cache``;
set to the empty string to disable. (The reference has no analog: torch
eager pays no compile, this is the XLA-side counterpart of its warm start.)
"""

from __future__ import annotations

import os

_DEFAULT = "/tmp/mt3d_xla_cache"
_enabled = False


def enable_compilation_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at a local
    directory. Never raises: platforms without cache support just skip."""
    global _enabled
    if _enabled:
        return
    path = os.environ.get("MT3D_COMPILE_CACHE_DIR", _DEFAULT)
    if not path:
        return
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time; tiny entries
        # stay in-memory only (size threshold keeps the dir bounded)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
    except Exception:
        pass

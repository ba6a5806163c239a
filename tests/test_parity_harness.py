"""Bitrot guard for the trained-accuracy parity harness
(``scripts/parity_train.py`` — VERDICT r4 weak #5/next-round #8).

Runs the ENTIRE head-to-head pipeline — synthetic volume, shared miner
pool, this framework's Trainer, the reference torch BaseTrainer (with its
import stubs), the common held-out evaluator — at smoke scale (16^3
patches, 48^3 volume, 1 epoch x 2 steps) in a subprocess, and asserts both
sides produce finite metrics. Full-scale results live in PARITY.md.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "parity_train.py")


def test_parity_harness_smoke(tmp_path):
    pytest.importorskip("torch")
    if not os.path.isdir(os.environ.get("MT3D_REFERENCE_DIR",
                                        "/root/reference")):
        pytest.skip("reference checkout not available")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--patch", "16", "--vol", "48",
         "--epochs", "1", "--steps", "2", "--batch", "1",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    summary = None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            summary = json.loads(line)
            break
        except ValueError:
            continue
    assert summary is not None, r.stdout[-2000:]
    res = summary["results"]
    assert set(res) == {"this_framework", "reference_torch_cpu"}
    for side in res.values():
        for key in ("dice", "normals_cosine", "normals_mse"):
            assert -1.0 <= side[key] <= 1.0 or key == "normals_mse"
            assert side[key] == side[key]  # not NaN

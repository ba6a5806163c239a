"""Multi-host distribution layer (parallel/distributed.py): a 2-process x
4-virtual-CPU-device run — global mesh, per-host batch feeding via
jax.make_array_from_process_local_data, process-0 guard — must numerically
match a single-process run over the identical global batch (SURVEY.md §2.5:
the reference has no distributed runtime; this layer is new)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(num_processes, local_devices, tmp_path, tag):
    port = _free_port()
    procs = []
    outs = []
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    for i in range(num_processes):
        out = str(tmp_path / f"{tag}_p{i}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER,
             "--num-processes", str(num_processes),
             "--process-id", str(i), "--port", str(port),
             "--local-devices", str(local_devices), "--out", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    results = []
    for p, out in zip(procs, outs):
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, stdout.decode()[-3000:]
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_two_process_matches_single_process(tmp_path):
    multi = _run(2, 4, tmp_path, "multi")
    single = _run(1, 8, tmp_path, "single")[0]

    assert multi[0]["is_main"] is True
    assert multi[1]["is_main"] is False
    assert multi[0]["process_index"] == 0 and multi[1]["process_index"] == 1
    # every process computes the same replicated result
    np.testing.assert_allclose(multi[0]["loss"], multi[1]["loss"], rtol=1e-6)
    np.testing.assert_allclose(multi[0]["param_sum"], multi[1]["param_sum"],
                               rtol=1e-6)
    # multi-process == single-process on the same global batch
    np.testing.assert_allclose(multi[0]["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(multi[0]["grad_norm"], single["grad_norm"],
                               rtol=1e-4)
    np.testing.assert_allclose(multi[0]["param_sum"], single["param_sum"],
                               rtol=1e-5)

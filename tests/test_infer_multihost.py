"""Multi-host inference: a 2-process x 2-virtual-CPU-device engine run over a
shared store must be bit-identical to a 1-process x 2-device run. Tiles are
partitioned by process_index (disjoint store regions), per-process progress
watermarks coexist, and only process 0 finalizes/quantizes.

This is new-layer completeness (SURVEY.md §2.5: the reference has no
distributed runtime); the trainer's equivalent lives in test_distributed.py.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.data.zio import create_zarr, open_zarr

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "infer_multihost_worker.py")

# forces the tiled path on the 40^3 volume (rolling slab would be ~819 kB)
_BUDGET_BYTES = 300_000


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Shared volume + deterministic checkpoint, built once in the parent."""
    import jax
    import jax.numpy as jnp
    from mt3d_resenc_unet_tpu.core.plan import (TaskHead,
                                                plan_from_manual_config)
    from mt3d_resenc_unet_tpu.models.network import ResEncUNet
    from mt3d_resenc_unet_tpu.train.checkpoint import save_params

    tmp = tmp_path_factory.mktemp("mh_assets")
    rng = np.random.default_rng(11)
    vol = rng.integers(0, 255, (40, 40, 40)).astype(np.uint8)
    img_path = str(tmp / "img.zarr")
    create_zarr(img_path, vol.shape, vol.dtype, (20, 20, 20))[...] = vol

    model_config = dict(
        basic_encoder_block="BasicBlockD", basic_decoder_block="ConvBlock",
        bottleneck_block="BasicBlockD", features_per_stage=[8, 16],
        num_stages=2, n_blocks_per_stage=[1, 1], n_conv_per_stage_decoder=[1],
        kernel_sizes=3, strides=[1, 2])
    plan = plan_from_manual_config(model_config, (16, 16, 16), 1,
                                   [TaskHead("sheet", 1, "sigmoid")])
    model = ResEncUNet(plan=plan, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = jax.device_get(model.init(
        {"params": jax.random.key(7)}, x, train=False)["params"])
    ckpt = str(tmp / "params")
    save_params(ckpt, params)
    return img_path, ckpt


def _run(num_processes, assets, out_dir, tmp_path, tag):
    img, ckpt = assets
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs, results = [], []
    for i in range(num_processes):
        res = str(tmp_path / f"{tag}_p{i}.json")
        results.append(res)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER,
             "--num-processes", str(num_processes),
             "--process-id", str(i), "--port", str(port),
             "--local-devices", "2",
             "--img", img, "--ckpt", ckpt,
             "--out-dir", str(out_dir),
             "--budget-bytes", str(_BUDGET_BYTES),
             "--result", res],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    out = []
    for p, res in zip(procs, results):
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, stdout.decode()[-3000:]
        with open(res) as f:
            out.append(json.load(f))
    return out


def test_two_process_inference_matches_single(assets, tmp_path):
    single = _run(1, assets, tmp_path / "single", tmp_path, "s")[0]
    multi = _run(2, assets, tmp_path / "multi", tmp_path, "m")

    assert {r["process_index"] for r in multi} == {0, 1}
    store_s, store_m = single["store"], multi[0]["store"]

    # per-process watermarks exist for the multi run
    assert os.path.exists(
        os.path.join(store_m, ".model_pass_progress.p0.json"))
    assert os.path.exists(
        os.path.join(store_m, ".model_pass_progress.p1.json"))
    # each process owns a disjoint, non-empty tile subset
    tiles = []
    for i in (0, 1):
        with open(os.path.join(store_m,
                               f".model_pass_progress.p{i}.json")) as f:
            done = [tuple(t) for t in json.load(f)["tiles_done"]]
        assert done, f"process {i} completed no tiles"
        tiles.append(set(done))
    assert not (tiles[0] & tiles[1])

    # identical compiled forward on identical per-tile inputs -> bit-identical
    for ds in ("sheet_sum", "sheet_count", "sheet_final"):
        a = open_zarr(os.path.join(store_s, ds)).read_all()
        b = open_zarr(os.path.join(store_m, ds)).read_all()
        np.testing.assert_array_equal(a, b, err_msg=ds)

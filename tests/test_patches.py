"""Patch miner tests on synthetic labeled volumes with known valid sets
(SURVEY.md §4). The fast cell-based miner must agree with a direct
transcription of the reference validity rule (helpers.py:38-69)."""

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.data.patches import (
    PatchCache,
    find_label_bounding_box,
    find_valid_patches,
)
from mt3d_resenc_unet_tpu.data.zio import create_zarr


def _make_volume(tmp_path, data, chunks=(16, 16, 16)):
    vol = create_zarr(str(tmp_path / "labels.zarr"), data.shape, data.dtype,
                      chunks, compressor=None)
    vol[...] = data
    return vol


def _reference_rule(data, patch_size, bbox_threshold, label_threshold):
    """Direct per-patch transcription of the reference validity check."""
    pZ, pY, pX = patch_size
    nz = np.argwhere(data != 0)
    if nz.size == 0:
        return set()
    minz, miny, minx = nz.min(0)
    maxz, maxy, maxx = nz.max(0)
    valid = set()
    for z in range(minz, maxz - pZ + 2, pZ // 2):
        for y in range(miny, maxy - pY + 2, pY // 2):
            for x in range(minx, maxx - pX + 2, pX // 2):
                patch = data[z:z + pZ, y:y + pY, x:x + pX]
                coords = np.argwhere(patch != 0)
                if coords.size == 0:
                    continue
                mn = coords.min(0); mx = coords.max(0)
                bb = np.prod(mx - mn + 1)
                if bb / patch.size < bbox_threshold:
                    continue
                if np.count_nonzero(patch) / patch.size < label_threshold:
                    continue
                valid.add((z, y, x))
    return valid


def test_bounding_box(tmp_path):
    data = np.zeros((40, 40, 40), np.uint8)
    data[5:20, 10:30, 3:35] = 1
    vol = _make_volume(tmp_path, data)
    assert find_label_bounding_box(vol, (16, 16, 16)) == (5, 19, 10, 29, 3, 34)


def test_bounding_box_empty(tmp_path):
    vol = _make_volume(tmp_path, np.zeros((20, 20, 20), np.uint8))
    assert find_label_bounding_box(vol)[1] == -1
    assert find_valid_patches(vol, (8, 8, 8)) == []


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_miner_matches_reference_rule(tmp_path, seed):
    rng = np.random.default_rng(seed)
    data = np.zeros((48, 48, 48), np.uint8)
    # a few dense blobs + sparse speckle
    for _ in range(3):
        z, y, x = rng.integers(0, 28, 3)
        data[z:z + 20, y:y + 20, x:x + 20] = (
            rng.random((20, 20, 20)) > 0.3).astype(np.uint8)
    data[rng.integers(0, 48, 200), rng.integers(0, 48, 200),
         rng.integers(0, 48, 200)] = 1
    vol = _make_volume(tmp_path, data, chunks=(17, 23, 16))

    patch = (16, 16, 16)
    got = find_valid_patches(vol, patch, bbox_threshold=0.5,
                             label_threshold=0.05, verbose=False)
    got_set = {tuple(p["start_pos"]) for p in got}
    want = _reference_rule(data, patch, 0.5, 0.05)
    assert got_set == want


def test_miner_thresholds(tmp_path):
    data = np.zeros((32, 32, 32), np.uint8)
    data[0:16, 0:16, 0:16] = 1  # one fully-labeled patch at origin
    vol = _make_volume(tmp_path, data)
    got = find_valid_patches(vol, (16, 16, 16), bbox_threshold=0.97,
                             label_threshold=0.5, verbose=False)
    assert {tuple(p["start_pos"]) for p in got} == {(0, 0, 0)}
    # stricter density excludes it never (density = 1.0); looser bbox keeps it
    got = find_valid_patches(vol, (16, 16, 16), bbox_threshold=1.0,
                             label_threshold=1.0, verbose=False)
    assert {tuple(p["start_pos"]) for p in got} == {(0, 0, 0)}


def test_patch_cache_roundtrip(tmp_path):
    cache = PatchCache(tmp_path / "cache", "m", (16, 16, 16))
    assert cache.load() is None
    patches = [{"volume_idx": 0, "start_pos": [1, 2, 3]}]
    cache.save(patches)
    assert cache.load() == patches
    assert cache.path.name == "m_16_16_16_cache.json"

"""Offline tooling tests: image-stack conversion, bbox crop, mesh
rasterization, normals slice export."""

import os

import numpy as np
import pytest

from mt3d_resenc_unet_tpu.data.zio import create_zarr, open_zarr


def test_zarr_crop(tmp_path):
    from mt3d_resenc_unet_tpu.tools.zarr_crop import cut_zarr_bounding_box

    data = np.arange(40 * 40 * 40, dtype=np.uint16).reshape(40, 40, 40)
    src = create_zarr(str(tmp_path / "src.zarr"), data.shape, data.dtype,
                      (16, 16, 16))
    src[...] = data
    out = cut_zarr_bounding_box(str(tmp_path / "src.zarr"),
                                str(tmp_path / "dst.zarr"),
                                5, 30, 10, 35, 0, 20)
    dst = open_zarr(out)
    np.testing.assert_array_equal(dst.read_all(), data[5:30, 10:35, 0:20])


def test_stack_images_to_zarr(tmp_path):
    pytest.importorskip("cv2")
    import cv2
    from mt3d_resenc_unet_tpu.tools.tiff_to_zarr import stack_images_to_zarr

    seg = tmp_path / "seg01"
    (seg / "layers").mkdir(parents=True)
    (seg / "inklabels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(seg / "layers" / f"layer_{i:02d}.png"),
                    rng.integers(0, 255, (20, 24), np.uint8) + np.uint8(0))
        cv2.imwrite(str(seg / "inklabels" / f"ink_{i:02d}.png"),
                    (rng.random((20, 24)) > 0.5).astype(np.uint8) * 255)

    group = stack_images_to_zarr(str(seg), start=0, stop=2)
    layers = open_zarr(os.path.join(group, "layers.zarr"))
    ink = open_zarr(os.path.join(group, "inklabels.zarr"))
    assert layers.shape == (3, 20, 24)
    assert ink.shape == (3, 20, 24)
    assert layers.dtype == np.uint8
    assert set(np.unique(ink.read_all())) <= {0, 255}


def test_slices_to_zarr(tmp_path):
    pytest.importorskip("cv2")
    import cv2
    from mt3d_resenc_unet_tpu.tools.tiff_to_zarr import slices_to_zarr

    d = tmp_path / "stack"
    d.mkdir()
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 65535, (16, 16), np.uint16) for _ in range(4)]
    for i, f in enumerate(frames):
        cv2.imwrite(str(d / f"{i:03d}.png"), f)
    out = slices_to_zarr(str(d), str(tmp_path / "out.zarr"), pattern="*.png")
    vol = open_zarr(out)
    assert vol.shape == (4, 16, 16)
    np.testing.assert_array_equal(vol[1], frames[1])


def _write_plane_obj(path, z0=4.0, size=10.0, normal_z=1.0):
    """A flat square at height z0 with +z normals, split into 2 triangles."""
    with open(path, "w") as f:
        for (x, y) in [(0, 0), (size, 0), (size, size), (0, size)]:
            f.write(f"v {x} {y} {z0}\n")
        for _ in range(4):
            f.write(f"vn 0 0 {normal_z}\n")
        f.write("f 1//1 2//2 3//3\n")
        f.write("f 1//1 3//3 4//4\n")


def test_mesh_obj_loading(tmp_path):
    from mt3d_resenc_unet_tpu.tools.mesh_rasterize import load_obj

    p = tmp_path / "plane.obj"
    _write_plane_obj(p)
    v, t, vn = load_obj(str(p))
    assert v.shape == (4, 3) and t.shape == (2, 3)
    np.testing.assert_allclose(vn, [[0, 0, 1]] * 4, atol=1e-6)


def test_mesh_normals_rasterization(tmp_path):
    """A flat +z plane at z=4 rasterizes normals (0,0,1) -> uint16
    (32767, 32767, 65535) on the slice through it, and nothing elsewhere."""
    from mt3d_resenc_unet_tpu.tools.mesh_rasterize import (
        load_obj, rasterize_normals_slice)

    p = tmp_path / "plane.obj"
    _write_plane_obj(p, z0=4.0)
    v, t, vn = load_obj(str(p))
    img = rasterize_normals_slice(v, t, vn, 4.0, w=16, h=16)
    hit = img.any(axis=-1)
    assert hit.any()
    # decoded normals at hits ~ (0, 0, 1)
    dec = img[hit].astype(np.float32) / 32767.5 - 1.0
    np.testing.assert_allclose(dec[:, 0], 0.0, atol=2e-4)
    np.testing.assert_allclose(dec[:, 2], 1.0, atol=1e-4)
    # slice far away: empty
    img2 = rasterize_normals_slice(v, t, vn, 12.0, w=16, h=16)
    assert not img2.any()


def test_mesh_labels(tmp_path):
    from mt3d_resenc_unet_tpu.tools.mesh_rasterize import write_mesh_labels

    p1 = tmp_path / "a.obj"
    p2 = tmp_path / "b.obj"
    _write_plane_obj(p1, z0=2.0)
    _write_plane_obj(p2, z0=5.0)
    out = tmp_path / "labels"
    write_mesh_labels([str(p1), str(p2)], str(out), (0, 8), 16, 16,
                      num_threads=2)
    import imageio.v2 as imageio
    sl2 = imageio.imread(out / "00002.png")
    sl5 = imageio.imread(out / "00005.png")
    assert (sl2 == 1).any() and not (sl2 == 2).any()
    assert (sl5 == 2).any() and not (sl5 == 1).any()


def test_normals_slices_export(tmp_path):
    from mt3d_resenc_unet_tpu.tools.normals_slices import write_normals_slices

    vol = create_zarr(str(tmp_path / "n.zarr"), (3, 4, 8, 8), np.uint16,
                      (3, 4, 8, 8))
    vol[...] = np.full((3, 4, 8, 8), 40000, np.uint16)
    n = write_normals_slices(str(tmp_path / "n.zarr"),
                             str(tmp_path / "slices"), use_16bit=True)
    assert n == 4
    assert len(os.listdir(tmp_path / "slices")) == 4

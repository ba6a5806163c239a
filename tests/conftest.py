"""Test configuration: force CPU with 8 virtual devices BEFORE jax imports.

This is the TPU-equivalent of a fake multi-device backend (SURVEY.md §4):
pjit sharding and collective behavior is validated on an 8-way host mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_zarr_dir(tmp_path):
    return str(tmp_path / "store.zarr")

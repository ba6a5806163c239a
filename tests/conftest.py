"""Test configuration: force CPU with 8 virtual devices BEFORE the backend
initializes.

This is the TPU-equivalent of a fake multi-device backend (SURVEY.md §4):
pjit sharding and collective behavior is validated on an 8-way host mesh.

Note: this session's environment presets JAX_PLATFORMS=axon (a TPU plugin
that ignores a later env override), so we must force the platform through
jax.config before the first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_zarr_dir(tmp_path):
    return str(tmp_path / "store.zarr")

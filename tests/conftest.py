"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
exercised without TPU hardware (the standard JAX analogue of a fake backend).
Set RGBD360_TEST_TPU=1 to run on the real chip instead.
"""

import os

if not os.environ.get("RGBD360_TEST_TPU"):
    # jax may already be imported by a sitecustomize hook, so plain env vars
    # are not enough — update the live config before any backend is created.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")
SAMPLES = REFERENCE / "samples"


@pytest.fixture(scope="session")
def sample_paths():
    paths = sorted(SAMPLES.glob("sphere_images_*.bin"))
    if not paths:
        pytest.skip("reference samples not available")
    return paths


@pytest.fixture(scope="session")
def calibration():
    from rgbd360_tpu.io.calib import load_calibration

    if not (REFERENCE / "Calibration").exists():
        pytest.skip("reference calibration not available")
    return load_calibration(
        REFERENCE / "Calibration/Extrinsics",
        REFERENCE / "Calibration/Intrinsics",
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

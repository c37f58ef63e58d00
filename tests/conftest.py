"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths can be
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Must be set before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import pytest  # noqa: E402

DATASETS = pathlib.Path("/root/reference/datasets")


@pytest.fixture(scope="session")
def lp_datasets():
    return DATASETS / "linear_programming"


@pytest.fixture(scope="session")
def mip_datasets():
    return DATASETS / "mip"

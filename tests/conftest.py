"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths can be
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Must be set before jax import.
"""

import os

# NOTE: this environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and the
# jax build here resolves JAX_PLATFORM_NAME with higher priority, so set both.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # multi_thread_eigen=false: this box has few cores; 8 virtual devices
    # each spinning an eigen pool causes pathological contention.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_multi_thread_eigen=false"
    ).strip()

# Persistent XLA compilation cache: the PDLP major-iteration program takes
# ~15s to compile on this box; cache it across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cuopt_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import pathlib  # noqa: E402

import pytest  # noqa: E402

DATASETS = pathlib.Path("/root/reference/datasets")


@pytest.fixture(scope="session")
def lp_datasets():
    return DATASETS / "linear_programming"


@pytest.fixture(scope="session")
def mip_datasets():
    return DATASETS / "mip"

"""Linkable C ABI: build cpp/c_api/c_api_smoke.c against
libcuopt_tpu_c.so and solve afiro through it (reference
cpp/tests/c_api_tests/c_api_test.c over cuopt_c.h:106-668)."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AFIRO = "/root/reference/datasets/linear_programming/afiro_original.mps"


@pytest.mark.skipif(shutil.which("make") is None or
                    shutil.which("gcc") is None,
                    reason="no native toolchain")
@pytest.mark.skipif(not os.path.exists(AFIRO),
                    reason="afiro dataset not mounted")
def test_c_abi_smoke():
    r = subprocess.run(
        ["make", "-C", os.path.join(REPO, "cpp"), "all", "c_api_smoke"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault("JAX_PLATFORM_NAME", "cpu")
    r = subprocess.run(
        [os.path.join(REPO, "cpp", "c_api", "c_api_smoke"), AFIRO],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "C_API_SMOKE_OK" in r.stdout
    assert "objective=-464.75" in r.stdout

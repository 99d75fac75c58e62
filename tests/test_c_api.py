"""C API (c_api/ — reference c_api/ parity): build the shared library and
drive it from a real C program."""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPI = os.path.join(REPO, "c_api")


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
def test_c_api_example():
    subprocess.run(["make", "-s"], cwd=CAPI, check=True, timeout=120)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [os.path.join(CAPI, "example_c"), REPO],
        cwd=CAPI,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "C API EXAMPLE: OK" in res.stdout

"""C ABI (include/icicle_tpu.h) end-to-end: builds libicicle_tpu.so + the C
smoke test and runs it in a subprocess — the proof that a non-Python consumer
(the reference's wrappers/rust|golang role, Cargo.toml:3-19) can drive the
framework through a stable extern \"C\" boundary."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_c_abi_smoke():
    build = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "build_capi.sh")],
        capture_output=True, text=True, timeout=300)
    assert build.returncode == 0, build.stderr[-800:]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)   # test binary pins cpu via init("cpu")
    run = subprocess.run(
        [os.path.join(REPO, "build", "test_capi")],
        capture_output=True, text=True, timeout=900, env=env)
    assert run.returncode == 0, (run.stdout[-500:], run.stderr[-500:])
    assert "ALL C ABI CHECKS PASSED" in run.stdout

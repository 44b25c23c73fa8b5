"""Test configuration: run on a virtual 8-device CPU mesh.

Must set platform env vars *before* jax initializes (mirrors the reference's
CPU-as-reference-device test harness, icicle/tests/test_base.h:22-63: our
"reference device" is the XLA CPU backend, the "main device" is TPU when
present; CI runs everything on the virtual CPU mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env pins JAX_PLATFORMS=axon
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the CI host is single-core, so XLA:CPU compiles
# dominate test time; cache them across processes/runs.
os.makedirs("/root/.cache/jax_local", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_local")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    """Seeded numpy RNG; the seed is logged so failures are reproducible
    (same policy as reference test_base.h:52-57)."""
    seed = int(os.environ.get("ICICLE_TPU_TEST_SEED", "20260816"))
    print(f"[seed={seed}]")
    return np.random.default_rng(seed)

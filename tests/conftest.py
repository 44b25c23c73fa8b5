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
# dominate test time; cache them across processes/runs. Keyed by the host's
# CPU feature set — XLA:CPU AOT entries from a different machine are
# rejected with cpu_aot_loader feature-mismatch spam (see runtime/cache.py).
from icicle_tpu.runtime.cache import host_fingerprint  # noqa: E402

_cache = "/root/.cache/jax_local/cpu-" + host_fingerprint()
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# fast/slow lanes (VERDICT r3 ask): modules dominated by big jitted pipelines
# or subprocess builds are `slow`; everything else is `fast`. The fast lane
# (`pytest -m fast`) must stay under ~10 min on this 1-core host — the split
# below is from the round-5 per-module timing run (warm compile cache):
# test_msm/test_g2 exceed 10 min EACH (generic-pipeline compiles),
# test_curve is ~3 min; the remaining fast set sums to ~8 min.
_SLOW_MODULES = {
    "test_msm_tpu.py", "test_msm_tpu2.py", "test_msm_tpu3.py",
    "test_msm_r12.py", "test_msm_sharded.py", "test_two_level.py",
    "test_ml_kem.py", "test_ml_kem_tpu.py", "test_pairing_ate.py",
    "test_capi.py", "test_reference_vectors.py", "test_fri.py",
    "test_sumcheck.py", "test_blake3.py", "test_sharded.py",
    "test_ecntt.py", "test_glv.py", "test_msm_glv.py",
    "test_msm.py", "test_g2.py", "test_curve.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = os.path.basename(str(item.fspath))
        if name in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    """Seeded numpy RNG; the seed is logged so failures are reproducible
    (same policy as reference test_base.h:52-57)."""
    seed = int(os.environ.get("ICICLE_TPU_TEST_SEED", "20260816"))
    print(f"[seed={seed}]")
    return np.random.default_rng(seed)

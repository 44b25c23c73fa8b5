"""Persistent XLA compilation cache setup.

The limb kernels compile into sizeable XLA programs; caching them on disk keeps
re-runs (tests, benches, CLI tools) fast. Enabled automatically on package
import unless ICICLE_TPU_NO_CACHE is set.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    if os.environ.get("ICICLE_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "ICICLE_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "icicle_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags

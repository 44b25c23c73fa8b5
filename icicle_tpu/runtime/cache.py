"""Persistent XLA compilation cache setup.

The limb kernels compile into sizeable XLA programs; caching them on disk keeps
re-runs (tests, benches, CLI tools) fast. Enabled automatically on package
import unless ICICLE_TPU_NO_CACHE is set.
"""

from __future__ import annotations

import os


def host_fingerprint() -> str:
    """Short hash of this host's CPU feature set.

    XLA:CPU persistent-cache entries embed AOT code compiled for the exact
    machine features of the compiling host; loading them on a host with a
    different feature set is rejected entry-by-entry (cpu_aot_loader
    "machine feature mismatch", risk of SIGILL) — seen when the CI driver
    ran against a cache populated on a different machine (MULTICHIP_r04).
    Keying the cache path by the feature set gives every machine its own
    namespace instead."""
    import hashlib
    import platform

    feat = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feat += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(feat.encode()).hexdigest()[:10]


def enable_compilation_cache() -> None:
    if os.environ.get("ICICLE_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "ICICLE_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "icicle_tpu_xla"),
    )
    # CPU-only processes get a per-host-feature-set subdir (see
    # host_fingerprint); TPU processes keep the shared dir — their cache
    # entries are keyed by the accelerator, not the host, and re-warming a
    # TPU cache costs 20-30 min per kernel shape.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        cache_dir = os.path.join(cache_dir, "cpu-" + host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags

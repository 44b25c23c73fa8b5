"""Per-op backend registry — the TPU analog of ICICLE's dispatch layer.

Reference L3 (include/icicle/dispatcher.h) keys a per-API function table by
device-type string, populated by backend DSOs at static-init. Here a backend is
a *kernel implementation*: "xla" (pure jnp, runs on any platform and is the
bit-exactness reference) or "pallas" (hand-written TPU kernels). Ops register
implementations with :func:`register_impl`; dispatch picks config.backend, then
the process default, then whatever is registered.
"""

from __future__ import annotations

import os
import threading
from typing import Callable

from icicle_tpu.runtime.errors import IcicleError, IcicleException
from icicle_tpu.runtime.log import logger

XLA = "xla"
PALLAS = "pallas"

_registry: dict[str, dict[str, Callable]] = {}
_lock = threading.Lock()
_default_backend = os.environ.get("ICICLE_TPU_BACKEND", "auto")


def register_impl(api: str, backend: str, fn: Callable) -> Callable:
    """Register `fn` as the `backend` implementation of `api`
    (analog of REGISTER_<API>_BACKEND macros, include/icicle/backend/*.h)."""
    with _lock:
        _registry.setdefault(api, {})[backend] = fn
    logger.debug("registered %s backend for %s", backend, api)
    return fn


def impl(api: str, backend: str):
    """Decorator form of register_impl."""
    def deco(fn):
        return register_impl(api, backend, fn)
    return deco


def set_default_backend(backend: str) -> None:
    """Process-wide backend preference (analog of icicle_set_device for the
    kernel-impl axis). "auto" = pallas on TPU when registered, else xla."""
    global _default_backend
    _default_backend = backend


def get_default_backend() -> str:
    return _default_backend


def _auto_backend(api: str) -> str:
    impls = _registry.get(api, {})
    if PALLAS in impls:
        import jax
        try:
            if jax.default_backend() not in ("cpu",):
                return PALLAS
        except Exception:
            pass
    return XLA


def dispatch(api: str, backend: str | None = None) -> Callable:
    """Resolve the implementation for `api` (reference dispatcher.h:38-50)."""
    impls = _registry.get(api)
    if not impls:
        raise IcicleException(IcicleError.API_NOT_IMPLEMENTED, api)
    choice = backend or _default_backend
    if choice == "auto":
        choice = _auto_backend(api)
    if choice not in impls:
        if XLA in impls:  # graceful fallback, mirrors CPU-default behavior
            logger.debug("backend %s not registered for %s; using xla", choice, api)
            choice = XLA
        else:
            raise IcicleException(
                IcicleError.API_NOT_IMPLEMENTED, f"{api} has no {choice} backend")
    return impls[choice]


def registered_apis() -> dict[str, list[str]]:
    return {k: sorted(v) for k, v in _registry.items()}

"""Perf timing utilities (reference R10: include/icicle/utils/timer.hpp
Timer RAII logger + the START_TIMER/END_TIMER macros in tests/benches).

TPU semantics: a device timer must block on the computation, so `device_timer`
calls jax.block_until_ready on the tracked value. `trace` integrates with
jax.profiler for xprof captures.
"""

from __future__ import annotations

import contextlib
import time

from icicle_tpu.runtime.log import logger


class Timer:
    """Context manager: logs elapsed wall time on exit (Timer RAII analog)."""

    def __init__(self, label: str, log: bool = True):
        self.label = label
        self.log = log
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        if self.log:
            logger.info("%s: %.3f ms", self.label, self.elapsed * 1e3)
        return False


@contextlib.contextmanager
def device_timer(label: str):
    """Times device work: blocks on everything produced inside the context.

    Usage:
        with device_timer("msm") as out:
            out.append(run(x))
    """
    import jax
    outputs: list = []
    t0 = time.perf_counter()
    yield outputs
    jax.block_until_ready(outputs)
    logger.info("%s: %.3f ms (device-synced)", label,
                (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def trace(label: str):
    """jax.profiler trace annotation (xprof hook)."""
    import jax
    with jax.profiler.TraceAnnotation(label):
        yield

"""Host<->device transfer/compute overlap.

Reference pattern: the 3-stream double-buffered NTT
(examples/c++/best-practice-ntt/example.cpp:36-50) overlaps H2D copies,
kernel execution, and D2H copies with two reusable device buffers.

TPU-native design: XLA dispatch is already asynchronous — `jax.device_put`
and jitted calls return futures immediately, and the runtime orders them on
the device queue, so transfers for chunk i+1 proceed while chunk i computes.
What the CUDA example achieves with explicit streams reduces here to a
*scheduling discipline*: keep >=2 chunks in flight and only block (D2H) on
the oldest. `stream_map` packages that discipline; `donate=True` reuses the
device buffers in place (the analog of the example's two d_vec buffers).
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator

import jax
import numpy as np


def stream_map(fn: Callable, host_chunks: Iterable, device=None,
               prefetch: int = 2, to_host: bool = True) -> Iterator:
    """Map `fn` over host-resident chunks with transfer/compute overlap.

    fn: device computation (ideally jitted; donate its argument to reuse the
        device input buffer across chunks).
    host_chunks: iterable of host arrays (or pytrees of them).
    prefetch: number of chunks kept in flight (2 = classic double buffering).
    to_host: if True, yield numpy results (blocking D2H on the oldest chunk
        only — younger chunks keep computing); if False, yield device arrays.

    Yields one result per chunk, in order.
    """
    if prefetch < 1:
        raise ValueError("prefetch must be >= 1")
    dev = device or jax.devices()[0]

    def fetch(res):
        if not to_host:
            return res
        return jax.tree_util.tree_map(np.asarray, res)

    inflight: deque = deque()
    for chunk in host_chunks:
        d = jax.device_put(chunk, dev)      # async H2D (own queue slot)
        inflight.append(fn(d))              # async compute
        if len(inflight) > prefetch:
            yield fetch(inflight.popleft())  # block only on the oldest
    while inflight:
        yield fetch(inflight.popleft())


def stream_reduce(fn: Callable, combine: Callable, host_chunks: Iterable,
                  device=None, prefetch: int = 2):
    """Overlapped map + on-device tree-free reduction.

    Like stream_map but folds results on device with `combine` (e.g. a
    point-add for chunked MSM, or jnp.add) and returns the single final
    value. The reduction stays on the device queue, so no intermediate D2H.
    """
    acc = None
    for res in stream_map(fn, host_chunks, device=device, prefetch=prefetch,
                          to_host=False):
        acc = res if acc is None else combine(acc, res)
    return acc

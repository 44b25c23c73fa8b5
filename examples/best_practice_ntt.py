"""Overlapped H2D / compute / D2H batch NTT (mirrors the reference's
examples/c++/best-practice-ntt: 3 CUDA streams + double buffering).

On TPU the same overlap falls out of XLA's async dispatch; stream_map just
enforces the double-buffer discipline (keep 2 chunks in flight, block only
on the oldest). Run: python examples/best_practice_ntt.py
"""

import time

import jax
import numpy as np

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops.ntt import ntt, ntt_init_domain
from icicle_tpu.runtime.config import NTTDir
from icicle_tpu.utils.pipeline import stream_map

LOG_NTT_SIZE = 16
BATCH = 16          # rows per chunk
N_CHUNKS = 8

f = get_field("babybear")
ntt_init_domain(f, LOG_NTT_SIZE)
n = 1 << LOG_NTT_SIZE

rng = np.random.default_rng(0)
chunks = [rng.integers(0, f.modulus, size=(BATCH, n), dtype=np.uint32)
          for _ in range(N_CHUNKS)]


@jax.jit
def fwd(x):
    return ntt(f, x, NTTDir.FORWARD)


# warm up compiles + transfer programs outside the timed loops (the
# overlap only shows on hardware with independent DMA engines, i.e. TPU;
# a 1-core CPU host serializes everything anyway)
np.asarray(fwd(chunks[0]))
list(stream_map(fwd, chunks[:2], prefetch=2))

t0 = time.perf_counter()
outs = list(stream_map(fwd, chunks, prefetch=2))
dt = time.perf_counter() - t0

t0 = time.perf_counter()
seq = [np.asarray(fwd(jax.device_put(c))) for c in chunks]
dt_seq = time.perf_counter() - t0

for a, b in zip(outs, seq):
    assert np.array_equal(a, b)
total = N_CHUNKS * BATCH * n
print(f"overlapped: {dt*1e3:.1f} ms ({total/dt/1e6:.1f} M elems/s)  "
      f"sequential: {dt_seq*1e3:.1f} ms ({total/dt_seq/1e6:.1f} M elems/s)")

"""stream_map/stream_reduce: overlap discipline must not change results
(reference analog: best-practice-ntt double-buffer example)."""

import jax
import jax.numpy as jnp
import numpy as np

from icicle_tpu.utils.pipeline import stream_map, stream_reduce
from icicle_tpu.fields.field import get_field
from icicle_tpu.ops.ntt import ntt, ntt_init_domain
from icicle_tpu.runtime.config import NTTDir


def test_stream_map_matches_sequential(rng):
    f = get_field("babybear")
    ntt_init_domain(f, 5)
    chunks = [rng.integers(0, f.modulus, size=(2, 32), dtype=np.uint32)
              for _ in range(5)]
    fwd = jax.jit(lambda x: ntt(f, x, NTTDir.FORWARD))
    outs = list(stream_map(fwd, chunks, prefetch=2))
    seq = [np.asarray(fwd(c)) for c in chunks]
    assert len(outs) == len(seq)
    for a, b in zip(outs, seq):
        assert np.array_equal(a, b)


def test_stream_map_prefetch_one_and_device_results(rng):
    chunks = [rng.integers(0, 100, size=(8,), dtype=np.uint32)
              for _ in range(3)]
    dbl = jax.jit(lambda x: x * 2)
    outs = list(stream_map(dbl, chunks, prefetch=1, to_host=False))
    for a, c in zip(outs, chunks):
        assert isinstance(a, jax.Array)
        assert np.array_equal(np.asarray(a), c * 2)


def test_stream_reduce(rng):
    chunks = [rng.integers(0, 1000, size=(16,), dtype=np.uint64)
              for _ in range(4)]
    total = stream_reduce(jax.jit(lambda x: jnp.sum(x)),
                          lambda a, b: a + b, chunks)
    assert int(total) == sum(int(c.sum()) for c in chunks)

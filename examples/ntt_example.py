"""NTT example (mirrors reference examples/c++/ntt + best-practice-ntt):
forward/inverse roundtrip and polynomial multiplication via the evaluation
domain. Run: python examples/ntt_example.py [log_size]
"""

import sys
import time

import numpy as np
import jax

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops import ntt as N
from icicle_tpu.runtime.config import NTTConfig, NTTDir


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    f = get_field("babybear")
    n = 1 << logn
    N.ntt_init_domain(f, logn)
    rng = np.random.default_rng(0)
    x = f.rand(rng, (n,))

    t0 = time.time()
    e = N.ntt_jit(f, x, NTTDir.FORWARD, NTTConfig())
    jax.block_until_ready(e)
    print(f"babybear NTT 2^{logn}: {time.time() - t0:.3f}s (incl compile)")

    t0 = time.time()
    e = N.ntt_jit(f, x, NTTDir.FORWARD, NTTConfig())
    jax.block_until_ready(e)
    dt = time.time() - t0
    print(f"steady: {dt * 1000:.2f} ms "
          f"({logn * (n // 2) / dt / 1e9:.2f} G butterflies/s)")

    back = N.ntt_jit(f, e, NTTDir.INVERSE, NTTConfig())
    assert np.array_equal(np.asarray(back), np.asarray(x))
    print("roundtrip OK")


if __name__ == "__main__":
    main()

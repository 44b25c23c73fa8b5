"""MSM example (mirrors reference examples/c++/msm).

Computes a bn254 G1 multi-scalar multiplication two ways — the generic XLA
kernel (ops.msm) and the Pallas TPU pipeline (ops.msm_tpu) — and checks they
agree. Run: python examples/msm_example.py [log_size]
"""

import sys
import time

import numpy as np

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group
from icicle_tpu.curves.host_ec import ec_mul
from icicle_tpu.ops.msm import msm
from icicle_tpu.ops.msm_tpu import msm_tpu


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = 1 << logn
    curve = get_curve("bn254")
    g = get_group("bn254")
    fq, fr = curve.fq, curve.fr
    mod = fq.modulus
    rng = np.random.default_rng(0)

    print(f"bn254 G1 MSM, n = 2^{logn}")
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 30, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]

    s_dev = fr.from_ints(scalars)
    px = fq.from_ints([p[0] for p in pts])
    py = fq.from_ints([p[1] for p in pts])

    t0 = time.time()
    res = msm("bn254", s_dev, px, py)
    x, y = g.to_affine_canonical(res)
    print(f"  generic kernel: {time.time() - t0:.2f}s")
    got_a = (int(fq.to_ints(x)), int(fq.to_ints(y)))

    t0 = time.time()
    import jax
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    got_b = msm_tpu("bn254", s_dev, px, py, lanes=min(1024, n // 4),
                    backend=backend)
    print(f"  {backend} pipeline: {time.time() - t0:.2f}s")
    assert got_a == got_b, "pipelines disagree!"
    print(f"  result.x = {hex(got_a[0])[:34]}...")
    print("  OK: both pipelines agree")


if __name__ == "__main__":
    main()

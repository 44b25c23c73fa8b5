"""MSM with precomputed bases (reference examples/c++/msm flow with
msm_precompute_bases + MSMConfig::precompute_factor).

Usage: PYTHONPATH=. python examples/msm_precompute_example.py [log_n]
"""

import sys
import time

import numpy as np

from icicle_tpu.curves.params import get_curve
from icicle_tpu.ops.msm import (
    msm_affine, msm_precompute_bases, MSMConfig,
)
from tests.ec_ref import ec_mul, msm_ref


def main() -> None:
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = 1 << log_n
    curve = get_curve("bn254")
    fr, fq, mod = curve.fr, curve.fq, curve.fq.modulus
    rng = np.random.default_rng(0)

    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 30, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]
    px = fq.from_ints([p[0] for p in pts])
    py = fq.from_ints([p[1] for p in pts])
    scal = fr.from_ints(scalars)

    cfg = MSMConfig(c=8, backend="xla")
    t0 = time.perf_counter()
    plain = msm_affine("bn254", scal, px, py, cfg)
    print(f"plain msm:          {time.perf_counter() - t0:.2f}s")

    # one-time precompute (pays off across repeated MSMs on fixed bases)
    nu = 4
    pcfg = MSMConfig(c=8, backend="xla", precompute_factor=nu)
    t0 = time.perf_counter()
    ox, oy = msm_precompute_bases("bn254", np.asarray(px), np.asarray(py),
                                  pcfg)
    print(f"precompute (nu={nu}): {time.perf_counter() - t0:.2f}s "
          f"({ox.shape[0]} bases)")

    t0 = time.perf_counter()
    pre = msm_affine("bn254", scal, ox, oy, pcfg)
    print(f"precomputed msm:    {time.perf_counter() - t0:.2f}s")

    assert pre == plain, "precompute path diverged"
    if n <= 512:
        want = msm_ref(scalars, pts, mod) or (0, 0)
        assert plain == want, "msm != oracle"
        print("verified against the python-int oracle")
    print("OK")


if __name__ == "__main__":
    main()

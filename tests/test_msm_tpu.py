"""Pallas MSM pipeline tests (XLA fold backend on CPU; the pallas backend is validated on real TPUs) vs the python-int oracle.
The same code compiles to a Mosaic kernel on real TPUs (bench path)."""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.ops.msm_tpu import msm_tpu
from tests.ec_ref import ec_mul, msm_ref, INF


@pytest.mark.parametrize("n,lanes,c", [(64, 8, 6), (128, 16, 0)])
def test_msm_tpu_vs_oracle(n, lanes, c):
    curve = get_curve("bn254")
    mod = curve.fq.modulus
    fr, fq = curve.fr, curve.fq
    rng = np.random.default_rng(n)
    gen = (curve.gen_x, curve.gen_y)
    ks = [int(k) for k in rng.integers(1, 1 << 28, size=n)]
    pts = [ec_mul(gen, k, mod) for k in ks]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]

    got = msm_tpu("bn254",
                  fr.from_ints(scalars),
                  fq.from_ints([p[0] for p in pts]),
                  fq.from_ints([p[1] for p in pts]),
                  c=c or None, lanes=lanes, backend="xla")
    want = msm_ref(scalars, pts, mod)
    want = want if want is not INF else (0, 0)
    assert got == want


def test_msm_tpu_skewed_zeros():
    curve = get_curve("bn254")
    mod = curve.fq.modulus
    fr, fq = curve.fr, curve.fq
    rng = np.random.default_rng(3)
    gen = (curve.gen_x, curve.gen_y)
    n, lanes = 64, 8
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 20, size=n)]
    scalars = [0] * (n // 2) + [int(s) for s in rng.integers(0, 1 << 16, size=n // 2)]
    got = msm_tpu("bn254", fr.from_ints(scalars),
                  fq.from_ints([p[0] for p in pts]),
                  fq.from_ints([p[1] for p in pts]),
                  lanes=lanes, backend="xla")
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))

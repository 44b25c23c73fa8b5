"""Suffix-fold MSM pipeline (v2) vs the python-int oracle.

Runs the XLA twin of the Mosaic kernel on CPU (interpret-mode Pallas is
impractically slow for a body this size); the pallas backend runs the same
surrounding pipeline on real TPUs. Mirrors the reference's msm tests
(tests/test_curve_api.cpp MSM cases incl. skewed distributions)."""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.ops.msm_tpu2 import msm_tpu2
from tests.ec_ref import ec_mul, msm_ref, INF


def _setup(n, seed, scalar_bits=254):
    curve = get_curve("bn254")
    mod = curve.fq.modulus
    fr, fq = curve.fr, curve.fq
    rng = np.random.default_rng(seed)
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 28, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               if scalar_bits >= 254 else int(s)
               for s in rng.integers(0, 1 << min(scalar_bits, 62), size=n)]
    return curve, fr, fq, mod, pts, scalars


@pytest.mark.parametrize("n,T,c", [(64, 16, 6), (96, 32, 5), (128, 128, 0)])
def test_msm_tpu2_vs_oracle(n, T, c):
    curve, fr, fq, mod, pts, scalars = _setup(n, n)
    got = msm_tpu2("bn254", fr.from_ints(scalars),
                   fq.from_ints([p[0] for p in pts]),
                   fq.from_ints([p[1] for p in pts]),
                   c=c or None, T=T, backend="xla")
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))


def test_msm_tpu2_unaligned_and_zeros():
    # n not a multiple of the tile, half the scalars zero, tiny values
    curve, fr, fq, mod, pts, _ = _setup(56, 7)
    rng = np.random.default_rng(8)
    scalars = [0] * 28 + [int(s) for s in rng.integers(0, 1 << 16, size=28)]
    got = msm_tpu2("bn254", fr.from_ints(scalars),
                   fq.from_ints([p[0] for p in pts]),
                   fq.from_ints([p[1] for p in pts]),
                   c=6, T=16, backend="xla")
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))


def test_msm_tpu2_skewed_same_digit():
    # every scalar identical -> one bucket takes all points (worst skew)
    curve, fr, fq, mod, pts, _ = _setup(32, 9)
    scalars = [(13 << 12) | 5] * 32
    got = msm_tpu2("bn254", fr.from_ints(scalars),
                   fq.from_ints([p[0] for p in pts]),
                   fq.from_ints([p[1] for p in pts]),
                   c=5, T=16, backend="xla")
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))

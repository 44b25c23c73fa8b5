"""Prefix-scan MSM pipeline (v3) vs the python-int oracle.

Runs the XLA twin of the Mosaic kernel on CPU; the pallas backend runs the
same surrounding pipeline on real TPUs. Mirrors the reference's msm tests
(tests/test_curve_api.cpp MSM cases incl. skewed distributions)."""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.ops.msm_tpu3 import msm_tpu3
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


def _run(fr, fq, scalars, pts, **kw):
    return msm_tpu3("bn254", fr.from_ints(scalars),
                    fq.from_ints([p[0] for p in pts]),
                    fq.from_ints([p[1] for p in pts]),
                    backend="xla", **kw)


@pytest.mark.parametrize("n,T,c", [(64, 16, 6), (96, 32, 5), (128, 128, 0)])
def test_msm_tpu3_vs_oracle(n, T, c):
    curve, fr, fq, mod, pts, scalars = _setup(n, n)
    got = _run(fr, fq, scalars, pts, c=c or None, T=T)
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))


def test_msm_tpu3_unaligned_and_zeros():
    # n not a multiple of the tile, half the scalars zero, tiny values
    curve, fr, fq, mod, pts, _ = _setup(56, 7)
    rng = np.random.default_rng(8)
    scalars = [0] * 28 + [int(s) for s in rng.integers(0, 1 << 16, size=28)]
    got = _run(fr, fq, scalars, pts, c=6, T=16)
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))


def test_msm_tpu3_skewed_same_digit():
    # every scalar identical -> one bucket takes all points (worst skew)
    curve, fr, fq, mod, pts, _ = _setup(32, 9)
    scalars = [(13 << 12) | 5] * 32
    got = _run(fr, fq, scalars, pts, c=5, T=16)
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))


def test_msm_tpu3_repeated_point():
    # the bench shape: one point repeated (maximal bucket collisions)
    curve = get_curve("bn254")
    fr, fq, mod = curve.fr, curve.fq, curve.fq.modulus
    P = ec_mul((curve.gen_x, curve.gen_y), 0xDEADBEEF, mod)
    rng = np.random.default_rng(11)
    scalars = [int(s) for s in rng.integers(0, 1 << 62, size=48)]
    pts = [P] * 48
    got = _run(fr, fq, scalars, pts, c=6, T=16)
    want = ec_mul(P, sum(scalars) % fr.modulus, mod)
    assert got == (want if want is not INF else (0, 0))


def test_msm_tpu3_matches_v2():
    from icicle_tpu.ops.msm_tpu2 import msm_tpu2
    curve, fr, fq, mod, pts, scalars = _setup(80, 21)
    a = _run(fr, fq, scalars, pts, c=6, T=32)
    b = msm_tpu2("bn254", fr.from_ints(scalars),
                 fq.from_ints([p[0] for p in pts]),
                 fq.from_ints([p[1] for p in pts]),
                 c=6, T=32, backend="xla")
    assert a == b


def test_madd_list_small_b3_matches_mont_b3():
    # the Mosaic kernels use the small-int b3 addition chain; the mont-list
    # path is the CPU-verified baseline
    import jax
    import jax.numpy as jnp
    from icicle_tpu.pallas.msm_kernel import (_ListField, _madd_list,
                                              _kernel_consts, _b3_small)
    curve = get_curve("bn254")
    f = _ListField(curve.fq.engine)
    b3_np, one_np, nl = _kernel_consts("bn254")
    rng = np.random.default_rng(3)
    mod = curve.fq.modulus
    P1 = ec_mul((curve.gen_x, curve.gen_y), 12345, mod)
    P2 = ec_mul((curve.gen_x, curve.gen_y), 99999, mod)
    fq = curve.fq
    to_l = lambda v: [jnp.asarray(np.asarray(fq.to_mont(fq.from_ints([v])))[0, i:i+1]) for i in range(nl)]
    X1, Y1 = to_l(P1[0]), to_l(P1[1])
    Z1 = to_l(1)
    x2, y2 = to_l(P2[0]), to_l(P2[1])
    b3m = [jnp.asarray(b3_np[i:i+1]) for i in range(nl)]
    a = _madd_list(f, X1, Y1, Z1, x2, y2, b3m)
    b = _madd_list(f, X1, Y1, Z1, x2, y2, _b3_small(curve))
    for u, v in zip(a, b):
        for x, y in zip(u, v):
            assert np.array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("nu", [2, 4])
def test_msm_tpu3_precompute_vs_oracle(nu):
    """precompute_factor route: v3 over msm_precompute_bases output must
    equal the oracle (reference msm.h:23-34 precompute semantics)."""
    from icicle_tpu.ops.msm import msm_precompute_bases, MSMConfig

    c = 6
    curve, fr, fq, mod, pts, scalars = _setup(48, 21 + nu)
    px = fq.from_ints([p[0] for p in pts])
    py = fq.from_ints([p[1] for p in pts])
    ox, oy = msm_precompute_bases("bn254", px, py,
                                  MSMConfig(c=c, precompute_factor=nu))
    got = msm_tpu3("bn254", np.asarray(fr.from_ints(scalars)), ox, oy,
                   backend="xla", c=c, T=16, precompute_factor=nu)
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))

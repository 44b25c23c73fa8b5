"""EC group-law tests: vectorized complete formulas vs pure-int reference.

Mirrors the reference's curve sanity tests (icicle/tests/test_curve_api.cpp:
ECArithmetic / montgomery conversion cases) with the python-int oracle in
tests/ec_ref.py as the reference device.
"""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve, curve_names
from icicle_tpu.curves.group import get_group, Projective, pselect
from tests.ec_ref import ec_add, ec_mul, ec_neg, INF, msm_ref

CURVES = ["bn254", "bls12_377", "grumpkin"]  # one small, one 12-limb, one cycle


def rand_points(curve, g, n, rng):
    """Random points as small multiples of the generator (int oracle side)."""
    mod = curve.fq.modulus
    gen = (curve.gen_x, curve.gen_y)
    ks = [int(k) for k in rng.integers(1, 1 << 30, size=n)]
    pts = [ec_mul(gen, k, mod) for k in ks]
    return pts


def to_device(curve, g, pts):
    fq = curve.fq
    xs = fq.from_ints([p[0] for p in pts])
    ys = fq.from_ints([p[1] for p in pts])
    return g.from_affine_canonical(xs, ys)


def from_device(curve, g, proj):
    fq = curve.fq
    x, y = g.to_affine_canonical(proj)
    xi = fq.to_ints(x)
    yi = fq.to_ints(y)
    out = []
    for a, b in zip(np.ravel(xi), np.ravel(yi)):
        out.append(INF if (a == 0 and b == 0) else (int(a), int(b)))
    return out


@pytest.mark.parametrize("curve_name", CURVES)
def test_add_dbl_vs_reference(curve_name):
    curve = get_curve(curve_name)
    g = get_group(curve_name)
    mod = curve.fq.modulus
    rng = np.random.default_rng(7)
    n = 8
    pa = rand_points(curve, g, n, rng)
    pb = rand_points(curve, g, n, rng)
    da = to_device(curve, g, pa)
    db = to_device(curve, g, pb)

    got = from_device(curve, g, g.add(da, db))
    want = [ec_add(a, b, mod) for a, b in zip(pa, pb)]
    assert got == want

    got_dbl = from_device(curve, g, g.dbl(da))
    want_dbl = [ec_add(a, a, mod) for a in pa]
    assert got_dbl == want_dbl

    # mixed add: projective + affine(Montgomery)
    fq = curve.fq
    xb = fq.to_mont(fq.from_ints([p[0] for p in pb]))
    yb = fq.to_mont(fq.from_ints([p[1] for p in pb]))
    from icicle_tpu.curves.group import Affine
    got_mixed = from_device(curve, g, g.madd(da, Affine(xb, yb)))
    assert got_mixed == want


@pytest.mark.parametrize("curve_name", CURVES)
def test_complete_edge_cases(curve_name):
    """identity + P, P + (-P), P + P through the generic add."""
    curve = get_curve(curve_name)
    g = get_group(curve_name)
    mod = curve.fq.modulus
    rng = np.random.default_rng(3)
    pa = rand_points(curve, g, 4, rng)
    da = to_device(curve, g, pa)
    ident = g.identity((4,))

    # O + P = P
    assert from_device(curve, g, g.add(ident, da)) == pa
    # P + O = P
    assert from_device(curve, g, g.add(da, ident)) == pa
    # P + (-P) = O
    got = from_device(curve, g, g.add(da, g.neg(da)))
    assert got == [INF] * 4
    # P + P = 2P via generic add
    got2 = from_device(curve, g, g.add(da, da))
    assert got2 == [ec_add(p, p, mod) for p in pa]
    # O + O = O, and dbl(O) = O
    id1 = g.identity((2,))
    assert from_device(curve, g, g.add(id1, id1)) == [INF] * 2
    assert from_device(curve, g, g.dbl(id1)) == [INF] * 2


@pytest.mark.parametrize("curve_name", CURVES)
def test_scalar_mul(curve_name):
    curve = get_curve(curve_name)
    g = get_group(curve_name)
    mod = curve.fq.modulus
    rng = np.random.default_rng(11)
    k = int(rng.integers(1, curve.fr.modulus.bit_length())) | (1 << 100)
    k = int(rng.integers(1, 1 << 62)) * k % curve.fr.modulus
    gen_dev = g.generator(())
    got = from_device(curve, g, g.scalar_mul_int(gen_dev, k))[0]
    want = ec_mul((curve.gen_x, curve.gen_y), k, mod)
    assert got == want

    # subgroup order annihilates the generator
    got_r = from_device(curve, g, g.scalar_mul_int(gen_dev, curve.fr.modulus))[0]
    assert got_r == INF


def test_all_curves_generator_roundtrip():
    for name in curve_names():
        curve = get_curve(name)
        g = get_group(name)
        gen = g.generator(())
        got = from_device(curve, g, gen)[0]
        assert got == (curve.gen_x, curve.gen_y), name

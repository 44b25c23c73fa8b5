"""G2 group tests: Fp2 point ops + G2 MSM vs a python-int Fp2 oracle
(mirrors icicle/tests/test_curve_api.cpp G2 MSM cases)."""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve, _CURVES
from icicle_tpu.curves.group import get_group
from icicle_tpu.fields.field import _PARAMS
from icicle_tpu.ops.msm import msm, MSMConfig


class Fp2:
    def __init__(self, p, nr):
        self.p, self.nr = p, nr

    def add(self, a, b): return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)
    def sub(self, a, b): return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def mul(self, a, b):
        p, nr = self.p, self.nr
        return ((a[0] * b[0] + nr * a[1] * b[1]) % p,
                (a[0] * b[1] + a[1] * b[0]) % p)

    def inv(self, a):
        p, nr = self.p, self.nr
        norm = (a[0] * a[0] - nr * a[1] * a[1]) % p
        ninv = pow(norm, -1, p)
        return (a[0] * ninv % p, (-a[1]) * ninv % p)

    def eq(self, a, b): return a[0] == b[0] and a[1] == b[1]
    zero = (0, 0)


def ec2_add(f2, P, Q):
    if P is None: return Q
    if Q is None: return P
    x1, y1 = P
    x2, y2 = Q
    if f2.eq(x1, x2):
        if f2.eq(f2.add(y1, y2), f2.zero):
            return None
        num = f2.mul((3, 0), f2.mul(x1, x1))
        den = f2.add(y1, y1)
    else:
        num = f2.sub(y2, y1)
        den = f2.sub(x2, x1)
    lam = f2.mul(num, f2.inv(den))
    x3 = f2.sub(f2.sub(f2.mul(lam, lam), x1), x2)
    y3 = f2.sub(f2.mul(lam, f2.sub(x1, x3)), y1)
    return (x3, y3)


def ec2_mul(f2, P, k):
    acc = None
    while k:
        if k & 1:
            acc = ec2_add(f2, acc, P)
        P = ec2_add(f2, P, P)
        k >>= 1
    return acc


@pytest.mark.parametrize("curve_name", ["bn254", "bls12_377"])
def test_g2_group_law(curve_name):
    curve = get_curve(curve_name)
    p = curve.fq.modulus
    nr = _PARAMS[curve.params.base_field].nonresidue
    f2 = Fp2(p, nr)
    g = get_group(curve_name, g2=True)
    ef = g.coord_field

    gen = (curve.params.g2_gen_x, curve.params.g2_gen_y)
    want2 = ec2_add(f2, gen, gen)
    want3 = ec2_add(f2, want2, gen)

    gdev = g.generator(())
    d2 = g.dbl(gdev)
    d3 = g.add(d2, gdev)
    for dev_pt, want in ((d2, want2), (d3, want3)):
        x, y = g.to_affine_canonical(dev_pt)
        xi = ef.to_ints(x)
        yi = ef.to_ints(y)
        assert (int(xi[0]), int(xi[1])) == want[0]
        assert (int(yi[0]), int(yi[1])) == want[1]

    # subgroup order annihilates
    r_res = g.scalar_mul_int(gdev, curve.fr.modulus)
    assert bool(np.asarray(g.is_identity(r_res)))


def test_g2_msm_bn254():
    curve = get_curve("bn254")
    p = curve.fq.modulus
    f2 = Fp2(p, -1)
    g = get_group("bn254", g2=True)
    ef = g.coord_field
    fr = curve.fr
    rng = np.random.default_rng(5)

    gen = (curve.params.g2_gen_x, curve.params.g2_gen_y)
    ks = [3, 7, 11, 19]
    pts = [ec2_mul(f2, gen, k) for k in ks]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus for _ in ks]

    want = None
    for s, pt in zip(scalars, pts):
        want = ec2_add(f2, want, ec2_mul(f2, pt, s))

    px = ef.from_ints([[pt[0][0], pt[0][1]] for pt in pts])
    py = ef.from_ints([[pt[1][0], pt[1][1]] for pt in pts])
    s_dev = fr.from_ints(scalars)
    res = msm("bn254", s_dev, px, py, MSMConfig(g2=True))
    x, y = g.to_affine_canonical(res)
    xi, yi = ef.to_ints(x), ef.to_ints(y)
    assert (int(xi[0]), int(xi[1])) == want[0]
    assert (int(yi[0]), int(yi[1])) == want[1]


def test_g2_bw6_761_over_fq():
    """bw6_761 G2 lives over Fq directly (curves/params/bw6_761.h)."""
    curve = get_curve("bw6_761")
    g = get_group("bw6_761", g2=True)
    # generator round-trips and 2G matches the affine formulas mod q
    from tests.ec_ref import ec_add
    q = curve.fq.modulus
    gen = (curve.params.g2_gen_x[0], curve.params.g2_gen_y[0])
    want2 = ec_add(gen, gen, q)
    d2 = g.dbl(g.generator(()))
    x, y = g.to_affine_canonical(d2)
    assert (int(curve.fq.to_ints(x)), int(curve.fq.to_ints(y))) == want2

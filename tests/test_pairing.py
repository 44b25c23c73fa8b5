"""Pairing tests: non-degeneracy + bilinearity e(aP,bQ)=e(P,Q)^(ab), plus a
KZG-style verification identity (mirrors test_curve_api pairing cases)."""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.pairing import pairing, target_one, _setup, _PAIRINGS
from tests.ec_ref import ec_mul
from tests.test_g2 import Fp2, ec2_mul
from icicle_tpu.fields.field import _PARAMS


@pytest.mark.parametrize("curve_name", ["bn254", "bls12_381", "bls12_377"])
def test_twist_constant_consistency(curve_name):
    """b_g2 must equal b/xi (D) or b*xi (M) — validates the xi table."""
    cfg = _PAIRINGS[curve_name]
    curve = get_curve(curve_name)
    p = curve.fq.modulus
    nr = _PARAMS[curve.params.base_field].nonresidue
    f2 = Fp2(p, nr)
    b = (curve.b % p, 0)
    xi = (cfg.xi[0] % p, cfg.xi[1] % p)
    if cfg.twist == "D":
        want = f2.mul(b, f2.inv(xi))
    else:
        want = f2.mul(b, xi)
    assert want == tuple(v % p for v in curve.params.g2_b)


@pytest.mark.parametrize("curve_name", ["bn254", "bls12_381"])
def test_pairing_bilinear(curve_name):
    curve = get_curve(curve_name)
    p = curve.fq.modulus
    r = curve.fr.modulus
    nr = _PARAMS[curve.params.base_field].nonresidue
    f2 = Fp2(p, nr)
    g1 = (curve.gen_x, curve.gen_y)
    g2 = (curve.params.g2_gen_x, curve.params.g2_gen_y)

    e = pairing(curve_name, g1, g2)
    assert e != target_one(curve_name), "pairing must be non-degenerate"

    tw, *_ = _setup(curve_name)
    a, b = 7, 11
    e_ab = pairing(curve_name, ec_mul(g1, a, p), ec2_mul(f2, g2, b))
    assert e_ab == tw.pow(e, a * b)

    # e(P,Q)^r == 1 (target group order)
    assert tw.pow(e, r) == tw.one()


def test_kzg_style_identity():
    """e(C - y*G, H) == e(pi, tau*H - z*H) for C=f(tau)G, pi=((f(tau)-y)/(tau-z))G."""
    curve_name = "bn254"
    curve = get_curve(curve_name)
    p = curve.fq.modulus
    r = curve.fr.modulus
    f2 = Fp2(p, -1)
    g1 = (curve.gen_x, curve.gen_y)
    g2 = (curve.params.g2_gen_x, curve.params.g2_gen_y)

    tau = 123456789  # toy trusted setup
    coeffs = [5, 3, 2]  # f(x) = 5 + 3x + 2x^2
    f_tau = sum(c * pow(tau, i, r) for i, c in enumerate(coeffs)) % r
    z = 77
    y = sum(c * pow(z, i, r) for i, c in enumerate(coeffs)) % r
    # witness poly q(x) = (f(x)-y)/(x-z); evaluate at tau
    q_tau = (f_tau - y) * pow(tau - z, -1, r) % r

    from tests.ec_ref import ec_add, ec_neg
    C = ec_mul(g1, f_tau, p)
    pi = ec_mul(g1, q_tau, p)
    # LHS: e(C - y G, H)
    c_minus = ec_add(C, ec_neg(ec_mul(g1, y, p), p), p)
    lhs = pairing(curve_name, c_minus, g2)
    # RHS: e(pi, (tau - z) H)
    h_diff = ec2_mul(f2, g2, (tau - z) % r)
    rhs = pairing(curve_name, pi, h_diff)
    assert lhs == rhs

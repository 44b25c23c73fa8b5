"""Optimal-ate pairing: bilinearity on all three curves + raw-Fp12 value
parity vs the reference FFI (models/{bn,bls12}.h) when its build exists."""

import os

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.ate import ate_pairing, fp12_to_ints, _setup
from tests.ec_ref import ec_mul


def _g2_mul(tw, q, k, b_twist):
    """Affine double-and-add on the twist curve over Fp2 (test-only oracle)."""
    def add(a, b):
        if a is None:
            return b
        if b is None:
            return a
        x1, y1 = a
        x2, y2 = b
        if x1 == x2:
            if tw.e2_add(y1, y2) == (0, 0):
                return None
            num = tw.e2_mul_fp(tw.e2_sqr(x1), 3)
            den = tw.e2_add(y1, y1)
        else:
            num = tw.e2_sub(y2, y1)
            den = tw.e2_sub(x2, x1)
        lam = tw.e2_mul(num, tw.e2_inv(den))
        x3 = tw.e2_sub(tw.e2_sqr(lam), tw.e2_add(x1, x2))
        y3 = tw.e2_sub(tw.e2_mul(lam, tw.e2_sub(x1, x3)), y1)
        return (x3, y3)

    acc = None
    while k:
        if k & 1:
            acc = add(acc, q)
        q = add(q, q)
        k >>= 1
    return acc


def _fp12_pow(tw, a, e):
    r = tw.one()
    while e:
        if e & 1:
            r = tw.mul(r, a)
        a = tw.sqr(a)
        e >>= 1
    return r


@pytest.mark.parametrize("curve_name", ["bn254", "bls12_381", "bls12_377"])
def test_ate_bilinearity(curve_name):
    cfg, tw, p, tabs, twist_muls, b_twist = _setup(curve_name)
    curve = get_curve(curve_name)
    g1 = (curve.gen_x, curve.gen_y)
    gp = curve.params
    g2 = (tuple(v % p for v in gp.g2_gen_x), tuple(v % p for v in gp.g2_gen_y))

    a, b = 5, 11
    e = ate_pairing(curve_name, g1, g2)
    e_ab = ate_pairing(curve_name, ec_mul(g1, a, p), _g2_mul(tw, g2, b, b_twist))
    assert e_ab == _fp12_pow(tw, e, a * b)
    assert e != tw.one()  # non-degenerate


def test_ate_frobenius_coeff_matches_reference_table():
    """Canonical xi^((p-1)/3) equals the stored bn254 fq6 FROBENIUS_COEFF_C1[1]
    (fields/snark_fields/bn254_tower.h:30-32)."""
    cfg, tw, p, tabs, twist_muls, b_twist = _setup("bn254")
    c1_1 = tabs[0][1]
    want_c0 = 0x2FB347984F7911F74C0BEC3CF559B143B78CC310C2C3330C99E39557176F553D
    want_c1 = 0x16C9E55061EBAE204BA4CC8BD75A079432AE2A1D0B7C9DCE1665D51C640FCBA2
    assert c1_1 == (want_c0, want_c1)
    # and the twist frobenius constants (pairing/params/bn254.h:23-28)
    assert twist_muls[0] == (want_c0, want_c1)


def test_ate_vs_reference_ffi():
    from tests import ref_ffi
    if not ref_ffi.bn254_available():
        pytest.skip("bn254 reference build / golden store not present")
    cfg, tw, p, tabs, twist_muls, b_twist = _setup("bn254")
    curve = get_curve("bn254")
    g1 = ec_mul((curve.gen_x, curve.gen_y), 7, p)
    gp = curve.params
    g2gen = (tuple(v % p for v in gp.g2_gen_x), tuple(v % p for v in gp.g2_gen_y))
    g2 = _g2_mul(tw, g2gen, 13, b_twist)

    def limbs(v, n=8):
        return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(n)]

    p_u32 = np.array(limbs(g1[0]) + limbs(g1[1]), dtype=np.uint32)
    q_u32 = np.array(limbs(g2[0][0]) + limbs(g2[0][1])
                     + limbs(g2[1][0]) + limbs(g2[1][1]), dtype=np.uint32)
    got_ref = ref_ffi.bn254_pairing(p_u32, q_u32)

    ours = fp12_to_ints(ate_pairing("bn254", g1, g2))
    ours_u32 = np.array(sum((limbs(v) for v in ours), []), dtype=np.uint32)
    assert np.array_equal(ours_u32, got_ref)

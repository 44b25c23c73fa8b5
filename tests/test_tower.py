"""Vectorized pairing towers (Fq2/Fq6/Fq12) vs the host-int Fp12Tower.

Reference: include/icicle/fields/cubic_extension.h + snark_fields/
{bn254,bls12_381,bls12_377}_tower.h. The oracle is curves/ate.py's
Fp12Tower — itself byte-verified against the reference pairing FFI — so
agreement here chains the vectorized tower to the reference values.
"""

import numpy as np
import pytest

from icicle_tpu.curves.ate import Fp12Tower, _CONFIGS
from icicle_tpu.curves.params import get_curve
from icicle_tpu.fields.extension import get_tower_field

CURVES = ["bn254", "bls12_381", "bls12_377"]


def _rand_e2(rng, p):
    return (int.from_bytes(rng.bytes(48), "little") % p,
            int.from_bytes(rng.bytes(48), "little") % p)


def _rand_e6(rng, p):
    return tuple(_rand_e2(rng, p) for _ in range(3))


def _rand_e12(rng, p):
    return (_rand_e6(rng, p), _rand_e6(rng, p))


def _tw(curve_name):
    cfg = _CONFIGS[curve_name]
    p = get_curve(curve_name).fq.modulus
    return Fp12Tower(p, cfg.nr, cfg.xi), p


@pytest.mark.parametrize("curve_name", CURVES)
def test_fq6_mul_inv_vs_host(curve_name):
    tw, p = _tw(curve_name)
    f6 = get_tower_field(curve_name, 6)
    rng = np.random.default_rng(11)
    n = 4
    a_i = [_rand_e6(rng, p) for _ in range(n)]
    b_i = [_rand_e6(rng, p) for _ in range(n)]
    a = f6.from_ints(a_i)
    b = f6.from_ints(b_i)

    got_mul = f6.to_ints(f6.mul(a, b))
    got_inv = f6.to_ints(f6.inv(a))
    for i in range(n):
        want = tw.e6_mul(a_i[i], b_i[i])
        got = tuple(tuple(int(x) for x in c) for c in got_mul[i])
        assert got == want, f"{curve_name} fq6 mul row {i}"
        want_inv = tw.e6_inv(a_i[i])
        got = tuple(tuple(int(x) for x in c) for c in got_inv[i])
        assert got == want_inv, f"{curve_name} fq6 inv row {i}"


@pytest.mark.parametrize("curve_name", CURVES)
def test_fq12_mul_inv_vs_host(curve_name):
    tw, p = _tw(curve_name)
    f12 = get_tower_field(curve_name, 12)
    rng = np.random.default_rng(13)
    n = 2
    a_i = [_rand_e12(rng, p) for _ in range(n)]
    b_i = [_rand_e12(rng, p) for _ in range(n)]
    a = f12.from_ints(a_i)
    b = f12.from_ints(b_i)

    got_mul = f12.to_ints(f12.mul(a, b))
    got_inv = f12.to_ints(f12.inv(a))

    def nest(row):
        return tuple(tuple(tuple(int(x) for x in c2) for c2 in c6)
                     for c6 in row)

    for i in range(n):
        assert nest(got_mul[i]) == tw.mul(a_i[i], b_i[i]), \
            f"{curve_name} fq12 mul row {i}"
        assert nest(got_inv[i]) == tw.inv(a_i[i]), \
            f"{curve_name} fq12 inv row {i}"


def test_fq12_mont_roundtrip_and_mul():
    """mul_mont over the tower: to_mont(a)*to_mont(b) must equal
    to_mont(a*b) (nonresidue fold stays in-domain)."""
    tw, p = _tw("bn254")
    f12 = get_tower_field("bn254", 12)
    rng = np.random.default_rng(17)
    a_i, b_i = _rand_e12(rng, p), _rand_e12(rng, p)
    a = f12.from_ints([a_i])
    b = f12.from_ints([b_i])
    am, bm = f12.to_mont(a), f12.to_mont(b)
    assert np.array_equal(np.asarray(f12.from_mont(am)), np.asarray(a))
    got = np.asarray(f12.from_mont(f12.mul_mont(am, bm)))
    want = np.asarray(f12.from_ints([tw.mul(a_i, b_i)]))
    assert np.array_equal(got, want)


def test_fq12_pow_unity():
    """a^(p^12 - 1) == 1 exercises pow_const + const plumbing (tiny exponent
    stand-in: a * a^-1 == 1 and a^5 == ((a^2)^2)*a)."""
    tw, p = _tw("bn254")
    f12 = get_tower_field("bn254", 12)
    rng = np.random.default_rng(19)
    a_i = _rand_e12(rng, p)
    a = f12.from_ints([a_i])
    one = f12.to_ints(f12.mul(a, f12.inv(a)))

    def nest(row):
        return tuple(tuple(tuple(int(x) for x in c2) for c2 in c6)
                     for c6 in row)

    assert nest(one[0]) == tw.one()
    got5 = f12.to_ints(f12.pow_const(a, 5))
    w5 = tw.mul(tw.mul(tw.mul(tw.mul(a_i, a_i), a_i), a_i), a_i)
    assert nest(got5[0]) == w5

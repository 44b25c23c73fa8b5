"""Field arithmetic vs exact Python-int ground truth.

Mirrors the reference's ModArith typed test suite
(icicle/tests/test_mod_arithmetic_api.h): random vectors, every ring op,
compared against big-int arithmetic done in Python (exact)."""

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field, field_names

FIELDS = ["babybear", "koalabear", "m31", "goldilocks", "stark252",
          "bn254_scalar", "bn254_base", "bls12_377_scalar", "bls12_381_scalar",
          "bls12_381_base", "bw6_761_base"]

N = 97  # deliberately non-aligned size


@pytest.mark.parametrize("name", FIELDS)
def test_add_sub_neg(name, rng):
    f = get_field(name)
    a_i = [int.from_bytes(rng.bytes(48), "little") % f.modulus for _ in range(N)]
    b_i = [int.from_bytes(rng.bytes(48), "little") % f.modulus for _ in range(N)]
    a, b = f.from_ints(a_i), f.from_ints(b_i)
    got_add = f.to_ints(f.add(a, b))
    got_sub = f.to_ints(f.sub(a, b))
    got_neg = f.to_ints(f.neg(a))
    for i in range(N):
        assert got_add[i] == (a_i[i] + b_i[i]) % f.modulus, f"add lane {i}"
        assert got_sub[i] == (a_i[i] - b_i[i]) % f.modulus, f"sub lane {i}"
        assert got_neg[i] == (-a_i[i]) % f.modulus, f"neg lane {i}"


@pytest.mark.parametrize("name", FIELDS)
def test_mul(name, rng):
    f = get_field(name)
    a_i = [int.from_bytes(rng.bytes(128), "little") % f.modulus for _ in range(N)]
    b_i = [int.from_bytes(rng.bytes(128), "little") % f.modulus for _ in range(N)]
    # include edge cases
    a_i[:4] = [0, 1, f.modulus - 1, f.modulus - 1]
    b_i[:4] = [f.modulus - 1, f.modulus - 1, f.modulus - 1, 1]
    a, b = f.from_ints(a_i), f.from_ints(b_i)
    got = f.to_ints(f.mul(a, b))
    for i in range(N):
        assert got[i] == (a_i[i] * b_i[i]) % f.modulus, f"mul lane {i}: {a_i[i]} * {b_i[i]}"


@pytest.mark.parametrize("name", FIELDS)
def test_mont_roundtrip(name, rng):
    f = get_field(name)
    a_i = [int.from_bytes(rng.bytes(128), "little") % f.modulus for _ in range(N)]
    a = f.from_ints(a_i)
    back = f.to_ints(f.from_mont(f.to_mont(a)))
    for i in range(N):
        assert back[i] == a_i[i]


@pytest.mark.parametrize("name", FIELDS)
def test_inv(name, rng):
    f = get_field(name)
    n = 13  # inversion is an unrolled pow; keep the vector small
    a_i = [int.from_bytes(rng.bytes(128), "little") % f.modulus for _ in range(n)]
    a_i[0] = 1
    a_i[1] = f.modulus - 1
    a = f.from_ints(a_i)
    got = f.to_ints(f.inv(a))
    for i in range(n):
        assert got[i] == pow(a_i[i], -1, f.modulus), f"inv lane {i}"


@pytest.mark.parametrize("name", [n for n in FIELDS])
def test_sqr_and_pow(name, rng):
    f = get_field(name)
    a_i = [int.from_bytes(rng.bytes(128), "little") % f.modulus for _ in range(9)]
    a = f.from_ints(a_i)
    got_sqr = f.to_ints(f.sqr(a))
    got_pow = f.to_ints(f.pow_const(a, 5))
    for i in range(9):
        assert got_sqr[i] == (a_i[i] * a_i[i]) % f.modulus
        assert got_pow[i] == pow(a_i[i], 5, f.modulus)


@pytest.mark.parametrize("name", [n for n in field_names() if get_field(n).params.rou])
def test_rou_is_primitive(name):
    """The configured rou must generate exactly the 2^two_adicity subgroup."""
    f = get_field(name)
    s = f.two_adicity
    p = f.modulus
    assert pow(f.params.rou, 1 << s, p) == 1
    assert pow(f.params.rou, 1 << (s - 1), p) == p - 1


def test_mul_mont_hot_path(rng):
    """mul_mont with a Montgomery-form constant = canonical single-REDC mul."""
    for name in ["babybear", "bn254_scalar", "goldilocks"]:
        f = get_field(name)
        c_i = int.from_bytes(rng.bytes(64), "little") % f.modulus
        a_i = [int.from_bytes(rng.bytes(64), "little") % f.modulus for _ in range(16)]
        a = f.from_ints(a_i)
        c_mont = f.to_mont(f.from_ints([c_i] * 16))
        got = f.to_ints(f.mul_mont(a, c_mont))
        for i in range(16):
            assert got[i] == (a_i[i] * c_i) % f.modulus


@pytest.mark.parametrize("name", ["bn254_base", "bls12_381_base",
                                  "stark252", "bw6_761_base"])
def test_mont_fused16_matches_unfused(name, rng):
    """_mont_fused16 (fused comba+REDC, pallas msm kernel hot path) must be
    bit-identical to _redc16(_comba16(...)) for Montgomery-domain inputs,
    including 0 / 1 / p-1 edges."""
    import jax.numpy as jnp
    from icicle_tpu.math.bigint import _split16, unstack, stack

    f = get_field(name)
    eng = f.engine
    a_i = [int.from_bytes(rng.bytes(128), "little") % f.modulus
           for _ in range(32)]
    b_i = [int.from_bytes(rng.bytes(128), "little") % f.modulus
           for _ in range(32)]
    a_i[:4] = [0, 1, f.modulus - 1, f.modulus - 1]
    b_i[:4] = [f.modulus - 1, 0, f.modulus - 1, 1]
    a16 = _split16(unstack(f.from_ints(a_i)))
    b16 = _split16(unstack(f.from_ints(b_i)))
    want = np.asarray(stack(eng._redc16(eng._comba16(a16, b16))))
    got = np.asarray(stack(eng._mont_fused16(a16, b16)))
    assert np.array_equal(got, want)

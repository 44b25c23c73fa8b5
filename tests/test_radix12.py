"""Tests for the signed radix-2^12 Montgomery engine (math/radix12.py).

Reference op: device modular multiplication
(icicle/include/icicle/math/modular_arithmetic.h mult/Montgomery reduce);
this engine is the TPU-lane redesign used by the Pallas MSM kernels.
Correctness oracle: exact python ints.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from icicle_tpu.fields.field import get_field
from icicle_tpu.math.radix12 import RADIX, MASK, Radix12, int_to_words

FIELDS = ["bn254_base", "bn254_scalar", "bls12_381_base"]


def _to_words(eng, v, shape=()):
    return [jnp.full(shape, np.int32(w), dtype=jnp.int32)
            for w in int_to_words(v, eng.nw)]


def _read(eng, words, idx=0):
    v = 0
    for k, w in enumerate(words):
        v += int(np.asarray(w).reshape(-1)[idx]) << (RADIX * k)
    return v


@pytest.mark.parametrize("field_name", FIELDS)
def test_u32_roundtrip(field_name):
    fld = get_field(field_name)
    p = fld.modulus
    eng = Radix12(p)
    rng = np.random.default_rng(7)
    vals = [int(x) % p for x in rng.integers(0, 1 << 63, size=8)] + [0, p - 1]
    nl = (p.bit_length() + 31) // 32
    limbs = [jnp.asarray(
        np.array([(v >> (32 * i)) & 0xFFFFFFFF for v in vals], np.uint32))
        for i in range(nl)]
    words = eng.from_u32(limbs)
    back = eng.to_u32(words, nl)
    for i in range(nl):
        np.testing.assert_array_equal(np.asarray(back[i]),
                                      np.asarray(limbs[i]))


@pytest.mark.parametrize("field_name", FIELDS)
def test_mul_mont_exact(field_name):
    p = get_field(field_name).modulus
    eng = Radix12(p)
    rng = np.random.default_rng(11)
    rinv = pow(eng.R, -1, p)
    for _ in range(20):
        a = int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % p
        b = int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % p
        out = eng.mul_mont(_to_words(eng, a), _to_words(eng, b))
        got = _read(eng, out)
        assert -p < got < 2 * p, f"window violated: {got / p:.2f} p"
        assert got % p == a * b * rinv % p


@pytest.mark.parametrize("field_name", FIELDS)
def test_mul_mont_lazy_operand(field_name):
    """One operand may be a lazy add/sub result (|words| <= 2^13)."""
    p = get_field(field_name).modulus
    eng = Radix12(p)
    rng = np.random.default_rng(13)
    rinv = pow(eng.R, -1, p)
    for _ in range(10):
        a1, a2, b = (int(rng.integers(0, 1 << 62)) ** 2 % p for _ in range(3))
        lazy = eng.add(_to_words(eng, a1), _to_words(eng, a2))
        out = eng.mul_mont(lazy, _to_words(eng, b))
        got = _read(eng, out)
        assert -p < got < 2 * p
        assert got % p == (a1 + a2) * b * rinv % p
        # sub producing negative words is also allowed as the lazy operand
        lazy = eng.sub(_to_words(eng, a1), _to_words(eng, a2))
        got = _read(eng, eng.mul_mont(lazy, _to_words(eng, b)))
        assert -p < got < 2 * p
        assert got % p == (a1 - a2) * b * rinv % p


@pytest.mark.parametrize("field_name", FIELDS)
def test_norm_and_canon(field_name):
    p = get_field(field_name).modulus
    eng = Radix12(p)
    rng = np.random.default_rng(17)
    for _ in range(10):
        a, b = (int(rng.integers(0, 1 << 62)) ** 2 % p for _ in range(2))
        d = eng.sub(_to_words(eng, a), _to_words(eng, b))
        n = eng.norm(d)
        assert _read(eng, n) == a - b
        for w in n[:-1]:
            ww = int(np.asarray(w).reshape(-1)[0])
            assert 0 <= ww < (1 << RADIX)
        c = eng.canon_nonneg(d)
        got = _read(eng, c)
        assert got == (a - b) + (2 * p if a < b else 0)
        assert 0 <= got < 4 * p


@pytest.mark.parametrize("field_name", FIELDS)
def test_i32_bound_audit(field_name):
    """Exact-int simulation of mul_mont's columns under worst-case operand
    bounds proves no i32 overflow is possible (one lazy 2^13 operand x one
    normalized operand with a 2p-bounded signed top word)."""
    p = get_field(field_name).modulus
    eng = Radix12(p)
    nw = eng.nw
    LAZY, NORMW = (1 << 13), (1 << RADIX) - 1
    # worst |top word| of a normalized (-2p,2p) value
    top = (2 * p) >> (RADIX * (nw - 1))
    amax = [LAZY] * (nw - 1) + [max(LAZY, 2 * top)]
    bmax = [NORMW] * (nw - 1) + [max(NORMW, top)]
    cols = [0] * (2 * nw - 1)
    for i in range(nw):
        for j in range(nw):
            cols[i + j] += amax[i] * bmax[j]
    carry_max = 0
    pmax = [int(w) for w in eng.p12]
    for i in range(nw):
        v = cols[i] + carry_max
        assert v < (1 << 31), f"col {i} can overflow: {v:.3e}"
        m = MASK
        for j in range(1, nw):
            cols[i + j] += m * pmax[j]
        carry_max = (v + m * pmax[0]) >> RADIX
    for k in range(nw, 2 * nw - 1):
        v = cols[k] + carry_max
        assert v < (1 << 31), f"tail col {k} can overflow"
        carry_max = v >> RADIX


@pytest.mark.parametrize("field_name", ["bn254_base"])
def test_mul_small(field_name):
    p = get_field(field_name).modulus
    eng = Radix12(p)
    rng = np.random.default_rng(23)
    rinv = pow(eng.R, -1, p)
    a = int(rng.integers(0, 1 << 62)) ** 2 % p
    for k in (1, 3, -13, 255):
        got = _read(eng, eng.mul_small(_to_words(eng, a), k))
        assert got == k * a
        # normalized mul_small result is a legal mul operand after norm()
        out = eng.mul_mont(eng.norm(eng.mul_small(_to_words(eng, a), 3)),
                           _to_words(eng, a))
        assert _read(eng, out) % p == 3 * a * a * rinv % p

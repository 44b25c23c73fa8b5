"""Extension field tests vs python-int polynomial arithmetic mod (X^D - w).

Mirrors the reference's typed ModArith tests over extension types
(icicle/tests/test_mod_arithmetic_api.h run with extension_t configs).
"""

import numpy as np
import pytest

from icicle_tpu.fields.extension import get_ext_field, _EXT_CONFIGS


def ref_ext_mul(a, b, d, w, p):
    out = [0] * d
    for i in range(d):
        for j in range(d):
            k = i + j
            t = a[i] * b[j]
            if k < d:
                out[k] = (out[k] + t) % p
            else:
                out[k - d] = (out[k - d] + t * w) % p
    return tuple(v % p for v in out)


def ref_ext_pow(a, e, d, w, p):
    result = tuple([1] + [0] * (d - 1))
    base = a
    while e:
        if e & 1:
            result = ref_ext_mul(result, base, d, w, p)
        base = ref_ext_mul(base, base, d, w, p)
        e >>= 1
    return result


BASES = ["babybear", "koalabear", "m31", "goldilocks", "bn254_base", "bls12_377_base"]


@pytest.mark.parametrize("base", BASES)
def test_ext_mul_add_vs_int(base):
    d, w = _EXT_CONFIGS[base]
    ef = get_ext_field(base)
    p = ef.modulus
    rng = np.random.default_rng(123)
    n = 16
    a_int = [[int.from_bytes(rng.bytes(12), "little") % p for _ in range(d)]
             for _ in range(n)]
    b_int = [[int.from_bytes(rng.bytes(12), "little") % p for _ in range(d)]
             for _ in range(n)]
    a = ef.from_ints(a_int)
    b = ef.from_ints(b_int)

    got_mul = ef.to_ints(ef.mul(a, b))
    got_add = ef.to_ints(ef.add(a, b))
    for i in range(n):
        want = ref_ext_mul(tuple(a_int[i]), tuple(b_int[i]), d, w, p)
        assert tuple(int(x) for x in got_mul[i]) == want, f"{base} mul row {i}"
        want_add = tuple((a_int[i][j] + b_int[i][j]) % p for j in range(d))
        assert tuple(int(x) for x in got_add[i]) == want_add


@pytest.mark.parametrize("base", BASES)
def test_ext_inv(base):
    d, w = _EXT_CONFIGS[base]
    ef = get_ext_field(base)
    p = ef.modulus
    rng = np.random.default_rng(77)
    n = 8
    a_int = [[int.from_bytes(rng.bytes(12), "little") % p for _ in range(d)]
             for _ in range(n)]
    a = ef.from_ints(a_int)
    inv = ef.inv(a)
    prod = ef.to_ints(ef.mul(a, inv))
    one = tuple([1] + [0] * (d - 1))
    for i in range(n):
        assert tuple(int(x) for x in prod[i]) == one, f"{base} inv row {i}"


def test_ext_mont_roundtrip():
    ef = get_ext_field("babybear")
    rng = np.random.default_rng(5)
    a = ef.rand(rng, (32,))
    m = ef.to_mont(a)
    back = ef.from_mont(m)
    assert np.array_equal(np.asarray(a), np.asarray(back))
    # mul_mont(x_mont, y) == mul(x, y) in canonical terms
    b = ef.rand(rng, (32,))
    via_mont = ef.from_mont(ef.mul_mont(ef.to_mont(a), ef.to_mont(b)))
    direct = ef.mul(a, b)
    assert np.array_equal(np.asarray(via_mont), np.asarray(direct))


def test_cubic_extension_inv_mul_roundtrip():
    """Generic cubic tower (reference cubic_extension.h): x * x^-1 == 1."""
    import numpy as np
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.fields.extension import ExtEngine
    base = get_field("babybear")
    p = base.modulus
    w = next(v for v in range(2, 50) if pow(v, (p - 1) // 3, p) != 1)
    eng = ExtEngine(base, 3, w)
    rng = np.random.default_rng(11)
    x = np.asarray(rng.integers(1, p, size=(5, 3), dtype=np.uint32))
    xi = eng.inv(x)
    one = np.asarray(eng.mul(x, np.asarray(xi)))
    assert np.array_equal(one[:, 0], np.ones(5, dtype=np.uint32))
    assert not one[:, 1:].any()

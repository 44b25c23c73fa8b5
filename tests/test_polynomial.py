"""Polynomial API tests vs python-int polynomial arithmetic.

Mirrors icicle/tests/test_polynomial_api.cpp cases: arithmetic, multiplication,
division, divide-by-vanishing, slicing, evaluation, degree.
"""

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.polynomials import Polynomial

F = get_field("babybear")
P = F.modulus


def ref_mul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % P
    return out


def ref_eval(c, x):
    acc = 0
    for v in reversed(c):
        acc = (acc * x + v) % P
    return acc


def rand_coeffs(rng, n):
    return [int(v) for v in rng.integers(0, P, size=n)]


def make(c):
    return Polynomial.from_coeffs(F, F.from_ints(c))


def read(p):
    return [int(v) for v in p.to_ints()]


def test_add_sub():
    rng = np.random.default_rng(1)
    a, b = rand_coeffs(rng, 10), rand_coeffs(rng, 17)
    pa, pb = make(a), make(b)
    got = read(pa + pb)
    b_pad = b + [0] * 0
    a_pad = a + [0] * (17 - 10)
    want = [(x + y) % P for x, y in zip(a_pad, b_pad)]
    assert got[:17] == want
    got_sub = read(pa - pb)
    want_sub = [(x - y) % P for x, y in zip(a_pad, b_pad)]
    assert got_sub[:17] == want_sub


def test_mul():
    rng = np.random.default_rng(2)
    a, b = rand_coeffs(rng, 5), rand_coeffs(rng, 8)
    got = read(make(a) * make(b))
    assert got == ref_mul(a, b)


def test_mul_scalar():
    rng = np.random.default_rng(3)
    a = rand_coeffs(rng, 9)
    s = 12345
    got = read(make(a).mul_scalar(s))
    assert got == [(x * s) % P for x in a]


def test_divide():
    rng = np.random.default_rng(4)
    q_ref = rand_coeffs(rng, 5)
    d_ref = rand_coeffs(rng, 4)
    d_ref[-1] = max(d_ref[-1], 1)
    r_ref = rand_coeffs(rng, 3)
    # a = q*d + r
    a = ref_mul(q_ref, d_ref)
    for i, v in enumerate(r_ref):
        a[i] = (a[i] + v) % P
    q, r = make(a).divide(make(d_ref))
    got_q = read(q)
    got_r = read(r)
    assert [v for v in got_q if True][:len(q_ref)] == q_ref
    assert got_r[:len(r_ref)] == r_ref
    assert all(v == 0 for v in got_r[len(r_ref):])


def test_divide_by_vanishing():
    rng = np.random.default_rng(5)
    nn = 4
    q_ref = rand_coeffs(rng, 9)
    # p = q * (x^nn - 1)
    v = [P - 1] + [0] * (nn - 1) + [1]
    p = ref_mul(q_ref, v)
    got = read(make(p).divide_by_vanishing(nn))
    assert got[:len(q_ref)] == q_ref


def test_eval_and_rou_domain():
    rng = np.random.default_rng(6)
    c = rand_coeffs(rng, 7)
    p = make(c)
    x = 99999
    assert int(F.to_ints(p.eval(x))) == ref_eval(c, x)

    evals = p.eval_on_rou_domain(3)  # 8 points
    from icicle_tpu.ops.ntt import get_root_of_unity
    w = get_root_of_unity(F, 8)
    for i in [0, 3, 7]:
        want = ref_eval(c, pow(w, i, P))
        assert int(F.to_ints(evals[i])) == want

    # roundtrip through from_rou_evals
    p2 = Polynomial.from_rou_evals(F, evals)
    assert read(p2)[:7] == c


def test_slice_even_odd_degree_monomial():
    rng = np.random.default_rng(7)
    c = rand_coeffs(rng, 10)
    p = make(c)
    assert read(p.even()) == c[0::2]
    assert read(p.odd()) == c[1::2]
    assert p.degree() == 9 if c[9] != 0 else True
    p3 = p.add_monomial_inplace(5, 12)
    got = read(p3)
    assert got[12] == 5 and got[:10] == c

"""Lattice op tests (mirrors icicle/tests/test_ring_api.cpp: decomposition
roundtrip, JL projection determinism/linearity, norm checks, sampling)."""

import math

import numpy as np
import pytest

from icicle_tpu.rings.babykoala import get_zq, Q, RQ_DEGREE
from icicle_tpu.ops.lattice import (
    compute_nof_digits, decompose_balanced, recompose_balanced,
    jl_projection, get_jl_matrix_rows, check_norm_bound, check_norm_relative,
    NormType, random_sampling, challenge_space_polynomials, operator_norm,
)


def rand_zq(rng, n, bound=None):
    bound = bound or Q
    vals = [int.from_bytes(rng.bytes(8), "little") % bound for _ in range(n)]
    return vals, get_zq().from_ints(vals)


@pytest.mark.parametrize("base", [2, 4, 16, 1 << 20])
def test_decompose_recompose_roundtrip(base):
    rng = np.random.default_rng(base)
    vals, x = rand_zq(rng, 64)
    digits = decompose_balanced(x, base)
    nd = compute_nof_digits(base)
    assert digits.shape[0] == nd * 64
    # digits are balanced: |digit| <= base/2
    dv = np.asarray(digits)
    d64 = dv[..., 0].astype(np.uint64) | (dv[..., 1].astype(np.uint64) << np.uint64(32))
    centered = np.where(d64 > Q // 2, d64.astype(object) - Q, d64.astype(object))
    assert all(abs(int(c)) <= base // 2 for c in centered)
    back = recompose_balanced(digits, base, 64)
    got = [int(v) for v in get_zq().to_ints(back)]
    assert got == vals


def test_jl_projection_matches_explicit_matrix():
    rng = np.random.default_rng(7)
    n, m = 128, 8
    vals, x = rand_zq(rng, n)
    seed = b"jl-seed"
    proj = jl_projection(x, seed, m)
    rows = get_jl_matrix_rows(seed, n, 0, m)
    rows_int = get_zq().to_ints(rows)
    got = [int(v) for v in get_zq().to_ints(proj)]
    for r in range(m):
        want = sum(int(rows_int[r][i]) * vals[i] for i in range(n)) % Q
        assert got[r] == want


def test_jl_conjugated_rows():
    seed = b"conj"
    d = RQ_DEGREE
    plain = get_zq().to_ints(get_jl_matrix_rows(seed, d, 0, 1))
    conj = get_zq().to_ints(get_jl_matrix_rows(seed, d, 0, 1, negacyclic_conjugate=True))
    # conj row: c'[0] = c[0]; c'[d-k] = -c[k]
    assert int(conj[0][0]) == int(plain[0][0])
    for k in range(1, d):
        want = (-int(plain[0][k])) % Q
        assert int(conj[0][d - k]) == want


def test_norm_bounds():
    rng = np.random.default_rng(9)
    small_vals = [int(v) for v in rng.integers(0, 1000, size=32)]
    x = get_zq().from_ints(small_vals)
    l2 = math.isqrt(sum(v * v for v in small_vals)) + 1
    assert check_norm_bound(x, NormType.L2, l2 + 1)
    assert not check_norm_bound(x, NormType.L2, 1)
    linf = max(small_vals)
    assert check_norm_bound(x, NormType.LInfinity, linf + 1)
    assert not check_norm_bound(x, NormType.LInfinity, linf)
    # negative (centered) values
    neg = get_zq().from_ints([Q - 5])
    assert check_norm_bound(neg, NormType.LInfinity, 6)
    assert not check_norm_bound(neg, NormType.LInfinity, 5)
    # relative norm
    y = get_zq().from_ints([2] * 32)
    assert check_norm_relative(y, x, NormType.L2, 1000)


def test_random_sampling_deterministic_and_uniform():
    a = np.asarray(random_sampling(100, True, b"seed-1"))
    b = np.asarray(random_sampling(100, True, b"seed-1"))
    c = np.asarray(random_sampling(100, True, b"seed-2"))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    d = np.asarray(random_sampling(100, False, b"seed-1"))
    assert not np.array_equal(a, d)
    # all values < Q (or == Q, matching the reference's reduce_from_bytes quirk)
    v = d[..., 0].astype(np.uint64) | (d[..., 1].astype(np.uint64) << np.uint64(32))
    assert (v <= Q).all()


def test_challenge_space_polynomials():
    ones, twos = 23, 10
    polys = challenge_space_polynomials(b"chal", 4, ones, twos)
    ints = get_zq().to_ints(polys)
    for p in ints:
        cnt1 = sum(1 for v in p if int(v) in (1, Q - 1))
        cnt2 = sum(1 for v in p if int(v) in (2, Q - 2))
        cnt0 = sum(1 for v in p if int(v) == 0)
        assert (cnt1, cnt2, cnt0) == (ones, twos, RQ_DEGREE - ones - twos)
    # deterministic
    again = get_zq().to_ints(challenge_space_polynomials(b"chal", 4, ones, twos))
    assert np.array_equal(np.asarray(ints, dtype=object), np.asarray(again, dtype=object))
    # with operator-norm rejection: all results within bound
    bounded = challenge_space_polynomials(b"chal", 2, ones, twos, norm_bound=40)
    for p in get_zq().to_ints(bounded):
        balanced = [int(v) if int(v) <= 2 else int(v) - Q for v in p]
        assert operator_norm(balanced) <= 40

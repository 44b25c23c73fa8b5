"""babykoala ring tests: Zq arithmetic, RNS conversion, negacyclic NTT, Rq
multiply, matmul (mirrors icicle/tests/test_ring_api.cpp cases)."""

import numpy as np
import pytest

from icicle_tpu.rings.babykoala import (
    get_zq, get_rns, zq_to_rns, rns_to_zq, verify_constants,
    Q, P_BB, P_KB, RQ_DEGREE,
)
from icicle_tpu.rings.rq import (
    negacyclic_ntt, rq_mul, rq_add, rq_from_ints, rq_to_ints,
)
from icicle_tpu.runtime.config import NTTDir


def test_constants():
    verify_constants()
    assert Q == P_BB * P_KB


def test_zq_arithmetic_vs_int():
    zq = get_zq()
    rng = np.random.default_rng(1)
    a_int = [int.from_bytes(rng.bytes(8), "little") % Q for _ in range(32)]
    b_int = [int.from_bytes(rng.bytes(8), "little") % Q for _ in range(32)]
    a, b = zq.from_ints(a_int), zq.from_ints(b_int)
    got_mul = zq.to_ints(zq.mul(a, b))
    got_add = zq.to_ints(zq.add(a, b))
    for i in range(32):
        assert int(got_mul[i]) == a_int[i] * b_int[i] % Q
        assert int(got_add[i]) == (a_int[i] + b_int[i]) % Q


def test_rns_roundtrip_and_mul():
    zq = get_zq()
    rns = get_rns()
    rng = np.random.default_rng(2)
    a_int = [int.from_bytes(rng.bytes(8), "little") % Q for _ in range(16)]
    b_int = [int.from_bytes(rng.bytes(8), "little") % Q for _ in range(16)]
    a = zq.from_ints(a_int)
    b = zq.from_ints(b_int)
    ar = zq_to_rns(a)
    # residues correct
    ar_np = np.asarray(ar)
    for i in range(16):
        assert int(ar_np[i, 0]) == a_int[i] % P_BB
        assert int(ar_np[i, 1]) == a_int[i] % P_KB
    # roundtrip
    back = zq.to_ints(rns_to_zq(ar))
    assert [int(v) for v in back] == a_int
    # mul in RNS == mul in Zq
    br = zq_to_rns(b)
    prod_rns = rns.mul(ar, br)
    prod = zq.to_ints(rns_to_zq(prod_rns))
    assert [int(v) for v in prod] == [x * y % Q for x, y in zip(a_int, b_int)]


def ref_negacyclic_mul(a, b):
    d = len(a)
    out = [0] * d
    for i in range(d):
        for j in range(d):
            k = i + j
            t = a[i] * b[j]
            if k < d:
                out[k] = (out[k] + t) % Q
            else:
                out[k - d] = (out[k - d] - t) % Q
    return [v % Q for v in out]


def test_negacyclic_ntt_roundtrip():
    rng = np.random.default_rng(3)
    a_int = [[int.from_bytes(rng.bytes(8), "little") % Q for _ in range(RQ_DEGREE)]
             for _ in range(3)]
    a = rq_from_ints(a_int)
    e = negacyclic_ntt(a, NTTDir.FORWARD)
    back = negacyclic_ntt(e, NTTDir.INVERSE)
    got = rq_to_ints(back)
    for i in range(3):
        assert [int(v) for v in got[i]] == a_int[i]


def test_rq_mul_vs_schoolbook():
    rng = np.random.default_rng(4)
    a_int = [int.from_bytes(rng.bytes(8), "little") % Q for _ in range(RQ_DEGREE)]
    b_int = [int.from_bytes(rng.bytes(8), "little") % Q for _ in range(RQ_DEGREE)]
    a = rq_from_ints([a_int])
    b = rq_from_ints([b_int])
    got = rq_to_ints(rq_mul(a, b))[0]
    want = ref_negacyclic_mul(a_int, b_int)
    assert [int(v) for v in got] == want


def test_field_matmul():
    from icicle_tpu.ops.mat_ops import matmul, matrix_transpose, MatMulConfig
    from icicle_tpu.fields.field import get_field
    f = get_field("babybear")
    P = f.modulus
    rng = np.random.default_rng(5)
    A = [[int(v) for v in row] for row in rng.integers(0, P, size=(3, 4))]
    B = [[int(v) for v in row] for row in rng.integers(0, P, size=(4, 5))]
    a, b = f.from_ints(A), f.from_ints(B)
    got = f.to_ints(matmul(f, a, b))
    for i in range(3):
        for j in range(5):
            want = sum(A[i][k] * B[k][j] for k in range(4)) % P
            assert int(got[i][j]) == want
    # transpose
    t = f.to_ints(matrix_transpose(f, a))
    assert [[int(v) for v in row] for row in t] == [list(col) for col in zip(*A)]
    # transposed-operand config
    at = f.from_ints([list(col) for col in zip(*A)])
    got2 = f.to_ints(matmul(f, at, b, MatMulConfig(a_transposed=True)))
    assert np.array_equal(np.asarray(got2, dtype=object), np.asarray(got, dtype=object))


def test_rq_matmul():
    from icicle_tpu.ops.mat_ops import rq_matmul
    rng = np.random.default_rng(6)
    def rand_poly():
        return [int.from_bytes(rng.bytes(8), "little") % Q for _ in range(RQ_DEGREE)]
    A = [[rand_poly() for _ in range(2)] for _ in range(2)]
    B = [[rand_poly() for _ in range(3)] for _ in range(2)]
    a = rq_from_ints(A)
    b = rq_from_ints(B)
    got = rq_to_ints(rq_matmul(a, b))
    for i in range(2):
        for j in range(3):
            want = [0] * RQ_DEGREE
            for k in range(2):
                prod = ref_negacyclic_mul(A[i][k], B[k][j])
                want = [(x + y) % Q for x, y in zip(want, prod)]
            assert [int(v) for v in got[i][j]] == want

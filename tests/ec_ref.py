"""Independent pure-Python (int) elliptic-curve reference for test oracles.

Textbook affine short-Weierstrass arithmetic (a=0) over Python ints — slow but
unquestionably correct; used to validate the vectorized TPU kernels at small
sizes (mirrors the reference's CPU-as-reference-device test pattern,
icicle/tests/test_base.h).
"""

from __future__ import annotations

INF = None  # identity


def ec_add(p, q, mod):
    if p is INF:
        return q
    if q is INF:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if (y1 + y2) % mod == 0:
            return INF
        lam = (3 * x1 * x1) * pow(2 * y1, -1, mod) % mod
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, mod) % mod
    x3 = (lam * lam - x1 - x2) % mod
    y3 = (lam * (x1 - x3) - y1) % mod
    return (x3, y3)


def ec_neg(p, mod):
    if p is INF:
        return INF
    return (p[0], (-p[1]) % mod)


def ec_mul(p, k, mod):
    if k < 0:
        return ec_mul(ec_neg(p, mod), -k, mod)
    acc = INF
    while k:
        if k & 1:
            acc = ec_add(acc, p, mod)
        p = ec_add(p, p, mod)
        k >>= 1
    return acc


def msm_ref(scalars, points, mod):
    """sum_i scalars[i] * points[i]; points as (x, y) int tuples or INF."""
    acc = INF
    for s, p in zip(scalars, points):
        acc = ec_add(acc, ec_mul(p, s, mod), mod)
    return acc

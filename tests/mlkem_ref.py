"""Independent pure-python ML-KEM (FIPS 203) reference for test oracles.

Written directly from the FIPS 203 final spec (Algorithms 13-21) using
hashlib's SHA3/SHAKE — deliberately sharing no code with
icicle_tpu/ops/pqc/ml_kem.py so byte-equality is a genuine cross-check
(the reference repo uses kyber_py the same way,
backend/cuda_pqc/tests/ml_kem/batch_tests.py).
"""

from __future__ import annotations

import hashlib

Q = 3329
ZETA = 17

PARAMS = {
    "512": dict(k=2, eta1=3, eta2=2, du=10, dv=4),
    "768": dict(k=3, eta1=2, eta2=2, du=10, dv=4),
    "1024": dict(k=4, eta1=2, eta2=2, du=11, dv=5),
}


def _H(b):
    return hashlib.sha3_256(b).digest()


def _G(b):
    return hashlib.sha3_512(b).digest()


def _J(b):
    return hashlib.shake_256(b).digest(32)


def _prf(eta, s, n):
    return hashlib.shake_256(s + bytes([n])).digest(64 * eta)


def _xof(rho, j, i):
    return hashlib.shake_128(rho + bytes([j, i])).digest(4 * 320)


def _bitrev7(x):
    return int(f"{x:07b}"[::-1], 2)


_ZETAS = [pow(ZETA, _bitrev7(i), Q) for i in range(128)]


def ntt(f):
    f = list(f)
    i = 1
    length = 128
    while length >= 2:
        for start in range(0, 256, 2 * length):
            z = _ZETAS[i]
            i += 1
            for j in range(start, start + length):
                t = z * f[j + length] % Q
                f[j + length] = (f[j] - t) % Q
                f[j] = (f[j] + t) % Q
        length //= 2
    return f


def intt(f):
    f = list(f)
    i = 127
    length = 2
    while length <= 128:
        for start in range(0, 256, 2 * length):
            z = _ZETAS[i]
            i -= 1
            for j in range(start, start + length):
                t = f[j]
                f[j] = (t + f[j + length]) % Q
                f[j + length] = z * (f[j + length] - t) % Q
        length *= 2
    return [v * 3303 % Q for v in f]  # 3303 = 128^-1 mod q


def _base_case_mul(a0, a1, b0, b1, gamma):
    return ((a0 * b0 + a1 * b1 % Q * gamma) % Q, (a0 * b1 + a1 * b0) % Q)


def mul_ntt(f, g):
    h = [0] * 256
    for i in range(128):
        gamma = pow(ZETA, 2 * _bitrev7(i) + 1, Q)
        h[2 * i], h[2 * i + 1] = _base_case_mul(
            f[2 * i], f[2 * i + 1], g[2 * i], g[2 * i + 1], gamma)
    return h


def sample_ntt(stream):
    out = []
    i = 0
    while len(out) < 256:
        b0, b1, b2 = stream[i], stream[i + 1], stream[i + 2]
        i += 3
        d1 = b0 + 256 * (b1 % 16)
        d2 = b1 // 16 + 16 * b2
        if d1 < Q:
            out.append(d1)
        if d2 < Q and len(out) < 256:
            out.append(d2)
    return out


def sample_cbd(b, eta):
    bits = []
    for byte in b:
        for k in range(8):
            bits.append((byte >> k) & 1)
    f = []
    for i in range(256):
        x = sum(bits[2 * i * eta + j] for j in range(eta))
        y = sum(bits[(2 * i + 1) * eta + j] for j in range(eta))
        f.append((x - y) % Q)
    return f


def byte_encode(f, d):
    bits = []
    for v in f:
        for j in range(d):
            bits.append((v >> j) & 1)
    out = bytearray()
    for i in range(0, len(bits), 8):
        out.append(sum(bits[i + j] << j for j in range(8)))
    return bytes(out)


def byte_decode(b, d):
    bits = []
    for byte in b:
        for j in range(8):
            bits.append((byte >> j) & 1)
    return [sum(bits[i * d + j] << j for j in range(d)) for i in range(256)]


def compress(f, d):
    return [(((v << d) + Q // 2) // Q) % (1 << d) for v in f]


def decompress(f, d):
    return [(v * Q + (1 << (d - 1))) >> d for v in f]


def _kpke_keygen(d, k, eta1):
    g = _G(d + bytes([k]))
    rho, sigma = g[:32], g[32:]
    A = [[sample_ntt(_xof(rho, j, i)) for j in range(k)] for i in range(k)]
    n = 0
    s = []
    for _ in range(k):
        s.append(ntt(sample_cbd(_prf(eta1, sigma, n), eta1)))
        n += 1
    e = []
    for _ in range(k):
        e.append(ntt(sample_cbd(_prf(eta1, sigma, n), eta1)))
        n += 1
    t = []
    for i in range(k):
        acc = list(e[i])
        for j in range(k):
            prod = mul_ntt(A[i][j], s[j])
            acc = [(a + b) % Q for a, b in zip(acc, prod)]
        t.append(acc)
    ek = b"".join(byte_encode(ti, 12) for ti in t) + rho
    dk = b"".join(byte_encode(si, 12) for si in s)
    return ek, dk


def _kpke_encrypt(ek, m, r, p):
    k, eta1, eta2, du, dv = p["k"], p["eta1"], p["eta2"], p["du"], p["dv"]
    t = [byte_decode(ek[384 * i:384 * (i + 1)], 12) for i in range(k)]
    rho = ek[384 * k:384 * k + 32]
    A = [[sample_ntt(_xof(rho, j, i)) for j in range(k)] for i in range(k)]
    n = 0
    y = []
    for _ in range(k):
        y.append(ntt(sample_cbd(_prf(eta1, r, n), eta1)))
        n += 1
    e1 = []
    for _ in range(k):
        e1.append(sample_cbd(_prf(eta2, r, n), eta2))
        n += 1
    e2 = sample_cbd(_prf(eta2, r, n), eta2)
    u = []
    for j in range(k):
        acc = [0] * 256
        for i in range(k):
            prod = mul_ntt(A[i][j], y[i])      # A^T row j
            acc = [(a + b) % Q for a, b in zip(acc, prod)]
        acc = intt(acc)
        u.append([(a + b) % Q for a, b in zip(acc, e1[j])])
    mu = decompress(byte_decode(m, 1), 1)
    v = [0] * 256
    for i in range(k):
        prod = mul_ntt(t[i], y[i])
        v = [(a + b) % Q for a, b in zip(v, prod)]
    v = intt(v)
    v = [(a + b + c) % Q for a, b, c in zip(v, e2, mu)]
    c1 = b"".join(byte_encode(compress(ui, du), du) for ui in u)
    c2 = byte_encode(compress(v, dv), dv)
    return c1 + c2


def _kpke_decrypt(dk, c, p):
    k, du, dv = p["k"], p["du"], p["dv"]
    u = [decompress(byte_decode(c[32 * du * i:32 * du * (i + 1)], du), du)
         for i in range(k)]
    v = decompress(byte_decode(c[32 * du * k:], dv), dv)
    s = [byte_decode(dk[384 * i:384 * (i + 1)], 12) for i in range(k)]
    acc = [0] * 256
    for i in range(k):
        prod = mul_ntt(s[i], ntt(u[i]))
        acc = [(a + b) % Q for a, b in zip(acc, prod)]
    w = intt(acc)
    w = [(a - b) % Q for a, b in zip(v, w)]
    return byte_encode(compress(w, 1), 1)


def keygen(cat, d, z):
    p = PARAMS[cat]
    ek, dk_pke = _kpke_keygen(d, p["k"], p["eta1"])
    dk = dk_pke + ek + _H(ek) + z
    return ek, dk


def encaps(cat, ek, m):
    g = _G(m + _H(ek))
    K, r = g[:32], g[32:]
    c = _kpke_encrypt(ek, m, r, PARAMS[cat])
    return c, K


def decaps(cat, dk, c):
    p = PARAMS[cat]
    k = p["k"]
    dk_pke = dk[:384 * k]
    ek = dk[384 * k:768 * k + 32]
    h = dk[768 * k + 32:768 * k + 64]
    z = dk[768 * k + 64:768 * k + 96]
    m = _kpke_decrypt(dk_pke, c, p)
    g = _G(m + h)
    K, r = g[:32], g[32:]
    Kbar = _J(z + c)
    c2 = _kpke_encrypt(ek, m, r, p)
    return K if c == c2 else Kbar

"""KZG polynomial commitment end-to-end (mirrors reference
examples/c++/polynomial-api + pedersen-commitment territory): commit via MSM,
open at a point, verify via pairings. Run: python examples/kzg_example.py
"""

import numpy as np

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group
from icicle_tpu.curves.host_ec import ec_mul, ec_add, ec_neg
from icicle_tpu.curves.pairing import pairing
from icicle_tpu.ops.msm import msm
from icicle_tpu.polynomials import Polynomial


def main():
    curve = get_curve("bn254")
    g = get_group("bn254")
    fq, fr = curve.fq, curve.fr
    p, r = fq.modulus, fr.modulus
    rng = np.random.default_rng(7)

    # toy trusted setup: powers of tau in G1, tau in G2
    tau = int.from_bytes(rng.bytes(31), "little") % r
    degree = 8
    g1 = (curve.gen_x, curve.gen_y)
    g2gen = (curve.params.g2_gen_x, curve.params.g2_gen_y)
    srs_ints = [ec_mul(g1, pow(tau, i, r), p) for i in range(degree)]

    # the polynomial
    coeffs = [int.from_bytes(rng.bytes(31), "little") % r for _ in range(degree)]
    poly = Polynomial.from_coeffs(fr, fr.from_ints(coeffs))

    # commit: C = sum c_i * tau^i * G = MSM(coeffs, srs)
    s_dev = fr.from_ints(coeffs)
    px = fq.from_ints([pt[0] for pt in srs_ints])
    py = fq.from_ints([pt[1] for pt in srs_ints])
    C_proj = msm("bn254", s_dev, px, py)
    Cx, Cy = g.to_affine_canonical(C_proj)
    C = (int(fq.to_ints(Cx)), int(fq.to_ints(Cy)))
    print("commitment:", hex(C[0])[:26], "...")

    # open at z: y = f(z); witness q(x) = (f(x) - y) / (x - z)
    z = 12345
    y = int(np.asarray(fr.to_ints(poly.eval(z))).item())
    num = poly.sub_monomial_inplace(y, 0)
    den = Polynomial.from_coeffs(fr, fr.from_ints([(-z) % r, 1]))
    q, rem = num.divide(den)
    assert all(int(v) == 0 for v in rem.to_ints()), "z is a root of f - y"
    q_coeffs = [int(v) for v in q.to_ints()]
    q_dev = fr.from_ints(q_coeffs + [0] * (degree - len(q_coeffs)))
    W_proj = msm("bn254", q_dev, px, py)
    Wx, Wy = g.to_affine_canonical(W_proj)
    W = (int(fq.to_ints(Wx)), int(fq.to_ints(Wy)))

    # verify: e(C - yG, H) == e(W, tauH - zH)
    f2 = Fp2(p, -1)
    lhs = pairing("bn254", ec_add(C, ec_neg(ec_mul(g1, y, p), p), p), g2gen)
    rhs = pairing("bn254", W, ec2_mul(f2, g2gen, (tau - z) % r))
    assert lhs == rhs
    print("KZG verify: OK")


# minimal local Fp2/G2 helpers so the example is self-contained
class Fp2:
    def __init__(self, p, nr):
        self.p, self.nr = p, nr
    def add(self, a, b): return ((a[0]+b[0]) % self.p, (a[1]+b[1]) % self.p)
    def sub(self, a, b): return ((a[0]-b[0]) % self.p, (a[1]-b[1]) % self.p)
    def mul(self, a, b):
        p, nr = self.p, self.nr
        return ((a[0]*b[0] + nr*a[1]*b[1]) % p, (a[0]*b[1] + a[1]*b[0]) % p)
    def inv(self, a):
        p, nr = self.p, self.nr
        norm = (a[0]*a[0] - nr*a[1]*a[1]) % p
        ni = pow(norm, -1, p)
        return (a[0]*ni % p, (-a[1])*ni % p)
    def eq(self, a, b): return a == b
    zero = (0, 0)


def ec2_add(f2, P, Q):
    if P is None: return Q
    if Q is None: return P
    (x1, y1), (x2, y2) = P, Q
    if f2.eq(x1, x2):
        if f2.eq(f2.add(y1, y2), f2.zero): return None
        lam = f2.mul(f2.mul((3, 0), f2.mul(x1, x1)), f2.inv(f2.add(y1, y1)))
    else:
        lam = f2.mul(f2.sub(y2, y1), f2.inv(f2.sub(x2, x1)))
    x3 = f2.sub(f2.sub(f2.mul(lam, lam), x1), x2)
    return (x3, f2.sub(f2.mul(lam, f2.sub(x1, x3)), y1))


def ec2_mul(f2, P, k):
    acc = None
    while k:
        if k & 1: acc = ec2_add(f2, acc, P)
        P = ec2_add(f2, P, P)
        k >>= 1
    return acc


if __name__ == "__main__":
    main()

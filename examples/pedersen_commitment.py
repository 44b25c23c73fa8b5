"""Pedersen vector commitment over bn254 G1 via MSM (mirrors reference
examples/c++/pedersen-commitment): commit(m, r) = r*H + sum_i m_i * G_i with
nothing-up-my-sleeve generators derived from a seeded hash expansion.

Run: python examples/pedersen_commitment.py
"""

import hashlib

import numpy as np

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group
from icicle_tpu.ops.msm import msm, MSMConfig

CURVE = "bn254"
N = 16  # message length

curve = get_curve(CURVE)
g = get_group(CURVE)
fr, fq = curve.fr, curve.fq


def hash_to_scalars(tag: bytes, count: int) -> list[int]:
    """Deterministic NUMS scalars: sha256 counter-mode expansion (the
    reference example seeds generators the same transparent way)."""
    out = []
    i = 0
    while len(out) < count:
        h = hashlib.sha256(tag + i.to_bytes(4, "little")).digest()
        out.append(int.from_bytes(h, "little") % fr.modulus)
        i += 1
    return out


# NUMS generators: G_i = k_i * G, H = k_H * G with k derived from hashes
ks = hash_to_scalars(b"pedersen-gen", N)
kh = hash_to_scalars(b"pedersen-blind", 1)[0]

gx, gy = [], []
for k in ks + [kh]:
    pt = g.scalar_mul_int(g.generator(()), k)
    x, y = g.to_affine_canonical(pt)
    gx.append(int(fq.to_ints(x[None])[0]))
    gy.append(int(fq.to_ints(y[None])[0]))

rng = np.random.default_rng(42)
message = [int(v) for v in rng.integers(1, 1 << 30, size=N)]
blind = int.from_bytes(rng.bytes(32), "little") % fr.modulus

# commitment = MSM over [message..., blind] x [G_i..., H]
scalars = fr.from_ints(message + [blind])
px = fq.from_ints(gx)
py = fq.from_ints(gy)
commit = msm(CURVE, scalars, px, py, MSMConfig())
cx, cy = g.to_affine_canonical(commit)
print("commitment:", hex(int(fq.to_ints(cx[None])[0]))[:18] + "...")

# homomorphism check: C(m1) + C(m2) == C(m1+m2) with blinds added
m2 = [int(v) for v in rng.integers(1, 1 << 30, size=N)]
b2 = int.from_bytes(rng.bytes(32), "little") % fr.modulus
c2 = msm(CURVE, fr.from_ints(m2 + [b2]), px, py, MSMConfig())
msum = [(a + b) % fr.modulus for a, b in zip(message, m2)]
c12 = msm(CURVE, fr.from_ints(msum + [(blind + b2) % fr.modulus]), px, py,
          MSMConfig())
lhs = g.to_affine_canonical(g.add(commit, c2))
rhs = g.to_affine_canonical(c12)
assert all(np.array_equal(np.asarray(a), np.asarray(b))
           for a, b in zip(lhs, rhs)), "additively homomorphic"
print("homomorphism check OK: C(m1)+C(m2) == C(m1+m2)")

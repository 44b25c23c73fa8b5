"""Lattice-SNARKs ring tour (mirrors reference examples/rust/lattice-snarks):
negacyclic NTT, Rq matmul, balanced decomposition, JL projection, norms,
challenge-space sampling over the babykoala ring.
Run: PYTHONPATH=.:/root/.axon_site python examples/lattice_example.py
"""

import numpy as np

from icicle_tpu.rings.babykoala import get_zq, Q, RQ_DEGREE
from icicle_tpu.rings.rq import negacyclic_ntt, rq_mul, rq_from_ints, rq_to_ints
from icicle_tpu.runtime.config import NTTDir
from icicle_tpu.ops.mat_ops import rq_matmul
from icicle_tpu.ops.lattice import (
    decompose_balanced, recompose_balanced, jl_projection, check_norm_bound,
    NormType, random_sampling, challenge_space_polynomials,
)


def main():
    zq = get_zq()
    rng = np.random.default_rng(0)
    print(f"babykoala ring: q = {hex(Q)} (P_bb * P_kb), Rq degree {RQ_DEGREE}")

    # negacyclic NTT roundtrip
    a = [[int.from_bytes(rng.bytes(8), "little") % Q for _ in range(RQ_DEGREE)]]
    t = negacyclic_ntt(rq_from_ints(a), NTTDir.FORWARD)
    back = rq_to_ints(negacyclic_ntt(t, NTTDir.INVERSE))
    assert [int(v) for v in back[0]] == a[0]
    print("negacyclic NTT roundtrip: OK")

    # Rq matrix product
    A = rq_from_ints([[a[0], a[0]]])
    B = rq_from_ints([[a[0]], [a[0]]])
    C = rq_matmul(A, B)
    print("Rq matmul (1x2)x(2x1):", C.shape)

    # balanced decomposition roundtrip
    vec = zq.from_ints([int.from_bytes(rng.bytes(8), "little") % Q
                        for _ in range(32)])
    digits = decompose_balanced(vec, base=1 << 16)
    back = recompose_balanced(digits, 1 << 16, 32)
    assert np.array_equal(np.asarray(back), np.asarray(vec))
    print("balanced decomposition roundtrip: OK")

    # JL projection + norm check
    small = zq.from_ints([int(v) for v in rng.integers(0, 1000, size=256)])
    proj = jl_projection(small, b"jl-seed", 16)
    print("JL projection 256 -> 16: OK")
    print("L2 norm bound check:", check_norm_bound(small, NormType.L2, 1 << 20))

    # seeded sampling
    u = random_sampling(8, fast_mode=True, seed=b"seed")
    ch = challenge_space_polynomials(b"chal", 2, ones=23, twos=10, norm_bound=32)
    print("uniform sample[0]:", hex(int(np.asarray(u)[0, 0])))
    print("challenge polynomials:", ch.shape, "(operator-norm bounded)")


if __name__ == "__main__":
    main()

"""Two-level (dcn x ici) sharding on a virtual 2x4 CPU mesh vs oracles."""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.fields.field import get_field
from icicle_tpu.ops import ntt as N
from icicle_tpu.parallel.two_level import (
    make_mesh2, msm_sharded3_2level, ntt_sharded_2level,
    merkle_build_sharded_2level,
)
from icicle_tpu.runtime.config import NTTDir
from tests.ec_ref import ec_mul, msm_ref, INF


def test_ntt_2level_matches_single(rng):
    f = get_field("babybear")
    n = 1 << 10
    mesh = make_mesh2(2, 4)
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    x = f.from_ints(a_i)
    want = f.to_ints(N.ntt(f, x, NTTDir.FORWARD))
    got = f.to_ints(ntt_sharded_2level(f, x, mesh, NTTDir.FORWARD))
    assert list(got) == list(want)


def test_msm_2level_vs_oracle(rng):
    curve = get_curve("bn254")
    mod = curve.fq.modulus
    fr, fq = curve.fr, curve.fq
    mesh = make_mesh2(2, 4)
    n = 64
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 24, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]
    got = msm_sharded3_2level("bn254", fr.from_ints(scalars),
                              fq.from_ints([p[0] for p in pts]),
                              fq.from_ints([p[1] for p in pts]),
                              mesh, c=4, T=64, wg=4, backend="xla")
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))


def test_merkle_2level_matches_single(rng):
    from icicle_tpu.ops.hash.poseidon2 import Poseidon2
    from icicle_tpu.ops.merkle import MerkleTree

    f = get_field("babybear")
    depth = 10
    leaves = rng.integers(0, f.modulus, size=(1 << depth,), dtype=np.uint32)
    mesh = make_mesh2(2, 4)
    t1 = MerkleTree([Poseidon2(f, 2)] * depth, leaf_words=1)
    t2 = MerkleTree([Poseidon2(f, 2)] * depth, leaf_words=1)
    want = t1.build(leaves)
    got = merkle_build_sharded_2level(t2, leaves, mesh)
    assert np.array_equal(got, want)
    for l1, l2 in zip(t1.layers, t2.layers):
        assert np.array_equal(np.asarray(l1), np.asarray(l2))
    proof = t2.get_merkle_proof(leaves, 777, pruned=True)
    assert t1.verify(proof) and t2.verify(proof)

"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops import ntt as N
from icicle_tpu.parallel.mesh import make_mesh
from icicle_tpu.parallel.ntt_sharded import ntt_sharded
from icicle_tpu.runtime.config import NTTDir


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("name", ["babybear", "goldilocks"])
def test_sharded_ntt_matches_single(name, rng):
    f = get_field(name)
    n = 1 << 8  # n1 = n2 = 16, divisible by d=8? 16 % 8 == 0 ok
    mesh = make_mesh(8)
    a_i = [int.from_bytes(rng.bytes(16), "little") % f.modulus for _ in range(n)]
    x = f.from_ints(a_i)
    want = f.to_ints(N.ntt(f, x, NTTDir.FORWARD))
    got = f.to_ints(ntt_sharded(f, x, mesh, NTTDir.FORWARD))
    assert list(got) == list(want)


def test_sharded_ntt_roundtrip(rng):
    f = get_field("babybear")
    n = 1 << 10
    mesh = make_mesh(4)
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    x = f.from_ints(a_i)
    y = ntt_sharded(f, x, mesh, NTTDir.FORWARD)
    back = f.to_ints(ntt_sharded(f, jax.device_get(y), mesh, NTTDir.INVERSE))
    assert list(back) == a_i


class TestShardedMerkle:
    """Subtree-partitioned Merkle build vs the single-device builder."""

    def _build_pair(self, hashers, leaf_words, leaves, d=8):
        from icicle_tpu.ops.merkle import MerkleTree
        from icicle_tpu.parallel.merkle_sharded import merkle_build_sharded

        mesh = make_mesh(d)
        t_single = MerkleTree(list(hashers), leaf_words)
        t_shard = MerkleTree(list(hashers), leaf_words)
        want = t_single.build(leaves)
        got = merkle_build_sharded(t_shard, leaves, mesh)
        return t_single, t_shard, want, got

    def test_root_matches_single_device(self, rng):
        from icicle_tpu.ops.hash.poseidon2 import Poseidon2

        f = get_field("babybear")
        depth = 12
        leaves = rng.integers(0, f.modulus, size=(1 << depth,), dtype=np.uint32)
        t1, t8, want, got = self._build_pair([Poseidon2(f, 2)] * depth, 1, leaves)
        assert np.array_equal(got, want)
        # every stored layer matches too (sub-cap sharded + cap replicated)
        for l1, l8 in zip(t1.layers, t8.layers):
            assert np.array_equal(np.asarray(l1), np.asarray(l8))

    def test_proofs_from_sharded_build_verify(self, rng):
        from icicle_tpu.ops.hash.poseidon2 import Poseidon2

        f = get_field("babybear")
        depth = 10
        leaves = rng.integers(0, f.modulus, size=(1 << depth,), dtype=np.uint32)
        t1, t8, want, got = self._build_pair([Poseidon2(f, 2)] * depth, 1, leaves)
        for idx in [0, 5, (1 << depth) - 1]:
            proof = t8.get_merkle_proof(leaves, idx, pruned=True)
            assert t8.verify(proof)
            assert t1.verify(proof)  # interchangeable with single-device tree

    def test_mixed_arity_and_wide_leaves(self, rng):
        from icicle_tpu.ops.hash.poseidon2 import Poseidon2

        f = get_field("babybear")
        # 4-ary bottom then binary: 4*2*2*2*2 = 64 leaves of 2 words
        hashers = [Poseidon2(f, 8).with_input_words(8), Poseidon2(f, 2),
                   Poseidon2(f, 2), Poseidon2(f, 2), Poseidon2(f, 2)]
        leaves = rng.integers(0, f.modulus, size=(64, 2), dtype=np.uint32)
        t1, t8, want, got = self._build_pair(hashers, 2, leaves, d=4)
        assert np.array_equal(got, want)

"""Merkle tree build/proof/verify (mirrors reference test_hash_api.cpp merkle
cases: build, pruned/full proofs, tamper detection, padding)."""

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops.hash.poseidon2 import Poseidon2
from icicle_tpu.ops.merkle import MerkleTree, MerkleProof
from icicle_tpu.runtime.config import MerkleTreeConfig


def make_tree(depth, t=2):
    f = get_field("babybear")
    h = Poseidon2(f, t)
    return MerkleTree([h] * depth, leaf_words=1), f


def test_build_and_root_stability(rng):
    tree, f = make_tree(depth=4, t=2)  # 16 leaves
    leaves = np.array([int.from_bytes(rng.bytes(8), "little") % f.modulus
                       for _ in range(16)], dtype=np.uint32).reshape(16, 1)
    r1 = tree.build(leaves)
    r2 = tree.build(leaves)
    assert np.array_equal(r1, r2)
    # different leaves -> different root
    leaves2 = leaves.copy()
    leaves2[3, 0] ^= 1
    r3 = tree.build(leaves2)
    assert not np.array_equal(r1, r3)


@pytest.mark.parametrize("pruned", [True, False])
def test_proof_verify(pruned, rng):
    tree, f = make_tree(depth=3, t=4)  # arity 4, 64 leaves
    n = tree.expected_leaves()
    leaves = np.array([int.from_bytes(rng.bytes(8), "little") % f.modulus
                       for _ in range(n)], dtype=np.uint32).reshape(n, 1)
    tree.build(leaves)
    for idx in [0, 1, 17, n - 1]:
        proof = tree.get_merkle_proof(leaves, idx, pruned=pruned)
        assert tree.verify(proof), f"idx {idx}"
        # tampered leaf fails
        bad = MerkleProof(leaf=proof.leaf ^ 1, leaf_idx=proof.leaf_idx,
                          root=proof.root, path=proof.path, pruned=proof.pruned)
        assert not tree.verify(bad)


def test_proof_serialization_roundtrip(rng):
    tree, f = make_tree(depth=3, t=2)
    n = tree.expected_leaves()
    leaves = np.arange(n, dtype=np.uint32).reshape(n, 1)
    tree.build(leaves)
    proof = tree.get_merkle_proof(leaves, 5)
    data = proof.serialize()
    back = MerkleProof.deserialize(data)
    assert back.leaf_idx == 5 and back.pruned
    assert np.array_equal(back.root, proof.root)
    # the reference layout stores the path as one flat blob
    # (merkle_proof_serializer.h); contents must match the segment concat
    assert np.array_equal(np.concatenate(back.path),
                          np.concatenate(proof.path))
    assert tree.verify(back)
    # reference byte layout: u8 pruned, u64 leaf_idx, u64-sized blobs
    import struct
    pruned, idx, nleaf = struct.unpack_from("<BQQ", data, 0)
    assert (pruned, idx) == (1, 5)
    assert nleaf == proof.leaf.size * 4
    off = 17 + nleaf
    (nroot,) = struct.unpack_from("<Q", data, off)
    assert nroot == proof.root.size * 4
    off += 8 + nroot
    (npath,) = struct.unpack_from("<Q", data, off)
    assert npath == sum(s.size for s in proof.path) * 4
    assert len(data) == off + 8 + npath


def test_padding_policies(rng):
    tree, f = make_tree(depth=3, t=2)  # 8 leaves expected
    leaves = np.arange(5, dtype=np.uint32).reshape(5, 1)
    r_zero = tree.build(leaves, MerkleTreeConfig(padding_policy="zero"))
    full_zero = np.concatenate([leaves, np.zeros((3, 1), np.uint32)])
    assert np.array_equal(r_zero, tree.build(full_zero))
    r_last = tree.build(leaves, MerkleTreeConfig(padding_policy="last_value"))
    full_last = np.concatenate([leaves, np.full((3, 1), 4, np.uint32)])
    assert np.array_equal(r_last, tree.build(full_last))
    with pytest.raises(Exception):
        tree.build(leaves)  # no padding policy


def test_mixed_arity_layers(rng):
    f = get_field("babybear")
    # leaf layer arity 4 (t=4), upper layers arity 2 (t=2): 4*2*2 = 16 leaves
    tree = MerkleTree([Poseidon2(f, 4), Poseidon2(f, 2), Poseidon2(f, 2)],
                      leaf_words=1)
    n = tree.expected_leaves()
    assert n == 16
    leaves = np.arange(n, dtype=np.uint32).reshape(n, 1)
    tree.build(leaves)
    for idx in (0, 7, 15):
        assert tree.verify(tree.get_merkle_proof(leaves, idx))


def test_multilimb_field_tree(rng):
    f = get_field("bn254_scalar")
    tree = MerkleTree([Poseidon2(f, 2)] * 3, leaf_words=8)
    leaves = np.zeros((8, 8), dtype=np.uint32)
    leaves[:, 0] = np.arange(8)
    tree.build(leaves)
    proof = tree.get_merkle_proof(leaves, 3)
    assert tree.verify(proof)


def test_chunked_build_bit_identical(rng):
    """chunks>1 must reproduce the unchunked tree exactly (layers + proofs);
    it routes around the remote-compile limit at 2^26+ (bench.py)."""
    f = get_field("babybear")
    depth = 10
    leaves = rng.integers(0, f.modulus, size=(1 << depth,), dtype=np.uint32)
    t_ref = MerkleTree([Poseidon2(f, 2)] * depth, leaf_words=1)
    t_chk = MerkleTree([Poseidon2(f, 2)] * depth, leaf_words=1)
    root_ref = t_ref.build(leaves)
    root_chk = t_chk.build(leaves, chunks=8)
    assert np.array_equal(root_ref, root_chk)
    for i in range(len(t_ref.layers)):
        assert np.array_equal(np.asarray(t_ref.layers[i]),
                              np.asarray(t_chk.layers[i])), f"layer {i}"
    proof = t_chk.get_merkle_proof(leaves, 777, pruned=True)
    assert t_chk.verify(proof)


def test_chunked_build_mixed_arity(rng):
    """chunk split must stop at the deepest layer the chunk size divides."""
    f = get_field("babybear")
    hashers = [Poseidon2(f, 4), Poseidon2(f, 2), Poseidon2(f, 4),
               Poseidon2(f, 2)]
    n = 4 * 2 * 4 * 2
    leaves = rng.integers(0, f.modulus, size=(n,), dtype=np.uint32)
    t_ref = MerkleTree(hashers, leaf_words=1)
    t_chk = MerkleTree(list(hashers), leaf_words=1)
    assert np.array_equal(t_ref.build(leaves), t_chk.build(leaves, chunks=4))

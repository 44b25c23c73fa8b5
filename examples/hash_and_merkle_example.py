"""Hash + Merkle example (mirrors reference examples/rust/hash-and-merkle):
Poseidon2 Merkle tree build, proof extraction and verification; byte hashes.
Run: PYTHONPATH=.:/root/.axon_site python examples/hash_and_merkle_example.py
"""

import numpy as np

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops.hash.poseidon2 import Poseidon2
from icicle_tpu.ops.hash.keccak import Keccak256
from icicle_tpu.ops.hash.blake3 import Blake3
from icicle_tpu.ops.merkle import MerkleTree


def main():
    f = get_field("babybear")
    rng = np.random.default_rng(0)

    # byte hashes
    print("keccak256('hello') =", Keccak256().hash_bytes(b"hello").hex()[:32], "...")
    print("blake3('hello')    =", Blake3().hash_bytes(b"hello").hex()[:32], "...")

    # Poseidon2 binary tree over 2^10 field leaves
    depth = 10
    h2 = Poseidon2(f, 2)   # 2->1 compression
    tree = MerkleTree([h2.with_input_words(2)] * depth, leaf_words=1)
    leaves = np.asarray(f.rand(rng, (1 << depth,)), dtype=np.uint32).reshape(-1, 1)
    root = tree.build(leaves)
    print("poseidon2 merkle root:", hex(int(root[0])))

    proof = tree.get_merkle_proof(leaves, leaf_idx=123, pruned=True)
    assert tree.verify(proof)
    print("proof for leaf 123 verifies: OK")
    blob = proof.serialize()
    from icicle_tpu.ops.merkle import MerkleProof
    assert tree.verify(MerkleProof.deserialize(blob))
    print(f"serialized proof: {len(blob)} bytes, roundtrip verifies")


if __name__ == "__main__":
    main()

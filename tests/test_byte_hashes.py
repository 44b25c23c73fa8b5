"""Keccak/SHA3/Blake2s vs hashlib + known vectors (mirrors reference
test_hash_api.cpp known-vector cases)."""

import hashlib

import numpy as np
import pytest

from icicle_tpu.ops.hash.keccak import Keccak256, Keccak512, Sha3_256, Sha3_512
from icicle_tpu.ops.hash.blake2s import Blake2s


@pytest.mark.parametrize("cls,href", [(Sha3_256, "sha3_256"), (Sha3_512, "sha3_512")])
@pytest.mark.parametrize("n", [0, 1, 31, 64, 135, 136, 137, 300])
def test_sha3_matches_hashlib(cls, href, n, rng):
    data = rng.bytes(n)
    got = cls().hash_bytes(data)
    want = hashlib.new(href, data).digest()
    assert got == want, f"{href} len {n}"


def test_keccak256_known_vectors():
    # keccak-256("") and keccak-256("abc") (pre-NIST padding, as used by Ethereum)
    assert Keccak256().hash_bytes(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert Keccak256().hash_bytes(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"


def test_keccak512_known_vector():
    assert Keccak512().hash_bytes(b"abc").hex() == \
        "18587dc2ea106b9a1563e32b3312421ca164c7f1f07bc922a9c83d77cea3a1e5" \
        "d0c69910739025372dc14ac9642629379540c17e2a65b19d77aa511a9d00bb96"


@pytest.mark.parametrize("n", [0, 1, 32, 63, 64, 65, 128, 200])
def test_blake2s_matches_hashlib(n, rng):
    data = rng.bytes(n)
    got = Blake2s().hash_bytes(data)
    want = hashlib.blake2s(data).digest()
    assert got == want, f"blake2s len {n}"


def test_batched_byte_hashes(rng):
    data = rng.bytes(64 * 3)
    got = Sha3_256().hash_bytes(data, batch=3)
    for i in range(3):
        want = hashlib.sha3_256(data[64 * i:64 * (i + 1)]).digest()
        assert got[32 * i:32 * (i + 1)] == want


def test_hash_words_matches_bytes(rng):
    data = rng.bytes(40)
    h = Keccak256()
    from_bytes = h.hash_bytes(data)
    import jax.numpy as jnp
    words = jnp.asarray(np.frombuffer(data, dtype="<u4").reshape(1, 10))
    from_words = np.asarray(h.hash_words(words)).astype("<u4").tobytes()
    assert from_bytes == from_words

"""Host byte-level Keccak/SHA-3 wrappers over the numpy batch engine
(utils/keccak_np.py) — single-message convenience for Fiat-Shamir
transcripts. Semantics match the reference's creators
(backend/cpu/src/hash/cpu_keccak.cpp): keccak pads 0x01, sha3 0x06.

(The former pure-python sponge here was the 4th keccak implementation in
the tree; it now delegates so the repo carries exactly two engines: the
batched JAX device kernel (ops/hash/keccak.py) and this numpy host engine,
plus the optional C++ fast path in native/host_crypto.cpp that utils.native
prefers when built.)
"""

from __future__ import annotations

import numpy as np

from icicle_tpu.utils.keccak_np import _sponge


def _one(data: bytes, rate: int, outlen: int, pad: int) -> bytes:
    arr = np.frombuffer(bytes(data), dtype=np.uint8).reshape(1, -1)
    return _sponge(arr, rate, outlen, pad)[0].tobytes()


def keccak_256(data: bytes) -> bytes:
    return _one(data, 136, 32, 0x01)


def keccak_512(data: bytes) -> bytes:
    return _one(data, 72, 64, 0x01)


def sha3_256(data: bytes) -> bytes:
    return _one(data, 136, 32, 0x06)


def sha3_512(data: bytes) -> bytes:
    return _one(data, 72, 64, 0x06)


def shake128(data: bytes, outlen: int) -> bytes:
    return _one(data, 168, outlen, 0x1F)


def shake256(data: bytes, outlen: int) -> bytes:
    return _one(data, 136, outlen, 0x1F)

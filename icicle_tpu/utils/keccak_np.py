"""Batch-vectorized Keccak-f[1600] + SHA3/SHAKE over numpy uint64 lanes.

The ML-KEM pipeline hashes thousands of fixed-size inputs per batch; this
vectorizes the permutation across the batch axis (state (B, 25) uint64), the
same data-parallel shape the reference's CUDA-PQC warp kernels use
(backend/cuda_pqc/include/ml_kem/hash/cuda_sha3_*.cuh).
"""

from __future__ import annotations

import numpy as np

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], dtype=np.uint64)

# rho rotations and pi permutation indexed by (x + 5y)
_RHO = np.zeros(25, dtype=np.uint64)
_rot = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]
for _x in range(5):
    for _y in range(5):
        _RHO[_x + 5 * _y] = _rot[_x][_y]


def _rol(v, n):
    n = np.uint64(n)
    if n == 0:
        return v
    return (v << n) | (v >> (np.uint64(64) - n))


def keccak_f(state: np.ndarray) -> np.ndarray:
    """state: (B, 25) uint64 (lane index = x + 5y). In-place style, returns."""
    s = state
    for rnd in range(24):
        # theta: column parity over y for each x (lane index = x + 5y)
        c = np.stack([s[:, x] ^ s[:, x + 5] ^ s[:, x + 10] ^ s[:, x + 15] ^ s[:, x + 20]
                      for x in range(5)], axis=1)
        d = np.stack([c[:, (x - 1) % 5] ^ _rol(c[:, (x + 1) % 5], 1)
                      for x in range(5)], axis=1)
        for x in range(5):
            for y in range(5):
                s[:, x + 5 * y] ^= d[:, x]
        # rho + pi
        b = np.empty_like(s)
        for x in range(5):
            for y in range(5):
                b[:, y + 5 * ((2 * x + 3 * y) % 5)] = _rol(s[:, x + 5 * y],
                                                           int(_RHO[x + 5 * y]))
        # chi
        for y in range(5):
            row = b[:, 5 * y:5 * y + 5]
            for x in range(5):
                s[:, x + 5 * y] = row[:, x] ^ (~row[:, (x + 1) % 5] & row[:, (x + 2) % 5])
        # iota
        s[:, 0] ^= _RC[rnd]
    return s


def _sponge(data: np.ndarray, rate: int, outlen: int, pad: int) -> np.ndarray:
    """data: (B, L) uint8 equal-length messages -> (B, outlen) uint8."""
    B, L = data.shape
    nblocks = L // rate + 1
    buf = np.zeros((B, nblocks * rate), dtype=np.uint8)
    buf[:, :L] = data
    buf[:, L] = pad
    buf[:, nblocks * rate - 1] ^= 0x80
    state = np.zeros((B, 25), dtype=np.uint64)
    lanes = buf.reshape(B, nblocks, rate // 8, 8).view("<u8")[..., 0]
    for blk in range(nblocks):
        state[:, :rate // 8] ^= lanes[:, blk]
        state = keccak_f(state)
    out = np.zeros((B, outlen), dtype=np.uint8)
    off = 0
    while off < outlen:
        take = min(rate, outlen - off)
        squeezed = state[:, :rate // 8].copy().view(np.uint8).reshape(B, rate)
        out[:, off:off + take] = squeezed[:, :take]
        off += take
        if off < outlen:
            state = keccak_f(state)
    return out


def sha3_256(data: np.ndarray) -> np.ndarray:
    return _sponge(data, 136, 32, 0x06)


def sha3_512(data: np.ndarray) -> np.ndarray:
    return _sponge(data, 72, 64, 0x06)


def shake128(data: np.ndarray, outlen: int) -> np.ndarray:
    return _sponge(data, 168, outlen, 0x1F)


def shake256(data: np.ndarray, outlen: int) -> np.ndarray:
    return _sponge(data, 136, outlen, 0x1F)

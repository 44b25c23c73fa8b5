"""Keccak/SHA-3 (reference F7: backend/cpu/src/hash/cpu_keccak.cpp — here a
from-scratch keccak-f[1600] over uint32 lane pairs, batch-vectorized for VPU).

64-bit lanes are (lo, hi) uint32 pairs; the permutation is fully unrolled
straight-line XOR/rotate code that XLA fuses per batch tile. Variants:
Keccak256/Keccak512 (0x01 domain padding) and Sha3_256/Sha3_512 (0x06), as in
the reference create_keccak_256_hash()/create_sha3_256_hash() family.

The word-level interface consumes whole uint32 words (Merkle/transcript usage);
hash_bytes handles arbitrary byte lengths.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.ops.hash.hash import Hash

U32 = jnp.uint32

# rotation offsets r[x,y] and the pi permutation, from the Keccak spec
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]


def _rot64(lo, hi, r):
    r = r % 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        nlo = ((lo << r) | (hi >> (32 - r))).astype(U32)
        nhi = ((hi << r) | (lo >> (32 - r))).astype(U32)
        return nlo, nhi
    r -= 32
    nlo = ((hi << r) | (lo >> (32 - r))).astype(U32)
    nhi = ((lo << r) | (hi >> (32 - r))).astype(U32)
    return nlo, nhi


_RC_WORDS = np.array([[rc & 0xFFFFFFFF, rc >> 32] for rc in _RC], dtype=np.uint32)


def _keccak_round(state, rc):
    """One keccak-f round; state = list of 25 (lo, hi) pairs, rc = (2,) u32."""
    # theta
    c = [(state[x][0] ^ state[x + 5][0] ^ state[x + 10][0] ^ state[x + 15][0]
          ^ state[x + 20][0],
          state[x][1] ^ state[x + 5][1] ^ state[x + 10][1] ^ state[x + 15][1]
          ^ state[x + 20][1]) for x in range(5)]
    d = []
    for x in range(5):
        rl, rh = _rot64(*c[(x + 1) % 5], 1)
        d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
    state = [(state[i][0] ^ d[i % 5][0], state[i][1] ^ d[i % 5][1])
             for i in range(25)]
    # rho + pi
    b = [None] * 25
    for x in range(5):
        for y in range(5):
            b[y + 5 * ((2 * x + 3 * y) % 5)] = _rot64(*state[x + 5 * y], _ROT[x][y])
    # chi
    state = []
    for y in range(5):
        for x in range(5):
            lo = b[x + 5 * y][0] ^ ((~b[(x + 1) % 5 + 5 * y][0]) & b[(x + 2) % 5 + 5 * y][0])
            hi = b[x + 5 * y][1] ^ ((~b[(x + 1) % 5 + 5 * y][1]) & b[(x + 2) % 5 + 5 * y][1])
            state.append((lo.astype(U32), hi.astype(U32)))
    # iota
    state[0] = (state[0][0] ^ rc[0], state[0][1] ^ rc[1])
    return state


def keccak_f1600(state):
    """state: list of 25 (lo, hi) pairs, index [x + 5*y]. Returns new state.

    Rounds run under lax.scan so the round body is traced once."""
    def step(s, rc):
        return _keccak_round(s, rc), None

    state, _ = jax.lax.scan(step, state, jnp.asarray(_RC_WORDS))
    return state


class _KeccakBase(Hash):
    rate_bytes: int
    pad_byte: int

    def __init__(self):
        self._jit = {}

    def _absorb_padded(self, blocks):
        """blocks: (batch, nof_blocks, rate_words) uint32, already padded."""
        batch = blocks.shape[0]
        zeros = jnp.zeros((batch,), dtype=U32)
        state = [(zeros, zeros) for _ in range(25)]
        rate_words = self.rate_bytes // 4
        nof_blocks = blocks.shape[1]
        for bi in range(nof_blocks):
            blk = blocks[:, bi, :]
            for w in range(rate_words // 2):
                lo = state[w][0] ^ blk[:, 2 * w]
                hi = state[w][1] ^ blk[:, 2 * w + 1]
                state[w] = (lo, hi)
            state = keccak_f1600(state)
        out = []
        for w in range(self.digest_words // 2):
            out.extend([state[w][0], state[w][1]])
        return jnp.stack(out, axis=-1)

    def _pad_host(self, data: np.ndarray) -> np.ndarray:
        """(batch, nbytes) uint8 -> (batch, nof_blocks, rate_words) uint32."""
        batch, n = data.shape
        rb = self.rate_bytes
        nof_blocks = n // rb + 1
        buf = np.zeros((batch, nof_blocks * rb), dtype=np.uint8)
        buf[:, :n] = data
        buf[:, n] = self.pad_byte
        buf[:, nof_blocks * rb - 1] ^= 0x80
        return buf.view("<u4").reshape(batch, nof_blocks, rb // 4)

    def hash_bytes(self, data: bytes, batch: int = 1) -> bytes:
        assert len(data) % batch == 0
        arr = np.frombuffer(data, dtype=np.uint8).reshape(batch, -1)
        blocks = jnp.asarray(self._pad_host(arr))
        key = blocks.shape
        if key not in self._jit:
            self._jit[key] = jax.jit(self._absorb_padded)
        out = np.asarray(self._jit[key](blocks)).astype("<u4")
        return out.tobytes()

    def hash_words(self, x):
        """(batch, in_words) uint32 -> (batch, digest_words)."""
        batch, in_words = x.shape
        n = in_words * 4
        rb = self.rate_bytes
        nof_blocks = n // rb + 1
        pad_words = nof_blocks * (rb // 4) - in_words
        pad = jnp.zeros((batch, pad_words), dtype=U32)
        first_pad = jnp.full((batch, 1), self.pad_byte, dtype=U32)
        pad = jax.lax.dynamic_update_slice(pad, first_pad, (0, 0))
        last = pad[:, -1:] | U32(0x80 << 24)
        pad = jnp.concatenate([pad[:, :-1], last], axis=1)
        blocks = jnp.concatenate([x, pad], axis=1).reshape(batch, nof_blocks, rb // 4)
        key = ("w", blocks.shape)
        if key not in self._jit:
            self._jit[key] = jax.jit(self._absorb_padded)
        return self._jit[key](blocks)


class Keccak256(_KeccakBase):
    rate_bytes = 136
    pad_byte = 0x01
    digest_words = 8


class Keccak512(_KeccakBase):
    rate_bytes = 72
    pad_byte = 0x01
    digest_words = 16


class Sha3_256(_KeccakBase):
    rate_bytes = 136
    pad_byte = 0x06
    digest_words = 8


class Sha3_512(_KeccakBase):
    rate_bytes = 72
    pad_byte = 0x06
    digest_words = 16

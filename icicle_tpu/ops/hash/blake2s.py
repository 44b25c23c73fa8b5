"""BLAKE2s-256 (reference F7: backend/cpu/src/hash/cpu_blake2s.cpp — here a
from-scratch RFC 7693 implementation on uint32 lanes, batch-vectorized)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.ops.hash.hash import Hash

U32 = jnp.uint32

_IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], dtype=np.uint32)

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _rotr(x, r):
    return ((x >> r) | (x << (32 - r))).astype(U32)


def _g(v, a, b, c, d, x, y):
    v[a] = (v[a] + v[b] + x).astype(U32)
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = (v[c] + v[d]).astype(U32)
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = (v[a] + v[b] + y).astype(U32)
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = (v[c] + v[d]).astype(U32)
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress(h, block, t_bytes, final):
    """h: list of 8 (batch,) u32; block: (batch, 16) u32; t_bytes: python int.

    Rounds run under lax.scan over the sigma-permuted message schedule."""
    msched = block[:, jnp.asarray(np.array(_SIGMA, dtype=np.int32))]  # (batch, 10, 16)
    msched = jnp.moveaxis(msched, 1, 0)                               # (10, batch, 16)
    v = list(h) + [jnp.broadcast_to(U32(x), h[0].shape) for x in _IV]
    v[12] = v[12] ^ U32(t_bytes & 0xFFFFFFFF)
    v[13] = v[13] ^ U32((t_bytes >> 32) & 0xFFFFFFFF)
    if final:
        v[14] = v[14] ^ U32(0xFFFFFFFF)

    def round_step(v, mr):
        v = list(v)
        m = [mr[:, i] for i in range(16)]
        _g(v, 0, 4, 8, 12, m[0], m[1])
        _g(v, 1, 5, 9, 13, m[2], m[3])
        _g(v, 2, 6, 10, 14, m[4], m[5])
        _g(v, 3, 7, 11, 15, m[6], m[7])
        _g(v, 0, 5, 10, 15, m[8], m[9])
        _g(v, 1, 6, 11, 12, m[10], m[11])
        _g(v, 2, 7, 8, 13, m[12], m[13])
        _g(v, 3, 4, 9, 14, m[14], m[15])
        return v, None

    v, _ = jax.lax.scan(round_step, v, msched)
    return [(h[i] ^ v[i] ^ v[i + 8]).astype(U32) for i in range(8)]


class Blake2s(Hash):
    digest_words = 8

    def __init__(self):
        self._jit = {}

    def _run(self, blocks, nbytes: int):
        """blocks: (batch, nof_blocks, 16) u32 zero-padded; nbytes = true length."""
        batch = blocks.shape[0]
        h = [jnp.broadcast_to(U32(x), (batch,)).astype(U32) for x in _IV]
        h[0] = h[0] ^ U32(0x01010000 ^ 32)  # param: depth 1, fanout 1, 32-byte out
        nof_blocks = blocks.shape[1]
        for i in range(nof_blocks):
            final = i == nof_blocks - 1
            t = min(nbytes, (i + 1) * 64) if not final else nbytes
            h = _compress(h, blocks[:, i, :], t, final)
        return jnp.stack(h, axis=-1)

    def hash_bytes(self, data: bytes, batch: int = 1) -> bytes:
        assert len(data) % batch == 0
        n = len(data) // batch
        arr = np.frombuffer(data, dtype=np.uint8).reshape(batch, n)
        nof_blocks = max(1, -(-n // 64))
        buf = np.zeros((batch, nof_blocks * 64), dtype=np.uint8)
        buf[:, :n] = arr
        blocks = jnp.asarray(buf.view("<u4").reshape(batch, nof_blocks, 16))
        key = (blocks.shape, n)
        if key not in self._jit:
            self._jit[key] = jax.jit(lambda b: self._run(b, n))
        out = np.asarray(self._jit[key](blocks)).astype("<u4")
        return out.tobytes()

    def hash_words(self, x):
        batch, in_words = x.shape
        n = in_words * 4
        nof_blocks = max(1, -(-in_words // 16))
        pad = jnp.zeros((batch, nof_blocks * 16 - in_words), dtype=U32)
        blocks = jnp.concatenate([x, pad], axis=1).reshape(batch, nof_blocks, 16)
        key = ("w", blocks.shape, n)
        if key not in self._jit:
            self._jit[key] = jax.jit(lambda b: self._run(b, n))
        return self._jit[key](blocks)

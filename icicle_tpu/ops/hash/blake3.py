"""Blake3 hash (reference F7: backend/cpu/src/hash/cpu_blake3.cpp, which
vendors the portable C implementation; output = 32-byte digests).

TPU-native structure: the compression function is pure uint32 VPU code
vectorized over the batch axis; the chunk/tree chaining walk is host-driven
(static per input length, so the whole hash jits per shape). Verified against
the official BLAKE3 test vectors (tests/test_byte_hashes.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.ops.hash.hash import Hash
from icicle_tpu.math.u32 import U32

IV = np.array([0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
               0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], dtype=np.uint32)

_MSG_PERM = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3

BLOCK_BYTES = 64
CHUNK_BYTES = 1024


def _rotr(x, r):
    return ((x >> r) | (x << (32 - r))).astype(U32)


def _g(v, a, b, c, d, mx, my):
    v[a] = (v[a] + v[b] + mx).astype(U32)
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = (v[c] + v[d]).astype(U32)
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = (v[a] + v[b] + my).astype(U32)
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = (v[c] + v[d]).astype(U32)
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress(cv, block_words, counter: int, block_len: int, flags: int,
              full_state: bool = False):
    """cv: list of 8 (batch,) arrays; block_words: list of 16 (batch,) arrays."""
    z = jnp.zeros_like(cv[0])
    v = [cv[i] for i in range(8)] + \
        [z + np.uint32(IV[i]) for i in range(4)] + \
        [z + np.uint32(counter & 0xFFFFFFFF),
         z + np.uint32((counter >> 32) & 0xFFFFFFFF),
         z + np.uint32(block_len), z + np.uint32(flags)]
    m = list(block_words)
    for rnd in range(7):
        _g(v, 0, 4, 8, 12, m[0], m[1])
        _g(v, 1, 5, 9, 13, m[2], m[3])
        _g(v, 2, 6, 10, 14, m[4], m[5])
        _g(v, 3, 7, 11, 15, m[6], m[7])
        _g(v, 0, 5, 10, 15, m[8], m[9])
        _g(v, 1, 6, 11, 12, m[10], m[11])
        _g(v, 2, 7, 8, 13, m[12], m[13])
        _g(v, 3, 4, 9, 14, m[14], m[15])
        if rnd < 6:
            m = [m[p] for p in _MSG_PERM]
    out = [v[i] ^ v[i + 8] for i in range(8)]
    return out


class Blake3(Hash):
    """Default-mode (unkeyed) BLAKE3, 32-byte output."""

    digest_words = 8
    default_input_words = 0

    def __init__(self):
        self._jit = {}

    def _run(self, blocks, nbytes: int):
        """blocks: (batch, n_blocks, 16) uint32 padded words."""
        batch = blocks.shape[0]
        n_chunks = max(1, -(-nbytes // CHUNK_BYTES))

        def chunk_cv(chunk_idx: int):
            start = chunk_idx * (CHUNK_BYTES // BLOCK_BYTES)
            chunk_bytes = min(CHUNK_BYTES, nbytes - chunk_idx * CHUNK_BYTES)
            n_blocks = max(1, -(-chunk_bytes // BLOCK_BYTES))
            cv = [jnp.zeros((batch,), U32) + np.uint32(IV[i]) for i in range(8)]
            for b in range(n_blocks):
                block_len = min(BLOCK_BYTES, chunk_bytes - b * BLOCK_BYTES)
                flags = 0
                if b == 0:
                    flags |= CHUNK_START
                if b == n_blocks - 1:
                    flags |= CHUNK_END
                    if n_chunks == 1:
                        flags |= ROOT
                bw = [blocks[:, start + b, i] for i in range(16)]
                cv = _compress(cv, bw, chunk_idx, block_len, flags)
            return cv

        cvs = [chunk_cv(i) for i in range(n_chunks)]

        # parent tree merge (left-full binary tree, blake3 spec)
        def merge(nodes):
            if len(nodes) == 1:
                return nodes[0]
            out = []
            i = 0
            while i + 1 < len(nodes):
                bw = nodes[i] + nodes[i + 1]
                flags = PARENT | (ROOT if len(nodes) == 2 else 0)
                cv = [jnp.zeros((batch,), U32) + np.uint32(IV[j]) for j in range(8)]
                out.append(_compress(cv, bw, 0, BLOCK_BYTES, flags))
                i += 2
            if i < len(nodes):
                out.append(nodes[i])
            return merge(out)

        root = merge(cvs)
        return jnp.stack(root, axis=-1)

    def hash_bytes(self, data: bytes, batch: int = 1) -> bytes:
        assert len(data) % batch == 0
        nbytes = len(data) // batch
        arr = np.frombuffer(data, dtype=np.uint8).reshape(batch, nbytes)
        n_blocks_total = max(1, -(-nbytes // BLOCK_BYTES))
        # round chunk boundaries: each chunk has 16 block slots
        n_chunks = max(1, -(-nbytes // CHUNK_BYTES))
        slots = n_chunks * (CHUNK_BYTES // BLOCK_BYTES)
        buf = np.zeros((batch, slots * BLOCK_BYTES), dtype=np.uint8)
        buf[:, :nbytes] = arr
        words = buf.view("<u4").reshape(batch, slots, 16)
        key = (words.shape, nbytes)
        if key not in self._jit:
            self._jit[key] = jax.jit(lambda b: self._run(b, nbytes))
        out = np.asarray(self._jit[key](jnp.asarray(words))).astype("<u4")
        return out.tobytes()

    def hash_words(self, x):
        batch, in_words = x.shape
        nbytes = in_words * 4
        n_chunks = max(1, -(-nbytes // CHUNK_BYTES))
        slots = n_chunks * (CHUNK_BYTES // BLOCK_BYTES)
        pad = slots * 16 - in_words
        if pad:
            x = jnp.concatenate([x, jnp.zeros((batch, pad), U32)], axis=1)
        return self._run(x.reshape(batch, slots, 16), nbytes)

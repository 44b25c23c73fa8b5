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


#: m-index schedule: round r position j reads message word _SCHEDULE[r, j]
_SCHEDULE = np.zeros((7, 16), dtype=np.int32)
_perm = list(range(16))
for _r in range(7):
    _SCHEDULE[_r] = _perm
    _perm = [_perm[p] for p in _MSG_PERM]

#: round lowering: "auto" (scan on CPU — the unrolled 7-round body makes
#: single-core XLA:CPU compiles pathological; unrolled on TPU — device loop
#: iterations are expensive there), or force "scan"/"unrolled".
ROUND_MODE = "auto"

_G_IDX = [(0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
          (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14)]


def _compress_dyn(cv, block_words, counter, block_len, flags):
    """Compression with counter/block_len/flags as broadcastable uint32
    arrays; cv and block_words are lists of equally-shaped arrays."""
    z = jnp.zeros_like(cv[0])
    v = [cv[i] for i in range(8)] + \
        [z + np.uint32(IV[i]) for i in range(4)] + \
        [z + counter, z, z + block_len, z + flags]
    mode = ROUND_MODE
    if mode == "auto":
        mode = "scan" if jax.default_backend() == "cpu" else "unrolled"
    m = list(block_words)
    if mode == "unrolled":
        for rnd in range(7):
            for gi, (a, b, c, d) in enumerate(_G_IDX):
                _g(v, a, b, c, d, m[2 * gi], m[2 * gi + 1])
            if rnd < 6:
                m = [m[p] for p in _MSG_PERM]
        return [v[i] ^ v[i + 8] for i in range(8)]

    # scan form: one round in the graph, message gathered by schedule row
    vs = jnp.stack(v, axis=0)             # (16, ...)
    ms = jnp.stack(m, axis=0)             # (16, ...)

    def round_body(vstate, sched_row):
        mr = jnp.take(ms, sched_row, axis=0)
        vv = [vstate[i] for i in range(16)]
        for gi, (a, b, c, d) in enumerate(_G_IDX):
            _g(vv, a, b, c, d, mr[2 * gi], mr[2 * gi + 1])
        return jnp.stack(vv, axis=0), None

    vs, _ = jax.lax.scan(round_body, vs, jnp.asarray(_SCHEDULE))
    return [vs[i] ^ vs[i + 8] for i in range(8)]


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
        """blocks: (batch, n_blocks, 16) uint32 padded words.

        Graph-size discipline: ONE traced compress inside a lax.scan over the
        chunk's block rows (vectorized over batch x chunks), then one batched
        compress per parent-tree level — O(log chunks) compress instances
        total. (An unrolled version compiles pathologically on wide DAGs.)
        """
        batch = blocks.shape[0]
        n_chunks = max(1, -(-nbytes // CHUNK_BYTES))
        bpc = CHUNK_BYTES // BLOCK_BYTES
        n_blocks = max(1, -(-min(nbytes, CHUNK_BYTES) // BLOCK_BYTES)) \
            if n_chunks == 1 else bpc
        # per-(chunk, block) metadata as arrays
        blk_meta_len = np.zeros((n_chunks, bpc), dtype=np.uint32)
        blk_flags = np.zeros((n_chunks, bpc), dtype=np.uint32)
        blk_active = np.zeros((n_chunks, bpc), dtype=bool)
        max_blocks = 0
        for ci in range(n_chunks):
            cbytes = min(CHUNK_BYTES, nbytes - ci * CHUNK_BYTES)
            nb = max(1, -(-cbytes // BLOCK_BYTES))
            max_blocks = max(max_blocks, nb)
            for b in range(nb):
                blk_active[ci, b] = True
                blk_meta_len[ci, b] = min(BLOCK_BYTES, max(cbytes - b * BLOCK_BYTES, 0))
                fl = 0
                if b == 0:
                    fl |= CHUNK_START
                if b == nb - 1:
                    fl |= CHUNK_END
                    if n_chunks == 1:
                        fl |= ROOT
                blk_flags[ci, b] = fl

        # (batch, chunks, blocks, 16) -> scan over block axis
        bl = blocks.reshape(batch, n_chunks, bpc, 16)[:, :, :max_blocks]
        counters = jnp.asarray(np.arange(n_chunks, dtype=np.uint32))[None, :]

        zeros2 = jnp.zeros((batch, n_chunks), U32)
        cv0 = [zeros2 + np.uint32(IV[i]) for i in range(8)]

        def body(cv, inp):
            bw_row, blen, flags, active = inp   # (batch, chunks, 16), (chunks,)...
            bw = [bw_row[..., i] for i in range(16)]
            newcv = _compress_dyn(cv, bw, counters, blen[None, :],
                                  flags[None, :])
            out = [jnp.where(active[None, :], n, o)
                   for n, o in zip(newcv, cv)]
            return out, None

        xs = (jnp.moveaxis(bl, 2, 0),
              jnp.asarray(blk_meta_len.T[:max_blocks]),
              jnp.asarray(blk_flags.T[:max_blocks]),
              jnp.asarray(blk_active.T[:max_blocks]))
        if max_blocks > 1:
            cvs, _ = jax.lax.scan(body, cv0, xs)
        else:
            cvs, _ = body(cv0, jax.tree_util.tree_map(lambda a: a[0], xs))

        # parent merges: one BATCHED compress per level over the pair axis
        nodes = cvs            # list of 8 arrays (batch, n_chunks)
        num = n_chunks
        while num > 1:
            half = num // 2
            left = [n[:, 0:2 * half:2] for n in nodes]
            right = [n[:, 1:2 * half:2] for n in nodes]
            bw = left + right                     # 16 words (batch, half)
            z = jnp.zeros((batch, half), U32)
            cv_iv = [z + np.uint32(IV[i]) for i in range(8)]
            flags = PARENT | (ROOT if num == 2 else 0)
            merged = _compress_dyn(cv_iv, bw, z, z + np.uint32(BLOCK_BYTES),
                                   z + np.uint32(flags))
            if num % 2:
                nodes = [jnp.concatenate([m, n[:, -1:]], axis=1)
                         for m, n in zip(merged, nodes)]
                num = half + 1
            else:
                nodes = merged
                num = half
        root = [n[:, 0] for n in nodes]
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

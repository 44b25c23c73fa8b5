"""Proof-of-work grind (reference F8: include/icicle/hash/pow.h,
backend/cpu/src/hash/cpu_pow.cpp).

Semantics (cpu_pow.cpp:63-120): input = challenge || u64(nonce) LE || zero
padding (PowConfig.padding_size, default 24); a nonce solves when the digest's
first 8 bytes, read little-endian, are < 2^(64 - solution_bits). The search
returns the smallest solving nonce.

TPU-native: the nonce grid is a batched hash_words call (grid of 1024 nonces
per step, mirroring the reference's grid_size) — the whole grid hashes in one
vectorized kernel invocation.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from icicle_tpu.ops.hash.hash import Hash


@dataclasses.dataclass
class PowConfig:
    """Mirror of reference PowConfig (pow.h:16-23)."""
    padding_size: int = 24
    grid_size: int = 1024


def _build_grid(challenge: bytes, offset: int, grid: int, padding: int) -> np.ndarray:
    full = len(challenge) + 8 + padding
    # pad rows to a word multiple for hash_words
    row_bytes = full + (-full) % 4
    buf = np.zeros((grid, row_bytes), dtype=np.uint8)
    ch = np.frombuffer(challenge, dtype=np.uint8)
    buf[:, :len(ch)] = ch
    nonces = (np.arange(grid, dtype=np.uint64) + np.uint64(offset))
    buf[:, len(ch):len(ch) + 8] = nonces[:, None].view(np.uint8).reshape(grid, 8)
    return buf


def proof_of_work(hasher: Hash, challenge: bytes, solution_bits: int,
                  cfg: PowConfig | None = None) -> tuple[bool, int, int]:
    """Returns (found, nonce, mined_hash). Matches reference cpu_pow."""
    if not (1 <= solution_bits <= 60):
        raise ValueError("solution_bits must be in [1, 60]")
    cfg = cfg or PowConfig()
    threshold = 1 << (64 - solution_bits)
    full = len(challenge) + 8 + cfg.padding_size
    # byte hashes honor exact lengths via hash_bytes; pass the exact row size
    offset = 0
    max_iters = 1 << 22  # practical cap (reference scans the full u64 space)
    for _ in range(max_iters):
        rows = _build_grid(challenge, offset, cfg.grid_size, cfg.padding_size)
        data = rows[:, :full].tobytes()
        digests = hasher.hash_bytes(data, batch=cfg.grid_size)
        ds = np.frombuffer(digests, dtype=np.uint8).reshape(cfg.grid_size, -1)
        vals = ds[:, :8].copy().view("<u8").reshape(-1)
        hits = np.nonzero(vals < threshold)[0]
        if hits.size:
            i = int(hits[0])
            return True, offset + i, int(vals[i])
        offset += cfg.grid_size
    return False, 0, 0


def proof_of_work_verify(hasher: Hash, challenge: bytes, solution_bits: int,
                         nonce: int, cfg: PowConfig | None = None) -> tuple[bool, int]:
    """Returns (is_correct, mined_hash)."""
    if not (1 <= solution_bits <= 60):
        raise ValueError("solution_bits must be in [1, 60]")
    cfg = cfg or PowConfig()
    data = challenge + int(nonce).to_bytes(8, "little") + b"\x00" * cfg.padding_size
    digest = hasher.hash_bytes(data, batch=1)
    val = int.from_bytes(digest[:8], "little")
    return val < (1 << (64 - solution_bits)), val

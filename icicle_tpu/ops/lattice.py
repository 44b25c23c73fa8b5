"""Lattice ops over the babykoala ring Z_q (reference F14-F19).

Reference sources (semantics mirrored byte-for-byte where seeded):
  balanced decomposition  backend/cpu/src/ring/cpu_balanced_decomposition.cpp
  JL projection           backend/cpu/src/ring/cpu_jl_projection.cpp
  norm checks             backend/cpu/src/ring/cpu_norm.cpp
  random sampling         backend/cpu/src/ring/cpu_random_sampling.cpp
  operator norm           include/icicle/operator_norm.h (fixed-point FFT)

The seeded expansions (keccak512-driven) are host-side by construction — they
produce the SAME bytes as the reference so proofs interoperate. The bulk math
around them (digit extraction, projections, reductions) is vectorized numpy /
jnp over the whole vector. q fits in 63 bits so int64/uint64 host lanes are
exact (the same assumption the reference makes: cpu_norm.cpp:7).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from icicle_tpu.rings.babykoala import get_zq, Q, RQ_DEGREE
from icicle_tpu.utils import native as keccak_py


def _to_u64(x) -> np.ndarray:
    """(..., 2) uint32 Zq limbs -> uint64 numpy."""
    a = np.asarray(x)
    return a[..., 0].astype(np.uint64) | (a[..., 1].astype(np.uint64) << np.uint64(32))


def _from_u64(v: np.ndarray):
    lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (v >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(np.stack([lo, hi], axis=-1))


# -- balanced decomposition (F14) -------------------------------------------------

def compute_nof_digits(base: int) -> int:
    """Mirror of balanced_decomposition::compute_nof_digits (:34-47)."""
    digits = math.ceil(math.log2(Q) / math.log2(base))
    return digits + 1 if base > 2 else digits


def decompose_balanced(x, base: int, nof_digits: int | None = None):
    """(n, 2) Zq -> (nof_digits * n, 2), digit-major layout (digit d of element
    i at [d * n + i]), matching cpu_decompose_balanced_digits exactly."""
    assert base > 1
    nof_digits = nof_digits or compute_nof_digits(base)
    v = _to_u64(x).astype(np.int64)  # q < 2^63: exact
    n = v.shape[0]
    out = np.zeros((nof_digits, n), dtype=np.int64)
    q = Q
    rem = v.copy()
    if base > 2:
        rem = np.where(rem > q // 2, rem - q, rem)
    for d in range(nof_digits):
        digit = rem % base          # numpy % matches python floor-mod
        rem = rem // base           # floor division
        carry = digit > base // 2
        digit = np.where(carry, digit - base, digit)
        rem = rem + carry
        out[d] = digit
    res = np.where(out < 0, out + q, out).astype(np.uint64)
    return _from_u64(res.reshape(nof_digits * n))


def recompose_balanced(digits, base: int, out_size: int):
    """Inverse of decompose_balanced (cpu_recompose_from_balanced_digits)."""
    v = _to_u64(digits)
    nof_digits = v.shape[0] // out_size
    blocks = v.reshape(nof_digits, out_size)
    acc = np.zeros(out_size, dtype=object)
    for d in range(nof_digits - 1, -1, -1):
        acc = (acc * base + blocks[d].astype(object)) % Q
    return _from_u64(np.array([int(t) for t in acc], dtype=np.uint64))


# -- JL projection (F15) -----------------------------------------------------------

def _jl_entries(seed: bytes, row_idx: int, hashes_per_row: int, row_size: int) -> np.ndarray:
    """2-bit entries of one implicit JL row: 0->0, 1->+1, 2->-1, 3->0."""
    out = np.zeros(row_size, dtype=np.int8)
    entries_per_hash = 64 * 4  # keccak512 output bits / 2
    for h in range(hashes_per_row):
        counter = np.uint32(row_idx * hashes_per_row + h)
        digest = keccak_py.keccak_512(seed + counter.tobytes())
        db = np.frombuffer(digest, dtype=np.uint8)
        two_bits = np.stack([(db >> s) & 3 for s in (0, 2, 4, 6)], axis=1).reshape(-1)
        lo = h * entries_per_hash
        hi = min(row_size, lo + entries_per_hash)
        out[lo:hi] = two_bits[:hi - lo]
    return out


def jl_projection(x, seed: bytes, output_size: int):
    """Project (n, 2) Zq vector to (output_size, 2) via the seeded {0,±1}
    matrix (cpu_jl_projection.cpp:22-107)."""
    v = _to_u64(x).astype(object)
    n = v.shape[0]
    entries_per_hash = 64 * 4
    hashes_per_row = -(-n // entries_per_hash)
    rows = np.zeros(output_size, dtype=np.uint64)
    for r in range(output_size):
        e = _jl_entries(seed, r, hashes_per_row, n)
        acc = int(np.sum(np.where(e == 1, v, 0)) - np.sum(np.where(e == 2, v, 0))) % Q
        rows[r] = acc
    return _from_u64(rows)


def get_jl_matrix_rows(seed: bytes, row_size: int, start_row: int, num_rows: int,
                       negacyclic_conjugate: bool = False,
                       polyring_size: int = RQ_DEGREE):
    """Explicit JL rows as Zq elements (cpu_get_jl_matrix_rows:110-210)."""
    entries_per_hash = 64 * 4
    hashes_per_row = -(-row_size // entries_per_hash)
    out = np.zeros((num_rows, row_size), dtype=np.uint64)
    for r in range(num_rows):
        e = _jl_entries(seed, start_row + r, hashes_per_row, row_size)
        if negacyclic_conjugate:
            d = polyring_size
            row = np.zeros(row_size, dtype=np.uint64)
            for col in range(row_size):
                which, coeff = divmod(col, d)
                conj_idx = which * d + (0 if coeff == 0 else d - coeff)
                v2 = e[col] if coeff == 0 else (e[col] ^ 0x3) & 0x3
                row[conj_idx] = {0: 0, 1: 1, 2: Q - 1, 3: 0}[int(v2)]
            out[r] = row
        else:
            out[r] = np.where(e == 1, np.uint64(1),
                              np.where(e == 2, np.uint64(Q - 1), np.uint64(0)))
    return _from_u64(out)


# -- norms (F16) --------------------------------------------------------------------

class NormType:
    L2 = "L2"
    LInfinity = "LInfinity"


def _abs_centered(v: np.ndarray) -> np.ndarray:
    q = np.uint64(Q)
    return np.where(v > q // np.uint64(2), q - v, v)


def check_norm_bound(x, norm: str, bound: int) -> bool:
    """cpu_check_norm_bound: inputs must be < sqrt(q) in centered form; L2
    compares sum of squares (128-bit exact) against bound^2."""
    v = _abs_centered(_to_u64(x))
    sqrt_q = int(math.isqrt(Q))
    if np.any(v >= sqrt_q):
        raise ValueError("input value >= sqrt(q)")
    if norm == NormType.L2:
        total = int(np.sum((v.astype(object)) ** 2))
        return total < bound * bound
    if norm == NormType.LInfinity:
        return int(v.max()) < bound
    raise ValueError(norm)


def check_norm_relative(a, b, norm: str, scale: int) -> bool:
    """cpu_norm.cpp check_norm_relative: norm(a) < scale * norm(b)."""
    va = _abs_centered(_to_u64(a))
    vb = _abs_centered(_to_u64(b))
    sqrt_q = int(math.isqrt(Q))
    if np.any(va >= sqrt_q) or np.any(vb >= sqrt_q):
        raise ValueError("input value >= sqrt(q)")
    if norm == NormType.L2:
        na = int(np.sum(va.astype(object) ** 2))
        nb = int(np.sum(vb.astype(object) ** 2))
        return na < scale * scale * nb
    if norm == NormType.LInfinity:
        return int(va.max()) < scale * int(vb.max())
    raise ValueError(norm)


# -- random sampling (F17) ------------------------------------------------------------

RANDOM_SAMPLING_FAST_MODE_NUMBER_OF_TASKS = 256  # vec_ops_backend.h:507


def _reduce_from_bytes8(b: bytes) -> int:
    """ModArith::reduce_from_bytes (:499-506): repeated subtract while q < v.
    NOTE the reference loop leaves v == q unreduced; mirror exactly."""
    v = int.from_bytes(b[:8], "little")
    while Q < v:
        v -= Q
    return v


def random_sampling(size: int, fast_mode: bool, seed: bytes,
                    batch_size: int = 1):
    """Seeded uniform Zq sampling, byte-identical to cpu_random_sampling."""
    out = np.zeros((batch_size, size), dtype=np.uint64)
    if fast_mode:
        spt = -(-size // RANDOM_SAMPLING_FAST_MODE_NUMBER_OF_TASKS)
        total_tasks = -(-size // spt)
        zq = get_zq()
        for b in range(batch_size):
            seeds = []
            for t in range(min(total_tasks, RANDOM_SAMPLING_FAST_MODE_NUMBER_OF_TASKS)):
                digest = keccak_py.keccak_512(
                    seed + np.uint32(b).tobytes() + np.uint64(t).tobytes())
                seeds.append(_reduce_from_bytes8(digest))
            for t, s in enumerate(seeds):
                prev = s
                out[b, t * spt] = prev
                for i in range(1, spt):
                    idx = t * spt + i
                    if idx >= size:
                        break
                    prev = prev * prev % Q
                    out[b, idx] = prev
    else:
        elements_per_hash = 64 // 8  # keccak512 bytes / element bytes
        hashes_per_batch = max(-(-size // elements_per_hash), 1)
        for b in range(batch_size):
            for counter in range(hashes_per_batch):
                digest = keccak_py.keccak_512(
                    seed + np.uint32(b).tobytes() + np.uint64(counter).tobytes())
                for i in range(elements_per_hash):
                    idx = counter * elements_per_hash + i
                    if idx >= size:
                        break
                    out[b, idx] = _reduce_from_bytes8(digest[i * 8:(i + 1) * 8])
    res = _from_u64(out)
    return res[0] if batch_size == 1 else res


# -- operator norm (F19) + challenge space sampling (F17b) ----------------------------

_FP_SCALE = 1000000


def _fp_reduce(num: int, denom: int) -> int:
    if num >= 0:
        return (num + denom // 2) // denom
    return -((-num + denom // 2) // denom)


def _fp_mul(a: int, b: int) -> int:
    return _fp_reduce(a * b, _FP_SCALE)


def _cmul(a, b):
    return (_fp_mul(a[0], b[0]) - _fp_mul(a[1], b[1]),
            _fp_mul(a[0], b[1]) + _fp_mul(a[1], b[0]))


_TWIST = None
_WLEN = [(-1000000, 0), (0, 1000000), (707106, 707106),
         (923879, 382683), (980785, 195090), (995184, 98017)]


def _twist_table():
    global _TWIST
    if _TWIST is None:
        tw = []
        for i in range(64):
            ang = math.pi * i / 64
            tw.append((int(math.cos(ang) * _FP_SCALE), int(math.sin(ang) * _FP_SCALE)))
        _TWIST = tw
    return _TWIST


def operator_norm(poly_int64: list[int]) -> int:
    """Fixed-point FFT operator norm (operator_norm.h:160-178), bit-exact
    integer arithmetic mirroring the int32 FixedPoint ops."""
    tw = _twist_table()
    a = [_cmul((int(c) * _FP_SCALE, 0), tw[i]) for i, c in enumerate(poly_int64)]
    n = 64
    # bit-reverse permute
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j ^= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    llen, stage = 2, 0
    while llen <= n:
        wlen = _WLEN[stage]
        for i in range(0, n, llen):
            w = (_FP_SCALE, 0)
            for jj in range(llen // 2):
                u = a[i + jj]
                v = _cmul(a[i + jj + llen // 2], w)
                a[i + jj] = (u[0] + v[0], u[1] + v[1])
                a[i + jj + llen // 2] = (u[0] - v[0], u[1] - v[1])
                w = _cmul(w, wlen)
        llen <<= 1
        stage += 1
    max_norm = 0.0
    for re, im in a:
        fre, fim = np.float32(re / _FP_SCALE), np.float32(im / _FP_SCALE)
        val = math.sqrt(float(np.float32(fre * fre + fim * fim)))
        max_norm = max(max_norm, val)
    max_norm += 0.000001
    return math.ceil(max_norm)


class _BitIter:
    """Mirror of RandomBitIterator (cpu_random_sampling.cpp:137-177)."""

    def __init__(self, digest: bytes):
        self.words = [int.from_bytes(digest[i * 8:(i + 1) * 8], "little")
                      for i in range(8)]
        self.limb = 0
        self.bit = 0
        self.lfsr = self.words[7]

    def next_bit(self) -> int:
        if self.limb < 8:
            b = (self.words[self.limb] >> self.bit) & 1
        else:
            b = (self.lfsr >> self.bit) & 1
        self.bit += 1
        if self.bit == 64:
            self.bit = 0
            self.limb += 1
            if self.limb >= 8:
                lsb = self.lfsr & 1
                self.lfsr >>= 1
                if lsb:
                    self.lfsr ^= 0xD800000000000000
        return b


def _merge_shuffle(arr: list[int], size_a: int, size_b: int, index_bits: int,
                   it: _BitIter):
    """arxiv 1508.03167 merge shuffle (cpu_random_sampling.cpp:181-210)."""
    i, j, n = 0, size_a, size_a + size_b
    while True:
        if not it.next_bit():
            if j == n:
                break
            arr[i], arr[j] = arr[j], arr[i]
            j += 1
        else:
            if i == j:
                break
        i += 1
    while i < n:
        while True:
            m = 0
            for b in range(index_bits):
                m |= it.next_bit()
                if b < index_bits - 1:
                    m <<= 1
            if m <= i:
                break
        arr[i], arr[m] = arr[m], arr[i]
        i += 1


def challenge_space_polynomials(seed: bytes, size: int, ones: int, twos: int,
                                norm_bound: int = 0):
    """Sample `size` Rq challenge polynomials with `ones` +-1 and `twos` +-2
    coefficients, optional operator-norm rejection (cpu_random_sampling.cpp:
    212-304). Returns (size, 64, 2) tensor."""
    assert ones + twos <= RQ_DEGREE
    out = np.zeros((size, RQ_DEGREE), dtype=np.uint64)
    for poly_idx in range(size):
        retry = 0
        while True:
            digest = keccak_py.keccak_512(
                seed + np.uint64(poly_idx).tobytes() + np.uint32(retry).tobytes())
            it = _BitIter(digest)
            vals = [0] * RQ_DEGREE
            for l in range(ones):
                vals[l] = 1 if it.next_bit() else Q - 1
            for m in range(ones, ones + twos):
                vals[m] = 2 if it.next_bit() else Q - 2
            _merge_shuffle(vals, ones, twos,
                           math.ceil(math.log2(ones + twos)) if ones + twos > 0 else 0, it)
            _merge_shuffle(vals, ones + twos, RQ_DEGREE - ones - twos,
                           math.ceil(math.log2(RQ_DEGREE)), it)
            if not norm_bound:
                break
            balanced = [v if v <= 2 else v - Q for v in vals]
            retry += 1
            if operator_norm(balanced) <= norm_bound:
                break
        out[poly_idx] = np.array(vals, dtype=np.uint64)
    return _from_u64(out)

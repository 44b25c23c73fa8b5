"""Signed radix-2^12 Montgomery arithmetic for Pallas EC kernels.

Reference op: device modular multiplication (icicle/include/icicle/math/
modular_arithmetic.h mult + Montgomery reduce). TPU redesign rationale:

The 16-bit comba/CIOS core (math/bigint.py) spends ~5 vector ops per partial
product (mul, mask, shift, 2 adds) because 16x16 products must be split to
keep u32 column sums exact. Radix 2^12 with SIGNED i32 words removes the
splits entirely:

  - 22 words of 12 bits cover 264 bits; partial products are < 2^26, and a
    column accumulates at most 44 of them (22 operand products + 22 REDC
    injections) -> |column| < 2^31.5 ... kept under 2^31 by the ONE-LAZY
    rule below, so raw i32 accumulation is exact with NO masking.
  - REDC is product-scanning over the same columns (R' = 2^264): each of
    the 22 steps resolves one column, derives m_i = -t_i/p mod 2^12, and
    injects m_i * p into the higher columns. No per-word carry ripple.
  - No canonical conditional subtract anywhere: values live in (-2p, 2p)
    (signed), subtraction is PLAIN wordwise sub, negation is wordwise.

Bounds contract (checked by tests/test_radix12.py):
  * "normalized" value: words w_k in [0, 2^12) except the top word, which is
    a small signed word (value in (-2p, 2p)); produced by mul_mont and norm().
  * lazy add/sub outputs have |w_k| <= 2^13; mul_mont accepts at most ONE
    lazy operand (44 * 2^13 * 2^12 < 2^31); two lazy operands must pass
    through norm() first.
  * mul_mont output value is in (-p, 2p) whenever |a|,|b| < 32p.

The Montgomery domain here is R' = 2^264 (NOT the 2^(32L) domain of
math/bigint.py); converting between domains costs one 2^256-domain montmul
by 2^(264-256+256) etc. — see mont_shift constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

_I = jnp.int32
RADIX = 12
MASK = (1 << RADIX) - 1


@functools.lru_cache(maxsize=None)
def make_engine(modulus: int, nbits: int | None = None):
    return Radix12(modulus)


def int_to_words(v: int, nw: int) -> list[int]:
    return [(v >> (RADIX * k)) & MASK for k in range(nw)]


class Radix12:
    """Field engine over lists of per-word i32 arrays (struct-of-words)."""

    def __init__(self, p: int):
        self.p = p
        self.nw = -(-(p.bit_length() + 2) // RADIX)  # headroom for 4p
        self.rbits = RADIX * self.nw
        self.R = 1 << self.rbits
        assert self.R > 4 * p, "need R' > 4p for the (-2p, 2p) window"
        self.inv12 = np.int32((-pow(p, -1, 1 << RADIX)) % (1 << RADIX))
        self.p12 = [np.int32(w) for w in int_to_words(p, self.nw)]
        # even fully carry-normalized operands overflow i32 columns once
        # nw * 2^(2*RADIX+1) reaches 2^31 (e.g. bw6_761's 761-bit modulus):
        # such fields must use the 16-bit split-product engine instead.
        self.audit_mul((1 << RADIX) - 1, (1 << RADIX) - 1)
        self.p2_12 = [np.int32(w) for w in int_to_words(2 * p, self.nw)]
        # montgomery constants in the 2^rbits domain
        self.one_mont = int_to_words(self.R % p, self.nw)

    # -- conversions --------------------------------------------------------
    def from_u32(self, limbs32):
        """list of L u32 (...,)-arrays (little-endian 32-bit limbs) ->
        nw signed words. Input must be < 2^(12*nw)."""
        nl = len(limbs32)
        out = []
        for k in range(self.nw):
            lo_bit = RADIX * k
            i = lo_bit // 32
            off = lo_bit % 32
            if i >= nl:
                out.append(jnp.zeros_like(limbs32[0]).astype(_I))
                continue
            w = limbs32[i] >> off
            if off > 32 - RADIX and i + 1 < nl:
                w = w | (limbs32[i + 1] << (32 - off))
            out.append((w & jnp.uint32(MASK)).astype(_I))
        return out

    def to_u32(self, words, nl: int):
        """CANONICAL nonneg words (each in [0, 2^12)) -> nl u32 limbs.

        Pure bit-field repacking (every bit belongs to exactly one word), so
        shifted ORs are exact — no carries. Words above bit 32*nl must be 0.
        """
        limbs = []
        for i in range(nl):
            lo = 32 * i
            acc = jnp.zeros_like(words[0], dtype=jnp.uint32)
            for k in range(self.nw):
                wb = RADIX * k
                if wb + RADIX <= lo or wb >= lo + 32:
                    continue
                w = words[k].astype(jnp.uint32)
                part = (w << (wb - lo)) if wb >= lo else (w >> (lo - wb))
                acc = acc | (part & jnp.uint32(0xFFFFFFFF))
            limbs.append(acc)
        return limbs

    # -- ring ops ------------------------------------------------------------
    def add(self, a, b):
        return [x + y for x, y in zip(a, b)]

    def sub(self, a, b):
        return [x - y for x, y in zip(a, b)]

    def neg(self, a):
        return [-x for x in a]

    def norm(self, a):
        """Carry-normalize: words -> [0, 2^12) with small signed top word."""
        out = []
        carry = jnp.zeros_like(a[0])
        for k in range(self.nw - 1):
            v = a[k] + carry
            out.append(v & MASK)
            carry = v >> RADIX        # arithmetic shift: floor division
        out.append(a[self.nw - 1] + carry)
        return out

    def canon_nonneg(self, a):
        """Normalized signed value in (-2p, 2p) -> nonneg words, value
        in [0, 4p). One masked add of 2p; output words <= 2^13 (lazy-1)."""
        a = self.norm(a)
        negm = a[self.nw - 1] >> 31   # all-ones if value negative
        return [x + (jnp.broadcast_to(t, x.shape) & negm)
                for x, t in zip(a, [jnp.int32(v) for v in self.p2_12])]

    def audit_mul(self, abound: int, bbound: int):
        """Worst-case exact-int simulation of mul_mont's i32 columns for
        per-word abs bounds (abound, bbound). Raises at TRACE time if any
        intermediate could overflow int32 — an unsafe schedule cannot
        compile. Top-word bounds include the (-2p,2p) signed window."""
        nw = self.nw
        top = max((2 * self.p) >> (RADIX * (nw - 1)), 1)
        amax = [abound] * (nw - 1) + [max(abound, 2 * top)]
        bmax = [bbound] * (nw - 1) + [max(bbound, 2 * top)]
        cols = [0] * (2 * nw - 1)
        for i in range(nw):
            for j in range(nw):
                cols[i + j] += amax[i] * bmax[j]
        carry = 0
        pmax = [int(w) for w in self.p12]
        for i in range(nw):
            v = cols[i] + carry
            if v >= (1 << 31):
                raise OverflowError(
                    f"radix12 montmul col {i} can reach {v:.3e} >= 2^31 "
                    f"for bounds ({abound}, {bbound})")
            for j in range(1, nw):
                cols[i + j] += MASK * pmax[j]
            carry = (v + MASK * pmax[0]) >> RADIX
        for k in range(nw, 2 * nw - 1):
            v = cols[k] + carry
            if v >= (1 << 31):
                raise OverflowError(
                    f"radix12 montmul tail col {k} can reach {v:.3e}")
            carry = v >> RADIX

    def mul_mont(self, a, b):
        """Montgomery product a*b*R'^-1 with fused product-scanning REDC.

        At most one operand lazy (|words| <= 2^13), the other normalized.
        Output: normalized, value in (-p, 2p)."""
        nw = self.nw
        ncols = 2 * nw - 1
        zero = jnp.zeros(jnp.broadcast_shapes(a[0].shape, b[0].shape),
                         dtype=_I)
        cols = [zero] * ncols
        for i in range(nw):
            for j in range(nw):
                cols[i + j] = cols[i + j] + a[i] * b[j]
        carry = zero
        for i in range(nw):
            v = cols[i] + carry
            m = (v * self.inv12) & MASK
            carry = (v + m * self.p12[0]) >> RADIX
            for j in range(1, nw):
                cols[i + j] = cols[i + j] + m * self.p12[j]
        out = []
        for k in range(nw, ncols):
            v = cols[k] + carry
            out.append(v & MASK)
            carry = v >> RADIX
        out.append(carry)
        return out

    def mul_small(self, x, k: int):
        """k*x for a small python int k via word-wise multiply (|k*w| must
        stay < 2^31; |k| <= 2^17 with normalized x). Output lazy-ish: words
        <= k*2^12 — normalize before use as a mul operand."""
        assert k != 0
        return [w * np.int32(k) for w in x]

    # -- host-side helpers (tests / constants) -------------------------------
    def words_to_int(self, words) -> int:
        """Numpy host read-back of one element (signed words)."""
        v = 0
        for k, w in enumerate(words):
            v += int(np.asarray(w).reshape(-1)[0]) << (RADIX * k)
        return v

"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic on uint32 limb pairs.

The reference gives goldilocks a dedicated no-slack-bit implementation
(include/icicle/fields/stark_fields/goldilocks.h:13-22). Here elements are
uint32 tensors shaped ``(..., 2)`` = [lo, hi] and reduction exploits
2^64 === eps (mod p) and 2^96 === -1 (mod p), with eps = 2^32 - 1.

No Montgomery domain: the special form makes direct reduction cheaper.
Canonical representatives in [0, p) at all API boundaries.
"""

from __future__ import annotations

import jax.numpy as jnp

from icicle_tpu.math.params import FieldParams
from icicle_tpu.math.u32 import U32, mulhilo

P_LO = jnp.uint32(0x00000001)
P_HI = jnp.uint32(0xFFFFFFFF)
EPS = jnp.uint32(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p

GOLDILOCKS_P = (1 << 64) - (1 << 32) + 1


def _add64(alo, ahi, blo, bhi):
    """(lo, hi, carry) of 64-bit a+b."""
    lo = alo + blo
    c0 = (lo < alo).astype(U32)
    hi = ahi + bhi
    c1 = (hi < ahi).astype(U32)
    hi2 = hi + c0
    c1 = c1 + (hi2 < hi).astype(U32)
    return lo, hi2, c1


def _sub64(alo, ahi, blo, bhi):
    """(lo, hi, borrow) of 64-bit a-b."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    hi = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi2 = hi - b0
    b1 = b1 + (hi < b0).astype(U32)
    return lo, hi2, b1


def _geq_p(lo, hi):
    return (hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))


def _canon(lo, hi):
    """Reduce a value < 2^64 into [0, p) (single conditional subtract)."""
    dlo, dhi, _ = _sub64(lo, hi, P_LO, P_HI)
    ge = _geq_p(lo, hi)
    return jnp.where(ge, dlo, lo).astype(U32), jnp.where(ge, dhi, hi).astype(U32)


def _mul64(alo, ahi, blo, bhi):
    """Full 128-bit product of two 64-bit values as four u32 words n0..n3."""
    h00, l00 = mulhilo(alo, blo)
    h01, l01 = mulhilo(alo, bhi)
    h10, l10 = mulhilo(ahi, blo)
    h11, l11 = mulhilo(ahi, bhi)
    n0 = l00
    # n1 = h00 + l01 + l10 (with carries into n2)
    s1 = h00 + l01
    c1 = (s1 < h00).astype(U32)
    n1 = s1 + l10
    c1 = c1 + (n1 < s1).astype(U32)
    # n2 = h01 + h10 + l11 + c1 (carries into n3)
    s2 = h01 + h10
    c2 = (s2 < h01).astype(U32)
    s2b = s2 + l11
    c2 = c2 + (s2b < s2).astype(U32)
    n2 = s2b + c1
    c2 = c2 + (n2 < s2b).astype(U32)
    n3 = h11 + c2
    return n0, n1, n2, n3


def _reduce128(n0, n1, n2, n3):
    """Reduce n3*2^96 + n2*2^64 + (n1,n0) into [0, p).

    Uses 2^64 === eps and 2^96 === -1 (mod p) — the same identity family the
    reference's goldilocks host math applies.
    """
    # t = n_lo - n3  (borrow compensates with -eps, which cannot re-underflow)
    tlo, thi, borrow = _sub64(n0, n1, n3, jnp.zeros_like(n3))
    blo, bhi, _ = _sub64(tlo, thi, EPS, jnp.zeros_like(thi))
    tlo = jnp.where(borrow > 0, blo, tlo).astype(U32)
    thi = jnp.where(borrow > 0, bhi, thi).astype(U32)
    # t += n2 * eps  (= (n2 << 32) - n2, always < 2^64)
    elo = jnp.zeros_like(n2) - n2          # low word of n2*eps
    ehi = n2 - (n2 != 0).astype(U32)       # high word of n2*eps
    rlo, rhi, carry = _add64(tlo, thi, elo, ehi)
    # overflow of 2^64 === eps: add eps once (cannot overflow again)
    alo, ahi, _ = _add64(rlo, rhi, EPS, jnp.zeros_like(rhi))
    rlo = jnp.where(carry > 0, alo, rlo).astype(U32)
    rhi = jnp.where(carry > 0, ahi, rhi).astype(U32)
    return _canon(rlo, rhi)


class Goldilocks:
    """Vectorized goldilocks arithmetic; same interface as Mont32/BigField."""

    def __init__(self, params: FieldParams):
        assert params.modulus == GOLDILOCKS_P
        self.params = params
        self.p_int = GOLDILOCKS_P

    def add(self, a, b):
        alo, ahi, blo, bhi = a[..., 0], a[..., 1], b[..., 0], b[..., 1]
        lo, hi, carry = _add64(alo, ahi, blo, bhi)
        # carry means +2^64 === +eps
        clo, chi, _ = _add64(lo, hi, EPS, jnp.zeros_like(hi))
        lo = jnp.where(carry > 0, clo, lo).astype(U32)
        hi = jnp.where(carry > 0, chi, hi).astype(U32)
        lo, hi = _canon(lo, hi)
        return jnp.stack([lo, hi], axis=-1)

    def sub(self, a, b):
        alo, ahi, blo, bhi = a[..., 0], a[..., 1], b[..., 0], b[..., 1]
        lo, hi, borrow = _sub64(alo, ahi, blo, bhi)
        plo, phi, _ = _add64(lo, hi, P_LO, P_HI)
        lo = jnp.where(borrow > 0, plo, lo).astype(U32)
        hi = jnp.where(borrow > 0, phi, hi).astype(U32)
        return jnp.stack([lo, hi], axis=-1)

    def neg(self, a):
        zero = jnp.zeros_like(a)
        return self.sub(zero, a)

    def mul(self, a, b):
        n0, n1, n2, n3 = _mul64(a[..., 0], a[..., 1], b[..., 0], b[..., 1])
        lo, hi = _reduce128(n0, n1, n2, n3)
        out = jnp.stack([lo, hi], axis=-1)
        # XLA:CPU's fusion passes are pathologically superlinear on chained
        # 64-bit-emulation DAGs (a 4-mul chain compiles in ~90 s on a 1-core
        # host). Fencing each multiply keeps fusions small; compile drops to
        # seconds. TPU keeps full fusion.
        import jax
        if jax.default_backend() == "cpu":
            out = jax.lax.optimization_barrier(out)
        return out

    # Montgomery-free field: mul_mont === mul and domain conversions are no-ops,
    # so composite kernels can treat all single-limb-like fields uniformly.
    mul_mont = mul

    def to_mont(self, a):
        return a

    def from_mont(self, a):
        return a

    def sqr(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        return (a[..., 0] == 0) & (a[..., 1] == 0)

    def eq(self, a, b):
        return (a[..., 0] == b[..., 0]) & (a[..., 1] == b[..., 1])

    def const(self, value: int, like=None):
        v = value % self.p_int
        arr = jnp.array([v & 0xFFFFFFFF, v >> 32], dtype=jnp.uint32)
        if like is not None:
            arr = jnp.broadcast_to(arr, like.shape[:-1] + (2,))
        return arr

    def pow_const(self, a, e: int):
        """a^e via square-and-multiply as a lax.scan over exponent bits: the
        mul body is traced once, keeping the XLA graph tiny regardless of e
        (an unrolled 64-bit chain makes single-core LLVM compiles pathological).
        """
        import jax
        if e == 0:
            return self.const(1, like=a)
        one = jnp.broadcast_to(self.const(1, like=a), a.shape)
        bits = jnp.array([(e >> i) & 1 for i in reversed(range(e.bit_length()))],
                         dtype=jnp.uint32)

        def body(res, bit):
            res = self.mul(res, res)
            res_mul = self.mul(res, a)
            res = jnp.where(bit.astype(bool), res_mul, res)
            return res, None

        out, _ = jax.lax.scan(body, one, bits)
        return out

    def inv(self, a):
        return self.pow_const(a, self.p_int - 2)

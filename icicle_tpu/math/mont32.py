"""Single-word (p < 2^31) Montgomery field arithmetic on uint32 lanes.

Serves babybear, koalabear and m31 (the reference's one-limb STARK fields,
include/icicle/fields/stark_fields/{babybear,koalabear,m31}.h). Elements live in
flat uint32 arrays, one lane per element — the dense VPU-friendly layout.

Montgomery domain uses R = 2^32. Two calling conventions:
  * `mul(a, b)`       — canonical in/out (two REDC passes).
  * `mul_mont(a, b)`  — a*b*R^-1; use with one operand pre-multiplied by R
                        (e.g. twiddles/round constants stored in Montgomery form)
                        for canonical-in/canonical-out at one REDC per multiply.
"""

from __future__ import annotations

import jax.numpy as jnp

from icicle_tpu.math.params import FieldParams
from icicle_tpu.math.u32 import U32, mulhilo, mullo


class Mont32:
    """Vectorized modular arithmetic for a fixed single-limb prime field."""

    def __init__(self, params: FieldParams):
        assert params.bits <= 31, "Mont32 requires p < 2^31 so a+b fits in uint32"
        self.params = params
        self.p = jnp.uint32(params.modulus)
        self.p_int = params.modulus
        self.pinv = jnp.uint32(params.inv32)  # -p^-1 mod 2^32
        self.r = jnp.uint32(params.r)         # R mod p  (= 1 in Montgomery form)
        self.r2 = jnp.uint32(params.r2)       # R^2 mod p

    # -- ring ops (canonical representatives in [0, p)) ---------------------
    def add(self, a, b):
        s = a + b
        return jnp.where(s >= self.p, s - self.p, s).astype(U32)

    def sub(self, a, b):
        d = a - b
        return jnp.where(a < b, d + self.p, d).astype(U32)

    def neg(self, a):
        return jnp.where(a == 0, a, self.p - a).astype(U32)

    def redc(self, hi, lo):
        """Montgomery reduction of a 64-bit value (hi*2^32+lo) < p*2^32 -> [0,p)."""
        m = mullo(lo, self.pinv)
        mp_hi, _ = mulhilo(m, self.p)
        # lo + (m*p).lo == 0 mod 2^32 by construction; carry out iff lo != 0.
        t = hi + mp_hi + (lo != 0).astype(U32)
        return jnp.where(t >= self.p, t - self.p, t).astype(U32)

    def mul_mont(self, a, b):
        hi, lo = mulhilo(a, b)
        return self.redc(hi, lo)

    def mul(self, a, b):
        return self.mul_mont(self.mul_mont(a, b), self.r2)

    def to_mont(self, a):
        return self.mul_mont(a, self.r2)

    def from_mont(self, a):
        return self.redc(jnp.zeros_like(a), a)

    def sqr(self, a):
        return self.mul(a, a)

    def pow_const(self, a, e: int):
        """a^e for a fixed Python-int exponent (square-and-multiply, unrolled)."""
        result = None
        base = self.to_mont(a)
        acc = base
        e_bits = []
        while e:
            e_bits.append(e & 1)
            e >>= 1
        for i, bit in enumerate(e_bits):
            if bit:
                result = acc if result is None else self.mul_mont(result, acc)
            if i + 1 < len(e_bits):
                acc = self.mul_mont(acc, acc)
        if result is None:
            return jnp.full_like(a, 1)
        return self.from_mont(result)

    def inv(self, a):
        """Fermat inverse a^(p-2); inv(0) = 0 (matching reference semantics of
        zero staying zero in batched inversions)."""
        return self.pow_const(a, self.p_int - 2)

    def eq(self, a, b):
        return a == b

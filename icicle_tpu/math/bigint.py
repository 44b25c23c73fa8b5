"""Generic multi-limb modular arithmetic on uint32 tensors.

TPU-native replacement for the reference's host/device big-int layer
(include/icicle/math/{host_math.h,modular_arithmetic.h}): elements are uint32
tensors with a trailing limb axis ``(..., L)`` (little-endian), multiplication is
a comba-style schoolbook product over 16-bit half-limbs (TPU has exact
16x16->32 integer multiplies but no widening 32x32), and reduction is Montgomery
REDC with 16-bit words.

Hot-path convention mirrors :mod:`icicle_tpu.math.mont32`: `mul_mont` computes
a*b*R^-1 (R = 2^(32 L)); constants stored in Montgomery form make each data
multiply cost exactly one REDC.

Internally all routines work on *lists of per-limb arrays* (struct-of-arrays) —
static Python unrolling that XLA fuses into straight-line VPU code, with no
dynamic indexing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from icicle_tpu.math.params import FieldParams
from icicle_tpu.math.u32 import U32, MASK16

_U = jnp.uint32

#: montmul lowering: "auto" | "unrolled" | "loop" (see BigField.mul_mont)
MUL_MODE = "auto"


import contextlib


@contextlib.contextmanager
def mul_mode(mode: str):
    """Trace-time override of the montmul lowering.

    Use "unrolled" around code regions that sit INSIDE a lax.scan body and run
    on TPU: device-loop iterations cost ~270us each there, so a scan body must
    be one big straight-line block, not nested micro-loops. Keep the override
    scoped — unrolling everything makes graphs uncompilable.
    """
    global MUL_MODE
    old = MUL_MODE
    MUL_MODE = mode
    try:
        yield
    finally:
        MUL_MODE = old


def unstack(x):
    """(..., L) array -> list of L (...,) arrays."""
    return [x[..., i] for i in range(x.shape[-1])]


def stack(limbs):
    return jnp.stack(limbs, axis=-1)


def _split16(limbs32):
    """list of L u32 limbs -> list of 2L half-limbs (values <= 0xffff)."""
    out = []
    for x in limbs32:
        out.append(x & MASK16)
        out.append(x >> 16)
    return out


def _join32(limbs16):
    return [(limbs16[2 * i] | (limbs16[2 * i + 1] << 16)).astype(_U)
            for i in range(len(limbs16) // 2)]


def _add_limbs(a, b):
    """Limbwise a+b with carry chain; returns (sum_limbs, carry_out)."""
    out = []
    carry = None
    for x, y in zip(a, b):
        s = x + y
        c = (s < x).astype(_U)
        if carry is not None:
            s2 = s + carry
            c = c + (s2 < s).astype(_U)
            s = s2
        out.append(s.astype(_U))
        carry = c
    return out, carry


def _sub_limbs(a, b):
    """Limbwise a-b with borrow chain; returns (diff_limbs, borrow_out)."""
    out = []
    borrow = None
    for x, y in zip(a, b):
        d = x - y
        br = (x < y).astype(_U)
        if borrow is not None:
            d2 = d - borrow
            br = br + (d < borrow).astype(_U)
            d = d2
        out.append(d.astype(_U))
        borrow = br
    return out, borrow


def _select(cond, a, b):
    """Per-limb select: cond ? a : b (cond broadcastable bool)."""
    return [jnp.where(cond, x, y).astype(_U) for x, y in zip(a, b)]


class BigField:
    """Vectorized Montgomery arithmetic for a fixed multi-limb prime field."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.p_int = params.modulus
        self.nlimbs = params.nlimbs
        self.nh = params.nhalf  # number of 16-bit half-limbs
        self.p32 = [np.uint32(v) for v in params.p_limbs32()]
        self.p16 = [np.uint32(v) for v in params.p_limbs16()]
        self.inv16 = np.uint32(params.inv16)
        self.r2_np = params.const_limbs32(params.r2)
        self.one_np = params.const_limbs32(1)
        self.r_np = params.const_limbs32(params.r)

    # -- constants -----------------------------------------------------------
    def const(self, value: int, like=None):
        """Broadcast a Python int to a stacked (..., L) constant array."""
        arr = jnp.asarray(self.params.const_limbs32(value))
        if like is not None:
            arr = jnp.broadcast_to(arr, like.shape[:-1] + (self.nlimbs,))
        return arr

    # -- add/sub on stacked arrays -------------------------------------------
    def add(self, a, b):
        al, bl = unstack(a), unstack(b)
        s, carry = _add_limbs(al, bl)
        d, borrow = _sub_limbs(s, [jnp.broadcast_to(x, s[0].shape) for x in self.p32])
        use_d = (carry > 0) | (borrow == 0)
        return stack(_select(use_d, d, s))

    def sub(self, a, b):
        al, bl = unstack(a), unstack(b)
        d, borrow = _sub_limbs(al, bl)
        dp, _ = _add_limbs(d, [jnp.broadcast_to(x, d[0].shape) for x in self.p32])
        return stack(_select(borrow > 0, dp, d))

    def neg(self, a):
        return self.sub(self.const(0, like=a), a)

    def is_zero(self, a):
        al = unstack(a)
        z = al[0] == 0
        for x in al[1:]:
            z = z & (x == 0)
        return z

    def eq(self, a, b):
        al, bl = unstack(a), unstack(b)
        e = al[0] == bl[0]
        for x, y in zip(al[1:], bl[1:]):
            e = e & (x == y)
        return e

    # -- multiplication core --------------------------------------------------
    def _comba16(self, a16, b16):
        """Full product of two nh-half-limb values as 2*nh half-limbs.

        Column sums accumulate split (lo, hi) 16-bit parts of each partial
        product in uint32 (safe for nh <= 2^16 terms), then one carry pass.
        """
        nh = self.nh
        ncols = 2 * nh - 1
        shape = jnp.broadcast_shapes(a16[0].shape, b16[0].shape)
        zero = jnp.zeros(shape, dtype=_U)
        cols_lo = [zero] * ncols
        cols_hi = [zero] * ncols
        for i in range(nh):
            for j in range(nh):
                prod = a16[i] * b16[j]
                k = i + j
                cols_lo[k] = cols_lo[k] + (prod & MASK16)
                cols_hi[k] = cols_hi[k] + (prod >> 16)
        t = []
        carry = zero
        for k in range(ncols):
            v = cols_lo[k] + carry
            if k > 0:
                v = v + cols_hi[k - 1]
            t.append(v & MASK16)
            carry = v >> 16
        t.append((cols_hi[ncols - 1] + carry) & MASK16)
        return t  # 2*nh half-limbs

    def _redc16(self, t):
        """Montgomery reduction of a 2*nh-half-limb value t < p*R -> [0, p).

        Word-by-word CIOS with 16-bit words. Carries past position i+nh are
        NOT rippled to the top each iteration (that is O(nh^2) extra ops);
        a single deferred wide word W rides at position i+nh+1 and is
        absorbed by the next iteration's tail (W <= 2 throughout, so every
        32-bit intermediate stays exact).
        """
        nh = self.nh
        t = list(t)
        assert len(t) == 2 * nh
        W = jnp.zeros_like(t[0])    # wide word at position i+nh+1
        for i in range(nh):
            m = (t[i] * self.inv16) & MASK16
            c = None
            for j in range(nh):
                v = t[i + j] + m * self.p16[j]
                if c is not None:
                    v = v + c
                if j > 0:
                    t[i + j] = v & MASK16
                c = v >> 16
            v = (t[i + nh] + c + W) if i > 0 else (t[i + nh] + c)
            t[i + nh] = v & MASK16
            W = v >> 16
        res16 = t[nh:]
        res32 = _join32(res16)
        d, borrow = _sub_limbs(res32, [jnp.broadcast_to(x, res32[0].shape) for x in self.p32])
        use_d = (W > 0) | (borrow == 0)
        return _select(use_d, d, res32)

    def _mont_fused16(self, a16, b16):
        """Fused comba product + product-scanning Montgomery REDC.

        Same result as ``_redc16(_comba16(a, b))`` but ~17% fewer primitives:
        the full product's (lo, hi) column sums are consumed by REDC directly
        (no intermediate carry-normalization pass), and the reduction injects
        ``m_i * p`` into the columns instead of rippling a per-word carry
        chain.  Exactness: every column holds <= 2*nh 16-bit terms
        (< 2^21) plus a < 2^17 carry, so all u32 intermediates are exact.
        """
        nh = self.nh
        shape = jnp.broadcast_shapes(a16[0].shape, b16[0].shape)
        zero = jnp.zeros(shape, dtype=_U)
        ncols = 2 * nh - 1
        cols_lo = [zero] * ncols
        cols_hi = [zero] * ncols
        for i in range(nh):
            for j in range(nh):
                prod = a16[i] * b16[j]
                k = i + j
                cols_lo[k] = cols_lo[k] + (prod & MASK16)
                cols_hi[k] = cols_hi[k] + (prod >> 16)
        carry = zero
        for i in range(nh):
            v = cols_lo[i] + carry
            if i > 0:
                v = v + cols_hi[i - 1]
            m = (v * self.inv16) & MASK16
            prod0 = m * self.p16[0]
            v = v + (prod0 & MASK16)      # low 16 bits cancel exactly
            carry = (v >> 16) + (prod0 >> 16)
            for j in range(1, nh):
                prod = m * self.p16[j]
                k = i + j
                cols_lo[k] = cols_lo[k] + (prod & MASK16)
                cols_hi[k] = cols_hi[k] + (prod >> 16)
        t = []
        for k in range(nh, ncols):
            v = cols_lo[k] + carry + cols_hi[k - 1]
            t.append(v & MASK16)
            carry = v >> 16
        v = cols_hi[ncols - 1] + carry
        t.append(v & MASK16)
        W = v >> 16
        res32 = _join32(t)
        d, borrow = _sub_limbs(
            res32, [jnp.broadcast_to(x, res32[0].shape) for x in self.p32])
        use_d = (W > 0) | (borrow == 0)
        return _select(use_d, d, res32)

    # -- loop-based SOS Montgomery (small XLA graphs) --------------------------
    #
    # The unrolled CIOS above emits O((2L)^2) primitives per multiply — fine
    # inside a Pallas kernel body, but it makes host-side XLA graphs (EC adds,
    # protocols) explode. The jnp path below uses separated-operand-scanning:
    #   m  = (T mod R) * p' mod R          (p' = -p^-1 mod R)
    #   res = (T + m*p) / R                (low half cancels exactly)
    # i.e. three comba products written as fori_loops over the limb axis plus
    # scan-based carry passes: ~100 ops per multiply at the same O(L^2) work.

    def _pinv16_full(self):
        import numpy as np
        pinv = (-pow(self.p_int, -1, 1 << (16 * self.nh))) % (1 << (16 * self.nh))
        from icicle_tpu.math.params import limbs_of
        return np.array(limbs_of(pinv, self.nh, 16), dtype=np.uint32)

    def _columns(self, a16, b16):
        """Column sums (lo, hi 16-bit parts separately) of the schoolbook
        product of two stacked (..., nh) half-limb arrays -> (..., 2*nh)."""
        import jax
        nh = self.nh
        shape = jnp.broadcast_shapes(a16.shape, b16.shape)
        a16 = jnp.broadcast_to(a16, shape)
        b16 = jnp.broadcast_to(b16, shape)
        ncols = 2 * nh
        zeros = jnp.zeros(shape[:-1] + (ncols,), dtype=_U)

        def body(i, cc):
            lo, hi = cc
            ai = jax.lax.dynamic_index_in_dim(a16, i, axis=-1, keepdims=True)
            prod = ai * b16  # (..., nh)
            slo = jax.lax.dynamic_slice_in_dim(lo, i, nh, axis=-1) + (prod & MASK16)
            shi = jax.lax.dynamic_slice_in_dim(hi, i, nh, axis=-1) + (prod >> 16)
            lo = jax.lax.dynamic_update_slice_in_dim(lo, slo, i, axis=-1)
            hi = jax.lax.dynamic_update_slice_in_dim(hi, shi, i, axis=-1)
            return lo, hi

        return jax.lax.fori_loop(0, nh, body, (zeros, zeros))

    @staticmethod
    def _carry_pass(lo, hi):
        """Resolve split column sums into canonical 16-bit limbs + final carry.

        t[k] = lo[k] + hi[k-1] + carry, scanned along the limb axis.
        """
        import jax
        hi_shifted = jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        x = lo + hi_shifted
        xs = jnp.moveaxis(x, -1, 0)

        def step(carry, xk):
            v = xk + carry
            return v >> 16, v & MASK16

        carry, t = jax.lax.scan(step, jnp.zeros_like(xs[0]), xs)
        # top column's hi part joins the outgoing carry
        return jnp.moveaxis(t, 0, -1), carry + hi[..., -1]

    def _mul_mont_stacked(self, a16, b16):
        """SOS Montgomery multiply on stacked (..., nh) half-limb arrays."""
        import jax
        nh = self.nh
        pinv = jnp.asarray(self._pinv16_full())
        p16v = jnp.asarray(np.array(self.p16, dtype=np.uint32))

        tlo, thi = self._columns(a16, b16)
        t, t_carry = self._carry_pass(tlo, thi)  # 2nh limbs; t_carry == 0

        mlo, mhi = self._columns(t[..., :nh], jnp.broadcast_to(pinv, t[..., :nh].shape))
        m, _ = self._carry_pass(mlo, mhi)
        m = m[..., :nh]  # mod R

        mplo, mphi = self._columns(m, jnp.broadcast_to(p16v, m.shape))
        mp, mp_carry = self._carry_pass(mplo, mphi)  # 2nh limbs, carry 0

        # S = T + m*p; low nh limbs cancel to zero; keep high half + carry bit
        s = t + mp  # each limb <= 2*0xffff: resolve with one carry scan
        xs = jnp.moveaxis(s, -1, 0)

        def step(carry, xk):
            v = xk + carry
            return v >> 16, v & MASK16

        carry, s16 = jax.lax.scan(step, jnp.zeros_like(xs[0]), xs)
        res16 = jnp.moveaxis(s16, 0, -1)[..., nh:]
        ovf = carry + t_carry + mp_carry

        # conditional subtract p (result < 2p)
        res32 = _join32([res16[..., i] for i in range(nh)])
        d, borrow = _sub_limbs(res32, [jnp.broadcast_to(x, res32[0].shape) for x in self.p32])
        use_d = (ovf > 0) | (borrow == 0)
        return _select(use_d, d, res32)

    @staticmethod
    def split16_stacked(a):
        """(..., L) u32 limbs -> (..., 2L) 16-bit half-limbs (interleaved)."""
        lo = a & MASK16
        hi = a >> 16
        out = jnp.stack([lo, hi], axis=-1)
        return out.reshape(a.shape[:-1] + (2 * a.shape[-1],))

    def _mul_mont_unrolled(self, a, b):
        """Straight-line comba + CIOS REDC: O((2L)^2) primitives, fully
        fusable by XLA — the TPU hot-path form (no sequential loop overhead)."""
        a16 = _split16(unstack(a))
        b16 = _split16(unstack(b))
        t = self._comba16(a16, b16)
        return stack(self._redc16(t))

    def mul_mont(self, a, b):
        """a * b * R^-1 mod p on stacked (..., L) arrays.

        Two lowerings of the same math:
          * "unrolled": straight-line comba/CIOS — fastest on TPU, where XLA
            fuses it into one big VPU kernel; graph cost O(L^2) primitives.
          * "loop": scan/fori based SOS — tiny graphs, for compile-bound hosts
            (single-core CPU CI) and very large L.
        Selected by MUL_MODE ("auto" picks unrolled on TPU, loop on CPU).
        """
        mode = MUL_MODE
        if mode == "auto":
            # measured: the unrolled form makes XLA graph compiles pathological
            # at MSM scale on both CPU (single-core LLVM) and TPU (>25 min);
            # hot paths that need straight-line montmul use the Pallas kernels
            # (icicle_tpu/pallas/*) instead, which compile the unroll inside a
            # single Mosaic kernel body.
            mode = "loop"
        if mode == "unrolled":
            return self._mul_mont_unrolled(a, b)
        a16 = self.split16_stacked(a)
        b16 = self.split16_stacked(b)
        return stack(self._mul_mont_stacked(a16, b16))

    def to_mont(self, a):
        return self.mul_mont(a, self.const(self.params.r2, like=a))

    def from_mont(self, a):
        return self.mul_mont(a, self.const(1, like=a))

    def mul(self, a, b):
        """Canonical modular multiply (two REDC passes)."""
        return self.mul_mont(self.mul_mont(a, b), self.const(self.params.r2, like=a))

    def sqr(self, a):
        return self.mul(a, a)

    # -- exponentiation / inversion -------------------------------------------
    def pow_const(self, a, e: int):
        """a^e for a fixed Python-int exponent; canonical in/out.

        Left-to-right square-and-multiply as a lax.scan over the exponent bits:
        the montmul body is traced once, keeping compile time flat in e.
        """
        import jax

        if e == 0:
            return self.const(1, like=a)
        base = self.to_mont(a)
        one = jnp.broadcast_to(self.const(self.params.r), base.shape)  # 1 in Montgomery form
        bits = jnp.array([(e >> i) & 1 for i in reversed(range(e.bit_length()))],
                         dtype=jnp.uint32)

        def body(res, bit):
            res = self.mul_mont(res, res)
            res_mul = self.mul_mont(res, base)
            res = jnp.where(bit.astype(bool), res_mul, res)
            return res, None

        result, _ = jax.lax.scan(body, one, bits)
        return self.from_mont(result)

    def inv(self, a):
        """Fermat inverse a^(p-2); maps 0 -> 0."""
        return self.pow_const(a, self.p_int - 2)

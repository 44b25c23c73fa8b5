"""Dense univariate polynomial API over NTT + vec_ops.

Reference surface: include/icicle/polynomials/polynomials.h (Polynomial<C,D,I>)
with the device-agnostic algorithms of
include/icicle/polynomials/default_backend/default_poly_backend.h
(multiply via rou-evaluation domains :136-250, divide_by_vanishing :301-470,
add/sub, slicing, evaluation). Same coefficient/rou-evaluation state machine;
functional style (ops return new Polynomial) — the JAX-native analog of the
reference's mutable context objects.

Coefficients are canonical-form field tensors ``(n,) + limb_shape`` padded to a
power of two; ``size`` tracks the logical length.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.fields.field import Field
from icicle_tpu.ops import ntt as N
from icicle_tpu.ops import vec_ops as V
from icicle_tpu.runtime.config import NTTConfig, NTTDir, Ordering


def _pad_pow2(f: Field, coeffs, size: int | None = None):
    n = coeffs.shape[0] if size is None else size
    target = 1 << max(1, (n - 1)).bit_length() if n > 1 else 1
    if coeffs.shape[0] < target:
        pad = f.zeros((target - coeffs.shape[0],))
        coeffs = jnp.concatenate([coeffs, pad], axis=0)
    return coeffs


class Polynomial:
    """Immutable dense polynomial; create via from_coeffs / from_rou_evals."""

    def __init__(self, f: Field, coeffs, size: int | None = None):
        self.f = f
        self.coeffs = coeffs            # (cap,) + limb_shape, canonical form
        self.size = size if size is not None else coeffs.shape[0]

    # -- constructors (reference polynomials.h:35-44) ---------------------------
    @classmethod
    def from_coeffs(cls, f: Field, coeffs, size: int | None = None) -> "Polynomial":
        coeffs = jnp.asarray(coeffs)
        if size is not None and coeffs.shape[0] < size:
            coeffs = jnp.concatenate(
                [coeffs, f.zeros((size - coeffs.shape[0],))], axis=0)
        return cls(f, coeffs, size if size is not None else coeffs.shape[0])

    @classmethod
    def from_rou_evals(cls, f: Field, evals, size: int | None = None) -> "Polynomial":
        """Interpolate from evaluations on the 2^k roots-of-unity domain."""
        evals = jnp.asarray(evals)
        n = evals.shape[0]
        assert n & (n - 1) == 0, "rou evals length must be a power of two"
        N.ntt_init_domain(f, n.bit_length() - 1)
        coeffs = N.ntt_jit(f, evals, NTTDir.INVERSE, NTTConfig())
        return cls(f, coeffs, size if size is not None else n)

    def _cap(self) -> int:
        return self.coeffs.shape[0]

    def clone(self) -> "Polynomial":
        return Polynomial(self.f, self.coeffs, self.size)

    # -- arithmetic ---------------------------------------------------------------
    def _binary(self, other: "Polynomial", op) -> "Polynomial":
        f = self.f
        n = max(self.size, other.size)
        a = _pad_pow2(f, self.coeffs, n)
        b = _pad_pow2(f, other.coeffs, n)
        cap = max(a.shape[0], b.shape[0])
        if a.shape[0] < cap:
            a = jnp.concatenate([a, f.zeros((cap - a.shape[0],))], axis=0)
        if b.shape[0] < cap:
            b = jnp.concatenate([b, f.zeros((cap - b.shape[0],))], axis=0)
        return Polynomial(f, op(a, b), n)

    def __add__(self, other: "Polynomial") -> "Polynomial":
        return self._binary(other, self.f.add)

    def __sub__(self, other: "Polynomial") -> "Polynomial":
        return self._binary(other, self.f.sub)

    def __neg__(self) -> "Polynomial":
        return Polynomial(self.f, self.f.neg(self.coeffs), self.size)

    def __mul__(self, other) -> "Polynomial":
        if isinstance(other, Polynomial):
            return self._mul_poly(other)
        return self.mul_scalar(other)

    __rmul__ = __mul__

    def mul_scalar(self, scalar) -> "Polynomial":
        f = self.f
        s = scalar if hasattr(scalar, "shape") else f.from_ints([int(scalar)])[0]
        return Polynomial(f, V.scalar_mul_vec(f, s, self.coeffs), self.size)

    def _mul_poly(self, other: "Polynomial") -> "Polynomial":
        """Multiply via rou-evaluation domain of size >= deg(a)+deg(b)+1
        (default_poly_backend.h multiply:136-250)."""
        f = self.f
        out_size = self.size + other.size - 1
        logn = max(1, (out_size - 1).bit_length())
        n = 1 << logn
        N.ntt_init_domain(f, logn)
        a = jnp.concatenate([self.coeffs[:self.size],
                             f.zeros((n - self.size,))], axis=0)
        b = jnp.concatenate([other.coeffs[:other.size],
                             f.zeros((n - other.size,))], axis=0)
        ea = N.ntt_jit(f, a, NTTDir.FORWARD, NTTConfig())
        eb = N.ntt_jit(f, b, NTTDir.FORWARD, NTTConfig())
        prod = f.mul(ea, eb)
        coeffs = N.ntt_jit(f, prod, NTTDir.INVERSE, NTTConfig())
        return Polynomial(f, coeffs, out_size)

    def divide(self, divisor: "Polynomial") -> tuple["Polynomial", "Polynomial"]:
        """Long division: returns (quotient, remainder)."""
        f = self.f
        q, r = V.polynomial_division(
            f, self.coeffs[:self.size], divisor.coeffs[:divisor.size])
        return (Polynomial(f, q), Polynomial(f, r))

    def __floordiv__(self, other: "Polynomial") -> "Polynomial":
        return self.divide(other)[0]

    def __mod__(self, other: "Polynomial") -> "Polynomial":
        return self.divide(other)[1]

    def divide_by_vanishing(self, degree: int) -> "Polynomial":
        """Divide by V(x) = x^degree - 1, assuming divisibility
        (default_poly_backend.h:301-470 fast path).

        Because q[i] = p[i+N] + q[i+N], each residue chain mod N is a suffix
        sum — one vectorized scan over ceil(size/N) blocks.
        """
        f = self.f
        nn = degree
        size = self.size
        if size <= nn:
            return Polynomial(f, f.zeros((1,)), 1)
        nblocks = -(-size // nn)
        pad = nblocks * nn - size
        c = self.coeffs[:size]
        if pad:
            c = jnp.concatenate([c, f.zeros((pad,))], axis=0)
        blocks = c.reshape((nblocks, nn) + f.limb_shape)

        def step(carry, blk):
            # scanning from the highest block down: carry = q-block above
            q_blk = f.add(blk, carry)
            return q_blk, q_blk

        # quotient block j = sum_{k > j} p-block k (suffix sum, exclusive)
        zero = f.zeros((nn,))
        _, qs = jax.lax.scan(step, zero, blocks[::-1])
        q_blocks = qs[::-1][1:]  # drop block 0 (it is sum of ALL incl. blk 0)
        # exclusive suffix: q block j uses blocks strictly above j
        q = q_blocks.reshape((-1,) + f.limb_shape) if q_blocks.size else f.zeros((1,))
        out_size = size - nn
        return Polynomial(f, q[:max(out_size, 1)], max(out_size, 1))

    def add_monomial_inplace(self, monomial_coeff, exponent: int) -> "Polynomial":
        """p + c*x^e (reference add_monomial_inplace)."""
        f = self.f
        n = max(self.size, exponent + 1)
        c = self.coeffs
        if c.shape[0] < n:
            c = jnp.concatenate([c, f.zeros((n - c.shape[0],))], axis=0)
        mc = monomial_coeff if hasattr(monomial_coeff, "shape") else \
            f.from_ints([int(monomial_coeff)])[0]
        cur = jax.lax.index_in_dim(c, exponent, axis=0, keepdims=False)
        c = jax.lax.dynamic_update_index_in_dim(
            c, f.add(cur, mc), exponent, axis=0)
        return Polynomial(f, c, n)

    def sub_monomial_inplace(self, monomial_coeff, exponent: int) -> "Polynomial":
        f = self.f
        mc = monomial_coeff if hasattr(monomial_coeff, "shape") else \
            f.from_ints([int(monomial_coeff)])[0]
        return self.add_monomial_inplace(f.neg(mc), exponent)

    # -- views (reference slice/even/odd) ----------------------------------------
    def slice(self, offset: int, stride: int, size: int | None = None) -> "Polynomial":
        c = self.coeffs[:self.size][offset::stride]
        if size is not None:
            c = c[:size]
        return Polynomial(self.f, c)

    def even(self) -> "Polynomial":
        return self.slice(0, 2)

    def odd(self) -> "Polynomial":
        return self.slice(1, 2)

    # -- evaluation -----------------------------------------------------------------
    def eval(self, x):
        """Evaluate at one or more points (Horner)."""
        f = self.f
        xs = x if hasattr(x, "shape") else f.from_ints([int(x)])
        squeeze = xs.shape == f.limb_shape or (f.limb_shape == () and xs.ndim == 0)
        if squeeze:
            xs = xs[None] if f.limb_shape == () else xs[None, :]
        out = V.polynomial_eval(f, self.coeffs[:self.size], xs)
        if squeeze:
            out = out[0]
        return out

    def eval_on_domain(self, domain):
        return V.polynomial_eval(f=self.f, coeffs=self.coeffs[:self.size],
                                 domain=domain)

    def eval_on_rou_domain(self, domain_log_size: int):
        """Evaluate on the 2^k rou domain via forward NTT."""
        f = self.f
        n = 1 << domain_log_size
        N.ntt_init_domain(f, domain_log_size)
        c = self.coeffs[:self.size]
        if c.shape[0] < n:
            c = jnp.concatenate([c, f.zeros((n - c.shape[0],))], axis=0)
        else:
            # fold higher coefficients: x^(i+n) == x^i on the size-n domain
            extra = c[n:]
            nb = -(-extra.shape[0] // n)
            if extra.shape[0] < nb * n:
                extra = jnp.concatenate(
                    [extra, f.zeros((nb * n - extra.shape[0],))], axis=0)
            folded = c[:n]
            for blk in extra.reshape((nb, n) + f.limb_shape):
                folded = f.add(folded, blk)
            c = folded
        return N.ntt_jit(f, c, NTTDir.FORWARD, NTTConfig())

    # -- introspection -----------------------------------------------------------
    def degree(self) -> int:
        idx = V.highest_non_zero_idx(self.f, self.coeffs[:self.size])
        return int(idx)

    def get_coeff(self, idx: int):
        return self.coeffs[idx]

    def copy_coeffs(self, start: int = 0, end: int | None = None):
        end = self.size if end is None else end
        return self.coeffs[start:end]

    def to_ints(self) -> np.ndarray:
        return self.f.to_ints(self.coeffs[:self.size])

"""Extension fields Fp[X]/(X^D - w) as vectorized engines.

Mirrors the reference's tower headers (include/icicle/fields/
{complex_extension.h, quartic_extension.h}) with one generic schoolbook
implementation: an extension element is a flat ``(..., D * B)`` uint32 tensor
(D components of base width B laid out contiguously), so every generic
consumer (EC group law, vec_ops, scans) treats it exactly like a wider field
element.

Degrees/nonresidues (reference configs):
  babybear  D=4 w=11      koalabear D=4 w=3      m31 D=4 w=-1
  goldilocks D=2 w=7      bn254_base D=2 w=-1    bls12_377_base D=2 w=-5
  bls12_381_base D=2 w=-1

The same `ExtEngine` therefore powers both FRI/sumcheck challenge fields
(small STARK quartics) and G2 point coordinates (big-field complex towers).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from icicle_tpu.fields.field import Field, get_field


class ExtEngine:
    """Engine-protocol implementation for Fp[X]/(X^D - w)."""

    def __init__(self, base: Field, degree: int, nonresidue: int):
        self.base = base
        self.bf = base.engine
        self.degree = degree
        self.w = nonresidue
        # base element width in u32 words ('' shape -> width 1, flat lanes)
        self.base_width = int(np.prod(base.limb_shape)) if base.limb_shape else 1
        self.base_flat = base.limb_shape == ()
        self.width = degree * self.base_width
        self.p_int = base.modulus

    # -- component plumbing ----------------------------------------------------
    def comps(self, x):
        """(..., D*B) -> list of D base elements ((..., B) or (...,) if flat)."""
        b, d = self.base_width, self.degree
        if self.base_flat:
            return [x[..., i] for i in range(d)]
        return [x[..., i * b:(i + 1) * b] for i in range(d)]

    def restack(self, comps):
        if self.base_flat:
            return jnp.stack(comps, axis=-1)
        return jnp.concatenate(comps, axis=-1)

    # -- small-constant multiply via add chain ----------------------------------
    def _mul_small(self, x, k: int):
        if k == 0:
            return jnp.zeros_like(x)
        if k < 0:
            return self.bf.neg(self._mul_small(x, -k))
        acc = None
        for bit in bin(k)[2:]:
            if acc is not None:
                acc = self.bf.add(acc, acc)
            if bit == "1":
                acc = x if acc is None else self.bf.add(acc, x)
        return acc

    # -- ring ops ----------------------------------------------------------------
    def add(self, a, b):
        return self.restack([self.bf.add(x, y)
                             for x, y in zip(self.comps(a), self.comps(b))])

    def sub(self, a, b):
        return self.restack([self.bf.sub(x, y)
                             for x, y in zip(self.comps(a), self.comps(b))])

    def neg(self, a):
        return self.restack([self.bf.neg(x) for x in self.comps(a)])

    def _mul_core(self, ac, bc, mul):
        """Schoolbook product with X^D = w folding; `mul` is the base multiply."""
        d, w = self.degree, self.w
        lo = [None] * d   # coefficients k < D
        hi = [None] * d   # coefficients k >= D (before w folding)
        for i in range(d):
            for j in range(d):
                prod = mul(ac[i], bc[j])
                k = i + j
                if k < d:
                    lo[k] = prod if lo[k] is None else self.bf.add(lo[k], prod)
                else:
                    kk = k - d
                    hi[kk] = prod if hi[kk] is None else self.bf.add(hi[kk], prod)
        out = []
        for k in range(d):
            v = lo[k]
            if hi[k] is not None:
                v = self.bf.add(v, self._mul_small(hi[k], w)) if w >= 0 \
                    else self.bf.sub(v, self._mul_small(hi[k], -w))
            out.append(v)
        return out

    def mul_mont(self, a, b):
        return self.restack(self._mul_core(self.comps(a), self.comps(b),
                                           self.bf.mul_mont))

    def mul(self, a, b):
        return self.restack(self._mul_core(self.comps(a), self.comps(b),
                                           self.bf.mul))

    def sqr(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return self.restack([self.bf.to_mont(x) for x in self.comps(a)])

    def from_mont(self, a):
        return self.restack([self.bf.from_mont(x) for x in self.comps(a)])

    def mul_base(self, a, s):
        """Multiply ext element by a base-field scalar (canonical both)."""
        return self.restack([self.bf.mul(x, s) for x in self.comps(a)])

    # -- predicates ----------------------------------------------------------------
    def is_zero(self, a):
        z = None
        for x in self.comps(a):
            zz = self.bf.is_zero(x) if not self.base_flat else (x == 0)
            z = zz if z is None else (z & zz)
        return z

    def eq(self, a, b):
        e = None
        for x, y in zip(self.comps(a), self.comps(b)):
            ee = self.bf.eq(x, y)
            e = ee if e is None else (e & ee)
        return e

    # -- inversion (canonical in/out; reference quartic_extension.h:248-283,
    #    complex_extension.h norm trick) -----------------------------------------
    def inv(self, a):
        bf, w = self.bf, self.w
        c = self.comps(a)
        if self.degree == 2:
            # norm = c0^2 - w c1^2; inv = (c0 - c1 X) / norm
            n = bf.sub(bf.mul(c[0], c[0]), self._mul_small(bf.mul(c[1], c[1]), w))
            ninv = bf.inv(n)
            return self.restack([bf.mul(c[0], ninv),
                                 bf.neg(bf.mul(c[1], ninv))])
        if self.degree == 4:
            c0, c1, c2, c3 = c
            two_c1c3 = bf.mul(c1, bf.add(c3, c3))
            x0 = bf.sub(bf.mul(c0, c0),
                        self._mul_small(bf.sub(two_c1c3, bf.mul(c2, c2)), w))
            x2 = bf.sub(bf.sub(bf.mul(c0, bf.add(c2, c2)), bf.mul(c1, c1)),
                        self._mul_small(bf.mul(c3, c3), w))
            norm = bf.sub(bf.mul(x0, x0), self._mul_small(bf.mul(x2, x2), w))
            ninv = bf.inv(norm)
            x0 = bf.mul(x0, ninv)
            x2 = bf.mul(x2, ninv)
            return self.restack([
                bf.sub(bf.mul(c0, x0), self._mul_small(bf.mul(c2, x2), w)),
                bf.sub(self._mul_small(bf.mul(c3, x2), w), bf.mul(c1, x0)),
                bf.sub(bf.mul(c2, x0), bf.mul(c0, x2)),
                bf.sub(bf.mul(c1, x2), bf.mul(c3, x0)),
            ])
        if self.degree == 3:
            # adjugate inverse over X^3 = w (reference cubic_extension.h):
            # t0 = c0^2 - w c1 c2; t1 = w c2^2 - c0 c1; t2 = c1^2 - c0 c2
            # norm = c0 t0 + w c2 t1 + w c1 t2; inv = (t0, t1, t2)/norm
            c0, c1, c2 = c
            t0 = bf.sub(bf.mul(c0, c0), self._mul_small(bf.mul(c1, c2), w))
            t1 = bf.sub(self._mul_small(bf.mul(c2, c2), w), bf.mul(c0, c1))
            t2 = bf.sub(bf.mul(c1, c1), bf.mul(c0, c2))
            norm = bf.add(bf.mul(c0, t0),
                          self._mul_small(bf.add(bf.mul(c2, t1),
                                                 bf.mul(c1, t2)), w))
            ninv = bf.inv(norm)
            return self.restack([bf.mul(t0, ninv), bf.mul(t1, ninv),
                                 bf.mul(t2, ninv)])
        raise NotImplementedError(f"inv for degree {self.degree}")

    def pow_const(self, a, e: int):
        if e == 0:
            one = [self.base.const(1)] + [self.base.const(0)] * (self.degree - 1)
            one = self.restack([jnp.broadcast_to(x, self.comps(a)[0].shape)
                                for x in one])
            return one
        result = None
        acc = a
        bits = []
        while e:
            bits.append(e & 1)
            e >>= 1
        for i, bit in enumerate(bits):
            if bit:
                result = acc if result is None else self.mul(result, acc)
            if i + 1 < len(bits):
                acc = self.mul(acc, acc)
        return result


class ExtField:
    """Field-like wrapper over ExtEngine (same surface as fields.field.Field)."""

    def __init__(self, base_name: str, degree: int, nonresidue: int):
        self.base = get_field(base_name)
        self.engine = ExtEngine(self.base, degree, nonresidue)
        self.name = f"{base_name}_ext{degree}"
        self.degree = degree
        self.modulus = self.base.modulus  # base characteristic
        self.limb_shape = (self.engine.width,)
        self.nlimbs = self.engine.width
        import jax
        self._jmul = jax.jit(self.engine.mul)
        self._jadd = jax.jit(self.engine.add)
        self._jsub = jax.jit(self.engine.sub)
        self._jinv = jax.jit(self.engine.inv)

    def add(self, a, b): return self._jadd(a, b)
    def sub(self, a, b): return self._jsub(a, b)
    def neg(self, a): return self.engine.neg(a)
    def mul(self, a, b): return self._jmul(a, b)
    def sqr(self, a): return self._jmul(a, a)
    def inv(self, a): return self._jinv(a)
    def mul_mont(self, a, b): return self.engine.mul_mont(a, b)
    def to_mont(self, a): return self.engine.to_mont(a)
    def from_mont(self, a): return self.engine.from_mont(a)
    def eq(self, a, b): return self.engine.eq(a, b)
    def is_zero(self, a): return self.engine.is_zero(a)
    def pow_const(self, a, e): return self.engine.pow_const(a, e)

    # -- int conversion (components little-endian: value = sum c_i X^i) ---------
    def from_ints(self, values) -> jnp.ndarray:
        """Nested int sequence with trailing axis of D components."""
        arr = np.asarray(values, dtype=object)
        assert arr.shape[-1] == self.degree, \
            f"trailing axis must be degree {self.degree}"
        comps = [self.base.from_ints(arr[..., i]) for i in range(self.degree)]
        return self.engine.restack(comps)

    def to_ints(self, arr) -> np.ndarray:
        comps = self.engine.comps(arr)
        outs = [self.base.to_ints(c) for c in comps]
        return np.stack(outs, axis=-1)

    def rand(self, rng: np.random.Generator, batch_shape=()):
        vals = np.empty(tuple(batch_shape) + (self.degree,), dtype=object)
        flat = vals.reshape(-1, self.degree)
        for i in range(flat.shape[0]):
            for j in range(self.degree):
                flat[i, j] = int.from_bytes(rng.bytes(40), "little") % self.modulus
        return self.from_ints(vals)

    def element_shape(self, batch_shape=()):
        return tuple(batch_shape) + (self.engine.width,)

    def zeros(self, batch_shape=()):
        return jnp.zeros(self.element_shape(batch_shape), dtype=jnp.uint32)


# reference extension configs: (base field -> degree, nonresidue)
_EXT_CONFIGS: dict[str, tuple[int, int]] = {
    "babybear": (4, 11),
    "koalabear": (4, 3),
    "m31": (4, -1),
    "goldilocks": (2, 7),
    "bn254_base": (2, -1),
    "bls12_377_base": (2, -5),
    "bls12_381_base": (2, -1),
}


@functools.lru_cache(maxsize=None)
def get_ext_field(base_name: str, degree: int | None = None) -> ExtField:
    if base_name not in _EXT_CONFIGS:
        raise KeyError(f"no extension config for {base_name!r}")
    d, w = _EXT_CONFIGS[base_name]
    if degree is not None and degree != d:
        raise ValueError(f"{base_name} extension degree is {d}, not {degree}")
    return ExtField(base_name, d, w)

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
    """Engine-protocol implementation for K[X]/(X^D - w).

    The base K is a prime Field OR another ExtField (towers: reference
    cubic_extension.h builds Fq6 = Fq2[v]/(v^3 - xi) and quadratic_extension
    builds Fq12 = Fq6[t]/(t^2 - v)). `nonresidue` is a small int (prime-base
    fast path) or a canonical element of K (flat uint32 row)."""

    def __init__(self, base, degree: int, nonresidue,
                 leaf_ops: str = "engine"):
        self.base = base
        # "engine": raw engine calls — fully traceable inside one outer jit
        # (STARK quartics, G2 complex coords). "wrapper": the base Field's
        # per-op jitted methods — towers over big bases, where one flat jit
        # graph would be hundreds of montmuls (uncompilable on 1-core hosts)
        # and fully-eager leaves are ~1000x slower.
        self.bf = base if leaf_ops == "wrapper" else base.engine
        self.degree = degree
        # base element width in u32 words ('' shape -> width 1, flat lanes)
        self.base_width = int(np.prod(base.limb_shape)) if base.limb_shape else 1
        self.base_flat = base.limb_shape == ()
        self.width = degree * self.base_width
        self.p_int = base.modulus
        if isinstance(nonresidue, (int, np.integer)):
            self.w = int(nonresidue)
            self._w_el = None
        else:
            self.w = None
            self._w_el = jnp.asarray(np.asarray(nonresidue, dtype=np.uint32))

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

    def _mul_w(self, x, mont: bool = False):
        """x * nonresidue. Int nonresidues are add chains (domain-agnostic);
        element nonresidues need the matching-domain base multiply."""
        if self._w_el is None:
            return self._mul_small(x, self.w)
        if mont:
            if not hasattr(self, "_w_el_mont"):
                self._w_el_mont = self.base.to_mont(self._w_el)
            return self.bf.mul_mont(x, self._w_el_mont)
        return self.bf.mul(x, self._w_el)

    # -- ring ops ----------------------------------------------------------------
    def add(self, a, b):
        return self.restack([self.bf.add(x, y)
                             for x, y in zip(self.comps(a), self.comps(b))])

    def sub(self, a, b):
        return self.restack([self.bf.sub(x, y)
                             for x, y in zip(self.comps(a), self.comps(b))])

    def neg(self, a):
        return self.restack([self.bf.neg(x) for x in self.comps(a)])

    def _mul_core(self, ac, bc, mul, mont: bool = False):
        """Schoolbook product with X^D = w folding; `mul` is the base multiply."""
        d = self.degree
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
                if self._w_el is None and self.w < 0:
                    v = self.bf.sub(v, self._mul_small(hi[k], -self.w))
                else:
                    v = self.bf.add(v, self._mul_w(hi[k], mont=mont))
            out.append(v)
        return out

    def mul_mont(self, a, b):
        return self.restack(self._mul_core(self.comps(a), self.comps(b),
                                           self.bf.mul_mont, mont=True))

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
        bf = self.bf
        mw = self._mul_w
        c = self.comps(a)
        if self.degree == 2:
            # norm = c0^2 - w c1^2; inv = (c0 - c1 X) / norm
            n = bf.sub(bf.mul(c[0], c[0]), mw(bf.mul(c[1], c[1])))
            ninv = bf.inv(n)
            return self.restack([bf.mul(c[0], ninv),
                                 bf.neg(bf.mul(c[1], ninv))])
        if self.degree == 4:
            c0, c1, c2, c3 = c
            two_c1c3 = bf.mul(c1, bf.add(c3, c3))
            x0 = bf.sub(bf.mul(c0, c0),
                        mw(bf.sub(two_c1c3, bf.mul(c2, c2))))
            x2 = bf.sub(bf.sub(bf.mul(c0, bf.add(c2, c2)), bf.mul(c1, c1)),
                        mw(bf.mul(c3, c3)))
            norm = bf.sub(bf.mul(x0, x0), mw(bf.mul(x2, x2)))
            ninv = bf.inv(norm)
            x0 = bf.mul(x0, ninv)
            x2 = bf.mul(x2, ninv)
            return self.restack([
                bf.sub(bf.mul(c0, x0), mw(bf.mul(c2, x2))),
                bf.sub(mw(bf.mul(c3, x2)), bf.mul(c1, x0)),
                bf.sub(bf.mul(c2, x0), bf.mul(c0, x2)),
                bf.sub(bf.mul(c1, x2), bf.mul(c3, x0)),
            ])
        if self.degree == 3:
            # adjugate inverse over X^3 = w (reference cubic_extension.h):
            # t0 = c0^2 - w c1 c2; t1 = w c2^2 - c0 c1; t2 = c1^2 - c0 c2
            # norm = c0 t0 + w c2 t1 + w c1 t2; inv = (t0, t1, t2)/norm
            c0, c1, c2 = c
            t0 = bf.sub(bf.mul(c0, c0), mw(bf.mul(c1, c2)))
            t1 = bf.sub(mw(bf.mul(c2, c2)), bf.mul(c0, c1))
            t2 = bf.sub(bf.mul(c1, c1), bf.mul(c0, c2))
            norm = bf.add(bf.mul(c0, t0),
                          mw(bf.add(bf.mul(c2, t1), bf.mul(c1, t2))))
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
    """Field-like wrapper over ExtEngine (same surface as fields.field.Field).

    `base` is a registered prime-field name or a Field/ExtField object
    (towers)."""

    def __init__(self, base, degree: int, nonresidue, jit_ops: bool = True):
        self.base = get_field(base) if isinstance(base, str) else base
        self.engine = ExtEngine(self.base, degree, nonresidue,
                                leaf_ops="engine" if jit_ops else "wrapper")
        self.name = f"{self.base.name}_ext{degree}"
        self.degree = degree
        self.modulus = self.base.modulus  # base characteristic
        self.limb_shape = (self.engine.width,)
        self.nlimbs = self.engine.width
        if jit_ops:
            import jax
            self._jmul = jax.jit(self.engine.mul)
            self._jadd = jax.jit(self.engine.add)
            self._jsub = jax.jit(self.engine.sub)
            self._jinv = jax.jit(self.engine.inv)
        else:
            # tower fields over big bases: one Fq12 op is hundreds of base
            # montmuls — jitting that graph is pathological to compile; run
            # op-by-op (callers embedding towers in larger jits trace
            # engine.* directly)
            self._jmul = self.engine.mul
            self._jadd = self.engine.add
            self._jsub = self.engine.sub
            self._jinv = self.engine.inv

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

    def const(self, value: int, batch_shape=()):
        comps = [self.base.const(value if i == 0 else 0, batch_shape)
                 for i in range(self.degree)]
        return self.engine.restack(comps)

    # -- int conversion (components little-endian: value = sum c_i X^i) ---------
    def from_ints(self, values) -> jnp.ndarray:
        """Nested int sequence; for towers, the trailing axes are the nested
        component axes outermost-first (e.g. Fq12 input shape (..., 2, 3, 2))."""
        arr = np.asarray(values, dtype=object)
        if isinstance(self.base, ExtField):
            axis = arr.ndim - 1 - self._tower_depth(self.base)
            assert arr.shape[axis] == self.degree, \
                f"axis {axis} must be degree {self.degree}"
            comps = [self.base.from_ints(arr.take(i, axis=axis))
                     for i in range(self.degree)]
        else:
            assert arr.shape[-1] == self.degree, \
                f"trailing axis must be degree {self.degree}"
            comps = [self.base.from_ints(arr[..., i])
                     for i in range(self.degree)]
        return self.engine.restack(comps)

    @staticmethod
    def _tower_depth(f) -> int:
        return 1 + ExtField._tower_depth(f.base) if isinstance(f, ExtField) \
            else 0

    def to_ints(self, arr) -> np.ndarray:
        comps = self.engine.comps(arr)
        outs = [self.base.to_ints(c) for c in comps]
        ax = -1 - self._tower_depth(self.base)
        return np.stack(outs, axis=ax)

    def rand(self, rng: np.random.Generator, batch_shape=()):
        if isinstance(self.base, ExtField):
            return self.engine.restack(
                [self.base.rand(rng, batch_shape) for _ in range(self.degree)])
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


# pairing tower nonresidues (reference snark_fields/{bn254,bls12_*}_tower.h):
# Fq2 = Fq[u]/(u^2 - nr), Fq6 = Fq2[v]/(v^3 - xi), Fq12 = Fq6[t]/(t^2 - v)
_TOWER_XI: dict[str, tuple[int, tuple[int, int]]] = {
    "bn254": (-1, (9, 1)),
    "bls12_381": (-1, (1, 1)),
    "bls12_377": (-5, (0, 1)),
}


@functools.lru_cache(maxsize=None)
def get_tower_field(curve_name: str, ext_degree: int) -> ExtField:
    """Vectorized pairing tower fields Fq2 / Fq6 / Fq12 for bn254 and
    bls12-{381,377} (reference cubic_extension.h + *_tower.h). Elements are
    flat (..., D*B) uint32 rows; see curves/ate.py Fp12Tower for the
    host-int twin these are tested against."""
    if curve_name not in _TOWER_XI:
        raise KeyError(f"no pairing tower for {curve_name!r}")
    nr, xi = _TOWER_XI[curve_name]
    if ext_degree == 2:
        return ExtField(f"{curve_name}_base", 2, nr, jit_ops=False)
    if ext_degree == 6:
        fq2 = get_tower_field(curve_name, 2)
        xi_el = np.asarray(fq2.from_ints([list(xi)])[0])
        return ExtField(fq2, 3, xi_el, jit_ops=False)
    if ext_degree == 12:
        fq6 = get_tower_field(curve_name, 6)
        v_el = np.asarray(fq6.from_ints([[[0, 0], [1, 0], [0, 0]]])[0])
        return ExtField(fq6, 2, v_el, jit_ops=False)
    raise ValueError(f"tower degree must be 2, 6 or 12, got {ext_degree}")

"""Elliptic-curve group ops as branchless vectorized kernels.

TPU-native replacement for the reference's ``curves/projective.h`` /
``curves/affine.h``: points are pytrees of ``(..., L)`` uint32 limb tensors in
**Montgomery form** (one REDC per field multiply), and all formulas are the
*complete* homogeneous-projective formulas for ``a = 0`` short-Weierstrass
curves (Renes-Costello-Batina 2015, Algs 7-9). Complete formulas handle
identity/doubling/negation uniformly — no data-dependent branches, so every op
vectorizes over arbitrary batch axes and is safe as a combiner in scans.

The identity is ``(0, 1, 0)`` (same convention as the reference,
projective.h:26). ``add``/``dbl``/``madd`` take a field *engine* (``BigField``
or the Fp2 tower) so G1 and G2 share one implementation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.curves.params import Curve, get_curve


class Projective(NamedTuple):
    """Homogeneous projective point; coords in Montgomery form."""
    x: Any
    y: Any
    z: Any


class Affine(NamedTuple):
    """Affine point; coordinate form depends on context (see callers)."""
    x: Any
    y: Any


# NamedTuples are native JAX pytrees; no registration needed.


def padd(f, p: Projective, q: Projective, b3_mont) -> Projective:
    """Complete projective add (RCB15 Alg 7, a=0): 12 mul + 2 b3-mults worth."""
    m, add, sub = f.mul_mont, f.add, f.sub
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = m(x1, x2)
    t1 = m(y1, y2)
    t2 = m(z1, z2)
    t3 = sub(m(add(x1, y1), add(x2, y2)), add(t0, t1))   # x1y2 + x2y1
    t4 = sub(m(add(y1, z1), add(y2, z2)), add(t1, t2))   # y1z2 + y2z1
    y3 = sub(m(add(x1, z1), add(x2, z2)), add(t0, t2))   # x1z2 + x2z1
    t0 = add(add(t0, t0), t0)                            # 3 x1x2
    t2 = m(b3_mont, t2)                                  # 3b z1z2
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = m(b3_mont, y3)                                  # 3b (x1z2 + x2z1)
    x3 = sub(m(t3, t1), m(t4, y3))
    y3 = add(m(t1, z3), m(y3, t0))
    z3 = add(m(z3, t4), m(t0, t3))
    return Projective(x3, y3, z3)


def pmadd(f, p: Projective, q: Affine, b3_mont) -> Projective:
    """Complete mixed add (RCB15 Alg 8, a=0), q affine with Z=1 implicit.

    NOTE: q must be a genuine curve point (affine cannot encode identity);
    callers mask out padding lanes themselves.
    """
    m, add, sub = f.mul_mont, f.add, f.sub
    x1, y1, z1 = p
    x2, y2 = q
    t0 = m(x1, x2)
    t1 = m(y1, y2)
    t3 = sub(m(add(x1, y1), add(x2, y2)), add(t0, t1))   # x1y2 + x2y1
    t4 = add(m(y2, z1), y1)                              # y1 + y2z1
    y3 = add(m(x2, z1), x1)                              # x1 + x2z1
    t0 = add(add(t0, t0), t0)                            # 3 x1x2
    t2 = m(b3_mont, z1)                                  # 3b z1
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = m(b3_mont, y3)
    x3 = sub(m(t3, t1), m(t4, y3))
    y3 = add(m(t1, z3), m(y3, t0))
    z3 = add(m(z3, t4), m(t0, t3))
    return Projective(x3, y3, z3)


def pdbl(f, p: Projective, b3_mont) -> Projective:
    """Complete doubling (RCB15 Alg 9, a=0): 6 mul + 2 sqr class."""
    m, add, sub = f.mul_mont, f.add, f.sub
    x, y, z = p
    t0 = m(y, y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)                # 8 y^2
    t1 = m(y, z)
    t2 = m(b3_mont, m(z, z))        # 3b z^2
    x3 = m(t2, z3)
    y3 = add(t0, t2)
    z3 = m(t1, z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)                # 9b z^2
    t0 = sub(t0, t2)                # y^2 - 9b z^2
    y3 = add(m(t0, y3), x3)
    x3 = m(t0, m(x, y))
    x3 = add(x3, x3)
    return Projective(x3, y3, z3)


def pneg(f, p: Projective) -> Projective:
    return Projective(p.x, f.neg(p.y), p.z)


def pselect(cond, p: Projective, q: Projective) -> Projective:
    """Lane select: cond ? p : q. cond broadcastable against batch shape."""
    c = cond[..., None]
    sel = lambda a, b: jnp.where(c, a, b)
    return Projective(sel(p.x, q.x), sel(p.y, q.y), sel(p.z, q.z))


class Group:
    """Point ops bound to a curve's coordinate field engine.

    G1 uses the base field; G2 (g2=True) uses the quadratic extension (or the
    base field itself for bw6_761, whose G2 is defined over Fq —
    curves/params/bw6_761.h). All point tensors hold Montgomery-form
    coordinates; `from_affine_canonical` / `to_affine_canonical` convert at
    the API boundary.
    """

    def __init__(self, curve: Curve, g2: bool = False):
        self.curve = curve
        self.g2 = g2
        fq = curve.fq
        r = fq.params.r  # Montgomery R of the base field
        pmod = fq.modulus
        base_nl = fq.nlimbs

        def base_mont(v: int):
            vm = (v * r) % pmod
            return np.array([(vm >> (32 * i)) & 0xFFFFFFFF for i in range(base_nl)],
                            dtype=np.uint32)

        if not g2:
            self.coord_field = fq
            self.f = fq.engine
            nl = base_nl

            def const_mont(v):
                return jnp.asarray(base_mont(v))

            gen_x, gen_y = curve.gen_x, curve.gen_y
            b3 = curve.b3
            one = 1
        else:
            p = curve.params
            if p.g2_b is None:
                raise ValueError(f"curve {curve.name} has no G2")
            if p.g2_field == "fq":
                self.coord_field = fq
                self.f = fq.engine
                nl = base_nl

                def const_mont(v):
                    return jnp.asarray(base_mont(v[0] if isinstance(v, tuple) else v))

                gen_x, gen_y = p.g2_gen_x[0], p.g2_gen_y[0]
                b3 = (3 * p.g2_b[0]) % pmod
                one = 1
            else:
                from icicle_tpu.fields.extension import get_ext_field
                ef = get_ext_field(p.base_field)
                self.coord_field = ef
                self.f = ef.engine
                nl = ef.nlimbs  # 2 * base limbs, flat

                def const_mont(v):
                    re, im = v if isinstance(v, tuple) else (v, 0)
                    return jnp.asarray(np.concatenate([base_mont(re), base_mont(im)]))

                gen_x, gen_y = p.g2_gen_x, p.g2_gen_y
                b3 = ((3 * p.g2_b[0]) % pmod, (3 * p.g2_b[1]) % pmod)
                one = (1, 0)

        self.b3_mont = const_mont(b3)
        self.one_mont = const_mont(one)
        self._op_cache: dict = {}
        self._base_mont = base_mont
        self.zero_limbs = jnp.zeros((nl,), dtype=jnp.uint32)
        self.gen_mont = Affine(const_mont(gen_x), const_mont(gen_y))
        self.nlimbs = nl

    # -- constructors ---------------------------------------------------------
    def identity(self, batch_shape=()) -> Projective:
        shape = tuple(batch_shape) + (self.nlimbs,)
        z = jnp.zeros(shape, dtype=jnp.uint32)
        one = jnp.broadcast_to(self.one_mont, shape)
        return Projective(z, one, z)

    def generator(self, batch_shape=()) -> Projective:
        shape = tuple(batch_shape) + (self.nlimbs,)
        bc = lambda a: jnp.broadcast_to(a, shape)
        return Projective(bc(self.gen_mont.x), bc(self.gen_mont.y), bc(self.one_mont))

    # -- core ops (Montgomery form) -------------------------------------------
    # Each op routes through a nested jit cached per montmul lowering mode:
    # jit caches the traced jaxpr by aval, so the hundredth trace-time call of
    # a 13-montmul add in a fold tree reuses the first call's jaxpr instead of
    # re-tracing it (measured: cuts multi-minute Python tracing of the MSM
    # pipelines by ~4x on the 1-core CI host). XLA's CallInliner flattens the
    # nested calls before fusion, so compiled code is unchanged. MUL_MODE is
    # trace-time state, hence the per-mode cache key.
    def _op(self, name: str, raw):
        from icicle_tpu.math import bigint
        key = (name, bigint.MUL_MODE)
        fn = self._op_cache.get(key)
        if fn is None:
            fn = jax.jit(raw)
            self._op_cache[key] = fn
        return fn

    def add(self, p: Projective, q: Projective) -> Projective:
        return self._op("add", self._raw_add)(p, q)

    def madd(self, p: Projective, q: Affine) -> Projective:
        return self._op("madd", self._raw_madd)(p, q)

    def dbl(self, p: Projective) -> Projective:
        return self._op("dbl", self._raw_dbl)(p)

    # Raw (always-retrace) forms for contexts that must not nest a jit:
    def _raw_add(self, p: Projective, q: Projective) -> Projective:
        return padd(self.f, p, q, self.b3_mont)

    def _raw_madd(self, p: Projective, q: Affine) -> Projective:
        return pmadd(self.f, p, q, self.b3_mont)

    def _raw_dbl(self, p: Projective) -> Projective:
        return pdbl(self.f, p, self.b3_mont)

    # Jitted forms for eager/API callers (kept for API compat; add/madd/dbl
    # are now themselves jit-backed):
    @functools.cached_property
    def jadd(self):
        return jax.jit(self._raw_add)

    @functools.cached_property
    def jmadd(self):
        return jax.jit(self._raw_madd)

    @functools.cached_property
    def jdbl(self):
        return jax.jit(self._raw_dbl)

    def neg(self, p: Projective) -> Projective:
        return pneg(self.f, p)

    @functools.cached_property
    def glv_beta_mont(self):
        """Montgomery-form beta for the GLV endomorphism (x, y) -> (beta*x, y)
        (curves/glv.py; G1 only — G2 points live over the extension)."""
        if self.g2:
            raise ValueError("GLV beta is defined for G1 groups only")
        from icicle_tpu.curves.glv import glv_constants
        beta, _ = glv_constants(self.curve.name)
        # NUMPY, not jnp: the cache outlives any single trace (same tracer-
        # leak guard as ecntt._stage_glv); callers asarray it per use.
        return self._base_mont(beta)

    def is_identity(self, p: Projective):
        return self.f.is_zero(p.z)

    # -- scalar multiplication -------------------------------------------------
    def scalar_mul(self, p: Projective, scalar_bits_msb_first) -> Projective:
        """Double-and-add over a (nbits,) uint32 bit array (MSB first).

        lax.scan keeps one dbl + one add in the graph regardless of bit count.
        """
        def body(acc, bit):
            acc = self.dbl(acc)
            acc_added = self.add(acc, p)
            return pselect(bit.astype(bool), acc_added, acc), None

        batch = p.x.shape[:-1]
        out, _ = jax.lax.scan(body, self.identity(batch), scalar_bits_msb_first)
        return out

    def scalar_mul_int(self, p: Projective, k: int) -> Projective:
        nbits = max(k.bit_length(), 1)
        bits = jnp.array([(k >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                         dtype=jnp.uint32)
        return self.scalar_mul(p, bits)

    # -- boundary conversions ---------------------------------------------------
    def from_affine_canonical(self, x, y) -> Projective:
        """Canonical-form affine coordinate tensors -> Montgomery projective.

        Treats (0, 0) as the identity (matches the reference's Affine zero
        convention, curves/affine.h).
        """
        fq = self.coord_field
        xm, ym = fq.to_mont(x), fq.to_mont(y)
        is_inf = self.f.is_zero(x) & self.f.is_zero(y)
        shape = x.shape
        ident = self.identity(shape[:-1])
        pt = Projective(xm, ym, jnp.broadcast_to(self.one_mont, shape))
        return pselect(is_inf, ident, pt)

    def to_affine_canonical(self, p: Projective):
        """Montgomery projective -> canonical affine (x, y); identity -> (0,0).

        One Fermat inversion (runs as a scan of ~2·bits montmuls).
        """
        fq = self.coord_field
        z_can = fq.from_mont(p.z)
        zinv = fq.inv(z_can)  # canonical-domain inverse; 0 -> 0
        zinv_m = fq.to_mont(zinv)
        x = fq.from_mont(self.f.mul_mont(p.x, zinv_m))
        y = fq.from_mont(self.f.mul_mont(p.y, zinv_m))
        return x, y


_GROUPS: dict[tuple[str, bool], Group] = {}


def get_group(curve_name: str, g2: bool = False) -> Group:
    key = (curve_name, g2)
    if key not in _GROUPS:
        _GROUPS[key] = Group(get_curve(curve_name), g2=g2)
    return _GROUPS[key]

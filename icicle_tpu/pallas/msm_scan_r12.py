"""Radix-2^12 variant of the MSM v3 prefix-scan kernel.

Reference algorithm: Pippenger bucket accumulation
(backend/cpu/src/curve/cpu_msm.hpp phases 1-3). Same pipeline contract as
pallas/msm_scan.py (v3), but the in-kernel field arithmetic runs on the
signed radix-2^12 engine (math/radix12.py) instead of 16-bit split-product
u32 limbs:

  - no per-product masking (i32 products of 12/13-bit words accumulate raw),
  - no conditional subtracts (values live in a signed (-2p, 2p) window),
  - adds/subs are PLAIN wordwise ops (no carry ripple, no select).

Per-madd op count drops ~25-30% vs the 16-bit core, at the price of ~1.9x
the i32 multiplies — which engine wins on hardware depends on the VPU's
mul:add throughput ratio (tools/vpu_probe.py measures it; the pipeline flag
ICICLE_TPU_MSM_ENGINE picks the kernel).

Domain contract: all kernel I/O is u32 limbs in the R' = 2^(12*nw)
Montgomery domain (NOT the BigField 2^(32L) domain). ops/msm_tpu3.py shifts
points into R' at prep time and shifts extracted buckets back — both are
one BigField montmul by a power-of-two constant, O(n) and O(M) work vs the
kernel's O(n*W).

Every montmul in the mixed add is guarded by a trace-time worst-case i32
column audit (`Radix12.audit_mul`) driven by static word bounds, so an
overflowing schedule cannot compile.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icicle_tpu.curves.params import get_curve
from icicle_tpu.math.radix12 import Radix12, int_to_words
from icicle_tpu.pallas.msm_kernel import _b3_small


class _BVal:
    """A field value as (signed words, static per-word abs bound)."""

    __slots__ = ("w", "b")

    def __init__(self, w, b: int):
        self.w = w
        self.b = b


class _R12Field:
    """Bound-tracked radix-12 ops on lists of (G,)-shaped i32 arrays."""

    def __init__(self, eng: Radix12):
        self.eng = eng
        self.NORM = (1 << 12) - 1

    def add(self, a: _BVal, b: _BVal) -> _BVal:
        return _BVal(self.eng.add(a.w, b.w), a.b + b.b)

    def sub(self, a: _BVal, b: _BVal) -> _BVal:
        return _BVal(self.eng.sub(a.w, b.w), a.b + b.b)

    def norm(self, a: _BVal) -> _BVal:
        return _BVal(self.eng.norm(a.w), self.NORM)

    def mul(self, a: _BVal, b: _BVal) -> _BVal:
        """Montgomery mul with trace-time overflow audit. Operand laziness
        budgets shrink with field size (columns hold nw products), so when
        the audit fails the larger-bound operand is carry-normalized first —
        a deterministic, field-dependent schedule decided at trace time."""
        while True:
            try:
                self.eng.audit_mul(a.b, b.b)
                break
            except OverflowError:
                if a.b <= self.NORM and b.b <= self.NORM:
                    raise
                if a.b >= b.b:
                    a = self.norm(a)
                else:
                    b = self.norm(b)
        return _BVal(self.eng.mul_mont(a.w, b.w), self.NORM)

    def mul_small(self, a: _BVal, k: int) -> _BVal:
        assert abs(k) * a.b < (1 << 31)
        return self.norm(_BVal(self.eng.mul_small(a.w, k), abs(k) * a.b))


def _madd_r12(f: _R12Field, X1, Y1, Z1, x2, y2, b3):
    """Complete mixed add (RCB15 Alg 8, a=0) over bound-tracked radix-12
    values. State (X1,Y1,Z1) may be lazy-1 (<= 2^13 words); the affine
    point (x2,y2) must be normalized. Output coords are lazy-1.

    b3: small python int, or a normalized _BVal constant.
    """
    m, add, sub = f.mul, f.add, f.sub
    mb3 = (lambda v: f.mul_small(v, b3)) if isinstance(b3, int) \
        else (lambda v: m(v, b3))
    t0 = m(X1, x2)
    t1 = m(Y1, y2)
    t3 = sub(m(f.norm(add(X1, Y1)), add(x2, y2)), add(t0, t1))
    t4 = add(m(y2, Z1), Y1)
    y3 = add(m(x2, Z1), X1)
    t0 = add(add(t0, t0), t0)
    t2 = mb3(Z1)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = mb3(y3)
    t3 = f.norm(t3)
    t4 = f.norm(t4)
    x3 = sub(m(t3, t1), m(t4, y3))
    y3 = add(m(t1, z3), m(y3, t0))
    z3 = add(m(z3, t4), m(t0, t3))
    return x3, y3, z3


def _consts_r12(curve_name: str):
    """(b3_or_None_smallint, b3_u32_row, one_u32_row, nl, eng) in R'."""
    curve = get_curve(curve_name)
    fq = curve.fq
    p, nl = fq.modulus, fq.nlimbs
    eng = Radix12(p)

    def u32row(v: int) -> np.ndarray:
        return np.array([(v >> (32 * i)) & 0xFFFFFFFF for i in range(nl)],
                        dtype=np.uint32)

    b3s = _b3_small(curve)
    rp = eng.R % p
    return (b3s, u32row(curve.b3 * rp % p), u32row(rp), nl, eng)


def make_prefix_scan_r12(curve_name: str, K: int, C: int,
                         G: int | None = None):
    """Radix-12 twin of msm_scan.make_prefix_scan. Same shapes:

    invoke(plimbs (n_groups, K, 2L, G) u32, R'-domain Montgomery, y signed)
      -> E-stream (n_groups, K, 3L, G) u32, R'-domain, values in [0, 4p).
    """
    b3s, b3_np, one_np, nl, eng = _consts_r12(curve_name)
    f = _R12Field(eng)
    nw = eng.nw
    G = G or next((g for g in (1024, 512, 256, 128) if C % g == 0), C)
    assert C % G == 0 and G <= 1024
    n_groups = C // G
    LAZY1 = 2 * f.NORM

    def kernel(consts_ref, pl_ref, e_ref, Ex, Ey, Ez):
        k = pl.program_id(1)
        x2 = _BVal(eng.from_u32([pl_ref[0, 0, i, :] for i in range(nl)]),
                   f.NORM)
        y2 = _BVal(eng.from_u32([pl_ref[0, 0, nl + i, :] for i in range(nl)]),
                   f.NORM)
        if b3s is not None:
            b3 = b3s
        else:
            b3 = _BVal(eng.from_u32(
                [jnp.broadcast_to(consts_ref[0, i], (G,)) for i in range(nl)]),
                f.NORM)
        one_w = eng.from_u32(
            [jnp.broadcast_to(consts_ref[1, i], (G,)) for i in range(nl)])

        @pl.when(k == 0)
        def _():
            for i in range(nw):
                Ex[i, :] = jnp.zeros((G,), jnp.int32)
                Ey[i, :] = one_w[i]
                Ez[i, :] = jnp.zeros((G,), jnp.int32)

        X1 = _BVal([Ex[i, :] for i in range(nw)], LAZY1)
        Y1 = _BVal([Ey[i, :] for i in range(nw)], LAZY1)
        Z1 = _BVal([Ez[i, :] for i in range(nw)], LAZY1)
        ex, ey, ez = _madd_r12(f, X1, Y1, Z1, x2, y2, b3)
        for i in range(nw):
            Ex[i, :] = ex.w[i]
            Ey[i, :] = ey.w[i]
            Ez[i, :] = ez.w[i]
        for j, v in enumerate((ex, ey, ez)):
            u = eng.to_u32(eng.norm(eng.canon_nonneg(v.w)), nl)
            for i in range(nl):
                e_ref[0, 0, j * nl + i, :] = u[i]

    in_spec = pl.BlockSpec((1, 1, 2 * nl, G), lambda g, k: (g, k, 0, 0),
                           memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((2, nl), lambda g, k: (0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, 3 * nl, G), lambda g, k: (g, k, 0, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n_groups, K, 3 * nl, G), jnp.uint32)

    call = pl.pallas_call(
        kernel,
        grid=(n_groups, K),
        in_specs=[const_spec, in_spec],
        out_specs=out_spec,
        out_shape=out_sds,
        scratch_shapes=[pltpu.VMEM((nw, G), jnp.int32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    consts = jnp.asarray(np.stack([b3_np, one_np]))

    def invoke(plimbs):
        return call(consts, plimbs)

    return invoke


def make_prefix_scan_r12_xla(curve_name: str, K: int, C: int):
    """lax.scan twin of the radix-12 kernel (CPU tests / fallback).

    Bit-identical I/O contract to make_prefix_scan_r12 with n_groups kept:
    (ng, K, 2L, C/ng) u32 -> (ng, K, 3L, C/ng) u32 in [0, 4p), R' domain.
    """
    b3s, b3_np, one_np, nl, eng = _consts_r12(curve_name)
    f = _R12Field(eng)
    nw = eng.nw
    LAZY1 = 2 * f.NORM
    b3_c = jnp.asarray(b3_np)
    one_c = jnp.asarray(one_np)

    def invoke(plimbs):
        ng, _, _, g = plimbs.shape
        lanes = ng * g
        full = jnp.transpose(plimbs, (1, 0, 3, 2)).reshape(
            plimbs.shape[1], lanes, 2 * nl)                   # (K, lanes, 2L)
        one_w = eng.from_u32([jnp.broadcast_to(one_c[i], (lanes,))
                              for i in range(nl)])
        if b3s is not None:
            b3 = b3s
        else:
            b3 = _BVal(eng.from_u32([jnp.broadcast_to(b3_c[i], (lanes,))
                                     for i in range(nl)]), f.NORM)
        zero = [jnp.zeros((lanes,), jnp.int32) for _ in range(nw)]

        def body(state, row):
            ex, ey, ez = state
            x2 = _BVal(eng.from_u32([row[:, i] for i in range(nl)]), f.NORM)
            y2 = _BVal(eng.from_u32([row[:, nl + i] for i in range(nl)]),
                       f.NORM)
            nx, ny, nz = _madd_r12(
                f, _BVal(ex, LAZY1), _BVal(ey, LAZY1), _BVal(ez, LAZY1),
                x2, y2, b3)
            out = []
            for v in (nx, ny, nz):
                out.extend(eng.to_u32(eng.norm(eng.canon_nonneg(v.w)), nl))
            return ((nx.w, ny.w, nz.w),
                    jnp.stack(out, axis=-1))                  # (lanes, 3L)

        _, estream = jax.lax.scan(body, (zero, one_w, zero), full)
        out = estream.reshape(K, ng, g, 3 * nl)
        return jnp.transpose(out, (1, 0, 3, 2))               # (ng,K,3L,g)

    return invoke

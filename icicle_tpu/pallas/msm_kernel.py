"""Pallas TPU kernel for MSM bucket accumulation (the Pippenger hot phase).

Reference algorithm: backend/cpu/src/curve/cpu_msm.hpp phase1 (per-worker
signed-digit bucket accumulation). TPU redesign: after sorting each window's
points by |digit|, the accumulation is a *segmented running fold* — and the
natural TPU shape for that is lane-parallel chunking:

  * the sorted stream is laid out (K, C): C lanes (multiples of 128), each
    lane owning a contiguous K-element chunk of the sorted order;
  * coordinates are stored limb-FIRST, (L, C): the limb index sits on the
    8-sublane axis and the C point lanes fill the 128-lane axis, so every
    16-bit partial product is a full-width VPU op;
  * ONE Pallas grid step performs a complete mixed-add (Renes-Costello-Batina
    2015 Alg 8, 13 montmuls) of a row of points into C VMEM-resident
    accumulators, with a per-lane segment-reset select;
  * the multiply pipeline (16x16->32 comba + CIOS REDC) is straight-line code
    inside the kernel body — Mosaic fuses it into tight VPU code with no
    per-op dispatch (the XLA-graph lowering of the same math needs >25 min
    compiles or 13 us-per-primitive loop overhead).

Cross-lane stitching (buckets spanning chunk boundaries) and the weighted
bucket reduction run in XLA around the kernel (ops/msm_tpu.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icicle_tpu.curves.params import get_curve
from icicle_tpu.math.bigint import _add_limbs, _sub_limbs, _select, _split16
from icicle_tpu.math.u32 import MASK16


class _ListField:
    """Modular ops on lists of per-limb (C,)-shaped uint32 arrays (limb-first
    layout). Reuses the BigField comba/REDC cores, which are list-based."""

    def __init__(self, eng):
        self.eng = eng
        self.p32 = eng.p32  # list of np.uint32

    def _bp(self, like):
        return [jnp.broadcast_to(jnp.uint32(v), like.shape) for v in self.p32]

    def add(self, a, b):
        s, carry = _add_limbs(a, b)
        d, borrow = _sub_limbs(s, self._bp(s[0]))
        return _select((carry > 0) | (borrow == 0), d, s)

    def sub(self, a, b):
        d, borrow = _sub_limbs(a, b)
        dp, _ = _add_limbs(d, self._bp(d[0]))
        return _select(borrow > 0, dp, d)

    def mul_mont(self, a, b):
        return self.eng._mont_fused16(_split16(a), _split16(b))

    def mul_small(self, x, k: int):
        """k*x (mod p) for a small signed python int k by double-and-add:
        |k| <= ~64 costs a handful of mod-adds vs a full montmul. Used for
        the b3 = 3b curve constant in the RCB15 formulas (b3 is 9/3/12/-3/
        -51 on the supported curves)."""
        assert k != 0
        neg = k < 0
        k = abs(k)
        acc = x
        for bit in bin(k)[3:]:
            acc = self.add(acc, acc)
            if bit == "1":
                acc = self.add(acc, x)
        if neg:
            acc = self.sub([jnp.zeros_like(v) for v in x], acc)
        return acc


def _b3_small(curve) -> int | None:
    """b3 as a small signed int if |b3 mod p| (centered) is tiny, else None."""
    p = curve.fq.modulus
    b = curve.b3 if curve.b3 < p // 2 else curve.b3 - p
    return int(b) if abs(b) <= 1 << 20 else None


def _madd_list(f: _ListField, X1, Y1, Z1, x2, y2, b3):
    """Complete mixed add, RCB15 Alg 8 (a=0), on limb lists. 13 montmuls,
    or 11 + two mod-add chains when b3 is passed as a small python int."""
    m, add, sub = f.mul_mont, f.add, f.sub
    mb3 = (lambda v: f.mul_small(v, b3)) if isinstance(b3, int) \
        else (lambda v: m(b3, v))
    t0 = m(X1, x2)
    t1 = m(Y1, y2)
    t3 = sub(m(add(X1, Y1), add(x2, y2)), add(t0, t1))
    t4 = add(m(y2, Z1), Y1)
    y3 = add(m(x2, Z1), X1)
    t0 = add(add(t0, t0), t0)
    t2 = mb3(Z1)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = mb3(y3)
    x3 = sub(m(t3, t1), m(t4, y3))
    y3 = add(m(t1, z3), m(y3, t0))
    z3 = add(m(z3, t4), m(t0, t3))
    return x3, y3, z3


@functools.lru_cache(maxsize=None)
def _kernel_consts(curve_name: str):
    curve = get_curve(curve_name)
    fq = curve.fq
    r, p, nl = fq.params.r, fq.modulus, fq.nlimbs

    def mont(v: int) -> np.ndarray:
        vm = (v * r) % p
        return np.array([(vm >> (32 * i)) & 0xFFFFFFFF for i in range(nl)],
                        dtype=np.uint32)

    return mont(curve.b3), mont(1), nl


def make_bucket_accum(curve_name: str, n_windows: int, k_steps: int,
                      lanes: int):
    """Build the bucket-accumulation call.

    invoke(keys (W, K, C) int32, px, py (W, K, C, L) u32 Montgomery, y signed)
      -> vx, vy, vz (W, K, C, L): per-position inclusive segmented fold.
    Layout transposes to/from the kernel's limb-first form happen inside.
    """
    curve = get_curve(curve_name)
    eng = curve.fq.engine
    f = _ListField(eng)
    b3_np, one_np, nl = _kernel_consts(curve_name)
    C = lanes
    W, K = n_windows, k_steps

    def kernel(consts_ref, keys_ref, px_ref, py_ref,
               vx_ref, vy_ref, vz_ref, accx, accy, accz, ck):
        k = pl.program_id(1)
        keys = keys_ref[0, 0, 0, :]                       # (C,)
        x2 = [px_ref[0, 0, i, :] for i in range(nl)]      # limb lists of (C,)
        y2 = [py_ref[0, 0, i, :] for i in range(nl)]
        b3 = [jnp.broadcast_to(consts_ref[0, i], (C,)) for i in range(nl)]
        one = [jnp.broadcast_to(consts_ref[1, i], (C,)) for i in range(nl)]

        @pl.when(k == 0)
        def _():
            for i in range(nl):
                accx[i, :] = x2[i]
                accy[i, :] = y2[i]
                accz[i, :] = one[i]
            ck[0, :] = keys

        @pl.when(k != 0)
        def _():
            X1 = [accx[i, :] for i in range(nl)]
            Y1 = [accy[i, :] for i in range(nl)]
            Z1 = [accz[i, :] for i in range(nl)]
            x3, y3, z3 = _madd_list(f, X1, Y1, Z1, x2, y2, b3)
            is_new = keys != ck[0, :]
            for i in range(nl):
                accx[i, :] = jnp.where(is_new, x2[i], x3[i])
                accy[i, :] = jnp.where(is_new, y2[i], y3[i])
                accz[i, :] = jnp.where(is_new, one[i], z3[i])
            ck[0, :] = keys

        for i in range(nl):
            vx_ref[0, 0, i, :] = accx[i, :]
            vy_ref[0, 0, i, :] = accy[i, :]
            vz_ref[0, 0, i, :] = accz[i, :]

    coord_spec = pl.BlockSpec((1, 1, nl, C), lambda w, k: (w, k, 0, 0),
                              memory_space=pltpu.VMEM)
    key_spec = pl.BlockSpec((1, 1, 1, C), lambda w, k: (w, k, 0, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((2, nl), lambda w, k: (0, 0),
                              memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((W, K, nl, C), jnp.uint32)

    call = pl.pallas_call(
        kernel,
        grid=(W, K),
        in_specs=[const_spec, key_spec, coord_spec, coord_spec],
        out_specs=(coord_spec, coord_spec, coord_spec),
        out_shape=(out_sds, out_sds, out_sds),
        scratch_shapes=[
            pltpu.VMEM((nl, C), jnp.uint32),
            pltpu.VMEM((nl, C), jnp.uint32),
            pltpu.VMEM((nl, C), jnp.uint32),
            pltpu.VMEM((1, C), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    consts = jnp.asarray(np.stack([b3_np, one_np]))

    def invoke(keys, px, py):
        # (W, K, C[, L]) caller layout -> limb-first kernel layout
        kk = keys[:, :, None, :]
        pxt = jnp.swapaxes(px, -1, -2)       # (W, K, L, C)
        pyt = jnp.swapaxes(py, -1, -2)
        vx, vy, vz = call(consts, kk, pxt, pyt)
        back = lambda v: jnp.swapaxes(v, -1, -2)   # -> (W, K, C, L)
        return back(vx), back(vy), back(vz)

    return invoke


def make_bucket_accum_xla(curve_name: str, n_windows: int, k_steps: int,
                          lanes: int):
    """XLA lax.scan lowering of the same (W, K, C) fold semantics.

    The reference path for CPU tests (interpret-mode Pallas is impractically
    slow for a body this size) and the fallback when Pallas is unavailable.
    Uses the loop-form montmul so the graph stays small.
    """
    from icicle_tpu.curves.group import get_group, pselect, Projective, Affine, pmadd

    group = get_group(curve_name)
    nl = get_curve(curve_name).fq.nlimbs
    C = lanes

    def invoke(keys, px, py):
        # inputs (W, K, C[, L]) -> scan over K with (W, C)-batched state
        one_b = jnp.broadcast_to(group.one_mont, (n_windows, C, nl))

        def body(carry, row):
            accx, accy, accz, ck = carry
            kr, x2, y2 = row       # (W, C), (W, C, L), (W, C, L)
            acc = Projective(accx, accy, accz)
            comb = pmadd(group.f, acc, Affine(x2, y2), group.b3_mont)
            is_new = (kr != ck)
            newp = pselect(is_new, Projective(x2, y2, one_b), comb)
            return (newp.x, newp.y, newp.z, kr), (newp.x, newp.y, newp.z)

        k0 = keys[:, 0]
        x0, y0 = px[:, 0], py[:, 0]
        init = (x0, y0, one_b, k0)
        rows = (jnp.moveaxis(keys[:, 1:], 1, 0),
                jnp.moveaxis(px[:, 1:], 1, 0),
                jnp.moveaxis(py[:, 1:], 1, 0))
        if k_steps > 1:
            _, outs = jax.lax.scan(body, init, rows)
            vx = jnp.concatenate([x0[None], outs[0]], axis=0)
            vy = jnp.concatenate([y0[None], outs[1]], axis=0)
            vz = jnp.concatenate([one_b[None], outs[2]], axis=0)
        else:
            vx, vy, vz = x0[None], y0[None], one_b[None]
        # axis order: (K, W, C, L) -> (W, K, C, L)
        return (jnp.moveaxis(vx, 0, 1), jnp.moveaxis(vy, 0, 1),
                jnp.moveaxis(vz, 0, 1))

    return invoke

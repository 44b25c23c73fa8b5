"""Pallas TPU kernel for the suffix-fold MSM bucket phase (pipeline v2).

Reference algorithm: Pippenger bucket accumulation + weighted bucket
reduction (backend/cpu/src/curve/cpu_msm.hpp phases 1-3). TPU redesign that
eliminates every random-access step (sorts with payloads, row gathers,
scatters, dense bucket arrays) measured to run at ~2 GB/s on TPU:

The window sum  sum_k k*B_k  over buckets k=1..M equals

    sum_{j=1..M} S_j,   S_j = sum of points whose |digit| >= j,

and on a key-DESCENDING sorted stream that contains every key 1..M at least
once (guaranteed by M dummy identity elements), S_j = E_{t_j} where E_t is
the running prefix sum of the descending stream and t_j is the last slot of
key j's run. So ONE sequential pass with two accumulators per lane

    E += P_t                      (complete mixed add)
    D += E   if t ends a key-run  (complete projective add)

yields the whole weighted window sum. Each kernel lane owns one tile's
stream; the per-tile sums combine by a log-depth roll-scan add tree in XLA —
no bucket arrays exist at all.

Layouts: the kernel consumes (n_groups, K, 8L+8, G) bf16 — permuted
Montgomery coordinate BYTES (one-hot-matmul output, assembled into u32
limbs in VMEM) with a packed flag word in row 8L — with lanes in contiguous
<=1024-wide groups. Montgomery form throughout; the montmul bodies are
straight-line comba/CIOS from math/bigint.py, fused by Mosaic into VPU
code.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icicle_tpu.curves.params import get_curve
from icicle_tpu.math.bigint import _sub_limbs
from icicle_tpu.pallas.msm_kernel import (_ListField, _madd_list,
                                          _kernel_consts, _b3_small)


def _padd_list(f: _ListField, X1, Y1, Z1, X2, Y2, Z2, b3):
    """Complete projective add, RCB15 Alg 7 (a=0), on limb lists: 14
    montmuls, or 12 + two mod-add chains for small-int b3."""
    m, add, sub = f.mul_mont, f.add, f.sub
    mb3 = (lambda v: f.mul_small(v, b3)) if isinstance(b3, int) \
        else (lambda v: m(b3, v))
    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t2 = m(Z1, Z2)
    t3 = sub(m(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(m(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    y3 = sub(m(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    t0 = add(add(t0, t0), t0)
    t2 = mb3(t2)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = mb3(y3)
    x3 = sub(m(t3, t1), m(t4, y3))
    y3 = add(m(t1, z3), m(y3, t0))
    z3 = add(m(z3, t4), m(t0, t3))
    return x3, y3, z3


def _sel(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def make_suffix_fold(curve_name: str, K: int, C: int, G: int | None = None):
    """Build the suffix-fold kernel.

    invoke(pbytes (n_groups, K, 8L+8, G) bf16: Montgomery coordinate bytes
           (x||y) in rows 0..8L-1, the flag word in row 8L (bit0=is_real,
           bit1=is_dacc, bit2=negate_y; exact in bf16), rows 8L+1.. pad the
           sublane tiling)
      -> (Dx, Dy, Dz) each (L, C) u32: the per-tile weighted window sums
         (lane = g*G + lane_in_group).
    Byte->limb assembly and y-negation happen IN-KERNEL: the XLA passes that
    did them (unpack + select + stack + a whole-array transpose) were ~2x
    the kernel's own runtime. Cross-tile reduction happens in XLA (a log-C
    roll-scan costs one add instance in the graph; unrolling it here blew up
    Mosaic compile time).

    Lanes are processed in groups of <= 1024 (exactly one (8, 128) vreg per
    per-limb temp): the straight-line comba keeps ~60 temps live, so wider
    lane vectors spill the register file and thrash VMEM. The group axis
    LEADS the layout so every per-step block DMA is contiguous.
    """
    curve = get_curve(curve_name)
    eng = curve.fq.engine
    f = _ListField(eng)
    b3_np, one_np, nl = _kernel_consts(curve_name)
    b3_int = _b3_small(curve)
    p32 = [int(v) for v in eng.p32]
    G = G or lane_group(C)
    assert C % G == 0 and G <= 1024
    n_groups = C // G

    def kernel(consts_ref, pb_ref, dxo, dyo, dzo,
               Ex, Ey, Ez, Dx, Dy, Dz):
        k = pl.program_id(1)

        def byte_u32(row):
            # Mosaic has no bf16->u32 cast; bf16 -> f32 -> i32 -> u32 (all
            # values 0..255, exact)
            return pb_ref[0, 0, row, :].astype(jnp.float32).astype(
                jnp.int32).astype(jnp.uint32)

        def limb(i):
            return (byte_u32(4 * i) | (byte_u32(4 * i + 1) << 8)
                    | (byte_u32(4 * i + 2) << 16)
                    | (byte_u32(4 * i + 3) << 24))

        x2 = [limb(i) for i in range(nl)]
        yraw = [limb(nl + i) for i in range(nl)]
        fl = pb_ref[0, 0, 8 * nl, :].astype(jnp.float32).astype(jnp.int32)
        is_real = (fl & 1) != 0
        is_dacc = (fl & 2) != 0
        neg_y = (fl & 4) != 0
        # y -> p - y on negated lanes (borrow-free: 0 < y < p for reals;
        # dummies never set the bit)
        pc = [jnp.full((G,), jnp.uint32(v)) for v in p32]
        yneg, _ = _sub_limbs(pc, yraw)
        y2 = [jnp.where(neg_y, a, b) for a, b in zip(yneg, yraw)]
        b3 = b3_int if b3_int is not None else [
            jnp.broadcast_to(consts_ref[0, i], (G,)) for i in range(nl)]
        one = [jnp.broadcast_to(consts_ref[1, i], (G,)) for i in range(nl)]
        zero = [jnp.zeros((G,), jnp.uint32) for _ in range(nl)]

        @pl.when(k == 0)
        def _():
            for i in range(nl):
                Ex[i, :] = zero[i]
                Ey[i, :] = one[i]
                Ez[i, :] = zero[i]
                Dx[i, :] = zero[i]
                Dy[i, :] = one[i]
                Dz[i, :] = zero[i]

        E = ([Ex[i, :] for i in range(nl)], [Ey[i, :] for i in range(nl)],
             [Ez[i, :] for i in range(nl)])
        ex, ey, ez = _madd_list(f, E[0], E[1], E[2], x2, y2, b3)
        ex = _sel(is_real, ex, E[0])
        ey = _sel(is_real, ey, E[1])
        ez = _sel(is_real, ez, E[2])
        for i in range(nl):
            Ex[i, :] = ex[i]
            Ey[i, :] = ey[i]
            Ez[i, :] = ez[i]

        D = ([Dx[i, :] for i in range(nl)], [Dy[i, :] for i in range(nl)],
             [Dz[i, :] for i in range(nl)])
        dx, dy, dz = _padd_list(f, D[0], D[1], D[2], ex, ey, ez, b3)
        dx = _sel(is_dacc, dx, D[0])
        dy = _sel(is_dacc, dy, D[1])
        dz = _sel(is_dacc, dz, D[2])
        for i in range(nl):
            Dx[i, :] = dx[i]
            Dy[i, :] = dy[i]
            Dz[i, :] = dz[i]

        @pl.when(k == K - 1)
        def _():
            for i in range(nl):
                dxo[0, i, :] = Dx[i, :]
                dyo[0, i, :] = Dy[i, :]
                dzo[0, i, :] = Dz[i, :]

    pb_spec = pl.BlockSpec((1, 1, 8 * nl + 8, G), lambda g, k: (g, k, 0, 0),
                           memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((2, nl), lambda g, k: (0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nl, G), lambda g, k: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n_groups, nl, G), jnp.uint32)

    call = pl.pallas_call(
        kernel,
        grid=(n_groups, K),
        in_specs=[const_spec, pb_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_sds, out_sds, out_sds),
        scratch_shapes=[pltpu.VMEM((nl, G), jnp.uint32) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    consts = jnp.asarray(np.stack([b3_np, one_np]))

    def invoke(pbytes):
        dx, dy, dz = call(consts, pbytes)
        back = lambda a: jnp.transpose(a, (1, 0, 2)).reshape(nl, C)
        return back(dx), back(dy), back(dz)

    return invoke


def lane_group(C: int) -> int:
    return next((g for g in (1024, 512, 256, 128) if C % g == 0), C)


def make_suffix_fold_xla(curve_name: str, K: int, C: int):
    """lax.scan lowering of the same fold semantics (CPU tests / fallback).

    Uses the loop-form montmul so the graph stays small on compile-bound
    hosts; math identical to the Mosaic kernel.
    """
    from icicle_tpu.curves.group import get_group, Projective, Affine, pselect

    group = get_group(curve_name)
    nl = get_curve(curve_name).fq.nlimbs

    fq = get_curve(curve_name).fq
    f = fq.engine

    def invoke(pbytes):
        # (n_groups, K, 8L+8, G) bf16 bytes+flags -> (K, C, ...) canonical
        # layout arrays, then scan over K
        K_ = pbytes.shape[1]
        full = jnp.transpose(pbytes, (1, 0, 3, 2)).reshape(
            K_, C, -1)                               # (K, C, 8L+8)
        bu = full[..., :8 * nl].astype(jnp.uint32)
        fl = full[..., 8 * nl].astype(jnp.int32)     # (K, C)
        b4 = bu.reshape(K_, C, 2 * nl, 4)
        limbs = (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
                 | (b4[..., 3] << 24))               # (K, C, 2L)
        xs = limbs[..., :nl]
        ys = limbs[..., nl:]
        ys = jnp.where(((fl & 4) != 0)[..., None], f.neg(ys), ys)
        ident = group.identity((C,))

        def body(carry, row):
            E, D = carry
            xr, yr, fr = row                       # (C, L), (C, L), (C,)
            P = Affine(xr, yr)
            is_real = (fr & 1) != 0
            is_dacc = (fr & 2) != 0
            Enew = group.madd(E, P)
            E = pselect(is_real, Enew, E)
            Dnew = group.add(D, Projective(E.x, E.y, E.z))
            D = pselect(is_dacc, Dnew, D)
            return (E, D), None

        (_, D), _ = jax.lax.scan(body, (ident, ident), (xs, ys, fl))
        to_lc = lambda a: a.T                      # (C, L) -> (L, C)
        return to_lc(D.x), to_lc(D.y), to_lc(D.z)

    return invoke

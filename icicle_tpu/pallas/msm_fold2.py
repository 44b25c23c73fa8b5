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

Layouts: coordinates are (K, L, C) uint32 (limb-major rows; C = tiles on the
128-lane axis), flags (K, 2, C) int32 [is_real; is_d_accum]. Montgomery form
throughout; the montmul bodies are straight-line comba/CIOS from
math/bigint.py, fused by Mosaic into VPU code.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icicle_tpu.curves.params import get_curve
from icicle_tpu.pallas.msm_kernel import _ListField, _madd_list, _kernel_consts


def _padd_list(f: _ListField, X1, Y1, Z1, X2, Y2, Z2, b3):
    """Complete projective add, RCB15 Alg 7 (a=0), on limb lists: 14 montmuls."""
    m, add, sub = f.mul_mont, f.add, f.sub
    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t2 = m(Z1, Z2)
    t3 = sub(m(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(m(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    y3 = sub(m(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    t0 = add(add(t0, t0), t0)
    t2 = m(b3, t2)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = m(b3, y3)
    x3 = sub(m(t3, t1), m(t4, y3))
    y3 = add(m(t1, z3), m(y3, t0))
    z3 = add(m(z3, t4), m(t0, t3))
    return x3, y3, z3


def _sel(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def make_suffix_fold(curve_name: str, K: int, C: int):
    """Build the suffix-fold kernel.

    invoke(xs, ys (n_groups, K, L, G) u32 Montgomery,
           flags (n_groups, K, 2, G) i32)
      -> (Dx, Dy, Dz) each (L, C) u32: the per-tile weighted window sums
         (lane = g*G + lane_in_group).
    Cross-tile reduction happens in XLA (a log-C roll-scan costs one add
    instance in the graph; unrolling it here blew up Mosaic compile time).

    Lanes are processed in groups of <= 1024 (exactly one (8, 128) vreg per
    per-limb temp): the straight-line comba keeps ~60 temps live, so wider
    lane vectors spill the register file and thrash VMEM. The group axis
    LEADS the layout so every per-step block DMA is contiguous.
    """
    curve = get_curve(curve_name)
    eng = curve.fq.engine
    f = _ListField(eng)
    b3_np, one_np, nl = _kernel_consts(curve_name)
    G = lane_group(C)
    n_groups = C // G

    def kernel(consts_ref, x_ref, y_ref, f_ref, dxo, dyo, dzo,
               Ex, Ey, Ez, Dx, Dy, Dz):
        k = pl.program_id(1)
        x2 = [x_ref[0, 0, i, :] for i in range(nl)]
        y2 = [y_ref[0, 0, i, :] for i in range(nl)]
        b3 = [jnp.broadcast_to(consts_ref[0, i], (G,)) for i in range(nl)]
        one = [jnp.broadcast_to(consts_ref[1, i], (G,)) for i in range(nl)]
        zero = [jnp.zeros((G,), jnp.uint32) for _ in range(nl)]
        is_real = f_ref[0, 0, 0, :] != 0
        is_dacc = f_ref[0, 0, 1, :] != 0

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

    coord_spec = pl.BlockSpec((1, 1, nl, G), lambda g, k: (g, k, 0, 0),
                              memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((1, 1, 2, G), lambda g, k: (g, k, 0, 0),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((2, nl), lambda g, k: (0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nl, G), lambda g, k: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((n_groups, nl, G), jnp.uint32)

    call = pl.pallas_call(
        kernel,
        grid=(n_groups, K),
        in_specs=[const_spec, coord_spec, coord_spec, flag_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_sds, out_sds, out_sds),
        scratch_shapes=[pltpu.VMEM((nl, G), jnp.uint32) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    consts = jnp.asarray(np.stack([b3_np, one_np]))

    def invoke(xs, ys, flags):
        dx, dy, dz = call(consts, xs, ys, flags)
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

    def invoke(xs, ys, flags):
        # (n_groups, K, L, G) group-major layout -> (K, L, C), then scan
        # over K with (C, L)-batched state
        G = xs.shape[-1]
        K_ = xs.shape[1]
        to_klc = lambda a, w: jnp.transpose(a, (1, 2, 0, 3)).reshape(
            K_, w, C)
        xs = to_klc(xs, xs.shape[2])
        ys = to_klc(ys, ys.shape[2])
        flags = to_klc(flags, 2)
        ident = group.identity((C,))

        def body(carry, row):
            E, D = carry
            xr, yr, fr = row                       # (L, C), (L, C), (2, C)
            P = Affine(xr.T, yr.T)                 # (C, L)
            is_real = fr[0] != 0
            is_dacc = fr[1] != 0
            Enew = group.madd(E, P)
            E = pselect(is_real, Enew, E)
            Dnew = group.add(D, Projective(E.x, E.y, E.z))
            D = pselect(is_dacc, Dnew, D)
            return (E, D), None

        (_, D), _ = jax.lax.scan(body, (ident, ident), (xs, ys, flags))
        to_lc = lambda a: a.T                      # (C, L) -> (L, C)
        return to_lc(D.x), to_lc(D.y), to_lc(D.z)

    return invoke

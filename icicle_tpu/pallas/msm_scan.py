"""Pallas TPU kernel for the MSM v3 prefix-scan bucket phase.

Reference algorithm: Pippenger bucket accumulation + weighted reduction
(backend/cpu/src/curve/cpu_msm.hpp phases 1-3). Third TPU redesign:

v2 (pallas/msm_fold2.py) fused the weighted window sum into the kernel with
TWO accumulators per lane (E += P every slot, D += E at key-run ends). The
padd + selects for D are ~14 of the 27 montmuls per slot but fire usefully
on only ~M of T+M slots. v3 removes D from the kernel entirely:

  - the kernel is a pure running-prefix scan: E += P (complete mixed add,
    13 montmuls) for EVERY slot, unconditionally — no flags, no selects —
    and streams E back to HBM per slot;
  - run-end prefixes (= bucket suffix sums S_j) are then EXTRACTED in XLA
    by a one-hot matmul over the E-stream bytes on the MXU (exact: one-hot
    rows select single byte values; int32/f32 accumulation), giving dense
    per-tile bucket arrays with zero random-access ops;
  - dummy slots are GONE: a tile's sorted stream no longer needs every key
    present (absent keys extract as all-zero rows, mapped to the identity),
    and key-0 slots (zero digits / padding) sort to the tile's end where
    they pollute only the never-extracted tail prefix.

Per-slot kernel cost drops 27 -> 13 montmuls and slots per window drop
T+M -> T; the extraction costs ~M*T*96 int8 MACs per (tile, window) on the
otherwise-idle MXU.

Layouts: kernel input is assembled u32 limbs (n_groups, K, 2L, G) —
x||y Montgomery, y pre-negated in XLA — lanes in contiguous <=1024-wide
groups (one (8,128) vreg per per-limb temp; wider spills). E-stream output
is (n_groups, K, 3L, G) u32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icicle_tpu.curves.params import get_curve
from icicle_tpu.pallas.msm_kernel import (_ListField, _madd_list,
                                          _kernel_consts, _b3_small)


def make_prefix_scan(curve_name: str, K: int, C: int, G: int | None = None):
    """Build the prefix-scan kernel.

    invoke(plimbs (n_groups, K, 2L, G) u32: permuted Montgomery limbs,
           x in rows 0..L-1, (sign-applied) y in rows L..2L-1)
      -> E-stream (n_groups, K, 3L, G) u32: the running prefix sum per lane
         after absorbing slot k (x rows 0..L-1, y rows L..2L-1, z rest).
    """
    import numpy as np

    curve = get_curve(curve_name)
    eng = curve.fq.engine
    f = _ListField(eng)
    b3_np, one_np, nl = _kernel_consts(curve_name)
    G = G or next((g for g in (1024, 512, 256, 128) if C % g == 0), C)
    assert C % G == 0 and G <= 1024
    n_groups = C // G

    b3_int = _b3_small(curve)

    def kernel(consts_ref, pl_ref, e_ref, Ex, Ey, Ez):
        k = pl.program_id(1)
        x2 = [pl_ref[0, 0, i, :] for i in range(nl)]
        y2 = [pl_ref[0, 0, nl + i, :] for i in range(nl)]
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

        ex, ey, ez = _madd_list(
            f, [Ex[i, :] for i in range(nl)], [Ey[i, :] for i in range(nl)],
            [Ez[i, :] for i in range(nl)], x2, y2, b3)
        for i in range(nl):
            Ex[i, :] = ex[i]
            Ey[i, :] = ey[i]
            Ez[i, :] = ez[i]
            e_ref[0, 0, i, :] = ex[i]
            e_ref[0, 0, nl + i, :] = ey[i]
            e_ref[0, 0, 2 * nl + i, :] = ez[i]

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
        scratch_shapes=[pltpu.VMEM((nl, G), jnp.uint32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    consts = jnp.asarray(np.stack([b3_np, one_np]))

    def invoke(plimbs):
        return call(consts, plimbs)

    return invoke


def make_prefix_scan_xla(curve_name: str, K: int, C: int):
    """lax.scan twin of the prefix-scan kernel (CPU tests / fallback).

    Same I/O contract as make_prefix_scan with n_groups folded to 1:
    (1, K, 2L, C) u32 -> (1, K, 3L, C) u32.
    """
    from icicle_tpu.curves.group import get_group, Projective, Affine

    group = get_group(curve_name)
    nl = get_curve(curve_name).fq.nlimbs

    def invoke(plimbs):
        ng = plimbs.shape[0]
        full = jnp.transpose(plimbs, (1, 0, 3, 2)).reshape(
            plimbs.shape[1], ng * plimbs.shape[3], 2 * nl)    # (K, C, 2L)
        xs = full[..., :nl]
        ys = full[..., nl:]
        ident = group.identity((full.shape[1],))

        def body(E, row):
            xr, yr = row
            E = group.madd(E, Affine(xr, yr))
            return E, jnp.concatenate([E.x, E.y, E.z], axis=-1)

        _, estream = jax.lax.scan(body, ident, (xs, ys))      # (K, C, 3L)
        out = estream.reshape(estream.shape[0], ng, -1, 3 * nl)
        return jnp.transpose(out, (1, 0, 3, 2))               # (ng,K,3L,C/ng)

    return invoke

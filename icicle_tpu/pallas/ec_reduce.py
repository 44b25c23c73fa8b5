"""Pallas TPU kernel: reduce an array of projective EC points with complete
adds (RCB15 Alg 7), sequentially along a leading axis, lane-parallel across
the trailing axis.

Why this kernel exists: the v3 MSM pipeline (ops/msm_tpu3.py) needs two big
EC reductions outside its prefix-scan kernel — the cross-tile bucket fold
(tiles x (wg*M) adds) and the per-window bucket sum (M x W adds). Expressing
those as XLA-level fold-halves trees with unrolled comba montmuls emitted
O(10^5-10^6) HLO primitives, which the remote TPU compiler could not handle
at 2^20+ sizes (45+ min compiles, OOM-SIGKILL at 2^24). Here the unrolled
straight-line field arithmetic lives inside ONE Mosaic kernel body that the
grid reuses for every row — the XLA graph around it stays tiny.

Reference algorithm being served: Pippenger phase-2/3 bucket collapse
(backend/cpu/src/curve/cpu_msm.hpp:317-418); this kernel is the TPU-native
reduction primitive those phases decompose into.

Layouts follow pallas/msm_scan.py: limb-first (R, 3L, C) uint32, coords in
Montgomery form, lanes grouped <=1024 wide (one (8,128) vreg per live temp).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icicle_tpu.curves.params import get_curve
from icicle_tpu.pallas.msm_kernel import (_ListField, _kernel_consts,
                                          _b3_small)


def _padd_list(f: _ListField, X1, Y1, Z1, X2, Y2, Z2, b3):
    """Complete projective add (RCB15 Alg 7, a=0) on limb lists; b3 may be a
    small python int (mod-add chain) or a limb list. Mirrors
    curves/group.py:padd."""
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


def _pad_lanes(C: int) -> int:
    return -(-C // 128) * 128


def make_ec_reduce(curve_name: str, R: int, C: int, G: int | None = None,
                   Rb: int | None = None):
    """Build the reduce call.

    invoke(pts (R, 3L, C) u32 projective Montgomery limbs, limb-first)
      -> (3L, C) u32: the complete-add sum over the R axis, per lane.

    Lanes are independent; C is padded to a multiple of 128 internally
    (padding lanes compute garbage that is sliced away). R >= 1.

    Rows stream through the kernel in blocks of Rb with an in-kernel
    fori_loop doing one complete add per row: one grid step per BLOCK, not
    per row. The original one-row-per-step grid spent ~20 us of fixed
    per-step overhead against ~5 us of add work (measured 0.31 G
    lane-montmuls/s vs the scan kernel's 1.27 G); blocking amortizes that
    overhead Rb-fold. Rows are padded to a multiple of Rb with identity
    points (complete formulas absorb them exactly).
    """
    curve = get_curve(curve_name)
    eng = curve.fq.engine
    f = _ListField(eng)
    b3_np, one_np, nl = _kernel_consts(curve_name)
    Cp = _pad_lanes(C)
    G = G or next((g for g in (1024, 512, 256, 128) if Cp % g == 0), Cp)
    assert Cp % G == 0 and G <= 1024
    n_groups = Cp // G
    b3_int = _b3_small(curve)
    # block rows: ~6 MB of VMEM per in-flight block (double-buffered by the
    # pipeline) — big enough to amortize step overhead, small enough to
    # leave headroom for the ~60 live (nl, G) temporaries of the add
    if Rb is None:
        Rb = max(1, min(R, (6 << 20) // (3 * nl * G * 4)))
        Rb = 1 << (Rb.bit_length() - 1)
    Rp = -(-R // Rb) * Rb
    n_blocks = Rp // Rb

    def kernel(consts_ref, pts_ref, out_ref, Ax, Ay, Az):
        k = pl.program_id(1)
        b3 = b3_int if b3_int is not None else [
            jnp.broadcast_to(consts_ref[0, i], (G,)) for i in range(nl)]
        one = [jnp.broadcast_to(consts_ref[1, i], (G,)) for i in range(nl)]
        zero = [jnp.zeros((G,), jnp.uint32) for _ in range(nl)]

        @pl.when(k == 0)
        def _():
            for i in range(nl):
                Ax[i, :] = zero[i]
                Ay[i, :] = one[i]
                Az[i, :] = zero[i]

        def body(r, acc):
            ax, ay, az = acc
            row = pts_ref[pl.ds(r, 1), :, :]
            x2 = [row[0, i, :] for i in range(nl)]
            y2 = [row[0, nl + i, :] for i in range(nl)]
            z2 = [row[0, 2 * nl + i, :] for i in range(nl)]
            x3, y3, z3 = _padd_list(f, list(ax), list(ay), list(az),
                                    x2, y2, z2, b3)
            return tuple(x3), tuple(y3), tuple(z3)

        init = (tuple(Ax[i, :] for i in range(nl)),
                tuple(Ay[i, :] for i in range(nl)),
                tuple(Az[i, :] for i in range(nl)))
        ax, ay, az = jax.lax.fori_loop(0, Rb, body, init)
        for i in range(nl):
            Ax[i, :] = ax[i]
            Ay[i, :] = ay[i]
            Az[i, :] = az[i]

        @pl.when(k == n_blocks - 1)
        def _():
            for i in range(nl):
                out_ref[i, :] = Ax[i, :]
                out_ref[nl + i, :] = Ay[i, :]
                out_ref[2 * nl + i, :] = Az[i, :]

    in_spec = pl.BlockSpec((Rb, 3 * nl, G), lambda g, k: (k, 0, g),
                           memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((2, nl), lambda g, k: (0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3 * nl, G), lambda g, k: (0, g),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((3 * nl, Cp), jnp.uint32)

    call = pl.pallas_call(
        kernel,
        grid=(n_groups, n_blocks),
        in_specs=[const_spec, in_spec],
        out_specs=out_spec,
        out_shape=out_sds,
        scratch_shapes=[pltpu.VMEM((nl, G), jnp.uint32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    consts = jnp.asarray(np.stack([b3_np, one_np]))
    ident_col = np.zeros((3 * nl, 1), dtype=np.uint32)
    ident_col[nl:2 * nl, 0] = one_np

    def invoke(pts):
        if Cp != C:
            pts = jnp.pad(pts, ((0, 0), (0, 0), (0, Cp - C)))
        if Rp != R:
            ident_rows = jnp.broadcast_to(
                jnp.asarray(ident_col)[None], (Rp - R, 3 * nl, Cp))
            pts = jnp.concatenate([pts, ident_rows], axis=0)
        out = call(consts, pts)
        return out[:, :C] if Cp != C else out

    return invoke


def make_ec_reduce_xla(curve_name: str, R: int, C: int, G: int | None = None):
    """lax.scan twin of make_ec_reduce (CPU tests / fallback): same I/O
    contract, loop-form montmuls keep the graph small on compile-bound
    hosts."""
    from icicle_tpu.curves.group import get_group, Projective

    group = get_group(curve_name)
    nl = get_curve(curve_name).fq.nlimbs

    def invoke(pts):
        rows = jnp.swapaxes(pts, -1, -2)                  # (R, C, 3L)

        def body(acc, row):
            s = group.add(acc, Projective(row[..., :nl], row[..., nl:2 * nl],
                                          row[..., 2 * nl:]))
            return s, None

        init = Projective(rows[0, :, :nl], rows[0, :, nl:2 * nl],
                          rows[0, :, 2 * nl:])
        if R > 1:
            acc, _ = jax.lax.scan(body, init, rows[1:])
        else:
            acc = init
        return jnp.concatenate([acc.x, acc.y, acc.z], axis=-1).T  # (3L, C)

    return invoke

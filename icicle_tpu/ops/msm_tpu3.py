"""Prefix-scan + MXU-extraction MSM pipeline (v3) — the TPU large-n path.

Reference surface: ``include/icicle/msm.h`` (msm, MSMConfig.c), CPU algorithm
``backend/cpu/src/curve/cpu_msm.hpp`` phases 1-3. Successor to the v2
suffix-fold pipeline (ops/msm_tpu2.py); see pallas/msm_scan.py for the
kernel-level rationale. Per window:

  1. signed digits (XLA; shared with v2)
  2. per (window, tile of T points): single-u32 packed row-sort
     ((kmax-|digit|) << 14 | neg << 13 | idx) — NO dummy slots
  3. point limbs routed to sorted slots by one-hot matmuls on the MXU,
     assembled to u32 and sign-applied in XLA
  4. Pallas prefix-scan kernel: E += P per slot (13-montmul complete mixed
     add, no flags), E streamed to HBM
  5. run-end prefixes extracted by one-hot matmuls over the E-stream bytes
     (exact byte selection, MXU) -> dense per-tile bucket arrays B_k^t
     (per-tile prefix fill-forward happens per extraction chunk)
  6. cross-tile reduce (work ~ tiles*M) via the ec_reduce Mosaic kernel
     -> per-window filled prefixes S_j
  7. weighted reduction sum_k k*B_k = sum_j S_j: two-pass ec_reduce over
     the bucket axis (windows ride the lanes)
  8. window Horner on host ints.

All EC reductions outside the prefix-scan kernel run as Pallas kernels
(pallas/ec_reduce.py): expressing them as XLA fold-halves trees with
unrolled comba montmuls made remote TPU compiles infeasible at 2^20+
(45+ min / OOM) — the round-3 blocker on this pipeline.

The kernel does 13 montmuls/slot on exactly n*W slots (v2: 27 on
(n + tiles*2^(c-1))*W slots); the MXU (idle in v2) absorbs the extraction.
TPU layout rules as v2: limb-major at jit boundaries, big trailing axes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.host_ec import ec_add, ec_dbl, INF
from icicle_tpu.ops.msm import signed_window_count
from icicle_tpu.ops.msm_tpu2 import _signed_digits_t
from icicle_tpu.pallas.msm_scan import make_prefix_scan, make_prefix_scan_xla
from icicle_tpu.pallas.ec_reduce import make_ec_reduce, make_ec_reduce_xla

_IDX_BITS = 13
_NEG_BIT = 13
_KEY_SHIFT = 14


def _plan3(n: int, c: int | None, nbits: int, T: int | None,
           wg: int | None = None):
    T = T or min(8192, max(256, n))
    T = min(T, 1 << _IDX_BITS)
    if c is None:
        best = None
        for cc in range(4, 17):
            w = (nbits + cc) // cc + 1
            cost = w * (1.0 + (1 << (cc - 1)) / T)
            if best is None or cost < best[1]:
                best = (cc, cost)
        c = best[0]
    M = 1 << (c - 1)
    assert M < (1 << (31 - _KEY_SHIFT))
    n_windows = signed_window_count(nbits, c)
    tiles = -(-n // T)
    tiles = 1 << max(0, (tiles - 1).bit_length())
    # windows per group: bound in-flight permuted+E-stream bytes (~160B/slot)
    if wg is None:
        byte_budget = 6 << 30
        per_window = tiles * T * 160
        wg_cap = max(1, min(n_windows, byte_budget // max(per_window, 1), 8))
        # powers of two only: the scan kernel's lane group is wg*B_g with
        # B_g a power of two, so wg in {1,2,4,8} gives wg*B_g == 1024 (full
        # (8,128) vregs); e.g. wg=7 -> G=896 idles 12.5% of every vreg AND
        # makes the cross-tile reduce's wg*M lane count non-pow2 (G=512).
        # Pick the candidate maximizing lane occupancy (G = min(wg*tiles,
        # 1024) — at tiles < 1024 a small wg leaves vreg lanes idle and the
        # scan runs at G/1024 of the issue ceiling; seen in the round-5
        # stage probe: wg=1 at tiles=512 doubled the scan time), then
        # minimizing padded windows, then the fewest groups.
        best = None
        for cand in (8, 4, 2, 1):
            if cand > wg_cap:
                continue
            padded = -(-n_windows // cand) * cand
            occupancy_deficit = 1024 - min(cand * tiles, 1024)
            key = (occupancy_deficit, padded, -cand)
            if best is None or key < best[0]:
                best = (key, cand)
        wg = best[1]
    return c, M, T, tiles, n_windows, wg


def _bytes_i8(a):
    """uint32 (..., R, G) -> int8 (..., 4R, G) little-endian byte planes."""
    planes = [((a >> (8 * i)) & jnp.uint32(0xFF)).astype(jnp.int32).astype(
        jnp.int8) for i in range(4)]
    st = jnp.stack(planes, axis=-2)         # (..., R, 4, G)
    sh = st.shape
    return st.reshape(sh[:-3] + (sh[-3] * 4, sh[-1]))


def _join_u32(cols):
    """int32 byte columns (..., 4R) -> u32 (..., R)."""
    b = cols.astype(jnp.uint32) & jnp.uint32(0xFF)
    sh = b.shape
    b4 = b.reshape(sh[:-1] + (sh[-1] // 4, 4))
    return (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
            | (b4[..., 3] << 24))


@functools.lru_cache(maxsize=None)
def _jitted_pipeline3(curve_name: str, c: int, nbits: int, n_pad: int, T: int,
                      tiles: int, wg: int, backend: str,
                      engine: str = "u32", nu: int = 1, n_scal: int = 0,
                      glv: bool = False):
    from icicle_tpu.math.bigint import mul_mode
    import contextlib

    curve = get_curve(curve_name)
    fq = curve.fq
    nl = fq.nlimbs
    M = 1 << (c - 1)
    K = T
    n_windows = signed_window_count(nbits, c)
    if nu > 1:
        # precomputed bases: windows merge into G = max(G0, W-(nu-1)*G0)
        # groups of stride G0 (reference msm.h:23-34; ops/msm.py remap)
        from icicle_tpu.ops.msm import precompute_shift
        G0_pre = precompute_shift(nbits, c, nu) // c
        n_windows = max(G0_pre, n_windows - (nu - 1) * G0_pre)
    kmax = M
    C = wg * tiles
    b = max(1, 1024 // wg)
    B_g = min(tiles, 1 << (b.bit_length() - 1))
    G = wg * B_g                  # kernel/extraction lane group (<=1024)
    ng_chunks = C // G
    # One-hot operands are never materialized whole: the permute chunk size
    # and the extraction bucket-block size are bounded so each transient
    # one-hot stays under a byte budget (at 2^24 the full (C, K, T) permute
    # one-hot would be ~68 GB). XLA fuses the compare-iota producer into
    # the dot, so the one-hot is MXU-bound, not HBM-bound — a VMEM-built
    # Pallas variant was tried (round 4) and cannot beat the fused dot;
    # the MAC count (slots x T x 64) is what the T knob tunes.
    import os as _os
    oh_budget = int(_os.environ.get("ICICLE_TPU_MSM_OH_BUDGET",
                                    str(2 << 30)))
    B_p = max(1, min(B_g, oh_budget // max(wg * K * T, 1)))
    B_p = 1 << (B_p.bit_length() - 1)
    G_p = wg * B_p                # permute chunk lanes
    ng_p = tiles // B_p
    MB = max(1, min(M, oh_budget // max(G * K, 1)))
    MB = 1 << (MB.bit_length() - 1)

    if engine == "r12":
        from icicle_tpu.pallas.msm_scan_r12 import (
            make_prefix_scan_r12, make_prefix_scan_r12_xla)
        from icicle_tpu.math.radix12 import Radix12
        rbits = Radix12(fq.modulus).rbits
        # extracted E-stream values are X*2^rbits in [0, 4p); one montmul by
        # 2^(64*nl - rbits) maps them back into the 2^(32*nl) domain
        unshift = np.asarray(fq.params.const_limbs32(
            (1 << (64 * nl - rbits)) % fq.modulus), dtype=np.uint32)
        if backend == "pallas":
            scan = make_prefix_scan_r12(curve_name, K, C, G)
        else:
            scan = make_prefix_scan_r12_xla(curve_name, K, C)
    else:
        unshift = None
        if backend == "pallas":
            scan = make_prefix_scan(curve_name, K, C, G)
        else:
            scan = make_prefix_scan_xla(curve_name, K, C)

    p32 = [np.uint32(v) for v in fq.engine.p32]
    one_mont = np.asarray(fq.params.const_limbs32(fq.params.r % fq.modulus),
                          dtype=np.uint32)
    iota_t = jnp.arange(T, dtype=jnp.uint32)

    # EC reductions as Mosaic kernels (XLA twins for CPU): cross-tile bucket
    # fold and the two-pass per-window bucket sum (sum_k k*B_k = sum_j S_j
    # over the filled prefixes).
    mk_reduce = make_ec_reduce if backend == "pallas" else make_ec_reduce_xla
    reduce_tiles = mk_reduce(curve_name, tiles, wg * M)
    M2 = min(M, 128)
    M1 = M // M2
    n_groups_w = -(-n_windows // wg)
    w_pad_k = n_groups_w * wg
    reduce_m1 = mk_reduce(curve_name, M1, w_pad_k * M2) if M1 > 1 else None
    reduce_m2 = mk_reduce(curve_name, M2, w_pad_k)

    def group_fn(points_u8, digits_g):
        """points_u8 (tiles, T, 8L) int8 Montgomery coord bytes (x||y);
        digits_g (wg, tiles, T) int32 -> bucket sums (wg, 3, L, M) u32."""
        key = jnp.abs(digits_g).astype(jnp.uint32)
        neg = (digits_g < 0).astype(jnp.uint32)
        pack = ((jnp.uint32(kmax) - key) << _KEY_SHIFT) \
            | (neg << _NEG_BIT) | iota_t[None, None, :]
        spack = jax.lax.sort([pack], dimension=2, num_keys=1)[0]  # (wg,t,K)

        skey = (jnp.uint32(kmax) - (spack >> _KEY_SHIFT)).astype(jnp.int32)
        sneg = (spack >> _NEG_BIT) & 1
        sidx = (spack & ((1 << _IDX_BITS) - 1)).astype(jnp.int32)
        nxt = jnp.concatenate(
            [skey[:, :, 1:], jnp.zeros((wg, tiles, 1), jnp.int32)], axis=2)
        is_end = (skey != nxt) & (skey >= 1)              # (wg, tiles, K)

        sid_t = jnp.transpose(sidx, (1, 0, 2))            # (tiles, wg, K)
        sneg_t = jnp.transpose(sneg, (1, 0, 2))

        def permute_chunk(_, args):
            si, pb, ng_c = args  # (B_p, wg, K), (B_p, T, 8L), (B_p, wg, K)
            oh = (si.reshape(-1, wg * K)[:, :, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
                  ).astype(jnp.int8)                      # (B_p, wg*K, T)
            out = jax.lax.dot_general(
                oh, pb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)         # (B_p, wg*K, 8L)
            limbs = _join_u32(out.reshape(B_p, wg, K, 8 * nl))  # (..., 2L)
            x = limbs[..., :nl]
            y = limbs[..., nl:]
            pc = jnp.asarray(np.array([int(v) for v in p32], np.uint32))
            yneg = _sub_mod_limbs(pc, y)
            y = jnp.where((ng_c.reshape(B_p, wg, K) == 1)[..., None],
                          yneg, y)
            xy = jnp.concatenate([x, y], axis=-1)         # (B_p, wg, K, 2L)
            # chunk layout (K, 2L, G_p), lane = tile_in_chunk*wg + w
            return None, jnp.transpose(xy, (2, 3, 0, 1)).reshape(
                K, 2 * nl, G_p)

        _, perm = jax.lax.scan(
            permute_chunk, None,
            (sid_t.reshape(ng_p, B_p, wg, K),
             points_u8.reshape(ng_p, B_p, T, 8 * nl),
             sneg_t.reshape(ng_p, B_p, wg, K).astype(jnp.int32)))

        if G_p != G:
            # permute-chunk lanes -> kernel lane groups (same global order)
            r = G // G_p
            perm = jnp.transpose(
                perm.reshape(ng_chunks, r, K, 2 * nl, G_p),
                (0, 2, 3, 1, 4)).reshape(ng_chunks, K, 2 * nl, G)

        estream = scan(perm)                              # (ng, K, 3L, G)

        # extraction inputs in lane order (lane = tile*wg + w)
        skey_l = jnp.transpose(skey, (1, 0, 2)).reshape(ng_chunks, G, K)
        isend_l = jnp.transpose(is_end, (1, 0, 2)).reshape(ng_chunks, G, K)

        ident_row = jnp.concatenate(
            [jnp.zeros((nl,), jnp.uint32), jnp.asarray(one_mont),
             jnp.zeros((nl,), jnp.uint32)])

        def extract_chunk(_, args):
            sk, ie, es = args  # (G, K) i32, (G, K) bool, (K, 3L, G) u32
            eb = _bytes_i8(es)                            # (K, 12L, G) int8
            eb = jnp.transpose(eb, (2, 0, 1))             # (G, K, 12L)

            # per lane, one-hot over run-end slots -> buckets, MB at a time
            # (the full (G, K, M) one-hot would blow the byte budget)
            def mblock(_, j):
                ids = (jnp.int32(M) - j * MB
                       - jax.lax.broadcasted_iota(jnp.int32, (1, 1, MB), 2))
                oh = ((sk[:, :, None] == ids)
                      & ie[:, :, None]).astype(jnp.int8)  # (G, K, MB)
                out = jax.lax.dot_general(
                    oh, eb, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)     # (G, MB, 12L)
                return None, _join_u32(out)               # (G, MB, 3L)

            if M > MB:
                _, bkb = jax.lax.scan(mblock, None,
                                      jnp.arange(M // MB, dtype=jnp.int32))
                bk = jnp.transpose(bkb, (1, 0, 2, 3)).reshape(G, M, 3 * nl)
            else:
                bk = mblock(None, jnp.int32(0))[1]        # (G, M, 3L)
            if unshift is not None:
                # r12 engine: domain-shift X*2^rbits (< 4p) -> X*2^(32L),
                # canonical. CIOS tolerates a < 4p since 4p < 2^(32L).
                sh = jnp.asarray(unshift)
                bk = jnp.concatenate(
                    [fq.mul_mont(bk[..., i * nl:(i + 1) * nl], sh)
                     for i in range(3)], axis=-1)
            bk = bk.reshape(B_g, wg, M, 3 * nl)

            # The extracted value at key j is the tile prefix S_j = sum of
            # the tile's points with |digit| >= j. Keys ABSENT from a tile
            # must replicate the nearest higher key's prefix (v2 forced this
            # with 2^(c-1) dummy slots per tile; here it is a log2(M)-round
            # fill-forward of SELECTS along the descending bucket axis).
            # Present rows are never all-zero (complete-formula identities
            # have Y != 0), so all-zero identifies absence exactly.
            present = jnp.any(bk != 0, axis=-1)           # (B_g, wg, M)
            filled = bk
            d = 1
            while d < M:
                shifted = jnp.concatenate(
                    [jnp.zeros((B_g, wg, d, 3 * nl), jnp.uint32),
                     filled[:, :, :-d]], axis=2)
                pshift = jnp.concatenate(
                    [jnp.zeros((B_g, wg, d), bool), present[:, :, :-d]],
                    axis=2)
                filled = jnp.where(present[..., None], filled, shifted)
                present = present | pshift
                d *= 2
            bk = jnp.where(present[..., None], filled, ident_row)
            # kernel-friendly layout for the cross-tile reduce: lane = w*M+k
            return None, jnp.transpose(
                bk.reshape(B_g, wg * M, 3 * nl), (0, 2, 1))

        _, buckets = jax.lax.scan(extract_chunk, None,
                                  (skey_l, isend_l, estream))
        buckets = buckets.reshape(tiles, 3 * nl, wg * M)

        # cross-tile reduce (Pippenger phase-2 analog): ONE Mosaic kernel
        # reused for all rows — tree-folding this in XLA with unrolled
        # montmuls was the 2^20+ compile bomb (see pallas/ec_reduce.py).
        return reduce_tiles(buckets)                      # (3L, wg*M)

    n_groups = -(-n_windows // wg)
    w_pad = n_groups * wg

    @jax.jit
    def run(scalars, points_u8):
        mm = (mul_mode("unrolled") if backend == "pallas"
              else contextlib.nullcontext())
        with mm:
            # scalars arrive row-major (n_scal, Ls) exactly as the caller
            # holds them (reference: are_scalars_on_device=true, msm.h:40-49
            # — no host-side marshaling in the hot path); transpose + pad to
            # the limb-major padded width on device.
            scalars_t = jnp.transpose(scalars)                # (Ls, n_scal)
            if glv:
                # GLV split: digits for the interleaved [P, phi(P)] bases
                # (ops/msm_glv.py); nbits here is glv_split_bound(curve).
                from icicle_tpu.ops.msm_glv import glv_digits_t
                digits = glv_digits_t(curve_name, scalars_t, c)
                if 2 * n_scal < n_pad:
                    digits = jnp.pad(
                        digits, ((0, 0), (0, n_pad - 2 * n_scal)))
            else:
                if n_scal < n_pad // nu:
                    scalars_t = jnp.pad(
                        scalars_t, ((0, 0), (0, n_pad // nu - n_scal)))
                digits = _signed_digits_t(scalars_t, c, nbits)  # (W, n)
            if nu > 1:
                from icicle_tpu.ops.msm import _precompute_digit_remap
                digits, _ = _precompute_digit_remap(
                    digits, nu, n_pad // nu, G0_pre)          # (G, n_pad)
            if w_pad != n_windows:
                digits = jnp.concatenate(
                    [digits, jnp.zeros((w_pad - n_windows, digits.shape[1]),
                                       digits.dtype)], axis=0)
            digits = digits.reshape(n_groups, wg, tiles, T)

            def body(_, dg):
                return None, group_fn(points_u8, dg)

            _, buckets = jax.lax.scan(body, None, digits)  # (ngw, 3L, wg*M)

            # window sum = sum_k k*B_k = sum over all M filled prefixes
            # (per-tile fill already happened in group_fn): two-pass EC
            # reduce over the bucket axis, window index riding the lanes.
            bk = buckets.reshape(n_groups, 3 * nl, wg, M)
            bk = jnp.transpose(bk, (3, 1, 0, 2)).reshape(
                M, 3 * nl, w_pad)                         # lane = g*wg + w
            if M1 > 1:
                b2 = jnp.transpose(
                    bk.reshape(M1, M2, 3 * nl, w_pad),
                    (0, 2, 3, 1)).reshape(M1, 3 * nl, w_pad * M2)
                r1 = reduce_m1(b2).reshape(3 * nl, w_pad, M2)
                bk = jnp.transpose(r1, (2, 0, 1))         # (M2, 3L, w_pad)
            total = reduce_m2(bk)                         # (3L, w_pad)
            return jnp.transpose(total[:, :n_windows]).reshape(
                n_windows, 3, nl)

    return run


def _sub_mod_limbs(p_row, y):
    """(L,) u32 modulus row minus (..., L) u32 limbs (y < p)."""
    out = []
    borrow = jnp.zeros(y.shape[:-1], jnp.uint32)
    for i in range(y.shape[-1]):
        x = jnp.broadcast_to(p_row[i], y.shape[:-1])
        d = x - y[..., i]
        br = (x < y[..., i]).astype(jnp.uint32)
        d2 = d - borrow
        br = br + (d < borrow).astype(jnp.uint32)
        out.append(d2)
        borrow = br
    return jnp.stack(out, axis=-1)


@functools.lru_cache(maxsize=None)
def _prep_fn3(curve_name: str, n_pad: int, tiles: int, T: int,
              engine: str = "u32"):
    """(L, n_pad) canonical limb-major coords -> (tiles, T, 8L) int8
    Montgomery bytes (x||y), chunked conversion as v2. engine="r12" lifts
    into the radix-12 kernel's 2^rbits Montgomery domain instead."""
    fq = get_curve(curve_name).fq
    nl = fq.nlimbs
    ch = T if tiles < 64 else 64 * T
    n_chunks = n_pad // ch
    assert n_chunks * ch == n_pad
    if engine == "r12":
        from icicle_tpu.math.radix12 import Radix12
        rbits = Radix12(fq.modulus).rbits
        shift = jnp.asarray(np.asarray(
            fq.params.const_limbs32((1 << rbits) % fq.modulus),
            dtype=np.uint32))
    else:
        shift = None

    from icicle_tpu.pallas.msm_kernel import _ListField

    f_list = _ListField(fq.engine)
    r2 = np.asarray(fq.params.const_limbs32(fq.params.r2), dtype=np.uint32)
    if shift is not None:
        # fold the extra domain shift into one constant: x * (r2*shift/R)
        sh_int = 0
        for i, w in enumerate(np.asarray(shift)):
            sh_int |= int(w) << (32 * i)
        r2_int = fq.params.r2
        rinv = pow(1 << (32 * nl), -1, fq.modulus)
        r2 = np.asarray(fq.params.const_limbs32(
            r2_int * sh_int % fq.modulus * rinv % fq.modulus),
            dtype=np.uint32)

    @jax.jit
    def prep(px_t, py_t):
        def body(cols):
            x_t, y_t = cols                               # (L, ch) limb-major
            # list-based montmul on per-limb (ch,) rows: no transpose to the
            # (ch, L) trailing-small-axis layout (16x tile padding), tiny
            # graph (the body compiles once), full-width VPU ops. The
            # loop-form montmul here cost 1.6 s at 2^20 (2x the whole
            # bucket pipeline); the stacked unrolled form still paid the
            # transpose.
            cst = [jnp.broadcast_to(jnp.uint32(v), (ch,)) for v in r2]
            planes = []
            for t in (x_t, y_t):
                m = f_list.mul_mont([t[i] for i in range(nl)], cst)
                for i in range(nl):
                    for s in (0, 8, 16, 24):
                        planes.append(((m[i] >> s) & jnp.uint32(0xFF))
                                      .astype(jnp.int32).astype(jnp.int8))
            return jnp.stack(planes, axis=-1)             # (ch, 8L)

        xr = px_t.reshape(nl, n_chunks, ch).transpose(1, 0, 2)
        yr = py_t.reshape(nl, n_chunks, ch).transpose(1, 0, 2)
        out = jax.lax.map(body, (xr, yr))
        return out.reshape(tiles, T, 8 * nl)

    return prep


def _pad_t(a, width, cols):
    out = np.zeros((width, cols), dtype=np.uint32)
    arr = np.asarray(a)
    out[:, :arr.shape[0]] = arr.T
    return out


def _resolve_plan(curve_name, n, c, T, wg, engine, nu, glv=False):
    import os
    curve = get_curve(curve_name)
    if engine is None:
        engine = os.environ.get("ICICLE_TPU_MSM_ENGINE")
    if engine is None:
        # measured-table engine choice (reference decision-tree analog):
        # e.g. the r12 kernel beats u32 by ~20% on bn254 at 2^20-2^24 (v5e)
        from icicle_tpu.ops.msm_tuning import tuned_engine
        engine = tuned_engine(curve_name, n, nu) or "u32"
    if engine == "r12":
        from icicle_tpu.math.radix12 import Radix12
        try:
            Radix12(curve.fq.modulus)
        except OverflowError:
            engine = "u32"   # field too large for signed-i32 radix-12 columns
    assert not (glv and nu > 1), "glv + precompute_factor not combined (yet)"
    if glv:
        # the point set doubles ([P, phi(P)]), digits come from the ~129-bit
        # split halves (ops/msm_glv.py)
        from icicle_tpu.ops.msm_glv import glv_split_bound
        nbits = glv_split_bound(curve_name)
        n = 2 * n
    else:
        nbits = curve.fr.modulus.bit_length()
    if c is None or T is None:
        # measured-table lookup (reference decision-tree analog, msm_tuning)
        from icicle_tpu.ops.msm_tuning import tuned_params
        tp = tuned_params(f"v3:{engine}", curve_name, n, nu)
        if tp:
            c = c or tp.get("c")
            T = T or tp.get("T")
            wg = wg or tp.get("wg")
    if nu > 1:
        assert c, "precomputed msm_tpu3 requires the bases' explicit c"
    c, M, T, tiles, n_windows, wg = _plan3(n, c, nbits, T, wg)
    if nu > 1:
        from icicle_tpu.ops.msm import precompute_shift
        G0 = precompute_shift(nbits, c, nu) // c
        n_windows = max(G0, n_windows - (nu - 1) * G0)
    return dict(engine=engine, nbits=nbits, c=c, M=M, T=T, tiles=tiles,
                n_windows=n_windows, wg=wg, n_pad=tiles * T, nu=nu,
                glv=glv)


def msm_tpu3_prepare(curve_name: str, points_x, points_y,
                     c: int | None = None, T: int | None = None,
                     engine: str | None = None, precompute_factor: int = 1,
                     wg: int | None = None, glv: bool = False):
    """One-time base preparation: pad + Montgomery-convert + byte-plane the
    points on device. The returned dict feeds msm_tpu3(prepared=...) so
    repeated MSMs over the same bases skip this work — the reference
    equivalent is uploading bases once with are_points_on_device=true
    (msm.h:40-49) plus msm_precompute_bases. glv=True interleaves
    [P_i, phi(P_i)] (phi = (beta*x, y), one canonical field mul per point)
    to pair with the glv digit split."""
    n = points_x.shape[0]
    plan = _resolve_plan(curve_name, n, c, T, wg, engine, precompute_factor,
                         glv)
    fq = get_curve(curve_name).fq
    if glv:
        from icicle_tpu.ops.msm_glv import glv_msm_constants
        beta = glv_msm_constants(curve_name)["beta"]
        beta_l = jnp.asarray(np.asarray(fq.from_ints([beta]))[0])

        @functools.partial(jax.jit, static_argnums=1)
        def glv_pad_dev(pts, cols):
            px, py = pts                                    # (n, L) each
            phix = fq.mul(px, beta_l[None, :])
            x2 = jnp.stack([px, phix], axis=1).reshape(-1, px.shape[1])
            y2 = jnp.stack([py, py], axis=1).reshape(-1, py.shape[1])
            pad = ((0, 0), (0, cols - x2.shape[0]))
            return (jnp.pad(jnp.transpose(x2), pad),
                    jnp.pad(jnp.transpose(y2), pad))

        px_t, py_t = glv_pad_dev((jnp.asarray(points_x),
                                  jnp.asarray(points_y)), plan["n_pad"])
    elif isinstance(points_x, jax.Array):
        # device-resident bases: transpose+pad on device (no tunnel D2H/H2D)
        @functools.partial(jax.jit, static_argnums=1)
        def pad_dev(a, cols):
            return jnp.pad(jnp.transpose(a),
                           ((0, 0), (0, cols - a.shape[0])))
        px_t = pad_dev(points_x, plan["n_pad"])
        py_t = pad_dev(points_y, plan["n_pad"])
    else:
        px_t = _pad_t(points_x, fq.nlimbs, plan["n_pad"])
        py_t = _pad_t(points_y, fq.nlimbs, plan["n_pad"])
    pts_u8 = _prep_fn3(curve_name, plan["n_pad"], plan["tiles"], plan["T"],
                       plan["engine"])(px_t, py_t)
    plan["pts_u8"] = pts_u8
    plan["n"] = n
    return plan


def msm_tpu3(curve_name: str, scalars, points_x=None, points_y=None,
             c: int | None = None, T: int | None = None,
             backend: str = "pallas", engine: str | None = None,
             precompute_factor: int = 1, wg: int | None = None,
             prepared: dict | None = None, glv: bool = False):
    """Prefix-scan MSM. scalars (N, Ls) canonical u32 limbs; points canonical
    affine (N, L). Returns canonical affine (x, y) python ints ((0,0) = INF).

    backend: "pallas" (Mosaic kernel) or "xla" (lax.scan twin, CPU tests).
    engine: in-kernel field arithmetic — "u32" (16-bit split comba/CIOS) or
    "r12" (signed radix-2^12, pallas/msm_scan_r12.py); default from
    ICICLE_TPU_MSM_ENGINE, else "u32".
    precompute_factor: nu > 1 means points are the interleaved (nu*N, L)
    output of msm_precompute_bases with the SAME c (which is then required);
    cuts window count (and bucket/extraction work) ~nu-fold.
    prepared: output of msm_tpu3_prepare over the same bases (points_x/y
    then unused); skips padding + Montgomery conversion per call.
    glv: decompose scalars k = k1 + lam*k2 on device and run over the
    interleaved [P, phi(P)] base set (ops/msm_glv.py) — slot-neutral in the
    scan phase by design, kept as a measured toggle (see performance.md).
    """
    curve = get_curve(curve_name)
    fq, fr = curve.fq, curve.fr
    nu = precompute_factor
    if prepared is None:
        assert points_x is not None and points_y is not None
        prepared = msm_tpu3_prepare(curve_name, points_x, points_y, c=c, T=T,
                                    engine=engine, precompute_factor=nu,
                                    wg=wg, glv=glv)
    plan = prepared
    engine, nbits, c, T = (plan["engine"], plan["nbits"], plan["c"],
                           plan["T"])
    M, tiles, n_windows, wg = (plan["M"], plan["tiles"], plan["n_windows"],
                               plan["wg"])
    n_pad, n = plan["n_pad"], plan["n"]
    pts_u8 = plan["pts_u8"]
    assert plan["nu"] == nu
    assert plan.get("glv", False) == glv
    if nu > 1:
        assert nu & (nu - 1) == 0, "precompute_factor must be a power of two"
        assert n == nu * scalars.shape[0], \
            "points must be msm_precompute_bases output (nu*N rows)"
        assert n_pad % nu == 0

    # scalars go to the device as-is (row-major (n_scal, Ls)); a no-op if the
    # caller already holds them device-resident (the bench/autotune path —
    # reference equivalent: MSMConfig.are_scalars_on_device, msm.h:40-49).
    import jax.numpy as _jnp
    scal_dev = _jnp.asarray(scalars)

    run = _jitted_pipeline3(curve_name, c, nbits, n_pad, T, tiles, wg,
                            backend, engine, nu, int(scal_dev.shape[0]),
                            glv)
    wsums = np.asarray(run(scal_dev, pts_u8))             # (W, 3, L)

    p = fq.modulus
    rinv = pow(1 << (32 * fq.nlimbs), -1, p)

    def limb_int(a) -> int:
        v = 0
        for i, w in enumerate(np.asarray(a, dtype=np.uint32)):
            v |= int(w) << (32 * i)
        return v

    pts = []
    for w in range(n_windows):
        z = limb_int(wsums[w, 2]) * rinv % p
        if z == 0:
            pts.append(INF)
            continue
        zi = pow(z, -1, p)
        pts.append((limb_int(wsums[w, 0]) * rinv % p * zi % p,
                    limb_int(wsums[w, 1]) * rinv % p * zi % p))

    acc = pts[-1]
    for w in range(n_windows - 2, -1, -1):
        for _ in range(c):
            acc = ec_dbl(acc, p)
        acc = ec_add(acc, pts[w], p)
    return acc if acc is not INF else (0, 0)

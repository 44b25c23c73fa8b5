"""Suffix-fold MSM pipeline (v2) — the TPU-native large-n path.

Reference surface: ``include/icicle/msm.h`` (msm + msm_precompute_bases with
MSMConfig.precompute_factor/c), CPU algorithm ``cpu_msm.hpp``. The v1
pipeline (ops/msm_tpu.py) is bottlenecked by random-access memory ops that
run at ~2 GB/s on TPU (global argsort, (N, L) row gathers, bucket scatters).
This pipeline has NONE of those:

  per window-group (wg windows batched into the lane axis so every stage
  amortizes its dispatch/DMA floor):
  1. signed digits                                     (XLA)
  2. per (window, tile of T points): single-u32 packed row-sort
     (descending key | neg-bit | source idx), with 2^(c-1) dummy slots
     appended so every bucket key occurs in every tile  (lax.sort, 1 column)
  3. point bytes routed to sorted slots by one-hot bf16 MATMULS on the MXU
     (dense compute instead of random access; exact because one-hot rows
     have a single nonzero and bytes fit bf16's 8-bit significand)
  4. Pallas suffix-fold kernel over C = wg*tiles lanes: two running
     accumulators per lane (E += P; D += E at key-run ends) — see
     pallas/msm_fold2.py for why this equals sum_k k*B_k
  5. cross-tile roll-scan reduce (per window) + window Horner on host ints.

TPU layout rule observed throughout: uint32 arrays are tiled (8, 128) on
their last two axes, so every large array keeps a BIG trailing axis (K, n,
or C = wg*tiles); (n, 8)-shaped limb arrays would be padded 16x in HBM.
Scalars/points therefore travel limb-MAJOR ((L, n)) at the jit boundary.
Lanes are ordered tile-major: lane = t*wg + w.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.curves.params import get_curve
from icicle_tpu.ops.msm import signed_window_count
from icicle_tpu.curves.host_ec import ec_add, ec_dbl, INF
from icicle_tpu.pallas.msm_fold2 import make_suffix_fold, make_suffix_fold_xla

_IDX_BITS = 13
_IDX_MASK = (1 << _IDX_BITS) - 1     # 8191; dummy slots use idx == mask
_KEY_SHIFT = _IDX_BITS + 1


def _plan2(n: int, c: int | None, nbits: int, T: int | None):
    # T=2048 balances the one-hot permute (MACs ~ n*T) against dummy-slot
    # overhead (M/T) and per-tile compression
    T = T or min(2048, n)
    T = min(T, n)
    if c is None:
        # minimize W(c) * (T + M(c)): fold slots across all windows
        best = None
        for cc in range(4, 13):
            w = (nbits + cc) // cc + 1
            cost = w * (T + (1 << (cc - 1)))
            if best is None or cost < best[1]:
                best = (cc, cost)
        c = best[0]
    M = 1 << (c - 1)
    assert T + 1 < _IDX_MASK, "tile too large for the packed-sort layout"
    assert M <= ((1 << 31) >> _KEY_SHIFT), "window too large for packed sort"
    n_windows = signed_window_count(nbits, c)
    tiles = -(-n // T)
    tiles = 1 << max(0, (tiles - 1).bit_length())
    # windows per fold pass: target <= 16384 lanes, bounded by ~4 GB of
    # in-flight permuted data (~256B per slot incl. bf16 padding); balanced
    # across groups (lane groups of wg*B_g lanes handle any wg)
    byte_budget = 4 << 30
    per_window = tiles * (T + M) * 256
    wg = max(1, min(n_windows, 16384 // tiles, byte_budget // per_window))
    n_groups = -(-n_windows // wg)
    wg = -(-n_windows // n_groups)
    return c, M, T, tiles, n_windows, wg


def _signed_digits_t(scalars_t, c: int, nbits: int):
    """(Ls, N) u32 canonical limb-major scalars -> (W, N) int32 signed digits
    (same math as ops/msm._signed_digits, limb-major input layout)."""
    n_windows = signed_window_count(nbits, c)
    half = 1 << (c - 1)
    full = 1 << c
    mask = jnp.uint32(full - 1)
    nlimbs = scalars_t.shape[0]

    digits = []
    carry = jnp.zeros(scalars_t.shape[1:], dtype=jnp.int32)
    for w in range(n_windows):
        bit = w * c
        li, off = bit >> 5, bit & 31
        if li >= nlimbs:
            raw = jnp.zeros(scalars_t.shape[1:], dtype=jnp.uint32)
        else:
            raw = scalars_t[li] >> off
            if off + c > 32 and li + 1 < nlimbs:
                raw = raw | (scalars_t[li + 1] << (32 - off))
        v = (raw & mask).astype(jnp.int32) + carry
        is_high = v > half
        digits.append(jnp.where(is_high, v - full, v))
        carry = is_high.astype(jnp.int32)
    return jnp.stack(digits, axis=0)


def _reduce_tiles_all(group, folds, n_groups: int, wg: int, tiles: int,
                      nl: int):
    """Cross-tile sum for EVERY window at once: folds (n_groups, 3, L,
    C=tiles*wg, tile-major lanes) -> (n_groups*wg, 3, L). One roll-scan tree
    (log2(tiles) iterations of a single add instance) batched over all
    windows."""
    from icicle_tpu.curves.group import Projective

    # (ng, 3, L, tiles, wg) -> (tiles, ng*wg, L)
    def arr(i):
        a = folds[:, i].reshape(n_groups, nl, tiles, wg)
        return jnp.transpose(a, (2, 0, 3, 1)).reshape(tiles, n_groups * wg,
                                                      nl)

    pts = Projective(arr(0), arr(1), arr(2))
    steps = max(1, (tiles - 1).bit_length())
    shifts = jnp.asarray([1 << k for k in range(steps)], dtype=jnp.int32)
    idx = jnp.arange(tiles, dtype=jnp.int32)

    def body(p, d):
        rolled = jax.tree_util.tree_map(lambda a: jnp.roll(a, d, axis=0), p)
        combined = group.add(rolled, p)
        keep = (idx < d)[:, None, None]
        newp = jax.tree_util.tree_map(
            lambda a, b: jnp.where(keep, a, b), p, combined)
        return newp, None

    out, _ = jax.lax.scan(body, pts, shifts)
    last = jax.tree_util.tree_map(lambda a: a[-1], out)     # (W_pad, L)
    return jnp.stack([last.x, last.y, last.z], axis=1)      # (W_pad, 3, L)


@functools.lru_cache(maxsize=None)
def _jitted_pipeline2(curve_name: str, c: int, nbits: int, n_pad: int, T: int,
                      tiles: int, wg: int, backend: str):
    curve = get_curve(curve_name)
    fq = curve.fq
    nl = fq.nlimbs
    M = 1 << (c - 1)
    K = T + M
    n_windows = signed_window_count(nbits, c)
    kmax = M
    C = wg * tiles
    # lane group = wg windows x B_g tiles (so the permute scan's chunk axis
    # IS the kernel's group axis); <= 1024 lanes per group
    b = max(1, 1024 // wg)
    B_g = min(tiles, 1 << (b.bit_length() - 1))   # pow2 divisor of tiles
    G = wg * B_g

    if backend == "pallas":
        fold = make_suffix_fold(curve_name, K, C, G)
    else:
        fold = make_suffix_fold_xla(curve_name, K, C)

    iota_t = jnp.arange(T, dtype=jnp.uint32)
    # dummy slots: keys 1..M (descending-packed), idx = sentinel
    dummy_pack = ((jnp.uint32(kmax) - jnp.arange(1, M + 1, dtype=jnp.uint32))
                  << _KEY_SHIFT) | jnp.uint32(_IDX_MASK)

    def group_fn(points_u8, digits_g):
        """points_u8 (tiles, T, 8L) Montgomery coord bytes (x||y); digits_g
        (wg, tiles, T) int32 -> window sums (wg, 3, L) u32 Montgomery."""
        key = jnp.abs(digits_g).astype(jnp.uint32)
        neg = (digits_g < 0).astype(jnp.uint32)
        pack = ((jnp.uint32(kmax) - key) << _KEY_SHIFT) | (neg << _IDX_BITS) \
            | iota_t[None, None, :]
        pack = jnp.concatenate(
            [pack, jnp.broadcast_to(dummy_pack, (wg, tiles, M))], axis=2)
        spack = jax.lax.sort([pack], dimension=2, num_keys=1)[0]  # (wg,t,K)

        skey = (jnp.uint32(kmax) - (spack >> _KEY_SHIFT)).astype(jnp.int32)
        sneg = (spack >> _IDX_BITS) & 1
        sidx = (spack & _IDX_MASK).astype(jnp.int32)
        is_real = sidx != _IDX_MASK
        nxt = jnp.concatenate(
            [skey[:, :, 1:], jnp.full((wg, tiles, 1), -1, jnp.int32)], axis=2)
        is_dacc = (skey != nxt) & (skey >= 1)

        # one-hot permute on the MXU, chunked over tiles; all wg windows of a
        # tile share one dot_general (rows = wg*K). bf16 is exact here: bytes
        # <= 255 fit the 8-bit significand and every one-hot row has exactly
        # ONE nonzero (dummy rows: none -> zero bytes; handled by is_real).
        nbytes = points_u8.shape[-1]

        # chunk == lane group: each scan step covers B_g tiles x wg windows
        # and emits its (K, nbytes+8, G) slice of the kernel input directly —
        # no whole-array transpose, no XLA unpack (the kernel assembles
        # limbs and applies y-negation in VMEM). The flag word (bit0 is_real,
        # bit1 is_dacc, bit2 negate_y; values 0..7 are exact in bf16) rides
        # as row nbytes; rows nbytes+1..+7 pad the sublane tiling.
        fl_full = (is_real.astype(jnp.int32) + 2 * is_dacc.astype(jnp.int32)
                   + 4 * sneg.astype(jnp.int32))     # (wg, tiles, K)
        fl_t = jnp.transpose(fl_full, (1, 0, 2))     # (tiles, wg, K)

        def chunk(_, args):
            si, pb, fc = args  # (B_g, wg, K), (B_g, T, nbytes), (B_g, wg, K)
            oh = (si.reshape(-1, wg * K)[:, :, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
                  ).astype(jnp.bfloat16)    # (B_g, wg*K, T)
            out = jax.lax.dot_general(
                oh, pb.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.bfloat16)  # (B_g, wg*K, nbytes)
            out = out.reshape(B_g, wg, K, nbytes)
            # in-group lane = tile_in_block*wg + w
            out = jnp.transpose(out, (2, 3, 0, 1)).reshape(K, nbytes, G)
            fl = jnp.transpose(fc, (2, 0, 1)).reshape(
                K, 1, G).astype(jnp.bfloat16)
            pad = jnp.zeros((K, 7, G), jnp.bfloat16)
            return None, jnp.concatenate([out, fl, pad], axis=1)

        ng = C // G
        sid_t = jnp.transpose(sidx, (1, 0, 2))       # (tiles, wg, K)
        _, perm = jax.lax.scan(
            chunk, None,
            (sid_t.reshape(ng, B_g, wg, K),
             points_u8.reshape(ng, B_g, T, nbytes),
             fl_t.reshape(ng, B_g, wg, K)))          # (ng, K, nbytes+8, G)

        dx, dy, dz = fold(perm)                      # (L, C)
        return jnp.stack([dx, dy, dz])               # (3, L, C)

    n_groups = -(-n_windows // wg)
    w_pad = n_groups * wg

    @jax.jit
    def run(scalars_t, points_u8):
        digits = _signed_digits_t(scalars_t, c, nbits)      # (W, n_pad)
        if w_pad != n_windows:
            digits = jnp.concatenate(
                [digits, jnp.zeros((w_pad - n_windows, digits.shape[1]),
                                   digits.dtype)], axis=0)
        digits = digits.reshape(n_groups, wg, tiles, T)

        def body(_, dg):
            return None, group_fn(points_u8, dg)

        _, folds = jax.lax.scan(body, None, digits)         # (ng, 3, L, C)
        # ONE batched cross-tile reduce for every window (lane = t*wg + w)
        from icicle_tpu.curves.group import get_group
        from icicle_tpu.math.bigint import mul_mode
        import contextlib
        group = get_group(curve_name)
        mm = (mul_mode("unrolled") if backend == "pallas"
              else contextlib.nullcontext())
        with mm:
            wsums = _reduce_tiles_all(group, folds, n_groups, wg, tiles, nl)
        return wsums[:n_windows]                            # (W, 3, L)

    return run


@functools.lru_cache(maxsize=None)
def _prep_fn(curve_name: str, n_pad: int, tiles: int, T: int):
    """(L, n_pad) canonical limb-major coords -> (tiles, T, 8L) Montgomery
    bytes, converted in column chunks to bound the (chunk, L) padded temps."""
    fq = get_curve(curve_name).fq
    nl = fq.nlimbs
    ch = T if tiles < 64 else 64 * T
    n_chunks = n_pad // ch
    assert n_chunks * ch == n_pad

    @jax.jit
    def prep(px_t, py_t):
        def body(cols):
            x_t, y_t = cols                          # (L, ch) each
            xm = fq.to_mont(x_t.T)                   # (ch, L) Montgomery
            ym = fq.to_mont(y_t.T)
            limbs = jnp.concatenate([xm, ym], axis=-1)   # (ch, 2L)
            b = jnp.stack([limbs & 0xFF, (limbs >> 8) & 0xFF,
                           (limbs >> 16) & 0xFF, (limbs >> 24) & 0xFF],
                          axis=-1)
            return b.reshape(ch, 8 * nl).astype(jnp.uint8)

        xr = px_t.reshape(nl, n_chunks, ch).transpose(1, 0, 2)
        yr = py_t.reshape(nl, n_chunks, ch).transpose(1, 0, 2)
        out = jax.lax.map(body, (xr, yr))            # (n_chunks, ch, 8L)
        return out.reshape(tiles, T, 8 * nl)

    return prep


def msm_tpu2(curve_name: str, scalars, points_x, points_y,
             c: int | None = None, T: int | None = None,
             backend: str = "pallas"):
    """Suffix-fold MSM. scalars (N, Ls) canonical u32 limbs; points canonical
    affine (N, L). Returns canonical affine (x, y) python ints ((0,0) = INF).

    backend: "pallas" (Mosaic kernel) or "xla" (lax.scan twin for CPU tests).
    """
    curve = get_curve(curve_name)
    fq, fr = curve.fq, curve.fr
    n = scalars.shape[0]
    nbits = fr.modulus.bit_length()
    c, M, T, tiles, n_windows, wg = _plan2(n, c, nbits, T)
    n_pad = tiles * T

    def pad_t(a, width):
        out = np.zeros((width, n_pad), dtype=np.uint32)
        out[:, :n] = np.asarray(a).T
        return out

    scal_t = pad_t(scalars, scalars.shape[1])
    px_t = pad_t(points_x, fq.nlimbs)
    py_t = pad_t(points_y, fq.nlimbs)
    pts_u8 = _prep_fn(curve_name, n_pad, tiles, T)(px_t, py_t)

    run = _jitted_pipeline2(curve_name, c, nbits, n_pad, T, tiles, wg, backend)
    wsums = np.asarray(run(scal_t, pts_u8))                 # (W, 3, L)

    # host Horner over windows (W points; python ints)
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

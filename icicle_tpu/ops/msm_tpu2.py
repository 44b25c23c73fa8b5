"""Suffix-fold MSM pipeline (v2) — the TPU-native large-n path.

Reference surface: ``include/icicle/msm.h`` (msm + msm_precompute_bases with
MSMConfig.precompute_factor/c), CPU algorithm ``cpu_msm.hpp``. The v1
pipeline (ops/msm_tpu.py) is bottlenecked by random-access memory ops that
run at ~2 GB/s on TPU (global argsort, (N, L) row gathers, bucket scatters).
This pipeline has NONE of those:

  per window-group (wg windows batched into the lane axis so every stage
  amortizes its dispatch/DMA floor):
  1. signed digits                                     (XLA, shared with v1)
  2. per (window, tile of T points): single-u32 packed row-sort
     (descending key | neg-bit | source idx), with 2^(c-1) dummy slots
     appended so every bucket key occurs in every tile  (lax.sort, 1 column)
  3. point bytes routed to sorted slots by one-hot MATMULS on the MXU
     (dense compute instead of random access)
  4. Pallas suffix-fold kernel over C = wg*tiles lanes: two running
     accumulators per lane (E += P; D += E at key-run ends) — see
     pallas/msm_fold2.py for why this equals sum_k k*B_k
  5. cross-tile roll-scan reduce (per window) + window Horner on host ints.

Every stage is O(n) sequential HBM traffic + MXU matmuls + VPU limb math.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.host_ec import ec_add, ec_dbl, INF
from icicle_tpu.ops.msm import _signed_digits
from icicle_tpu.pallas.msm_fold2 import make_suffix_fold, make_suffix_fold_xla

_IDX_BITS = 13
_IDX_MASK = (1 << _IDX_BITS) - 1     # 8191; dummy slots use idx == mask
_KEY_SHIFT = _IDX_BITS + 1


def _plan2(n: int, c: int | None, nbits: int, T: int | None):
    T = T or min(4096, n)
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
    n_windows = (nbits + c) // c + 1
    tiles = -(-n // T)
    tiles = 1 << max(0, (tiles - 1).bit_length())
    # windows per fold pass: target <= 16384 lanes, bounded by ~5 GB of
    # permuted coordinate arrays per pass; then balance the groups
    byte_budget = 5 << 30
    per_window = tiles * (T + M) * 8 * 4 * 2
    wg = max(1, min(n_windows, 16384 // tiles, byte_budget // per_window))
    n_groups = -(-n_windows // wg)
    wg = -(-n_windows // n_groups)
    return c, M, T, tiles, n_windows, wg


def _reduce_tiles(group, dx, dy, dz, wg: int, tiles: int):
    """Per-window sum over tiles: (L, wg*tiles) -> (wg, 3, L).

    Roll-scan tree along the tile axis (one add instance in the graph),
    batched over the window axis.
    """
    from icicle_tpu.curves.group import Projective

    nl = dx.shape[0]
    # (L, wg*tiles) -> (tiles, wg, L)
    arr = lambda a: jnp.transpose(a.reshape(nl, wg, tiles), (2, 1, 0))
    pts = Projective(arr(dx), arr(dy), arr(dz))
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
    last = jax.tree_util.tree_map(lambda a: a[-1], out)     # (wg, L)
    return jnp.stack([last.x, last.y, last.z], axis=1)      # (wg, 3, L)


@functools.lru_cache(maxsize=None)
def _jitted_pipeline2(curve_name: str, c: int, nbits: int, n_pad: int, T: int,
                      tiles: int, wg: int, backend: str):
    curve = get_curve(curve_name)
    fq = curve.fq
    f = fq.engine
    nl = fq.nlimbs
    M = 1 << (c - 1)
    K = T + M
    n_windows = (nbits + c) // c + 1
    kmax = M
    C = wg * tiles

    if backend == "pallas":
        fold = make_suffix_fold(curve_name, K, C)
    else:
        fold = make_suffix_fold_xla(curve_name, K, C)

    iota_t = jnp.arange(T, dtype=jnp.uint32)
    # dummy slots: keys 1..M (descending-packed), idx = sentinel
    dummy_pack = ((jnp.uint32(kmax) - jnp.arange(1, M + 1, dtype=jnp.uint32))
                  << _KEY_SHIFT) | jnp.uint32(_IDX_MASK)

    def group_fn(points_i8, digits_g):
        """points_i8 (tiles, T, 2L*4) int8 biased bytes; digits_g
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
        # ONE nonzero, so no accumulation ever happens. Dummy rows are
        # all-zero -> zero bytes (handled by is_real in the fold kernel).
        nbytes = points_i8.shape[-1]

        def chunk(_, args):
            si, pb = args               # (B, wg, K), (B, T, nbytes)
            oh = (si.reshape(-1, wg * K)[:, :, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
                  ).astype(jnp.bfloat16)    # (B, wg*K, T)
            out = jax.lax.dot_general(
                oh, pb.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.bfloat16)  # (B, wg*K, nbytes)
            return None, out

        B = max(1, min(tiles, (1 << 27) // (wg * K * T)))
        while tiles % B:
            B -= 1
        sid_t = jnp.transpose(sidx, (1, 0, 2))       # (tiles, wg, K)
        _, perm = jax.lax.scan(
            chunk, None,
            (sid_t.reshape(tiles // B, B, wg, K),
             points_i8.reshape(tiles // B, B, T, nbytes)))
        perm = perm.reshape(tiles, wg, K, nbytes)

        b = perm.astype(jnp.uint32)
        b4 = b.reshape(tiles, wg, K, 2 * nl, 4)
        limbs = (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
                 | (b4[..., 3] << 24))               # (tiles, wg, K, 2L)
        x = limbs[..., :nl]
        y = limbs[..., nl:]
        sneg_t = jnp.transpose(sneg, (1, 0, 2))
        y = jnp.where((sneg_t == 1)[..., None], f.neg(y), y)

        # (tiles, wg, K, L) -> (K, L, wg*tiles); lane = w*tiles + t
        def to_kernel(a):
            return jnp.transpose(a, (2, 3, 1, 0)).reshape(K, nl, C)
        xs = to_kernel(x)
        ys = to_kernel(y)
        flags = jnp.stack([is_real.astype(jnp.int32),
                           is_dacc.astype(jnp.int32)], axis=2)  # (wg,t,2,K)
        flags = jnp.transpose(flags, (3, 2, 0, 1)).reshape(K, 2, C)

        dx, dy, dz = fold(xs, ys, flags)             # (L, C)
        from icicle_tpu.curves.group import get_group
        from icicle_tpu.math.bigint import mul_mode
        import contextlib
        group = get_group(curve_name)
        mm = (mul_mode("unrolled") if backend == "pallas"
              else contextlib.nullcontext())
        with mm:
            return _reduce_tiles(group, dx, dy, dz, wg, tiles)  # (wg, 3, L)

    n_groups = -(-n_windows // wg)
    w_pad = n_groups * wg

    @jax.jit
    def run(scalars, points_i8):
        digits = _signed_digits(scalars, c, nbits)          # (W, n_pad)
        if w_pad != n_windows:
            digits = jnp.concatenate(
                [digits, jnp.zeros((w_pad - n_windows, digits.shape[1]),
                                   digits.dtype)], axis=0)
        digits = digits.reshape(n_groups, wg, tiles, T)

        def body(_, dg):
            return None, group_fn(points_i8, dg)

        _, wsums = jax.lax.scan(body, None, digits)
        return wsums.reshape(w_pad, 3, nl)[:n_windows]      # (W, 3, L)

    return run


@functools.lru_cache(maxsize=None)
def _prep_fn(nl: int, n: int, n_pad: int, tiles: int, T: int):
    @jax.jit
    def prep(px, py):
        limbs = jnp.concatenate([px, py], axis=-1)          # (n, 2L)
        pad = n_pad - n
        if pad:
            limbs = jnp.concatenate(
                [limbs, jnp.zeros((pad, 2 * nl), jnp.uint32)], axis=0)
        b = jnp.stack([limbs & 0xFF, (limbs >> 8) & 0xFF,
                       (limbs >> 16) & 0xFF, (limbs >> 24) & 0xFF], axis=-1)
        b = b.reshape(n_pad, 8 * nl).astype(jnp.uint8)
        return b.reshape(tiles, T, 8 * nl)

    return prep


def _prep_points_i8(fq, px_mont, py_mont, n_pad: int, tiles: int, T: int):
    """Montgomery affine coords -> (tiles, T, 8L) u8 bytes."""
    return _prep_fn(fq.nlimbs, px_mont.shape[0], n_pad, tiles, T)(
        px_mont, py_mont)


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
    if n_pad != n:
        scalars = jnp.concatenate(
            [jnp.asarray(scalars),
             jnp.zeros((n_pad - n, scalars.shape[1]), jnp.uint32)], axis=0)

    px_m = fq.to_mont(points_x)
    py_m = fq.to_mont(points_y)
    pts_i8 = _prep_points_i8(fq, px_m, py_m, n_pad, tiles, T)

    run = _jitted_pipeline2(curve_name, c, nbits, n_pad, T, tiles, wg, backend)
    wsums = np.asarray(run(scalars, pts_i8))                # (W, 3, L)

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

"""Suffix-fold MSM pipeline (v2) — the TPU-native large-n path.

Reference surface: ``include/icicle/msm.h`` (msm + msm_precompute_bases with
MSMConfig.precompute_factor/c), CPU algorithm ``cpu_msm.hpp``. The v1
pipeline (ops/msm_tpu.py) is bottlenecked by random-access memory ops that
run at ~2 GB/s on TPU (global argsort, (N, L) row gathers, bucket scatters).
This pipeline has NONE of those:

  per window:
  1. signed digits                                     (XLA, shared with v1)
  2. per tile of T points: single-u32 packed row-sort
     (descending key | neg-bit | source idx), with 2^(c-1) dummy slots
     appended so every bucket key occurs in every tile  (lax.sort, 1 column)
  3. point bytes routed to sorted slots by one-hot int8 MATMULS on the MXU
     (dense compute instead of random access)
  4. Pallas suffix-fold kernel: two running accumulators per tile-lane
     (E += P; D += E at key-run ends) — see pallas/msm_fold2.py for why this
     equals sum_k k*B_k — then a lane all-reduce over tiles
  5. window Horner combine on host ints (W points).

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
_NEG_BIT = 1 << _IDX_BITS
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
    # lane all-reduce needs a power-of-two lane count
    tiles = 1 << max(0, (tiles - 1).bit_length())
    return c, M, T, tiles, n_windows


@functools.lru_cache(maxsize=None)
def _jitted_pipeline2(curve_name: str, c: int, nbits: int, n_pad: int, T: int,
                      tiles: int, backend: str):
    curve = get_curve(curve_name)
    fq = curve.fq
    f = fq.engine
    nl = fq.nlimbs
    M = 1 << (c - 1)
    K = T + M
    n_windows = (nbits + c) // c + 1
    kmax = M

    if backend == "pallas":
        fold = make_suffix_fold(curve_name, K, tiles)
    else:
        fold = make_suffix_fold_xla(curve_name, K, tiles)

    iota_t = jnp.arange(T, dtype=jnp.uint32)
    # dummy slots: keys 1..M (descending-packed), idx = sentinel
    dummy_pack = ((jnp.uint32(kmax) - jnp.arange(1, M + 1, dtype=jnp.uint32))
                  << _KEY_SHIFT) | jnp.uint32(_IDX_MASK)

    def window_fn(points_i8, digits_w):
        """points_i8 (tiles, T, 2L*4) int8 (biased bytes); digits_w (tiles, T)
        int32 -> window sum (3, L) u32 Montgomery projective."""
        key = jnp.abs(digits_w).astype(jnp.uint32)
        neg = (digits_w < 0).astype(jnp.uint32)
        pack = ((jnp.uint32(kmax) - key) << _KEY_SHIFT) | (neg << _IDX_BITS) \
            | iota_t[None, :]
        pack = jnp.concatenate(
            [pack, jnp.broadcast_to(dummy_pack, (tiles, M))], axis=1)
        spack = jax.lax.sort([pack], dimension=1, num_keys=1)[0]  # (tiles, K)

        skey = (jnp.uint32(kmax) - (spack >> _KEY_SHIFT)).astype(jnp.int32)
        sneg = (spack >> _IDX_BITS) & 1
        sidx = (spack & _IDX_MASK).astype(jnp.int32)
        is_real = sidx != _IDX_MASK
        nxt = jnp.concatenate(
            [skey[:, 1:], jnp.full((tiles, 1), -1, jnp.int32)], axis=1)
        is_dacc = (skey != nxt) & (skey >= 1)

        # one-hot permute on the MXU, chunked over tiles
        nbytes = points_i8.shape[-1]

        def chunk(_, args):
            si, pi8 = args                       # (B, K), (B, T, nbytes)
            oh = (si[:, :, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
                  ).astype(jnp.int8)
            out = jax.lax.dot_general(
                oh, pi8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # (B, K, nbytes)
            return None, out

        B = max(1, min(tiles, (1 << 27) // (K * T)))
        while tiles % B:
            B -= 1
        _, perm = jax.lax.scan(
            chunk, None,
            (sidx.reshape(tiles // B, B, K),
             points_i8.reshape(tiles // B, B, T, nbytes)))
        perm = perm.reshape(tiles, K, nbytes)

        # un-bias bytes (dummy rows sum to 0 -> stay 0) and pack to u32 limbs
        b = (perm + 128 * is_real[:, :, None].astype(jnp.int32))
        b = b.astype(jnp.uint32)
        b4 = b.reshape(tiles, K, 2 * nl, 4)
        limbs = (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
                 | (b4[..., 3] << 24))             # (tiles, K, 2L)
        x = limbs[..., :nl]
        y = limbs[..., nl:]
        y = jnp.where((sneg == 1)[..., None], f.neg(y), y)

        xs = jnp.transpose(x, (1, 2, 0))           # (K, L, tiles)
        ys = jnp.transpose(y, (1, 2, 0))
        flags = jnp.stack([is_real.astype(jnp.int32),
                           is_dacc.astype(jnp.int32)], axis=1)  # (tiles,2,K)
        flags = jnp.transpose(flags, (2, 1, 0))    # (K, 2, tiles)

        dx, dy, dz = fold(xs, ys, flags)           # per-tile sums (L, C)
        # cross-tile reduce: roll-scan tree (one add instance in the graph).
        # Straight-line montmuls on TPU (device-loop iterations are ~270us
        # each there); loop-form on compile-bound CPU hosts.
        import contextlib
        from icicle_tpu.curves.group import get_group, Projective
        from icicle_tpu.ops.msm import _prefix_scan_add
        from icicle_tpu.math.bigint import mul_mode
        group = get_group(curve_name)
        pts = Projective(dx.T, dy.T, dz.T)         # (C, L)
        mm = (mul_mode("unrolled") if backend == "pallas"
              else contextlib.nullcontext())
        with mm:
            tot = _prefix_scan_add(group, pts)
        return jnp.stack([tot.x[-1], tot.y[-1], tot.z[-1]])  # (3, L)

    @jax.jit
    def run(scalars, points_i8):
        digits = _signed_digits(scalars, c, nbits)          # (W, n_pad)
        digits = digits.reshape(n_windows, tiles, T)

        def body(_, dw):
            return None, window_fn(points_i8, dw)

        _, wsums = jax.lax.scan(body, None, digits)
        return wsums                                        # (W, 3, L)

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
        return (b ^ jnp.uint8(0x80)).astype(jnp.int8).reshape(tiles, T, 8 * nl)

    return prep


def _prep_points_i8(fq, px_mont, py_mont, n_pad: int, tiles: int, T: int):
    """Montgomery affine coords -> (tiles, T, 8L) biased int8 bytes."""
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
    c, M, T, tiles, n_windows = _plan2(n, c, nbits, T)
    n_pad = tiles * T
    if n_pad != n:
        scalars = jnp.concatenate(
            [jnp.asarray(scalars),
             jnp.zeros((n_pad - n, scalars.shape[1]), jnp.uint32)], axis=0)

    px_m = fq.to_mont(points_x)
    py_m = fq.to_mont(points_y)
    pts_i8 = _prep_points_i8(fq, px_m, py_m, n_pad, tiles, T)

    run = _jitted_pipeline2(curve_name, c, nbits, n_pad, T, tiles, backend)
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

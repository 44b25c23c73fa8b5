"""TPU-optimized MSM pipeline around the Pallas bucket-accumulation kernel.

Pipeline (per window, all windows in one kernel grid):
  1. signed digit extraction (XLA, shared with ops/msm.py),
  2. sort by |digit| + gather points, sign applied to y (XLA sort/gather),
  3. lane-chunked segmented fold — the Pallas kernel (pallas/msm_kernel.py),
  4. bucket assembly: global segment ends + cross-lane tail stitching (XLA
     roll-scan over the C lane tails),
  5. weighted bucket reduction sum_k k*B_k via two suffix prefix-scans (XLA),
  6. window Horner combine on HOST python ints (a few hundred point ops —
     cheaper than a device scan of that depth).

Returns canonical affine coordinates.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group, Projective, pselect
from icicle_tpu.curves.host_ec import ec_add, ec_dbl, INF
from icicle_tpu.ops.msm import (
    _signed_digits, _auto_c, _segmented_scan_add, _prefix_scan_add,
    signed_window_count,
)
from icicle_tpu.pallas.msm_kernel import make_bucket_accum, make_bucket_accum_xla


def _plan(n: int, c: int | None, nbits: int, lanes: int):
    # cap auto-c at 12: larger windows shrink arithmetic but blow up the
    # weighted bucket-reduction scans (measured on TPU: c=12 is 5x faster
    # than c=16 at 2^20 — 0.69 vs 0.14 M pts/s)
    c = c or min(_auto_c(n), 12)
    n_windows = signed_window_count(nbits, c)
    lanes = min(lanes, n)
    k_steps = n // lanes
    assert lanes * k_steps == n, "n must be divisible by the lane count"
    return c, n_windows, k_steps, lanes


@functools.lru_cache(maxsize=None)
def _jitted_pipeline(curve_name: str, c: int, nbits: int, n: int, lanes: int,
                     backend: str, wchunk: int | None = None):
    """Jitted window-chunk pipeline: processes `wchunk` windows at a time
    (None = all W windows in one pass). Chunking bounds peak HBM at large n:
    each chunk holds sorted point copies + fold outputs for wchunk windows."""
    curve = get_curve(curve_name)
    group = get_group(curve_name)
    f = curve.fq.engine
    total_windows = signed_window_count(nbits, c)
    n_windows = wchunk or total_windows
    k_steps = n // lanes
    m_buckets = 1 << (c - 1)
    if backend == "pallas":
        kernel = make_bucket_accum(curve_name, n_windows, k_steps, lanes)
    else:
        kernel = make_bucket_accum_xla(curve_name, n_windows, k_steps, lanes)

    def run_chunk(digits, px_mont, py_mont):
        keys = jnp.abs(digits)
        order = jax.vmap(jnp.argsort)(keys)                 # (W, N)
        k_sorted = jnp.take_along_axis(keys, order, axis=1)
        d_sorted = jnp.take_along_axis(digits, order, axis=1)
        xs = px_mont[order]                                 # (W, N, L)
        ys = py_mont[order]
        ys = jnp.where((d_sorted < 0)[..., None], f.neg(ys), ys)

        W = n_windows
        L = xs.shape[-1]
        lane_keys = k_sorted.reshape(W, lanes, k_steps).transpose(0, 2, 1)
        lane_x = xs.reshape(W, lanes, k_steps, L).transpose(0, 2, 1, 3)
        lane_y = ys.reshape(W, lanes, k_steps, L).transpose(0, 2, 1, 3)

        vx, vy, vz = kernel(lane_keys.astype(jnp.int32), lane_x, lane_y)

        from icicle_tpu.math.bigint import mul_mode
        import contextlib
        # On the pallas path the XLA-side scans below must trace with
        # straight-line montmuls: each lax.scan iteration costs ~270us of
        # loop overhead on TPU, so the body must amortize it.
        mm = mul_mode("unrolled") if backend == "pallas" else contextlib.nullcontext()
        with mm:
            return _bucket_phase(vx, vy, vz, k_sorted, lane_keys)

    def _bucket_phase(vx, vy, vz, k_sorted, lane_keys):
        W = n_windows
        L = vx.shape[-1]

        # back to sorted-position space
        def to_pos(v):
            return v.transpose(0, 2, 1, 3).reshape(W, n, L)
        Vx, Vy, Vz = to_pos(vx), to_pos(vy), to_pos(vz)

        # global segment ends -> buckets0
        last = jnp.concatenate(
            [k_sorted[:, 1:] != k_sorted[:, :-1],
             jnp.ones((W, 1), bool)], axis=1)
        idx = jnp.where(last & (k_sorted > 0), k_sorted, m_buckets + 1)
        ident = group.identity((W, m_buckets + 1))

        def scat(bz, vals):
            return jax.vmap(lambda b, i, v: b.at[i].set(v, mode="drop"))(
                bz, idx, vals)
        buckets0 = Projective(scat(ident.x, Vx), scat(ident.y, Vy),
                              scat(ident.z, Vz))

        # cross-lane tail stitching
        final_keys = lane_keys[:, -1, :]                    # (W, C)
        first_keys = lane_keys[:, 0, :]
        finals = Projective(vx[:, -1], vy[:, -1], vz[:, -1])  # (W, C, L)
        cont = jnp.concatenate(
            [first_keys[:, 1:] == final_keys[:, :-1],
             jnp.zeros((W, 1), bool)], axis=1)
        tail_mask = cont & (final_keys > 0)
        tails = pselect(tail_mask, finals, group.identity((W, lanes)))

        first_lane = jnp.concatenate(
            [jnp.ones((W, 1), bool),
             final_keys[:, 1:] != final_keys[:, :-1]], axis=1)

        def seg_w(pts, flags):
            return _segmented_scan_add(group, pts, flags)
        scanned_tails = jax.vmap(seg_w)(tails, first_lane)
        run_end = jnp.concatenate(
            [final_keys[:, 1:] != final_keys[:, :-1],
             jnp.ones((W, 1), bool)], axis=1)
        tidx = jnp.where(run_end & (final_keys > 0), final_keys,
                         m_buckets + 1)

        def scat_t(bz, vals):
            return jax.vmap(lambda b, i, v: b.at[i].set(v, mode="drop"))(
                bz, tidx, vals)
        buckets1 = Projective(scat_t(ident.x, scanned_tails.x),
                              scat_t(ident.y, scanned_tails.y),
                              scat_t(ident.z, scanned_tails.z))

        buckets = group.add(buckets0, buckets1)

        # weighted reduction: two prefix scans over reversed buckets 1..M
        rev = jax.tree_util.tree_map(lambda a: a[:, 1:][:, ::-1], buckets)
        r1 = jax.vmap(lambda p: _prefix_scan_add(group, p))(rev)
        r2 = jax.vmap(lambda p: _prefix_scan_add(group, p))(r1)
        wsum = jax.tree_util.tree_map(lambda a: a[:, -1], r2)  # (W, L)
        return wsum

    jit_chunk = jax.jit(run_chunk)
    jit_digits = jax.jit(
        lambda scalars: _signed_digits(scalars, c, nbits))

    def run(scalars, px_mont, py_mont):
        digits = jit_digits(scalars)                        # (W_total, N)
        if n_windows >= total_windows:
            return jit_chunk(digits, px_mont, py_mont)
        # pad W to a chunk multiple with zero-digit windows (identity sums)
        g = n_windows
        n_chunks = -(-total_windows // g)
        pad = n_chunks * g - total_windows
        if pad:
            digits = jnp.concatenate(
                [digits, jnp.zeros((pad, digits.shape[1]), digits.dtype)],
                axis=0)
        parts = [jit_chunk(digits[i * g:(i + 1) * g], px_mont, py_mont)
                 for i in range(n_chunks)]
        full = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        return jax.tree_util.tree_map(lambda a: a[:total_windows], full)

    return run


def _auto_wchunk(n: int, n_windows: int, limb_words: int) -> int | None:
    """Windows per pass bounded by a ~4GB HBM working-set budget (sorted
    copies + fold outputs + transposes ~= 10 coord arrays per window)."""
    per_window = n * limb_words * 4 * 10
    budget = 4 << 30
    g = max(1, budget // per_window)
    return None if g >= n_windows else int(g)


def msm_tpu(curve_name: str, scalars, points_x, points_y, c: int | None = None,
            lanes: int = 1024, backend: str = "pallas",
            wchunk: int | str | None = "auto"):
    """Full MSM. scalars (N, Ls) canonical; points canonical affine (N, L).
    Returns canonical affine (x, y) python ints (INF -> (0, 0)).

    backend: "pallas" (Mosaic kernel, TPU) or "xla" (lax.scan fold — the
    reference lowering used by CPU tests). wchunk: windows processed per pass
    ("auto" sizes to HBM)."""
    curve = get_curve(curve_name)
    group = get_group(curve_name)
    fq = curve.fq
    n = scalars.shape[0]
    nbits = curve.fr.modulus.bit_length()
    c, n_windows, k_steps, lanes = _plan(n, c, nbits, lanes)
    if wchunk == "auto":
        wchunk = _auto_wchunk(n, n_windows, fq.nlimbs)

    px_m = fq.to_mont(points_x)
    py_m = fq.to_mont(points_y)
    wsum = _jitted_pipeline(curve_name, c, nbits, n, lanes, backend, wchunk)(
        scalars, px_m, py_m)

    # host Horner over windows (W ~ 20 points; python ints)
    p = fq.modulus
    rinv = pow(1 << (32 * fq.nlimbs), -1, p)

    def limb_int(a) -> int:
        v = 0
        for i, w in enumerate(np.asarray(a, dtype=np.uint32)):
            v |= int(w) << (32 * i)
        return v

    pts = []
    wx = np.asarray(wsum.x)
    wy = np.asarray(wsum.y)
    wz = np.asarray(wsum.z)
    for w in range(n_windows):
        z = limb_int(wz[w]) * rinv % p
        if z == 0:
            pts.append(INF)
            continue
        zi = pow(z, -1, p)
        x = limb_int(wx[w]) * rinv % p * zi % p
        y = limb_int(wy[w]) * rinv % p * zi % p
        pts.append((x, y))

    acc = pts[-1]
    for w in range(n_windows - 2, -1, -1):
        for _ in range(c):
            acc = ec_dbl(acc, p)
        acc = ec_add(acc, pts[w], p)
    return acc if acc is not INF else (0, 0)

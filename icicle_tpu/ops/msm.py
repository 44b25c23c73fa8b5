"""Multi-scalar multiplication (Pippenger) as a TPU-native vectorized kernel.

Reference surface: ``include/icicle/msm.h`` (msm, msm_precompute_bases,
MSMConfig) with the CPU algorithm in ``backend/cpu/src/curve/cpu_msm.hpp``
(signed-digit windows -> per-worker bucket scatter -> segment collapse ->
serial window accumulation).

TPU redesign — no scatter-accumulate, no per-thread buckets:
  1. signed window digits (W, N) extracted from scalar limbs (statically
     unrolled shifts; carry ripple across windows),
  2. per window: sort point indices by |digit| (XLA sort), negate y where the
     digit is negative,
  3. bucket sums via a *flagged segmented* ``lax.associative_scan`` whose
     combiner is the complete projective add — branchless, identity-safe —
     followed by a gather of segment tails into the bucket array,
  4. weighted bucket reduction sum_k k*B_k via a reversed associative scan
     (suffix sums) + binary tree reduce,
  5. Horner combine of window sums (c doublings per step) via ``lax.scan``.

Windows run under ``lax.map`` (sequential) to bound peak HBM; every stage is
batched over N so the VPU stays saturated.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.curves.params import Curve, get_curve
from icicle_tpu.curves.group import (
    Affine, Projective, Group, get_group, pselect,
)


@dataclasses.dataclass
class MSMConfig:
    """Mirror of the reference MSMConfig (msm.h:19-97); TPU-relevant fields."""
    c: int = 0                     # window bits; 0 = auto
    bitsize: int = 0               # scalar bits; 0 = field default
    backend: str | None = None     # None/auto | "xla" | "pallas"
    precompute_factor: int = 1
    batch_size: int = 1
    are_points_shared_in_batch: bool = True  # batch reuses one point set
    # None = auto: single fused vmapped graph on TPU (whole batch in one
    # device program), per-batch dispatch loop elsewhere (XLA:CPU compile
    # of the vmapped pipeline is minutes even at toy sizes)
    batch_vmap: bool | None = None
    are_scalars_montgomery_form: bool = False
    are_points_montgomery_form: bool = False
    g2: bool = False               # operate on the G2 group (msm.h G2 variants)


def _auto_c(n: int, curve_name: str | None = None) -> int:
    """Window-bits choice: measured tuning table first (reference
    decision-tree analog, ops/msm_tuning.py), else the closed-form model
    minimizing W*(n + 4*2^(c-1)) with a graph-size cap."""
    if curve_name is not None:
        from icicle_tpu.ops.msm_tuning import tuned_params
        tp = tuned_params("xla", curve_name, n)
        if tp and tp.get("c"):
            return tp["c"]
    best_c, best_cost = 1, float("inf")
    for c in range(2, 17):
        w = (255 + c) // c + 1
        cost = w * (n + 4 * (1 << (c - 1)))
        if cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def signed_window_count(nbits: int, c: int) -> int:
    """Exact signed-digit window count for scalars < 2^nbits: W = nbits//c+1.

    The conversion keeps v <= 2^(c-1) and emits v - 2^c with carry 1
    otherwise, so window w holds at most (raw bits of k) + 1. With
    W = floor(nbits/c) + 1 the top window covers bits c*(W-1)..nbits-1,
    i.e. raw < 2^(nbits mod c) <= 2^(c-1) even after +1 carry whenever
    nbits mod c != 0; when c | nbits the +1 IS the carry window. The
    previous (nbits+c)//c + 1 formula spent one extra all-zero window
    (3.7% of all MSM slot work at bn254 c=10: 27 -> 26 windows)."""
    return nbits // c + 1


def _signed_digits(scalar_limbs, c: int, nbits: int):
    """(N, Ls) u32 canonical scalars -> (W, N) int32 signed digits.

    Digits lie in [-2^(c-1), 2^(c-1)]; sum_w d_w * 2^(c*w) == scalar.
    Statically unrolled over windows (W is small).
    """
    n_windows = signed_window_count(nbits, c)
    half = 1 << (c - 1)
    full = 1 << c
    mask = jnp.uint32(full - 1)
    nlimbs = scalar_limbs.shape[-1]

    digits = []
    carry = jnp.zeros(scalar_limbs.shape[:-1], dtype=jnp.int32)
    for w in range(n_windows):
        bit = w * c
        li, off = bit >> 5, bit & 31
        if li >= nlimbs:
            raw = jnp.zeros(scalar_limbs.shape[:-1], dtype=jnp.uint32)
        else:
            raw = scalar_limbs[..., li] >> off
            if off + c > 32 and li + 1 < nlimbs:
                raw = raw | (scalar_limbs[..., li + 1] << (32 - off))
        v = (raw & mask).astype(jnp.int32) + carry
        is_high = v > half
        digits.append(jnp.where(is_high, v - full, v))
        carry = is_high.astype(jnp.int32)
    return jnp.stack(digits, axis=0)


def _segmented_scan_add(group: Group, points: Projective, flags):
    """Inclusive segmented prefix-sum of points under EC add.

    flags[i]=True marks the first element of a segment. Hillis-Steele over
    log2(N) steps driven by ``lax.scan`` with a *traced* shift, so the graph
    contains exactly ONE complete-add instance however large N is — essential
    on compile-bound hosts and cheap for XLA to schedule. Work is N·log N
    point adds (vs ~2N for Blelloch), all batched over N lanes.
    """
    n = points.x.shape[0]
    steps = max(1, (n - 1).bit_length())
    shifts = jnp.asarray([1 << k for k in range(steps)], dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def roll(a, d):
        return jnp.roll(a, d, axis=0)

    def body(carry, d):
        f, p = carry
        p_prev = jax.tree_util.tree_map(lambda a: roll(a, d), p)
        f_prev = roll(f, d)
        combined = group.add(p_prev, p)
        # keep own value when this lane already starts a segment or the
        # source lane is out of range (i < d)
        use_self = f | (idx < d)
        newp = pselect(use_self, p, combined)
        newf = f | (f_prev & (idx >= d))
        return (newf, newp), None

    (_, out), _ = jax.lax.scan(body, (flags, points), shifts)
    return out


def _prefix_scan_add(group: Group, pts: Projective) -> Projective:
    """Inclusive prefix-sum of points (same roll-scan trick, no flags)."""
    n = pts.x.shape[0]
    steps = max(1, (n - 1).bit_length())
    shifts = jnp.asarray([1 << k for k in range(steps)], dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(p, d):
        p_prev = jax.tree_util.tree_map(lambda a: jnp.roll(a, d, axis=0), p)
        combined = group.add(p_prev, p)
        return pselect(idx < d, p, combined), None

    out, _ = jax.lax.scan(body, pts, shifts)
    return out


def _window_sum(group: Group, digits_w, px, py, c: int) -> Projective:
    """Bucket-accumulate one window; returns sum_k k * B_k as a point."""
    f = group.f
    n = digits_w.shape[0]
    m_buckets = 1 << (c - 1)

    keys = jnp.abs(digits_w)                      # bucket index, 0..2^(c-1)
    order = jnp.argsort(keys)
    k_sorted = keys[order]
    d_sorted = digits_w[order]
    x_s = px[order]
    y_s = py[order]
    y_s = jnp.where((d_sorted < 0)[..., None], f.neg(y_s), y_s)

    # lift to projective; zero-digit lanes become identity (dropped later)
    valid = (k_sorted != 0)
    ones = jnp.broadcast_to(group.one_mont, x_s.shape)
    z_s = jnp.where(valid[..., None], ones, jnp.zeros_like(ones))
    y_lift = jnp.where(valid[..., None], y_s,
                       jnp.broadcast_to(group.one_mont, y_s.shape))
    leaves = Projective(jnp.where(valid[..., None], x_s, jnp.zeros_like(x_s)),
                        y_lift, z_s)

    first = jnp.concatenate(
        [jnp.ones((1,), bool), k_sorted[1:] != k_sorted[:-1]])
    scanned = _segmented_scan_add(group, leaves, first)

    last = jnp.concatenate(
        [k_sorted[1:] != k_sorted[:-1], jnp.ones((1,), bool)])
    # scatter segment tails into buckets; invalid/zero lanes -> dropped (OOB)
    idx = jnp.where(last & (k_sorted > 0), k_sorted, m_buckets + 1)
    ident = group.identity((m_buckets + 1,))
    buckets = jax.tree_util.tree_map(
        lambda bz, vals: bz.at[idx].set(vals, mode="drop"),
        ident, scanned)

    # weighted reduction: sum_k k*B_k = sum_{j>=1} (sum_{k>=j} B_k).
    # reverse buckets 1..M, prefix-scan twice; the last lane of the second
    # scan is sum_j suffix_j. Two add instances in the graph total.
    rev = jax.tree_util.tree_map(lambda a: a[1:][::-1], buckets)
    r = _prefix_scan_add(group, rev)
    rr = _prefix_scan_add(group, r)
    return jax.tree_util.tree_map(lambda a: a[-1], rr)


def _horner_windows(group: Group, window_sums: Projective, c: int) -> Projective:
    """sum_w 2^(c*w) * W_w, highest window first through c doublings."""
    top = jax.tree_util.tree_map(lambda a: a[-1], window_sums)
    rest = jax.tree_util.tree_map(lambda a: a[-2::-1], window_sums)

    def body(acc, wsum):
        acc = jax.lax.fori_loop(0, c, lambda _, a: group.dbl(a), acc)
        return group.add(acc, wsum), None

    out, _ = jax.lax.scan(body, top, rest)
    return out


def msm_impl(group: Group, scalar_limbs, px_mont, py_mont, c: int,
             nbits: int) -> Projective:
    """Jit-friendly core: canonical scalar limbs + Montgomery affine points."""
    digits = _signed_digits(scalar_limbs, c, nbits)     # (W, N)

    def per_window(dw):
        return _window_sum(group, dw, px_mont, py_mont, c)

    window_sums = jax.lax.map(per_window, digits)
    return _horner_windows(group, window_sums, c)


@functools.lru_cache(maxsize=None)
def _jitted_msm(curve_name: str, c: int, nbits: int, g2: bool = False):
    group = get_group(curve_name, g2=g2)

    @jax.jit
    def run(scalar_limbs, px, py):
        return msm_impl(group, scalar_limbs, px, py, c, nbits)

    return run


@functools.lru_cache(maxsize=None)
def _jitted_msm_batch(curve_name: str, c: int, nbits: int, g2: bool = False):
    """Batched MSM with shared points (reference msm.h batch_size +
    are_points_shared_in_batch): ONE graph vmapped over the batch axis —
    the whole batch runs as a single device program instead of a python
    loop of dispatches (the reference's own headline includes 2^10 x 1000
    batches, docs/api/cpp/msm.md:192)."""
    group = get_group(curve_name, g2=g2)

    @jax.jit
    def run(scalar_limbs, px, py):          # (B, N, Ls), (N, L), (N, L)
        return jax.vmap(
            lambda s: msm_impl(group, s, px, py, c, nbits))(scalar_limbs)

    return run


def precompute_shift(nbits: int, c: int, precompute_factor: int) -> int:
    """Doubling count between precomputed copies (cpu_msm.hpp:468-469):
    shift = c * ceil(ceil(bitsize/c) / precompute_factor)."""
    num_bms = (nbits - 1) // c + 1
    return c * ((num_bms - 1) // precompute_factor + 1)


def msm_precompute_bases(curve_name: str, points_x, points_y,
                         cfg: MSMConfig | None = None):
    """Reference msm_precompute_bases (msm.h:107; cpu_msm.hpp:455-481):
    returns interleaved canonical affine arrays of length
    precompute_factor*N where out[nu*i + j] = 2^(j*shift) * P_i.

    The window size used for `shift` must match the later msm() call — pass
    an explicit cfg.c for cross-implementation compatibility (the reference
    otherwise derives it from its machine-tuned decision trees).
    """
    cfg = cfg or MSMConfig()
    nu = cfg.precompute_factor
    curve = get_curve(curve_name)
    group = get_group(curve_name, g2=cfg.g2)
    fq = group.coord_field
    n = points_x.shape[0]
    nbits = cfg.bitsize or curve.fr.modulus.bit_length()
    c = cfg.c or _auto_c(n, curve_name)
    shift = precompute_shift(nbits, c, nu)

    if nu == 1:
        return np.asarray(points_x), np.asarray(points_y)

    # Chunked + unrolled-montmul evaluation: the earlier whole-array form
    # traced the doubling chain and the Fermat inversion with loop-form
    # montmuls over (n, L) arrays — tens of thousands of device-loop
    # iterations over 16x-tile-padded buffers, which was slow at 2^16 and
    # crashed the TPU worker outright at 2^20. Per chunk, the fori/scan
    # bodies hold ONE unrolled group op (compiled once, reused across
    # chunks).
    from icicle_tpu.math.bigint import mul_mode
    import contextlib

    ch = min(n, 1 << 15)
    n_pad = -(-n // ch) * ch
    # unrolled montmuls on accelerators (device-loop steps cost ~270 us, so
    # loop-form nesting is pathological); loop-form on CPU (a 12k-primitive
    # unrolled fori body takes 10+ min of single-core LLVM)
    unroll = jax.default_backend() != "cpu"

    @jax.jit
    def chunk_fn(px_c, py_c):
        with (mul_mode("unrolled") if unroll else contextlib.nullcontext()):
            cur = group.from_affine_canonical(px_c, py_c)
            outs = []
            for _ in range(1, nu):
                cur = jax.lax.fori_loop(
                    0, shift, lambda _, q: group.dbl(q), cur)
                outs.append(group.to_affine_canonical(cur))
            return outs

    px_p = np.zeros((n_pad, points_x.shape[1]), dtype=np.uint32)
    py_p = np.zeros((n_pad, points_y.shape[1]), dtype=np.uint32)
    px_p[:n] = np.asarray(points_x)
    py_p[:n] = np.asarray(points_y)
    copies_x = [np.empty_like(px_p) for _ in range(nu - 1)]
    copies_y = [np.empty_like(py_p) for _ in range(nu - 1)]
    for s in range(0, n_pad, ch):
        outs = chunk_fn(px_p[s:s + ch], py_p[s:s + ch])
        for j, (cx, cy) in enumerate(outs):
            copies_x[j][s:s + ch] = np.asarray(cx)
            copies_y[j][s:s + ch] = np.asarray(cy)
    # interleave: out[nu*i + j] = copy j of point i
    ox = np.stack([px_p[:n]] + [c[:n] for c in copies_x], axis=1)
    oy = np.stack([py_p[:n]] + [c[:n] for c in copies_y], axis=1)
    return ox.reshape(nu * n, -1), oy.reshape(nu * n, -1)


def _precompute_digit_remap(digits, nu: int, n: int, G0: int):
    """(W, N) digits -> (G, nu*N) merged-window digits for precomputed bases
    with stride G0 = shift/c (cpu_msm.hpp:469): window w = j*G0 + m of point
    i becomes merged window m of copy nu*i+j. Windows beyond nu*G0 (the
    signed-digit carry window) ride the LAST copy at m >= G0, so
    G = W - (nu-1)*G0."""
    W = digits.shape[0]
    G = max(G0, W - (nu - 1) * G0)
    blocks = []
    for j in range(nu):
        lo = j * G0
        hi = min(lo + G0, W) if j < nu - 1 else W
        blk = digits[lo:hi]
        if blk.shape[0] < G:
            blk = jnp.concatenate(
                [blk, jnp.zeros((G - blk.shape[0], n), digits.dtype)], axis=0)
        blocks.append(blk)
    dp = jnp.stack(blocks, axis=0)                 # (nu, G, N)
    return jnp.transpose(dp, (1, 2, 0)).reshape(G, nu * n), G


@functools.lru_cache(maxsize=None)
def _jitted_msm_pre(curve_name: str, c: int, nbits: int, nu: int, n: int,
                    g2: bool = False):
    group = get_group(curve_name, g2=g2)

    G0 = precompute_shift(nbits, c, nu) // c

    @jax.jit
    def run(scalar_limbs, px, py):
        digits = _signed_digits(scalar_limbs, c, nbits)        # (W, N)
        dp, G = _precompute_digit_remap(digits, nu, n, G0)

        def per_window(dw):
            return _window_sum(group, dw, px, py, c)

        window_sums = jax.lax.map(per_window, dp)
        return _horner_windows(group, window_sums, c)

    return run


def msm(curve_name: str, scalars, points_x, points_y,
        cfg: MSMConfig | None = None) -> Projective:
    """MSM over canonical-form inputs. Returns a Montgomery-form projective
    point (use Group.to_affine_canonical to read out).

    scalars: (N, Ls) u32 limbs (or (batch, N, Ls)); points: (N, L) u32 each
    (G2: L = coordinate-field width, e.g. 2x base limbs flat). With
    cfg.precompute_factor = nu > 1, points must be the interleaved
    (nu*N, L) output of msm_precompute_bases with the SAME cfg.c.
    """
    cfg = cfg or MSMConfig()
    curve = get_curve(curve_name)
    group = get_group(curve_name, g2=cfg.g2)
    fq, fr = group.coord_field, curve.fr

    if cfg.are_scalars_montgomery_form:
        scalars = fr.from_mont(scalars)
    if cfg.are_points_montgomery_form:
        px, py = points_x, points_y
    else:
        px, py = fq.to_mont(points_x), fq.to_mont(points_y)

    if scalars.ndim == 3:  # batch axis
        use_vmap = cfg.batch_vmap
        if use_vmap is None:
            use_vmap = jax.default_backend() == "tpu"
        if (use_vmap and cfg.are_points_shared_in_batch
                and cfg.precompute_factor == 1):
            n = scalars.shape[1]
            c = cfg.c or _auto_c(n, curve_name)
            nbits = cfg.bitsize or curve.fr.modulus.bit_length()
            return _jitted_msm_batch(curve_name, c, nbits, cfg.g2)(
                scalars, px, py)
        results = [msm(curve_name, scalars[i], points_x, points_y,
                       dataclasses.replace(cfg, batch_size=1))
                   for i in range(scalars.shape[0])]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *results)

    n = scalars.shape[0]
    c = cfg.c or _auto_c(n, curve_name)
    nbits = cfg.bitsize or curve.fr.modulus.bit_length()
    nu = cfg.precompute_factor
    if nu > 1:
        assert points_x.shape[0] == nu * n, \
            "precompute_factor msm needs msm_precompute_bases output"
        return _jitted_msm_pre(curve_name, c, nbits, nu, n, cfg.g2)(
            scalars, px, py)
    return _jitted_msm(curve_name, c, nbits, cfg.g2)(scalars, px, py)


# ---------------------------------------------------------------------------
# Dispatcher registration (reference: REGISTER_MSM_BACKEND, msm_backend.h)
# ---------------------------------------------------------------------------
# The registered signature is the affine-result form every consumer wants:
# (curve, scalars, px, py, cfg) -> canonical affine (x, y) python ints.

from icicle_tpu.runtime import dispatcher as _dispatcher


def _msm_affine_xla(curve_name, scalars, points_x, points_y, cfg):
    res = msm(curve_name, scalars, points_x, points_y, cfg)
    group = get_group(curve_name, g2=cfg.g2)
    x, y = group.to_affine_canonical(res)
    fq = group.coord_field
    return (int(np.atleast_1d(fq.to_ints(x))[0]),
            int(np.atleast_1d(fq.to_ints(y))[0]))


def _msm_affine_pallas(curve_name, scalars, points_x, points_y, cfg):
    # the prefix-scan pipeline serves the big single-MSM G1 case (plain or
    # power-of-two precompute with an explicit c); everything else (G2,
    # batch, montgomery-form inputs) takes the generic path
    nu = cfg.precompute_factor
    v3_pre = nu > 1 and cfg.c and nu & (nu - 1) == 0
    if (cfg.g2 or (nu > 1 and not v3_pre) or scalars.ndim == 3
            or cfg.are_scalars_montgomery_form
            or cfg.are_points_montgomery_form):
        return _msm_affine_xla(curve_name, scalars, points_x, points_y, cfg)
    import os
    if os.environ.get("ICICLE_TPU_MSM_PIPELINE", "v3") == "v2" and nu == 1:
        from icicle_tpu.ops.msm_tpu2 import msm_tpu2
        return msm_tpu2(curve_name, scalars, points_x, points_y,
                        c=cfg.c or None)
    from icicle_tpu.ops.msm_tpu3 import msm_tpu3
    return msm_tpu3(curve_name, scalars, points_x, points_y,
                    c=cfg.c or None, precompute_factor=nu)


_dispatcher.register_impl("msm", "xla", _msm_affine_xla)
_dispatcher.register_impl("msm", "pallas", _msm_affine_pallas)


def msm_affine(curve_name: str, scalars, points_x, points_y,
               cfg: MSMConfig | None = None):
    """Dispatched MSM returning the canonical affine result as python ints
    ((0, 0) = identity). Backend = cfg.backend | process default ("auto" =
    pallas on TPU)."""
    cfg = cfg or MSMConfig()
    return _dispatcher.dispatch("msm", cfg.backend)(
        curve_name, scalars, points_x, points_y, cfg)

"""ECNTT: NTT over elliptic-curve points (reference F4: include/icicle/ecntt.h,
CPU impl reuses the NTT skeleton templated over point ops, cpu_ecntt.cpp).

Radix-2 DIT over Projective point arrays: the butterfly multiplies the odd
lane by a twiddle SCALAR (a full scalar multiplication) and adds/subs.
Twiddle scalars vary per butterfly lane, so the scalar-mul runs as one
lax.scan over digit rows with per-lane table selects — all point math stays
vectorized over n/2 lanes.

Unlike the reference's bit-serial double-and-add, the ladder here is
2^4-ary: per 4-bit digit row it does 4 doublings + ONE table add (the
16-entry i*P table costs 15 adds once per stage), ~1.8x fewer montmuls
than bit-serial (256 dbl + 79 add vs 254 dbl + 254 add per 254-bit
scalar). Table selection is a pselect tree — selects are ~100x cheaper
than point adds on the VPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group, Group, Projective, pselect
from icicle_tpu.ops.vec_ops import bit_reverse_indices
from icicle_tpu.runtime.config import NTTDir, NTTConfig, Ordering
from icicle_tpu.runtime.errors import IcicleError, check

_WDIG = 4  # ladder digit width (bits)


def scalar_mul_vec_glv(group: Group, points: Projective, rows) -> Projective:
    """Per-lane scalar multiplication via the GLV split (curves/glv.py).

    rows = (dig1, dig2, neg1, neg2): base-2^_WDIG digit rows (ndig, lanes)
    of |k1|, |k2| (MSB first) plus per-lane sign flags. k*P is computed as a
    joint ladder over P' = sign1*P and phi(P)' = sign2*(beta*x, y, z) —
    HALF the doubling chain of the plain ladder (|ki| ~ sqrt(r)), two table
    adds per digit row, two 16-entry tables per call.
    """
    dig1, dig2, neg1, neg2 = rows
    f = group.f
    lanes = points.x.shape[:-1]
    ident = group.identity(lanes)
    beta = jnp.broadcast_to(group.glv_beta_mont, points.x.shape)

    def signed(pts, neg):
        return pselect(neg, Projective(pts.x, f.neg(pts.y), pts.z), pts)

    p1 = signed(points, neg1)
    p2 = signed(Projective(f.mul_mont(points.x, beta), points.y, points.z),
                neg2)

    def build_table(base):
        def tbody(acc, _):
            acc = group.add(acc, base)
            return acc, acc
        _, tail = jax.lax.scan(tbody, ident, None, length=(1 << _WDIG) - 1)
        return jax.tree_util.tree_map(
            lambda i, t: jnp.concatenate([i[None], t], axis=0), ident, tail)

    t1 = build_table(p1)
    t2 = build_table(p2)

    def sel(table, dig_row):
        out = jax.tree_util.tree_map(lambda a: a[0], table)
        for i in range(1, 1 << _WDIG):
            out = pselect(dig_row == i,
                          jax.tree_util.tree_map(lambda a: a[i], table), out)
        return out

    def body(acc, xs):
        d1, d2 = xs
        for _ in range(_WDIG):
            acc = group.dbl(acc)
        acc = group.add(acc, sel(t1, d1))
        acc = group.add(acc, sel(t2, d2))
        return acc, None

    out, _ = jax.lax.scan(body, ident, (dig1, dig2))
    return out


def scalar_mul_vec(group: Group, points: Projective, digits) -> Projective:
    """Per-lane scalar multiplication, 2^_WDIG-ary windowed ladder.

    digits: (ndig, lanes) uint32 (MSB first), base-2^_WDIG digits, one
    scalar per point lane.

    The 16-entry i*P table is built by a lax.scan (ONE complete-add instance
    in the graph — an unrolled 15-add chain multiplies XLA:CPU compile time
    superlinearly); the ladder body selects table rows with a pselect tree
    (selects, not gathers: TPU-friendly, no random access).
    """
    lanes = points.x.shape[:-1]
    ident = group.identity(lanes)

    def tbody(acc, _):
        acc = group.add(acc, points)
        return acc, acc

    _, tail = jax.lax.scan(tbody, ident, None, length=(1 << _WDIG) - 1)
    table = jax.tree_util.tree_map(
        lambda i, t: jnp.concatenate([i[None], t], axis=0), ident, tail)

    def row(i):
        return jax.tree_util.tree_map(lambda a: a[i], table)

    def body(acc, dig_row):
        for _ in range(_WDIG):
            acc = group.dbl(acc)
        sel = row(0)
        for i in range(1, 1 << _WDIG):
            sel = pselect(dig_row == i, row(i), sel)
        return group.add(acc, sel), None

    out, _ = jax.lax.scan(body, ident, digits)
    return out


def _ndig(nbits: int) -> int:
    return -(-nbits // _WDIG)


def _digit_rows(vals, nbits: int) -> np.ndarray:
    """(ndig, len(vals)) base-2^_WDIG digit rows (MSB first) of python ints."""
    nd = _ndig(nbits)
    out = np.zeros((nd, len(vals)), dtype=np.uint32)
    for i, v in enumerate(vals):
        for d in range(nd):
            out[nd - 1 - d, i] = (v >> (_WDIG * d)) & ((1 << _WDIG) - 1)
    return out


def _twiddle_digits(f_modulus: int, w: int, count: int, nbits: int) -> np.ndarray:
    """(ndig, count) base-2^_WDIG digit rows (MSB first) of w^0..w^(count-1)."""
    vals = []
    cur = 1
    for _ in range(count):
        vals.append(cur)
        cur = (cur * w) % f_modulus
    return _digit_rows(vals, nbits)


def _glv_nbits(curve_name: str) -> int:
    """Digit-row bit width for GLV half-scalars (max |ki| over the basis)."""
    return (get_curve(curve_name).fr.modulus.bit_length() + 1) // 2 + 2


def _glv_rows(curve_name: str, vals):
    """Host GLV split of python-int scalars -> ladder inputs
    (dig1, dig2 (ndig, n) uint32 MSB-first; neg1, neg2 (n,) bool)."""
    from icicle_tpu.curves.glv import glv_decompose
    k1s, k2s = [], []
    for v in vals:
        k1, k2 = glv_decompose(curve_name, int(v))
        k1s.append(k1)
        k2s.append(k2)
    nbits = _glv_nbits(curve_name)
    return (_digit_rows([abs(k) for k in k1s], nbits),
            _digit_rows([abs(k) for k in k2s], nbits),
            np.array([k < 0 for k in k1s]),
            np.array([k < 0 for k in k2s]))


def _powers(f_modulus: int, w: int, count: int) -> list[int]:
    vals, cur = [], 1
    for _ in range(count):
        vals.append(cur)
        cur = (cur * w) % f_modulus
    return vals


@functools.lru_cache(maxsize=None)
def _stage_digits(curve_name: str, logn: int, inverse: bool):
    """Plain (non-GLV) per-stage twiddle digit rows — the round-2 ladder,
    kept for the measured GLV-vs-plain comparison
    (ICICLE_TPU_ECNTT_GLV=0)."""
    curve = get_curve(curve_name)
    p = curve.fr.modulus
    w = curve.fr.params.omega(logn)
    if inverse:
        w = pow(w, -1, p)
    n = 1 << logn
    nbits = p.bit_length()
    return [_twiddle_digits(p, pow(w, n >> s, p), 1 << (s - 1), nbits)
            for s in range(2, logn + 1)]


def _glv_enabled() -> bool:
    import os
    return os.environ.get("ICICLE_TPU_ECNTT_GLV", "1") != "0"


@functools.lru_cache(maxsize=None)
def _stage_glv(curve_name: str, logn: int, inverse: bool):
    """Per-stage GLV ladder inputs for the radix-2 DIT twiddles.

    Returns a list over stages s=2..logn of (dig1, dig2, neg1, neg2) numpy
    arrays covering that stage's m distinct twiddles (stage 1's twiddle is
    w^0 = 1 and is skipped by the core). Cached as NUMPY: the cache is shared
    across jit traces (same guard as ntt.NttDomain)."""
    curve = get_curve(curve_name)
    p = curve.fr.modulus
    w = curve.fr.params.omega(logn)
    if inverse:
        w = pow(w, -1, p)
    n = 1 << logn
    stages = []
    for s in range(2, logn + 1):
        m = 1 << (s - 1)
        ws = pow(w, n >> s, p)
        stages.append(_glv_rows(curve_name, _powers(p, ws, m)))
    return stages


def _ecntt_core(curve_name: str, points: Projective, dir: NTTDir,
                logn: int) -> Projective:
    """Radix-2 DIT, natural input -> natural output (no scaling/coset).

    Stage 1's twiddles are all w^0 = 1, so its butterflies skip the scalar
    ladder entirely; stages 2+ run the GLV joint ladder (half the doubling
    chain of the plain 2^4-ary ladder)."""
    group = get_group(curve_name)
    n = 1 << logn
    use_glv = _glv_enabled()
    stages = (_stage_glv if use_glv else _stage_digits)(
        curve_name, logn, dir == NTTDir.INVERSE)

    # bit-reverse input order (DIT)
    rev = jnp.asarray(bit_reverse_indices(n))
    pts = jax.tree_util.tree_map(lambda a: a[rev], points)

    for s in range(1, logn + 1):
        m = 1 << (s - 1)
        # gather even/odd lanes of each block
        idx = np.arange(n).reshape(n >> s, 1 << s)
        ev = jnp.asarray(idx[:, :m].reshape(-1))
        od = jnp.asarray(idx[:, m:].reshape(-1))
        even = jax.tree_util.tree_map(lambda a: a[ev], pts)
        odd = jax.tree_util.tree_map(lambda a: a[od], pts)
        if s == 1:
            t = odd                      # twiddle = 1: no ladder
        elif use_glv:
            # twiddle layout: stage twiddles repeat per block; our ev/od
            # flatten is block-major so lane j of block b uses twiddle j
            d1, d2, n1, n2 = stages[s - 2]
            reps = n >> s
            rows = (jnp.asarray(np.tile(d1, (1, reps))),
                    jnp.asarray(np.tile(d2, (1, reps))),
                    jnp.asarray(np.tile(n1, reps)),
                    jnp.asarray(np.tile(n2, reps)))
            t = scalar_mul_vec_glv(group, odd, rows)
        else:
            digs = stages[s - 2]
            t = scalar_mul_vec(
                group, odd, jnp.asarray(np.tile(digs, (1, n >> s))))
        out_ev = group.add(even, t)
        out_od = group.add(even, group.neg(t))
        # scatter back
        buf = jax.tree_util.tree_map(
            lambda a, e, o: a.at[ev].set(e).at[od].set(o),
            pts, out_ev, out_od)
        pts = buf
    return pts


# ordering -> (input bit-reversed, output bit-reversed). Radix-2 engine =>
# digit reversal == bit reversal, so the mixed orderings alias the R forms
# (reference ntt.h:32-43; kNM/kMN only differ from kNR/kRN under a
# multi-radix split, ours is pure radix-2).
_ORDER_FLAGS = {
    Ordering.NN: (False, False), Ordering.NR: (False, True),
    Ordering.RN: (True, False), Ordering.RR: (True, True),
    Ordering.NM: (False, True), Ordering.MN: (True, False),
}


def _ecntt_one(curve_name: str, points: Projective, dir: NTTDir,
               cfg: NTTConfig, logn: int) -> Projective:
    """Single (unbatched) config-aware ECNTT over axis 0."""
    group = get_group(curve_name)
    curve = get_curve(curve_name)
    r = curve.fr.modulus
    n = 1 << logn
    rev = jnp.asarray(bit_reverse_indices(n))
    in_rev, out_rev = _ORDER_FLAGS[cfg.ordering]

    if in_rev:  # memory order is bit-reversed: un-permute to natural first
        points = jax.tree_util.tree_map(lambda a: a[rev], points)

    if dir == NTTDir.FORWARD and cfg.coset_gen is not None:
        # coset shift: lane j scaled by g^j before the transform
        # (reference cpu_ntt.cpp coset handling, templated over E=projective)
        rows = tuple(jnp.asarray(a) for a in
                     _glv_rows(curve_name, _powers(r, cfg.coset_gen % r, n)))
        points = scalar_mul_vec_glv(group, points, rows)

    pts = _ecntt_core(curve_name, points, dir, logn)

    if dir == NTTDir.INVERSE:
        # fused n^-1 and inverse-coset unscale: lane j *= n^-1 * g^-j
        n_inv = pow(n, -1, r)
        if cfg.coset_gen is not None:
            g_inv = pow(cfg.coset_gen % r, -1, r)
            vals = [(n_inv * pow(g_inv, j, r)) % r for j in range(n)]
        else:
            vals = [n_inv] * n
        rows = tuple(jnp.asarray(a) for a in _glv_rows(curve_name, vals))
        pts = scalar_mul_vec_glv(group, pts, rows)

    if out_rev:
        pts = jax.tree_util.tree_map(lambda a: a[rev], pts)
    return pts


_DEFAULT_CFG = NTTConfig()


def ecntt(curve_name: str, points: Projective, dir: NTTDir = NTTDir.FORWARD,
          cfg: NTTConfig = _DEFAULT_CFG, logn: int | None = None) -> Projective:
    """ECNTT with the reference's NTTConfig surface (ecntt_backend.h routes
    the full NTTConfig<scalar_t> through the NTT engine templated over
    E=projective_t): ordering, coset_gen, batch_size.

    Unbatched: coordinate arrays are (n, L), transform along axis 0.
    Batched (cfg.batch_size>1): (batch, n, L); columns_batch=True means the
    transform runs along axis 0 of (n, batch, L) (column-major batch),
    mirroring the reference's columns_batch flag.
    """
    if cfg.batch_size > 1:
        if cfg.columns_batch:
            # (n, batch, L): vmap over the batch (middle) axis
            vm = jax.vmap(lambda x, y, z: _run_one(curve_name, x, y, z, dir,
                                                   cfg, logn),
                          in_axes=1, out_axes=1)
        else:
            vm = jax.vmap(lambda x, y, z: _run_one(curve_name, x, y, z, dir,
                                                   cfg, logn),
                          in_axes=0, out_axes=0)
        ox, oy, oz = vm(points.x, points.y, points.z)
        return Projective(ox, oy, oz)
    n = points.x.shape[0]
    ln = logn or (n.bit_length() - 1)
    check(1 << ln == n, IcicleError.INVALID_ARGUMENT,
          f"ecntt size {n} is not a power of two")
    return _ecntt_one(curve_name, points, dir, cfg, ln)


def _run_one(curve_name, x, y, z, dir, cfg, logn):
    n = x.shape[0]
    ln = logn or (n.bit_length() - 1)
    out = _ecntt_one(curve_name, Projective(x, y, z), dir, cfg, ln)
    return out.x, out.y, out.z


@functools.lru_cache(maxsize=None)
def _jitted_ecntt(curve_name: str, logn: int, direction: str, cfg_key: tuple):
    ordering, coset_gen, batch_size, columns_batch = cfg_key[:4]
    cfg = NTTConfig(ordering=Ordering(ordering), coset_gen=coset_gen,
                    batch_size=batch_size, columns_batch=columns_batch)

    @jax.jit
    def run(px, py, pz):
        return ecntt(curve_name, Projective(px, py, pz), NTTDir(direction),
                     cfg=cfg, logn=logn)
    return run


def ecntt_jit(curve_name: str, points: Projective,
              dir: NTTDir = NTTDir.FORWARD,
              cfg: NTTConfig = _DEFAULT_CFG) -> Projective:
    """jit-cached ECNTT (one compile per curve/size/direction/config).

    ALWAYS prefer this over calling ecntt() eagerly: besides the retrace
    cost, eager complete-adds dispatch ~1e3 tiny ops each — the whole-graph
    jit collapses them into one cached executable (which also makes the
    15-add ladder tables compile-time work inside the graph)."""
    axis = 1 if (cfg.batch_size > 1 and not cfg.columns_batch) else 0
    n = points.x.shape[axis]
    logn = n.bit_length() - 1
    key = (cfg.ordering.value, cfg.coset_gen, cfg.batch_size,
           cfg.columns_batch, _glv_enabled())
    return _jitted_ecntt(curve_name, logn, dir.value, key)(
        points.x, points.y, points.z)

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
from icicle_tpu.runtime.config import NTTDir

_WDIG = 4  # ladder digit width (bits)


def scalar_mul_vec(group: Group, points: Projective, digits) -> Projective:
    """Per-lane scalar multiplication, 2^_WDIG-ary windowed ladder.

    digits: (ndig, lanes) uint32 (MSB first), base-2^_WDIG digits, one
    scalar per point lane.
    """
    lanes = points.x.shape[:-1]
    table = [group.identity(lanes)]
    for _ in range(1, 1 << _WDIG):
        table.append(group.add(table[-1], points))

    def body(acc, dig_row):
        for _ in range(_WDIG):
            acc = group.dbl(acc)
        sel = table[0]
        for i in range(1, 1 << _WDIG):
            sel = pselect(dig_row == i, table[i], sel)
        return group.add(acc, sel), None

    out, _ = jax.lax.scan(body, group.identity(lanes), digits)
    return out


def _ndig(nbits: int) -> int:
    return -(-nbits // _WDIG)


def _twiddle_digits(f_modulus: int, w: int, count: int, nbits: int) -> np.ndarray:
    """(ndig, count) base-2^_WDIG digit rows (MSB first) of w^0..w^(count-1)."""
    nd = _ndig(nbits)
    out = np.zeros((nd, count), dtype=np.uint32)
    cur = 1
    for i in range(count):
        for d in range(nd):
            out[nd - 1 - d, i] = (cur >> (_WDIG * d)) & ((1 << _WDIG) - 1)
        cur = (cur * w) % f_modulus
    return out


@functools.lru_cache(maxsize=None)
def _stage_digits(curve_name: str, logn: int, inverse: bool):
    curve = get_curve(curve_name)
    p = curve.fr.modulus
    w = curve.fr.params.omega(logn)
    if inverse:
        w = pow(w, -1, p)
    nbits = p.bit_length()
    n = 1 << logn
    # stage s (m = 2^s block half-size): twiddles w^(j * n/(2m)) for j in [0, m)
    stages = []
    for s in range(1, logn + 1):
        m = 1 << (s - 1)
        step = n >> s
        ws = pow(w, step, p)
        full = _twiddle_digits(p, ws, m, nbits)    # (ndig, m)
        reps = (n // 2) // m
        stages.append(np.tile(full, (1, reps)))    # (ndig, n/2)
    return jnp.asarray(np.stack(stages)), nbits    # (logn, ndig, n/2)


def ecntt(curve_name: str, points: Projective, dir: NTTDir = NTTDir.FORWARD,
          logn: int | None = None) -> Projective:
    """NTT of a (n,)-batched Projective array along axis 0 (natural in/out)."""
    group = get_group(curve_name)
    curve = get_curve(curve_name)
    n = points.x.shape[0]
    logn = logn or (n.bit_length() - 1)
    assert 1 << logn == n
    stages, nbits = _stage_digits(curve_name, logn, dir == NTTDir.INVERSE)

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
        # twiddle layout: stage twiddles repeat per block; our ev/od flatten
        # is block-major so lane j of block b uses twiddle j
        tw = stages[s - 1][:, :m]
        tw_full = jnp.tile(tw, (1, n >> s))
        t = scalar_mul_vec(group, odd, tw_full)
        out_ev = group.add(even, t)
        out_od = group.add(even, group.neg(t))
        # scatter back
        buf = jax.tree_util.tree_map(
            lambda a, e, o: a.at[ev].set(e).at[od].set(o),
            pts, out_ev, out_od)
        pts = buf

    if dir == NTTDir.INVERSE:
        p = curve.fr.modulus
        n_inv = pow(n, -1, p)
        nd = _ndig(nbits)
        digs = np.zeros((nd, n), dtype=np.uint32)
        for d in range(nd):
            digs[nd - 1 - d, :] = (n_inv >> (_WDIG * d)) & ((1 << _WDIG) - 1)
        pts = scalar_mul_vec(group, pts, jnp.asarray(digs))
    return pts


@functools.lru_cache(maxsize=None)
def _jitted_ecntt(curve_name: str, logn: int, direction: str):
    @jax.jit
    def run(px, py, pz):
        return ecntt(curve_name, Projective(px, py, pz), NTTDir(direction),
                     logn=logn)
    return run


def ecntt_jit(curve_name: str, points: Projective,
              dir: NTTDir = NTTDir.FORWARD) -> Projective:
    """jit-cached ECNTT (one compile per curve/size/direction): the 2^10-2^16
    sizes are dominated by the per-stage twiddle scalar-muls, so retracing
    the stage graphs per call would double the cost."""
    n = points.x.shape[0]
    logn = n.bit_length() - 1
    return _jitted_ecntt(curve_name, logn, dir.value)(
        points.x, points.y, points.z)

"""GLV scalar decomposition for MSM, on device.

Splits each 254-bit scalar k into (k1, k2) with k = k1 + lambda*k2 (mod r)
and |ki| ~ sqrt(r), then emits signed window digits for the DOUBLED point
set [P_i, phi(P_i)] (phi(x, y) = (beta*x, y) = lambda*(x, y)); an MSM over
those digits equals the original MSM. Constants come from curves/glv.py
(derived, not pasted — see that module).

Reference analog: none — the reference ships no GLV in its MSM
(cpu_msm.hpp runs plain signed-digit Pippenger); this is a TPU-first
experiment. Measured verdict (v5e, round 5): the v3 pipeline's slot count
is scalar-bits/c per point regardless of the split (2n points x W/2
windows == n x W slots), so GLV trades nothing in the dominant scan phase;
its only wins are one fewer carry-window amortization and a halved
cross-window Horner. See docs/performance.md for the numbers.

The Babai rounding runs entirely in u32 lanes (16-bit digit comba — TPUs
have no 64-bit integer datapath) so scalars never leave the device:
  c_i   = round(k * g_i / 2^m),   g_i = round(2^m * |n_i| / r)  (host const)
  k1    = k - c1*a1 - c2*a2  (two's complement mod 2^GLV_MOD_BITS)
  k2    =   - c1*b1 - c2*b2
with the +-1 rounding slack of the scaled-reciprocal trick absorbed into
the digit-width bound (glv_split_bound below).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from icicle_tpu.curves.glv import glv_constants, _lattice_basis
from icicle_tpu.curves.params import get_curve

_M_BITS = 400          # scaled-reciprocal shift (multiple of 16)
_MOD_BITS = 160        # two's-complement working width for k1/k2
_D = 16                # digit bits


def _to_digits(v: int, count: int) -> list[int]:
    return [(v >> (_D * i)) & 0xFFFF for i in range(count)]


@functools.lru_cache(maxsize=None)
def glv_msm_constants(curve_name: str):
    """Host-derived constants for the device split; all integers."""
    curve = get_curve(curve_name)
    r = curve.fr.modulus
    (a1, b1), (a2, b2) = _lattice_basis(curve_name)
    # normalize so det == +r (glv.py guarantees |det| == r)
    det = a1 * b2 - a2 * b1
    assert abs(det) == r
    if det < 0:
        a2, b2 = -a2, -b2
    # c1 = round(b2*k/r), c2 = round(-b1*k/r)
    n1, n2 = b2, -b1
    g1 = (abs(n1) << _M_BITS) // r
    g2 = (abs(n2) << _M_BITS) // r
    # |k1| = |k - c1*a1 - c2*a2|; exact Babai gives <= (|a1|+|a2|)/2, the
    # floor-reciprocal c_i error is < 1 each, adding < |a1|+|a2|
    bound = ((abs(a1) + abs(a2)) * 3) // 2 + 2
    bound2 = ((abs(b1) + abs(b2)) * 3) // 2 + 2
    nbits_g = max(bound.bit_length(), bound2.bit_length()) + 1
    assert nbits_g + 2 < _MOD_BITS
    beta, lam = glv_constants(curve_name)
    return dict(a1=a1, b1=b1, a2=a2, b2=b2, s1=1 if n1 >= 0 else -1,
                s2=1 if n2 >= 0 else -1, g1=g1, g2=g2, nbits_g=nbits_g,
                beta=beta, lam=lam, r=r)


def glv_split_bound(curve_name: str) -> int:
    """Bit width the split halves are guaranteed to fit (digit planning)."""
    return glv_msm_constants(curve_name)["nbits_g"]


def _mul_acc_digits(a_digs, const_digs, out_len):
    """(list of (n,) u32 16-bit digits) x (python-int digits) -> out_len
    digits, carries fully propagated. Plain comba on the VPU; every partial
    product of 16-bit values fits u32 with room for ~2^16 accumulations."""
    cols = [None] * out_len
    for i, ad in enumerate(a_digs):
        for j, cd in enumerate(const_digs):
            k = i + j
            if k >= out_len or cd == 0:
                continue
            p = ad * jnp.uint32(cd)
            lo, hi = p & jnp.uint32(0xFFFF), p >> 16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < out_len:
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    zero = jnp.zeros_like(a_digs[0])
    out = []
    carry = zero
    for k in range(out_len):
        v = (zero if cols[k] is None else cols[k]) + carry
        out.append(v & jnp.uint32(0xFFFF))
        carry = v >> 16
    return out


def _sub_digits_mod(a_digs, b_digs, count):
    """(a - b) mod 2^(16*count), digitwise borrow-free two's complement."""
    out = []
    carry = jnp.ones_like(a_digs[0])  # +1 of the two's complement
    for k in range(count):
        av = a_digs[k] if k < len(a_digs) else jnp.zeros_like(a_digs[0])
        bv = b_digs[k] if k < len(b_digs) else jnp.zeros_like(a_digs[0])
        v = av + (jnp.uint32(0xFFFF) - bv) + carry
        out.append(v & jnp.uint32(0xFFFF))
        carry = v >> 16
    return out


def _round_shift(prod_digs, m_bits):
    """round(prod / 2^m): take digits >= m/16, +1 when bit m-1 is set."""
    md = m_bits // _D
    hi = prod_digs[md:]
    rnd = (prod_digs[md - 1] >> (_D - 1)) & jnp.uint32(1)
    out = []
    carry = rnd
    for d in hi:
        v = d + carry
        out.append(v & jnp.uint32(0xFFFF))
        carry = v >> 16
    return out


def glv_split_t(curve_name: str, scalars_t):
    """(Ls, n) u32 canonical limb-major scalars -> (mag1, sg1, mag2, sg2):
    magX (Lg, n) u32 limb-major |kX| with Lg = ceil(MOD_BITS/32), sgX (n,)
    int32 in {+1, -1}; k == sg1*mag1 + lam*sg2*mag2 (mod r)."""
    cst = glv_msm_constants(curve_name)
    nl = scalars_t.shape[0]
    k16 = []
    for i in range(nl):
        k16.append(scalars_t[i] & jnp.uint32(0xFFFF))
        k16.append(scalars_t[i] >> 16)

    nd = _MOD_BITS // _D
    halves = []
    prods = []
    for gi in (cst["g1"], cst["g2"]):
        gd = _to_digits(gi, (gi.bit_length() + _D - 1) // _D)
        plen = _M_BITS // _D + nd  # enough for the >>m tail
        prods.append(_round_shift(_mul_acc_digits(k16, gd, plen), _M_BITS))
    c1_d, c2_d = prods
    # k1 = k - s1*c1*|a1| - s2*c2*|a2|;  k2 = -(s1*c1*b1 + s2*c2*b2)
    for which in (1, 2):
        if which == 1:
            t1 = (cst["s1"] * cst["a1"], c1_d)
            t2 = (cst["s2"] * cst["a2"], c2_d)
            base = k16[:nd]
        else:
            t1 = (cst["s1"] * cst["b1"], c1_d)
            t2 = (cst["s2"] * cst["b2"], c2_d)
            base = [jnp.zeros_like(k16[0])] * nd
        acc = base
        for coef, cd in (t1, t2):
            term = _mul_acc_digits(cd[:nd], _to_digits(abs(coef), nd), nd)
            if coef >= 0:
                acc = _sub_digits_mod(acc, term, nd)
            else:
                # acc + term mod 2^MOD_BITS
                out, carry = [], jnp.zeros_like(acc[0])
                for kk in range(nd):
                    v = acc[kk] + term[kk] + carry
                    out.append(v & jnp.uint32(0xFFFF))
                    carry = v >> 16
                acc = out
        neg = (acc[-1] >> (_D - 1)) & jnp.uint32(1)     # bit MOD_BITS-1
        # magnitude: two's complement when negative
        comp, carry = [], jnp.ones_like(acc[0])
        for kk in range(nd):
            v = (jnp.uint32(0xFFFF) - acc[kk]) + carry
            comp.append(v & jnp.uint32(0xFFFF))
            carry = v >> 16
        mag16 = [jnp.where(neg == 1, comp[kk], acc[kk]) for kk in range(nd)]
        mag32 = jnp.stack(
            [mag16[2 * j] | (mag16[2 * j + 1] << 16)
             for j in range(nd // 2)], axis=0)            # (Lg, n)
        sg = jnp.where(neg == 1, jnp.int32(-1), jnp.int32(1))
        halves.append((mag32, sg))
    (m1, s1), (m2, s2) = halves
    return m1, s1, m2, s2


def glv_digits_t(curve_name: str, scalars_t, c: int):
    """(Ls, n) scalars -> (Wg, 2n) int32 signed digits for the interleaved
    [P_i, phi(P_i)] base layout (column 2i = k1_i, 2i+1 = k2_i)."""
    from icicle_tpu.ops.msm import signed_window_count
    from icicle_tpu.ops.msm_tpu2 import _signed_digits_t

    m1, s1, m2, s2 = glv_split_t(curve_name, scalars_t)
    nbits_g = glv_split_bound(curve_name)
    d1 = _signed_digits_t(m1, c, nbits_g) * s1[None, :]   # (Wg, n)
    d2 = _signed_digits_t(m2, c, nbits_g) * s2[None, :]
    wg_n = signed_window_count(nbits_g, c)
    n = scalars_t.shape[1]
    return jnp.stack([d1, d2], axis=2).reshape(wg_n, 2 * n)

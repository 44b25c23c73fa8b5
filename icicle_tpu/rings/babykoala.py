"""The babykoala integer ring Z_q (q = P_babybear * P_koalabear) and its RNS
representation, plus the polynomial ring R_q = Z_q[X]/(X^64 + 1).

Reference: include/icicle/rings/params/babykoala.h (zq_config modulus/rou,
zq_rns_config crt_weights), rings/integer_ring_rns.h, rings/polynomial_ring.h.

TPU-native layouts:
  * Zq direct:  (..., 2) uint32 limbs — the BigField Montgomery engine works
    for any odd modulus (inversion is only defined for units; `inv` raises).
  * Zq RNS:     (..., 2) uint32 = (x mod P_bb, x mod P_kb) canonical residues,
    one Mont32 lane per component — the dense VPU form for bulk ring math.
  * Rq:         trailing (64,) coefficient axis before the Zq limb axis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.math.params import FieldParams
from icicle_tpu.fields.field import Field, get_field

P_BB = 0x78000001
P_KB = 0x7F000001
Q = P_BB * P_KB                      # 0x3B880000F7000001
ROU = 0x0309B1118BE440ED             # order 2^24 (babykoala.h zq_config)
OMEGAS_COUNT = 24
RQ_DEGREE = 64                       # R_q = Z_q[X]/(X^64+1), babykoala.h:77

# CRT weights (babykoala.h zq_rns_config::crt_weights): x = w_bb*x_bb + w_kb*x_kb mod q
CRT_W_BB = 0x2204924130924914
CRT_W_KB = 0x19836DBFC66DB6EE


class ZqField(Field):
    """Field-like wrapper for the composite ring Z_q (no Fermat inversion)."""

    def inv(self, a):
        raise NotImplementedError(
            "Z_q is a composite ring: elementwise Fermat inversion is invalid; "
            "invert units host-side with pow(x, -1, Q)")

    def unit_inv_int(self, x: int) -> int:
        return pow(x, -1, self.modulus)


@functools.lru_cache(maxsize=None)
def get_zq() -> ZqField:
    params = FieldParams(name="babykoala_zq", modulus=Q, rou=ROU,
                         two_adicity_override=OMEGAS_COUNT)
    zq = ZqField(params)
    # make the ring resolvable by name-based caches (ntt_jit etc.)
    from icicle_tpu.fields.field import register_field_object
    register_field_object(zq)
    return zq


class ZqRns:
    """RNS representation ops: (..., 2) = (babybear, koalabear) residues."""

    def __init__(self):
        self.f_bb = get_field("babybear")
        self.f_kb = get_field("koalabear")

    def comps(self, x):
        return x[..., 0], x[..., 1]

    def stack(self, bb, kb):
        return jnp.stack([bb, kb], axis=-1)

    def add(self, a, b):
        ab, ak = self.comps(a)
        bb_, bk = self.comps(b)
        return self.stack(self.f_bb.engine.add(ab, bb_),
                          self.f_kb.engine.add(ak, bk))

    def sub(self, a, b):
        ab, ak = self.comps(a)
        bb_, bk = self.comps(b)
        return self.stack(self.f_bb.engine.sub(ab, bb_),
                          self.f_kb.engine.sub(ak, bk))

    def mul(self, a, b):
        ab, ak = self.comps(a)
        bb_, bk = self.comps(b)
        return self.stack(self.f_bb.engine.mul(ab, bb_),
                          self.f_kb.engine.mul(ak, bk))

    def neg(self, a):
        ab, ak = self.comps(a)
        return self.stack(self.f_bb.engine.neg(ab), self.f_kb.engine.neg(ak))


_rns = None


def get_rns() -> ZqRns:
    global _rns
    if _rns is None:
        _rns = ZqRns()
    return _rns


# -- direct <-> RNS conversion (reference convert_to_rns / convert_from_rns,
#    registered in cpu_vec_ops.cpp) ---------------------------------------------

@jax.jit
def zq_to_rns(x):
    """(..., 2) Zq limbs -> (..., 2) RNS residues. x = lo + hi*2^32.

    Pure 32-bit lane math (no x64): residue = (lo mod p) + (hi mod p)*(2^32 mod p).
    """
    lo = x[..., 0]
    hi = x[..., 1]
    rns = get_rns()
    out = []
    for f, p in ((rns.f_bb, P_BB), (rns.f_kb, P_KB)):
        pj = jnp.uint32(p)
        def red(v):
            v = jnp.where(v >= pj, v - pj, v)
            return jnp.where(v >= pj, v - pj, v)  # 2^32-1 < 3p for both primes
        r32 = jnp.uint32((1 << 32) % p)
        e = f.engine
        out.append(e.add(red(lo), e.mul(red(hi), r32)))
    return jnp.stack(out, axis=-1)


def _const_limbs(v: int):
    return jnp.asarray(np.array([v & 0xFFFFFFFF, v >> 32], dtype=np.uint32))


@jax.jit
def rns_to_zq(x):
    """(..., 2) RNS residues -> (..., 2) Zq limbs via CRT weights."""
    zq = get_zq()
    bb = x[..., 0]
    kb = x[..., 1]
    # lift residues to Zq elements and combine: w_bb*bb + w_kb*kb (mod q)
    zeros = jnp.zeros_like(bb)
    bb_l = jnp.stack([bb, zeros], axis=-1)
    kb_l = jnp.stack([kb, zeros], axis=-1)
    w_bb = jnp.broadcast_to(_const_limbs(CRT_W_BB), bb_l.shape)
    w_kb = jnp.broadcast_to(_const_limbs(CRT_W_KB), kb_l.shape)
    e = zq.engine
    return e.add(e.mul(bb_l, w_bb), e.mul(kb_l, w_kb))


def verify_constants():
    """Sanity: CRT weights reconstruct; rou has order 2^24."""
    assert Q == 0x3B880000F7000001
    assert CRT_W_BB % P_BB == 1 and CRT_W_BB % P_KB == 0
    assert CRT_W_KB % P_KB == 1 and CRT_W_KB % P_BB == 0
    assert pow(ROU, 1 << OMEGAS_COUNT, Q) == 1
    assert pow(ROU, 1 << (OMEGAS_COUNT - 1), Q) != 1

"""R_q = Z_q[X]/(X^64 + 1): negacyclic NTT and polynomial ring arithmetic.

Reference F18: include/icicle/negacyclic_ntt.h with the frontend reduction in
src/ntt.cpp:187-211 — a negacyclic NTT over R_q is exactly a coset NTT in Z_q
with coset generator psi = omega(2d) (a primitive 2d-th root), ordering kNR
forward / kRN inverse, batched over polynomials. We reuse the generic NTT
kernel over the ZqField wrapper — same twiddle cache, same orderings.

Layout: an Rq batch is ``(..., 64, 2)`` uint32 (coefficient axis then Zq limb
axis); operations treat the polynomial axis as the NTT vector axis.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.ops import ntt as N
from icicle_tpu.runtime.config import NTTConfig, NTTDir, Ordering
from icicle_tpu.rings.babykoala import get_zq, RQ_DEGREE


@dataclasses.dataclass
class NegacyclicNTTConfig:
    """Mirror of reference NegacyclicNTTConfig (negacyclic_ntt.h:15-21)."""
    is_async: bool = False


def negacyclic_ntt(x, dir: NTTDir = NTTDir.FORWARD,
                   cfg: NegacyclicNTTConfig | None = None):
    """(batch..., 64, 2) Rq batch -> same shape, evaluation/coefficient domain.

    Matches src/ntt.cpp:187-211: coset_gen = psi = omega(log2(2d)),
    ordering kNR forward / kRN inverse.
    """
    zq = get_zq()
    logd = RQ_DEGREE.bit_length() - 1
    psi = zq.params.omega(logd + 1)
    N.ntt_init_domain(zq, logd + 1)
    ntt_cfg = NTTConfig(
        coset_gen=psi,
        ordering=Ordering.NR if dir == NTTDir.FORWARD else Ordering.RN,
    )
    return N.ntt_jit(zq, x, dir, ntt_cfg)


# -- Rq arithmetic ----------------------------------------------------------------

def rq_add(a, b):
    return get_zq().add(a, b)


def rq_sub(a, b):
    return get_zq().sub(a, b)


def rq_mul(a, b):
    """Negacyclic polynomial product via NTT domain (a, b in coeff domain)."""
    ea = negacyclic_ntt(a, NTTDir.FORWARD)
    eb = negacyclic_ntt(b, NTTDir.FORWARD)
    prod = get_zq().mul(ea, eb)
    return negacyclic_ntt(prod, NTTDir.INVERSE)


def rq_mul_eval(a_eval, b_eval):
    """Pointwise product for inputs already in the evaluation domain."""
    return get_zq().mul(a_eval, b_eval)


# -- host conversion helpers ---------------------------------------------------

def rq_from_ints(coeffs) -> jnp.ndarray:
    """Nested int array with trailing axis 64 -> (..., 64, 2) tensor."""
    return get_zq().from_ints(coeffs)


def rq_to_ints(x) -> np.ndarray:
    return get_zq().to_ints(x)

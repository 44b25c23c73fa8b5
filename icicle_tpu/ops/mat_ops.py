"""Matrix ops over fields and rings (reference F2: include/icicle/mat_ops.h,
backend/cpu/src/field/cpu_matrix_ops.cpp).

Surface: matmul (field elements, and R_q polynomial entries), matrix_transpose
(with batch). TPU design: a field matmul is a batched outer-product reduction —
(n, m) x (m, k) via broadcasting f.mul over the shared axis then a tree
reduction (keeps the graph log-depth); R_q matmul runs entirely in the NTT
evaluation domain (one forward NTT per operand, pointwise matmul over the
64 evaluation lanes, one inverse NTT — the LaBRADOR-style hot path).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.fields.field import Field


@dataclasses.dataclass
class MatMulConfig:
    """Mirror of reference MatMulConfig (mat_ops.h:20-56)."""
    a_transposed: bool = False
    b_transposed: bool = False
    result_transposed: bool = False


def _tree_sum(f: Field, x, axis: int):
    """Field sum along `axis` via halving (log-depth, one add instance/level)."""
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    while n > 1:
        half = n // 2
        rest = x[2 * half:]
        x = f.add(x[:half], x[half:2 * half])
        if rest.shape[0]:
            x = jnp.concatenate([x, rest], axis=0)
            # fold the odd leftover in the next iteration
        n = x.shape[0]
    return x[0]


def matmul(f: Field, a, b, cfg: MatMulConfig | None = None):
    """(n, m)+lim x (m, k)+lim -> (n, k)+lim canonical-form field matmul."""
    cfg = cfg or MatMulConfig()
    lim = f.limb_shape
    nl = len(lim)

    def mt(x):
        return jnp.moveaxis(x, 0, 1) if nl == 0 else jnp.swapaxes(x, 0, 1)

    if cfg.a_transposed:
        a = mt(a)
    if cfg.b_transposed:
        b = mt(b)
    n, m = a.shape[0], a.shape[1]
    k = b.shape[1]
    # broadcast to (n, m, k)+lim and reduce over m
    ae = jnp.expand_dims(a, 2)          # (n, m, 1)+lim
    be = jnp.expand_dims(b, 0)          # (1, m, k)+lim
    prod = f.mul(jnp.broadcast_to(ae, (n, m, k) + lim),
                 jnp.broadcast_to(be, (n, m, k) + lim))
    out = _tree_sum(f, prod, axis=1)
    if cfg.result_transposed:
        out = mt(out)
    return out


def matrix_transpose(f: Field, a, batch_size: int = 1):
    """(batch?, n, m)+lim -> (batch?, m, n)+lim (reference matrix_transpose)."""
    lim = len(f.limb_shape)
    return jnp.swapaxes(a, -2 - lim, -1 - lim)


# -- R_q (polynomial ring) matmul (reference: matmul for PolyRing entries) ------

def rq_matmul(a, b):
    """(n, m, 64, 2) x (m, k, 64, 2) R_q matrices -> (n, k, 64, 2).

    Runs in the evaluation domain: NTT both operands once, multiply-accumulate
    pointwise over the 64 evaluation lanes, inverse-NTT the result.
    """
    from icicle_tpu.rings.rq import negacyclic_ntt
    from icicle_tpu.rings.babykoala import get_zq
    from icicle_tpu.runtime.config import NTTDir
    zq = get_zq()
    ea = negacyclic_ntt(a, NTTDir.FORWARD)      # (n, m, 64, 2)
    eb = negacyclic_ntt(b, NTTDir.FORWARD)      # (m, k, 64, 2)
    n, m = ea.shape[0], ea.shape[1]
    k = eb.shape[1]
    ae = jnp.broadcast_to(jnp.expand_dims(ea, 2), (n, m, k) + ea.shape[2:])
    be = jnp.broadcast_to(jnp.expand_dims(eb, 0), (n, m, k) + eb.shape[2:])
    prod = zq.mul(ae, be)
    out = _tree_sum(zq, prod, axis=1)
    return negacyclic_ntt(out, NTTDir.INVERSE)

"""Multi-chip NTT: four-step decomposition with an ICI all-to-all.

The reference scales transform length with a two-pass hierarchy-1 split plus a
transpose-style reorder on one host (backend/cpu/include/ntt_cpu.h:79-100,
ntt_data.h:8-60) and has *no* inter-device path. The TPU-native design maps
that split onto the mesh: size n = n1*n2 viewed as an (n1, n2) matrix,

  1. length-n1 NTTs along columns  (local: the n2 axis is sharded),
  2. twiddle scaling by w_n^(k1*j2) (local, sharded like the data),
  3. all-to-all "transpose" resharding over ICI,
  4. length-n2 NTTs along rows     (local).

Output is digit-reversed (k1-major) — exactly why the reference API has
kNM/kMN orderings (include/icicle/ntt.h Ordering); normalize=True spends a
second collective transpose restoring natural order.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from icicle_tpu.fields.field import Field
from icicle_tpu.ops import ntt as ntt_mod
from icicle_tpu.runtime.config import NTTConfig, NTTDir


def _local_ntt(f: Field, x, axis: int, dir: NTTDir):
    """NTT along `axis` of a local block (vector axis moved into place)."""
    vec_axis = x.ndim - 1 - len(f.limb_shape)
    x = jnp.moveaxis(x, axis, vec_axis)
    y = ntt_mod._ntt_xla(f, x, dir, NTTConfig())
    return jnp.moveaxis(y, vec_axis, axis)


_TW_MATRIX_CACHE: dict = {}


def _twiddle_matrix(f: Field, n1: int, n2: int, dir: NTTDir):
    """T[k1, j2] = w_n^(k1*j2) (Montgomery form): one gather from the master
    power table, built eagerly ONCE per (field, n1, n2, dir) — the 16M-element
    gather must not sit inside the per-call jit graph. Requires n1*n2 <= 2^31
    so the index product fits int32."""
    key = (f.name, n1, n2, dir)
    if key in _TW_MATRIX_CACHE:
        return _TW_MATRIX_CACHE[key]
    n = n1 * n2
    logn = n.bit_length() - 1
    with jax.ensure_compile_time_eval():
        dom = ntt_mod.get_domain(f, logn)
        w = dom.w_int if dir == NTTDir.FORWARD else dom.w_inv_int
        table = ntt_mod._powers_mont(f, w, n)  # (n,) + limbs
        k1 = jnp.arange(n1, dtype=jnp.int32)[:, None]
        j2 = jnp.arange(n2, dtype=jnp.int32)[None, :]
        idx = (k1 * j2) & (n - 1)
        out = jnp.take(table, idx, axis=0)  # (n1, n2) + limbs
    _TW_MATRIX_CACHE[key] = jax.block_until_ready(out)
    return _TW_MATRIX_CACHE[key]


def ntt_sharded(f: Field, x, mesh: Mesh, dir: NTTDir = NTTDir.FORWARD,
                normalize: bool = True):
    """Distributed NTT of a flat vector of size n1*n2 = 2^logn.

    Natural order in; natural order out when normalize=True, else the (n1, n2)
    digit-reversed kNM matrix (row-sharded). The mesh axis size must divide
    both n1 and n2.
    """
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    n = x.shape[0]
    logn = n.bit_length() - 1
    assert (1 << logn) == n
    log_n1 = logn // 2
    n1, n2 = 1 << log_n1, 1 << (logn - log_n1)
    assert n1 % d == 0 and n2 % d == 0, "mesh axis must divide both factors"

    lim = f.limb_shape
    nl = len(lim)
    tw = _twiddle_matrix(f, n1, n2, dir)
    # pre-warm the local-NTT domains OUTSIDE shard_map: tables built inside
    # a manual-mesh trace can't enter the cross-mesh domain cache (ops/ntt.py
    # _mesh_tainted) and would be rebuilt per trace
    ntt_mod.get_domain(f, log_n1)
    ntt_mod.get_domain(f, logn - log_n1)

    col_spec = P(*((None, axis) + (None,) * nl))
    row_spec = P(*((axis, None) + (None,) * nl))
    xm = jax.device_put(x.reshape((n1, n2) + lim), NamedSharding(mesh, col_spec))
    tw = jax.device_put(tw, NamedSharding(mesh, col_spec))

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(col_spec, col_spec), out_specs=row_spec)
    def step(local, tw_local):
        y = _local_ntt(f, local, axis=0, dir=dir)     # column NTTs (length n1)
        y = f.mul_mont(y, tw_local)                   # twiddle scale
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1, tiled=True)
        y = _local_ntt(f, y, axis=1, dir=dir)         # row NTTs (length n2)
        return y
        # inverse scaling: the two local inverse passes contribute 1/n1 * 1/n2
        # = 1/n, so no extra normalization is needed.

    y = step(xm, tw)  # (n1, n2) row-sharded; y[k1, k2] = X[k1 + n1*k2]

    if not normalize:
        return y
    yt = jnp.swapaxes(y, 0, 1)  # (n2, n1): natural flat order
    yt = jax.lax.with_sharding_constraint(yt, NamedSharding(mesh, row_spec))
    return yt.reshape((n,) + lim)

"""Poseidon (original, Filecoin-optimized) hash.

Reference F7: include/icicle/hash/poseidon.h + CPU backend
backend/cpu/src/hash/cpu_poseidon.cpp (hash_single:148-225). Constants are the
optimized form — RoundConstants | MDS | pre_matrix | sparse matrices — parsed
by tools/extract_poseidon_constants.py into data/poseidon_<field>.npz.

Round structure (cpu_poseidon.cpp, alpha = 5 for every field):
  state += rc[0:T]                                   (pre-round constants)
  (half-1) x full round:   sbox all; += rc; @= MDS
  1 pre_matrix round:      sbox all; += rc; @= pre_matrix
  partial x partial round: sbox lane0; lane0 += rc; @= sparse[i]
  (half-1) x full round
  last round:              sbox all; @= MDS           (no constants)
  digest = state[1]

Sparse matrix layout (field_vec_sqr_sparse_matrix_mul:232-248): first column
(T values) then the rest of the first row (T-1 values):
  out[0] = <state, col0>;  out[j] = state[0]*row0[j-1] + state[j]  (j>=1).

States are kept in Montgomery form for the whole permutation; batch = leading
axis, every lane op is vectorized VPU code.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.fields.field import Field, get_field
from icicle_tpu.ops.hash.hash import Hash

_DATA = os.path.join(os.path.dirname(__file__), "data")


@functools.lru_cache(maxsize=None)
def _load_constants(field_name: str):
    path = os.path.join(_DATA, f"poseidon_{field_name}.npz")
    if not os.path.exists(path):
        raise ValueError(f"no poseidon constants for field {field_name}")
    return np.load(path)


def supported_widths(field_name: str) -> list[int]:
    return [int(t) for t in _load_constants(field_name)["arities"]]


def _from_limb_rows(f: Field, rows: np.ndarray):
    if f.limb_shape == ():
        return jnp.asarray(rows[:, 0])
    return jnp.asarray(rows[:, : f.limb_shape[0]])


class Poseidon(Hash):
    """Fixed-width Poseidon hasher (reference create_poseidon_hash)."""

    def __init__(self, field: Field | str, t: int, domain_tag: int | None = None):
        f = get_field(field) if isinstance(field, str) else field
        self.field = f
        self.t = t
        self.domain_tag = domain_tag
        c = _load_constants(f.name)
        if t not in set(int(x) for x in c["arities"]):
            raise ValueError(f"unsupported poseidon width t={t} for {f.name}")
        _full, half, partial, alpha = (int(v) for v in c[f"t{t}_meta"])
        self.half = half
        self.partial = partial
        self.alpha = alpha
        lim = f.limb_shape
        with jax.ensure_compile_time_eval():
            rc = f.to_mont(_from_limb_rows(f, c[f"t{t}_rc"]))
            o = 0
            self.rc_pre = rc[:t]
            o += t
            self.rc_full_top = rc[o:o + (half - 1) * t].reshape((half - 1, t) + lim)
            o += (half - 1) * t
            self.rc_pre_matrix = rc[o:o + t]
            o += t
            self.rc_partial = rc[o:o + partial]
            o += partial
            self.rc_full_bot = rc[o:o + (half - 1) * t].reshape((half - 1, t) + lim)
            self.mds = f.to_mont(_from_limb_rows(f, c[f"t{t}_mds"])).reshape((t, t) + lim)
            self.pre_matrix = f.to_mont(_from_limb_rows(f, c[f"t{t}_pre"])).reshape((t, t) + lim)
            self.sparse = f.to_mont(_from_limb_rows(f, c[f"t{t}_sparse"])).reshape(
                (partial, 2 * t - 1) + lim)
            if domain_tag is not None:
                self.domain_tag_mont = f.to_mont(f.from_ints([domain_tag]))[0]
        el_words = max(f.nlimbs, 1)
        self.digest_words = el_words
        self.default_input_words = (t - (domain_tag is not None)) * el_words
        self._jit_words = jax.jit(self._hash_words_impl)
        self._jit_fields = jax.jit(self._hash_fields_impl)

    # -- primitives (Montgomery domain) -----------------------------------------
    def _sbox(self, x):
        f = self.field
        x2 = f.mul_mont(x, x)
        x4 = f.mul_mont(x2, x2)
        return f.mul_mont(x4, x)  # alpha = 5 (cpu_poseidon.cpp:93)

    def _matmul(self, s, mat):
        """(batch, t)+lim state times (t, t)+lim matrix: out_c = sum_r s_r M[r,c]."""
        f = self.field
        lim = f.limb_shape
        sj = jnp.expand_dims(s, axis=-1 - len(lim))      # (batch, t, 1)+lim
        prod = f.mul_mont(sj, mat)                       # (batch, t_in, t_out)+lim
        x = jnp.moveaxis(prod, -2 - len(lim), 0)         # (t_in, batch, t_out)+lim
        while x.shape[0] > 1:
            half = x.shape[0] // 2
            rest = x[2 * half:]
            x = jnp.concatenate([f.add(x[:half], x[half:2 * half]), rest], axis=0)
        return x[0]

    def _sparse_mul(self, s, sp):
        """Sparse matrix apply; sp: (2t-1,)+lim = [col0 (t) | row0-rest (t-1)]."""
        f = self.field
        lim = f.limb_shape
        t = self.t
        col0 = sp[:t]
        row0 = sp[t:]
        prod = f.mul_mont(s, col0)                       # (batch, t)+lim
        x = jnp.moveaxis(prod, -1 - len(lim), 0)
        out0 = x[0]
        for i in range(1, t):
            out0 = f.add(out0, x[i])
        lane_axis = s.ndim - 1 - len(lim)
        s0 = jax.lax.index_in_dim(s, 0, axis=lane_axis, keepdims=True)
        srest = jax.lax.slice_in_dim(s, 1, t, axis=lane_axis)
        rest = f.add(f.mul_mont(s0, row0), srest)
        out0 = jnp.expand_dims(out0, axis=lane_axis)
        return jnp.concatenate([out0, rest], axis=lane_axis)

    def _full_round(self, s, rc, mat):
        f = self.field
        s = self._sbox(s)
        s = f.add(s, rc)
        return self._matmul(s, mat)

    def permute_mont(self, s):
        f = self.field
        lim = f.limb_shape
        lane_axis = s.ndim - 1 - len(lim)
        s = f.add(s, self.rc_pre)

        def full_step(s, rc):
            return self._full_round(s, rc, self.mds), None

        s, _ = jax.lax.scan(full_step, s, self.rc_full_top)
        s = self._full_round(s, self.rc_pre_matrix, self.pre_matrix)

        def partial_step(s, rc_sp):
            rc, sp = rc_sp
            s0 = jax.lax.index_in_dim(s, 0, axis=lane_axis, keepdims=False)
            s0 = f.add(self._sbox(s0), rc)
            s = jax.lax.dynamic_update_index_in_dim(s, s0, 0, axis=lane_axis)
            return self._sparse_mul(s, sp), None

        s, _ = jax.lax.scan(partial_step, s, (self.rc_partial, self.sparse))
        s, _ = jax.lax.scan(full_step, s, self.rc_full_bot)
        # last round: sbox + MDS, no constants
        return self._matmul(self._sbox(s), self.mds)

    # -- hashing interface ---------------------------------------------------------
    def hash_fields(self, x):
        """(batch, arity) element tensor -> (batch,) digests, canonical form."""
        return self._jit_fields(x)

    def _hash_fields_impl(self, x):
        f = self.field
        t = self.t
        lim = f.limb_shape
        lane_axis = x.ndim - 1 - len(lim)
        n = x.shape[lane_axis]
        use_tag = self.domain_tag is not None
        arity = t - 1 if use_tag else t
        if n != arity:
            raise ValueError(
                f"poseidon t={t}: expected {arity} input elements, got {n} "
                "(sponge is unsupported, matching cpu_poseidon.cpp:130-135)")
        xm = f.to_mont(x)
        if use_tag:
            tag = jnp.broadcast_to(self.domain_tag_mont,
                                   x.shape[:lane_axis] + (1,) + lim)
            s = jnp.concatenate([tag, xm], axis=lane_axis)
        else:
            s = xm
        out = self.permute_mont(s)
        lane1 = jax.lax.index_in_dim(out, 1, axis=out.ndim - 1 - len(lim),
                                     keepdims=False)
        return f.from_mont(lane1)

    # -- word-level interface ----------------------------------------------------
    def _hash_words_impl(self, x):
        f = self.field
        el_words = max(f.nlimbs, 1)
        batch, in_words = x.shape
        n = in_words // el_words
        if f.limb_shape == ():
            elems = x.reshape(batch, n)
        else:
            elems = x.reshape(batch, n, el_words)
        out = self._hash_fields_impl(elems)
        return out.reshape(batch, el_words) if f.limb_shape else out.reshape(batch, 1)

    def hash_words(self, x):
        return self._jit_words(x)


def create_poseidon(field, t: int, domain_tag: int | None = None) -> Poseidon:
    """Mirror of reference create_poseidon_hash (poseidon.h)."""
    return Poseidon(field, t, domain_tag)

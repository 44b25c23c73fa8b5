"""Poseidon2 (reference F7: include/icicle/hash/poseidon2.h + CPU backend
backend/cpu/src/hash/cpu_poseidon2.cpp; constants extracted from
include/icicle/hash/poseidon2_constants into data/*.npz).

Permutation (matching the reference round structure exactly):
  1. external matrix pre-multiplication,
  2. half_full_rounds full rounds: +RC[t], x^alpha (all lanes), M_ext,
  3. partial_rounds: +RC[1] (lane 0), lane0^alpha, M_int where
     M_int = all-ones + diag(d-1)  (out_i = sum(state) + (d_i - 1) * s_i),
  4. half_full_rounds full rounds,
  output lane = state[1] (reference poseidon2_permutation: out[0] = states[1]).

Sponge mode (input length != t, or t-1 with domain tag): zero state, lane 0
seeded with the domain tag or first input, then per block state[1..t-1] += next
(t-1) inputs with [1,0,...] padding on the last block, permuting per block.

TPU-native evaluation: states stay in Montgomery form for the whole
permutation (constants pre-converted), so every multiply is a single REDC and
all lane math is batched VPU code. vmap/batch = leading axis.
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
    path = os.path.join(_DATA, f"poseidon2_{field_name}.npz")
    if not os.path.exists(path):
        raise ValueError(f"no poseidon2 constants for field {field_name}")
    return np.load(path)


def supported_arities(field_name: str) -> list[int]:
    return [int(t) for t in _load_constants(field_name)["arities"]]


def _from_limb_rows(f: Field, rows: np.ndarray):
    """(N, L) uint32 limb rows -> element tensor with the field's layout."""
    if f.limb_shape == ():
        return jnp.asarray(rows[:, 0])
    return jnp.asarray(rows[:, : f.limb_shape[0]])


class Poseidon2(Hash):
    """One fixed-arity Poseidon2 hasher over a field (reference
    create_poseidon2_hash / Poseidon2HasherCpu)."""

    def __init__(self, field: Field | str, t: int, domain_tag: int | None = None):
        f = get_field(field) if isinstance(field, str) else field
        self.field = f
        self.t = t
        self.domain_tag = domain_tag
        c = _load_constants(f.name)
        if t not in set(int(x) for x in c["arities"]):
            raise ValueError(f"unsupported poseidon2 width t={t} for {f.name}")
        full_rounds, half_full, partial_rounds, alpha = (int(v) for v in c[f"t{t}_meta"])
        self.half_full = half_full
        self.partial_rounds = partial_rounds
        self.alpha = alpha
        one = f.const(1, batch_shape=(t,))
        with jax.ensure_compile_time_eval():
            rc = f.to_mont(_from_limb_rows(f, c[f"t{t}_rc"]))
            self.rc_full_top = rc[: half_full * t].reshape((half_full, t) + f.limb_shape)
            self.rc_partial = rc[half_full * t: half_full * t + partial_rounds]
            self.rc_full_bot = rc[half_full * t + partial_rounds:].reshape(
                (half_full, t) + f.limb_shape)
            self.mds = f.to_mont(_from_limb_rows(f, c[f"t{t}_mds"])).reshape(
                (t, t) + f.limb_shape)
            diag = _from_limb_rows(f, c[f"t{t}_diag"])
            self.diag_m1 = f.to_mont(f.sub(diag, one))
            if domain_tag is not None:
                self.domain_tag_mont = f.to_mont(f.from_ints([domain_tag]))[0]
        el_words = max(f.nlimbs, 1)
        self.digest_words = el_words
        self.default_input_words = (t - (domain_tag is not None)) * el_words
        self._jit_words = jax.jit(self._hash_words_impl)
        self._jit_fields = jax.jit(self._hash_fields_impl)

    # -- field-level permutation (Montgomery domain) ---------------------------
    def _sbox(self, x):
        f = self.field
        a = self.alpha
        x2 = f.mul_mont(x, x)
        if a == 3:
            return f.mul_mont(x2, x)
        if a == 5:
            return f.mul_mont(f.mul_mont(x2, x2), x)
        if a == 7:
            x4 = f.mul_mont(x2, x2)
            return f.mul_mont(f.mul_mont(x4, x2), x)
        if a == 9:
            x4 = f.mul_mont(x2, x2)
            return f.mul_mont(f.mul_mont(x4, x4), x)
        if a == 11:
            x4 = f.mul_mont(x2, x2)
            x8 = f.mul_mont(x4, x4)
            return f.mul_mont(f.mul_mont(x8, x2), x)
        raise ValueError(f"alpha {a}")

    def _matmul_ext(self, s):
        """s: (batch, t)+lim -> M_ext @ s per batch row (t x t field matmul)."""
        f = self.field
        lim = f.limb_shape
        sj = jnp.expand_dims(s, axis=-2 - len(lim))      # (batch, 1, t)+lim
        prod = f.mul_mont(sj, self.mds)                  # (batch, t, t)+lim
        x = jnp.moveaxis(prod, -1 - len(lim), 0)         # (t_in, batch, t_out)+lim
        while x.shape[0] > 1:
            half = x.shape[0] // 2
            rest = x[2 * half:]  # odd leftover element
            x = jnp.concatenate([f.add(x[:half], x[half:2 * half]), rest], axis=0)
        return x[0]

    def _matmul_int(self, s):
        """Internal matrix: out_i = sum_j(s_j) + (d_i - 1) * s_i."""
        f = self.field
        lim = f.limb_shape
        x = jnp.moveaxis(s, -1 - len(lim), 0)
        tot = x[0]
        for i in range(1, x.shape[0]):
            tot = f.add(tot, x[i])
        tot = jnp.moveaxis(jnp.broadcast_to(tot, x.shape), 0, -1 - len(lim))
        return f.add(tot, f.mul_mont(self.diag_m1, s))

    def _full_round(self, s, rc):
        f = self.field
        s = f.add(s, rc)
        s = self._sbox(s)
        return self._matmul_ext(s)

    def _partial_round(self, s, rc):
        f = self.field
        lim = f.limb_shape
        lane_axis = s.ndim - 1 - len(lim)
        s0 = jax.lax.dynamic_index_in_dim(s, 0, axis=lane_axis, keepdims=False)
        s0 = self._sbox(f.add(s0, rc))
        s = jax.lax.dynamic_update_index_in_dim(s, s0, 0, axis=lane_axis)
        return self._matmul_int(s)

    def permute_mont(self, s):
        """Full permutation on Montgomery-domain states (batch, t)+lim."""
        s = self._matmul_ext(s)  # pre-round external matrix

        def full_step(s, rc):
            return self._full_round(s, rc), None

        def partial_step(s, rc):
            return self._partial_round(s, rc), None

        s, _ = jax.lax.scan(full_step, s, self.rc_full_top)
        s, _ = jax.lax.scan(partial_step, s, self.rc_partial)
        s, _ = jax.lax.scan(full_step, s, self.rc_full_bot)
        return s

    def hash_fields(self, x):
        """(batch, n) element tensor -> (batch,) digests (canonical form).

        n == t (or t-1 with domain tag): single permutation; otherwise sponge.
        """
        return self._jit_fields(x)

    def _hash_fields_impl(self, x):
        f = self.field
        t = self.t
        lim = f.limb_shape
        n = x.shape[-1 - len(lim)]
        xm = f.to_mont(x)
        use_tag = self.domain_tag is not None
        if n == (t - 1 if use_tag else t):
            if use_tag:
                tag = jnp.broadcast_to(self.domain_tag_mont,
                                       x.shape[:-1 - len(lim)] + (1,) + lim)
                s = jnp.concatenate([tag, xm], axis=-1 - len(lim))
            else:
                s = xm
            out = self.permute_mont(s)
        else:
            out = self._sponge(xm)
        lane1 = jax.lax.index_in_dim(out, 1, axis=out.ndim - 1 - len(lim),
                                     keepdims=False)
        return f.from_mont(lane1)

    def _sponge(self, xm):
        f = self.field
        t = self.t
        lim = f.limb_shape
        lane_axis = xm.ndim - 1 - len(lim)
        n = xm.shape[lane_axis]
        use_tag = self.domain_tag is not None
        batch = xm.shape[:lane_axis]

        s = jnp.zeros(batch + (t,) + lim, dtype=jnp.uint32)
        if use_tag:
            first = jnp.broadcast_to(self.domain_tag_mont, batch + (1,) + lim)
            rest = xm
        else:
            first = jax.lax.slice_in_dim(xm, 0, 1, axis=lane_axis)
            rest = jax.lax.slice_in_dim(xm, 1, n, axis=lane_axis)
        s = jnp.concatenate(
            [first, jnp.zeros(batch + (t - 1,) + lim, dtype=jnp.uint32)],
            axis=lane_axis)
        rem = rest.shape[lane_axis]
        nof_hashers = max(1, -(-rem // (t - 1)))
        pad_len = nof_hashers * (t - 1) - rem
        if pad_len:
            # reference padding: [1, 0, 0, ...] (cpu_poseidon2.cpp sponge)
            one = f.to_mont(f.const(1, batch_shape=batch + (1,)))
            zeros = jnp.zeros(batch + (pad_len - 1,) + lim, dtype=jnp.uint32)
            rest = jnp.concatenate([rest, one, zeros], axis=lane_axis)
        blocks = jnp.moveaxis(
            rest.reshape(batch + (nof_hashers, t - 1) + lim),
            lane_axis, 0)  # (nof_hashers, batch, t-1)+lim

        def absorb(s, block):
            s0 = jax.lax.slice_in_dim(s, 0, 1, axis=lane_axis)
            srest = jax.lax.slice_in_dim(s, 1, t, axis=lane_axis)
            s = jnp.concatenate([s0, f.add(srest, block)], axis=lane_axis)
            return self.permute_mont(s), None

        s, _ = jax.lax.scan(absorb, s, blocks)
        return s

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

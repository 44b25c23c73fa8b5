"""Sumcheck protocol (prover + verifier) with reference-compatible transcript.

Reference F11: include/icicle/sumcheck/* (API, proof, transcript) and
backend/cpu/include/cpu_sumcheck.h (round loop). Limits mirror sumcheck.h:11-14
(MAX_COMBINE_POLY_DEG i.e. degree <= 6, <= 8 MLE polynomials).

TPU redesign: each round is ONE fused vectorized pass — slice even/odd halves
of every MLE, build the (deg+1) combine inputs incrementally
(inp_k = inp_{k-1} - even + odd, exactly the CPU backend's update rule,
cpu_sumcheck.h:160-172), evaluate the traced combine program over the whole
element axis, reduce. Folding with the round challenge is fused into the next
round's slicing. Host work per round is just the Fiat-Shamir hash.

Transcript bytes are identical to SumcheckTranscript (sumcheck_transcript.h):
  alpha_0 = H(domain_label || u32(nof_rounds) || u32(deg) || claimed_sum
              || seed || challenge_label || r_0 values || entry_0)
  alpha_i = H(entry_0 || alpha_{i-1} || challenge_label || round_label
              || u32(len) || u32(i) || r_i values)
where entry_0 = [round_label || u32(len) || u32(0)] — note the reference
builds entry_0 WITHOUT the round-0 values (the values are appended to the
hash input directly before entry_0); we reproduce that byte-for-byte.
Byte->field is little-endian-int mod p (ModArith::from, modular_arithmetic.h:458).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.fields.field import Field
from icicle_tpu.ops.program import ReturningValueProgram
from icicle_tpu.utils import native as _native

MAX_COMBINE_POLY_DEG = 6   # sumcheck.h:12
MAX_NOF_POLYNOMIALS = 8    # sumcheck.h:14


@dataclasses.dataclass
class SumcheckConfig:
    """Mirror of reference SumcheckConfig (sumcheck_config.h)."""
    use_extension_field: bool = False
    batch: int = 1


@dataclasses.dataclass
class SumcheckTranscriptConfig:
    """Mirror of SumcheckTranscriptConfig; labels default to empty byte
    strings and keccak-256, little-endian (sumcheck_transcript_config.h:51)."""
    domain_separator_label: bytes = b""
    round_poly_label: bytes = b""
    round_challenge_label: bytes = b""
    seed: int = 0
    little_endian: bool = True
    hasher: Callable[[bytes], bytes] = _native.keccak_256


@dataclasses.dataclass
class SumcheckProof:
    """Round polynomials, each a list of deg+1 field values (python ints)."""
    round_polys: list[list[int]]

    def serialize(self, f: Field) -> bytes:
        """BinarySerializer<SumcheckProof> layout (serialization.h:40-112):
        u64 nof_round_polynomials, then per poly: u64 len + raw LE elements."""
        eb = max(f.nlimbs, 1) * 4
        out = bytearray()
        out += len(self.round_polys).to_bytes(8, "little")
        for rp in self.round_polys:
            out += len(rp).to_bytes(8, "little")
            for v in rp:
                out += int(v).to_bytes(eb, "little")
        return bytes(out)

    @classmethod
    def deserialize(cls, f: Field, data: bytes) -> "SumcheckProof":
        eb = max(f.nlimbs, 1) * 4
        off = 0
        n = int.from_bytes(data[off:off + 8], "little"); off += 8
        polys = []
        for _ in range(n):
            ln = int.from_bytes(data[off:off + 8], "little"); off += 8
            vals = []
            for _ in range(ln):
                vals.append(int.from_bytes(data[off:off + eb], "little")); off += eb
            polys.append(vals)
        return cls(polys)


class SumcheckTranscript:
    """Byte-exact mirror of SumcheckTranscript (sumcheck_transcript.h)."""

    def __init__(self, f: Field, claimed_sum: int, nof_rounds: int,
                 combine_degree: int, cfg: SumcheckTranscriptConfig):
        self.f = f
        self.eb = max(f.nlimbs, 1) * 4
        self.claimed_sum = claimed_sum % f.modulus
        self.nof_rounds = nof_rounds
        self.combine_degree = combine_degree
        self.cfg = cfg
        self.round_idx = 0
        self.entry_0 = b""
        self.prev_alpha = 0

    def _field_bytes(self, v: int) -> bytes:
        return (v % self.f.modulus).to_bytes(self.eb, "little")

    def get_alpha(self, round_poly: Sequence[int]) -> int:
        cfg = self.cfg
        if self.round_idx == 0:
            hi = bytearray()
            hi += cfg.domain_separator_label
            hi += np.uint32(self.nof_rounds).tobytes()
            hi += np.uint32(self.combine_degree).tobytes()
            hi += self._field_bytes(self.claimed_sum)
            hi += self._field_bytes(cfg.seed)
            hi += cfg.round_challenge_label
            e0 = bytearray()
            e0 += cfg.round_poly_label
            e0 += np.uint32(len(round_poly)).tobytes()
            e0 += np.uint32(self.round_idx).tobytes()
            self.entry_0 = bytes(e0)
            for v in round_poly:
                hi += self._field_bytes(v)
            hi += self.entry_0
        else:
            hi = bytearray()
            hi += self.entry_0
            hi += self._field_bytes(self.prev_alpha)
            hi += cfg.round_challenge_label
            hi += cfg.round_poly_label
            hi += np.uint32(len(round_poly)).tobytes()
            hi += np.uint32(self.round_idx).tobytes()
            for v in round_poly:
                hi += self._field_bytes(v)
        digest = cfg.hasher(bytes(hi))
        self.round_idx += 1
        self.prev_alpha = int.from_bytes(digest, "little") % self.f.modulus
        return self.prev_alpha


def _round_pass(f: Field, combine: ReturningValueProgram, deg: int):
    """Returns a jitted fn: stacked MLEs (npolys, n)+lim, alpha -> round poly
    values (deg+1,)+lim and folded MLEs (npolys, n/2)+lim."""

    def run(mles, alpha, fold_first):
        lim = f.limb_shape
        el_axis = mles.ndim - 1 - len(lim)

        def halves(arr):
            ev = jax.lax.slice_in_dim(arr, 0, arr.shape[el_axis], stride=2,
                                      axis=el_axis)
            od = jax.lax.slice_in_dim(arr, 1, arr.shape[el_axis], stride=2,
                                      axis=el_axis)
            return ev, od

        if fold_first:
            ev0, od0 = halves(mles)
            diff = f.sub(od0, ev0)
            mles = f.add(ev0, f.mul(_bc(f, alpha, diff), diff))
        even, odd = halves(mles)
        diff = f.sub(odd, even)

        vals = []
        inp = even
        for k in range(deg + 1):
            if k == 1:
                inp = odd
            elif k > 1:
                inp = f.add(inp, diff)
            inputs = [jax.lax.index_in_dim(inp, i, axis=0, keepdims=False)
                      for i in range(inp.shape[0])]
            out = combine.execute(f, inputs)[0]       # (n/2,)+lim, n/2 pow2
            # tree-halving reduction over the element axis
            x = out
            while x.shape[0] > 1:
                h = x.shape[0] // 2
                x = f.add(x[:h], x[h:])
            vals.append(x[0])
        rp = jnp.stack(vals, axis=0)
        return rp, mles

    return jax.jit(run, static_argnums=(2,))


def _bc(f: Field, alpha, like):
    """Broadcast a scalar field element against `like`."""
    return jnp.broadcast_to(alpha, like.shape)


def sumcheck_prove(f: Field, mle_polys: Sequence, claimed_sum: int,
                   combine: ReturningValueProgram,
                   transcript_cfg: SumcheckTranscriptConfig | None = None,
                   cfg: SumcheckConfig | None = None):
    """Prove sum over the boolean hypercube of combine(mles...) == claimed_sum.

    mle_polys: list of (n,)+limb tensors (canonical form), n a power of two.
    Returns (SumcheckProof, challenges list).
    """
    transcript_cfg = transcript_cfg or SumcheckTranscriptConfig()
    if cfg is not None and cfg.use_extension_field:
        # parity with the reference: sumcheck.h:71-73 / cpu_sumcheck.h:30-33
        # reject use_extension_field as unsupported (not silently ignore it)
        from icicle_tpu.runtime.errors import IcicleException, IcicleError
        raise IcicleException(IcicleError.INVALID_ARGUMENT,
                              "SumcheckConfig::use_extension_field = true is "
                              "currently unsupported (matches reference)")
    # cfg.batch is a hash-batching knob for the closed CUDA backend; the CPU
    # reference ignores it and our round pass always evaluates the full
    # element axis in one fused batch, which subsumes it.
    n = mle_polys[0].shape[0]
    assert n & (n - 1) == 0 and n >= 2
    assert len(mle_polys) <= MAX_NOF_POLYNOMIALS
    deg = combine.poly_degree
    assert 0 < deg <= MAX_COMBINE_POLY_DEG
    nof_rounds = n.bit_length() - 1

    tr = SumcheckTranscript(f, claimed_sum, nof_rounds, deg, transcript_cfg)
    mles = jnp.stack(list(mle_polys), axis=0)

    round_fn = _round_pass(f, combine, deg)
    round_polys: list[list[int]] = []
    challenges: list[int] = [0]
    alpha_arr = f.from_ints([0])[0]
    for r in range(nof_rounds):
        rp, mles = round_fn(mles, alpha_arr, r > 0)
        rp_ints = [int(v) for v in np.atleast_1d(f.to_ints(rp))]
        round_polys.append(rp_ints)
        if r + 1 < nof_rounds:
            alpha = tr.get_alpha(rp_ints)
            challenges.append(alpha)
            alpha_arr = f.from_ints([alpha])[0]
    return SumcheckProof(round_polys), challenges


def _lagrange_eval(f_mod: int, ys: Sequence[int], x: int) -> int:
    """Evaluate the degree-(len(ys)-1) poly through (i, ys[i]) at x."""
    n = len(ys)
    total = 0
    for i in range(n):
        num, den = 1, 1
        for j in range(n):
            if i == j:
                continue
            num = num * ((x - j) % f_mod) % f_mod
            den = den * ((i - j) % f_mod) % f_mod
        total = (total + ys[i] * num * pow(den, -1, f_mod)) % f_mod
    return total


def sumcheck_verify(f: Field, proof: SumcheckProof, claimed_sum: int,
                    transcript_cfg: SumcheckTranscriptConfig | None = None) -> bool:
    """Mirror of reference Sumcheck::verify (sumcheck.h:123-162)."""
    transcript_cfg = transcript_cfg or SumcheckTranscriptConfig()
    p = f.modulus
    rps = proof.round_polys
    nof_rounds = len(rps)
    deg = len(rps[0]) - 1
    if (rps[0][0] + rps[0][1]) % p != claimed_sum % p:
        return False
    tr = SumcheckTranscript(f, claimed_sum, nof_rounds, deg, transcript_cfg)
    for r in range(nof_rounds - 1):
        alpha = tr.get_alpha(rps[r])
        alpha_val = _lagrange_eval(p, rps[r], alpha)
        nxt = (rps[r + 1][0] + rps[r + 1][1]) % p
        if alpha_val != nxt:
            return False
    return True

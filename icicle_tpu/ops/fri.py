"""FRI low-degree proof: prove + verify with reference-compatible transcript.

Reference F12: include/icicle/fri/* (fri.h API, fri_config.h, fri_transcript.h)
with the CPU prover in backend/cpu/include/cpu_fri_backend.h. folding_factor=2.

TPU redesign of the prover: each commit-fold round is a fused vectorized pass —
split the codeword in halves, fold with the round challenge and inverse
twiddles (cpu_fri_backend.h:113-133 semantics), and batch-hash the whole layer
into the round's Merkle tree (one `hash_words` per tree layer). Host work per
round is the Fiat-Shamir hash of the Merkle root.

Transcript bytes match FriTranscript (fri_transcript.h):
  entry_0 = domain_sep_label || u32(log_input_size) || public_state
  alpha_0 = H(entry_0 || seed || challenge_label || commit_label || root_0)
  alpha_i = H(entry_0 || alpha_{i-1} || challenge_label || commit_label || root_i)
  pow:     challenge = entry_0 || alpha_last || nonce_label; input appends
           u64(nonce) + 24 zero bytes (PowConfig.padding_size, pow.h:20);
           digest's first 8 LE bytes must be < 2^(64-pow_bits)
  queries: seed = first 8 LE bytes of H(entry_0 || nonce_label || u32(nonce))
           (or H(entry_0 || alpha_last) without pow), truncated to u32 and fed
           to std::mt19937 + libstdc++ uniform_int_distribution (replicated
           here bit-exactly, utils/rand_gen.h).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from icicle_tpu.fields.field import Field
from icicle_tpu.ops import ntt as N
from icicle_tpu.ops.hash.hash import Hash
from icicle_tpu.ops.merkle import MerkleTree, MerkleProof
from icicle_tpu.runtime.config import MerkleTreeConfig
from icicle_tpu.utils import native as _native


# -- std::mt19937 + libstdc++ uniform_int_distribution replica -----------------

class MT19937:
    """std::mt19937 with the single-u32 seed init (Knuth multiplier)."""

    def __init__(self, seed: int):
        self.mt = [0] * 624
        self.mt[0] = seed & 0xFFFFFFFF
        for i in range(1, 624):
            self.mt[i] = (1812433253 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 30)) + i) & 0xFFFFFFFF
        self.idx = 624

    def _gen(self):
        for i in range(624):
            y = (self.mt[i] & 0x80000000) | (self.mt[(i + 1) % 624] & 0x7FFFFFFF)
            nxt = self.mt[(i + 397) % 624] ^ (y >> 1)
            if y & 1:
                nxt ^= 0x9908B0DF
            self.mt[i] = nxt
        self.idx = 0

    def next_u32(self) -> int:
        if self.idx >= 624:
            self._gen()
        y = self.mt[self.idx]
        self.idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y


def uniform_int(gen: MT19937, lo: int, hi: int) -> int:
    """libstdc++ std::uniform_int_distribution<size_t> over a 32-bit urng
    when the range fits (the FRI case: hi - lo < 2^32)."""
    urngrange = 0xFFFFFFFF
    urange = hi - lo
    assert urange < urngrange, "range too large for this replica"
    uerange = urange + 1
    scaling = urngrange // uerange
    past = uerange * scaling
    while True:
        r = gen.next_u32()
        if r < past:
            return lo + r // scaling


# -- configs / proof -------------------------------------------------------------

@dataclasses.dataclass
class FriConfig:
    """Mirror of fri_config.h (defaults :16-26)."""
    folding_factor: int = 2
    stopping_degree: int = 0
    pow_bits: int = 16
    nof_queries: int = 100


@dataclasses.dataclass
class FriTranscriptConfig:
    """Mirror of fri_transcript_config.h (defaults: keccak-256, empty labels)."""
    domain_separator_label: bytes = b""
    round_challenge_label: bytes = b""
    commit_phase_label: bytes = b""
    nonce_label: bytes = b""
    public_state: bytes = b""
    seed: int = 0
    hasher: Callable[[bytes], bytes] = _native.keccak_256


@dataclasses.dataclass
class FriProof:
    """Mirror of FriProof<F>: per-query x per-round merkle proof pairs,
    final polynomial, pow nonce. Roots ride inside the merkle proofs."""
    query_proofs: list[list[tuple[MerkleProof, MerkleProof]]]  # [query][round]
    final_poly: list[int]
    pow_nonce: int

    @property
    def nof_rounds(self) -> int:
        return len(self.query_proofs[0]) if self.query_proofs else 0

    def round_root(self, round_idx: int) -> np.ndarray:
        return self.query_proofs[0][round_idx][0].root

    def serialize(self, f: Field) -> bytes:
        """Reference BinarySerializer<FriProof> layout
        (fri_proof_serializer.h): u64 nof_query_rows (= 2*nof_queries; row
        2q = query proof, row 2q+1 = symmetric proof, matching
        cpu_fri_backend.h:179-183), each row = u64 nof_rounds + that many
        reference-layout MerkleProofs; then u64 final_poly_size + raw F
        elements; then u64 pow_nonce."""
        import struct
        eb = max(f.nlimbs, 1) * 4
        out = bytearray()
        out += struct.pack("<Q", 2 * len(self.query_proofs))
        for per_round in self.query_proofs:
            for slot in range(2):
                out += struct.pack("<Q", len(per_round))
                for pair in per_round:
                    out += pair[slot].serialize()
        out += struct.pack("<Q", len(self.final_poly))
        for v in self.final_poly:
            out += int(v).to_bytes(eb, "little")
        out += struct.pack("<Q", self.pow_nonce)
        return bytes(out)

    @classmethod
    def deserialize(cls, f: Field, data: bytes) -> "FriProof":
        import struct
        eb = max(f.nlimbs, 1) * 4
        off = 0
        (nrows,) = struct.unpack_from("<Q", data, off)
        off += 8

        def read_proof():
            nonlocal off
            # parse one reference-layout MerkleProof in place
            _pruned, _idx, nleaf = struct.unpack_from("<BQQ", data, off)
            ln = struct.calcsize("<BQQ") + nleaf
            (nroot,) = struct.unpack_from("<Q", data, off + ln)
            ln += 8 + nroot
            (npath,) = struct.unpack_from("<Q", data, off + ln)
            ln += 8 + npath
            p = MerkleProof.deserialize(data[off:off + ln])
            off += ln
            return p

        rows = []
        for _ in range(nrows):
            (nr,) = struct.unpack_from("<Q", data, off)
            off += 8
            rows.append([read_proof() for _ in range(nr)])
        qps = []
        for q in range(nrows // 2):
            qps.append([(rows[2 * q][r], rows[2 * q + 1][r])
                        for r in range(len(rows[2 * q]))])
        (nf,) = struct.unpack_from("<Q", data, off)
        off += 8
        final = []
        for _ in range(nf):
            final.append(int.from_bytes(data[off:off + eb], "little"))
            off += eb
        (nonce,) = struct.unpack_from("<Q", data, off)
        return cls(qps, final, nonce)


class FriTranscript:
    """Byte-exact mirror of FriTranscript<F> (fri_transcript.h)."""

    def __init__(self, f: Field, cfg: FriTranscriptConfig, log_input_size: int):
        self.f = f
        self.eb = max(f.nlimbs, 1) * 4
        self.cfg = cfg
        self.entry_0 = (cfg.domain_separator_label
                        + np.uint32(log_input_size).tobytes()
                        + cfg.public_state)
        self.prev_alpha = 0
        self.pow_nonce = 0

    def _field_bytes(self, v: int) -> bytes:
        return (v % self.f.modulus).to_bytes(self.eb, "little")

    def get_alpha(self, merkle_root: bytes, is_first_round: bool) -> int:
        cfg = self.cfg
        hi = bytearray(self.entry_0)
        if is_first_round:
            hi += self._field_bytes(cfg.seed)
        else:
            hi += self._field_bytes(self.prev_alpha)
        hi += cfg.round_challenge_label
        hi += cfg.commit_phase_label
        hi += merkle_root
        digest = cfg.hasher(bytes(hi))
        self.prev_alpha = int.from_bytes(digest, "little") % self.f.modulus
        return self.prev_alpha

    def _pow_challenge(self) -> bytes:
        return self.entry_0 + self._field_bytes(self.prev_alpha) + self.cfg.nonce_label

    def solve_pow(self, pow_bits: int) -> int:
        challenge = self._pow_challenge()
        threshold = 1 << (64 - pow_bits)
        nonce = 0
        while True:
            digest = self.cfg.hasher(challenge + nonce.to_bytes(8, "little") + b"\x00" * 24)
            if int.from_bytes(digest[:8], "little") < threshold:
                return nonce
            nonce += 1

    def verify_pow(self, nonce: int, pow_bits: int) -> bool:
        digest = self.cfg.hasher(self._pow_challenge()
                                 + nonce.to_bytes(8, "little") + b"\x00" * 24)
        return int.from_bytes(digest[:8], "little") < (1 << (64 - pow_bits))

    def set_pow_nonce(self, nonce: int):
        self.pow_nonce = nonce

    def rand_queries(self, nof_queries: int, lo: int, hi: int,
                     use_pow: bool) -> list[int]:
        if use_pow:
            hi_bytes = self.entry_0 + self.cfg.nonce_label + \
                np.uint32(self.pow_nonce & 0xFFFFFFFF).tobytes()
        else:
            hi_bytes = self.entry_0 + self._field_bytes(self.prev_alpha)
        digest = self.cfg.hasher(hi_bytes)
        seed64 = int.from_bytes(digest[:8], "little")
        gen = MT19937(seed64 & 0xFFFFFFFF)  # seed_rand_generator takes unsigned
        return [uniform_int(gen, lo, hi) for _ in range(nof_queries)]


# -- prover --------------------------------------------------------------------

def _make_round_trees(leaves_hash: Hash, compress_hash: Hash, elem_words: int,
                      log_input_size: int) -> list[MerkleTree]:
    """Per-round arity-2 trees (fri.cpp:347-352: layer 0 = leaves hash, then
    log2(size) compression layers; each round pops the top layer)."""
    trees = []
    for r in range(log_input_size):
        height = log_input_size - r
        hashers = [leaves_hash.with_input_words(elem_words)]
        hashers += [compress_hash.with_input_words(2 * leaves_hash.digest_words)
                    for _ in range(height)]
        trees.append(MerkleTree(hashers, elem_words))
    return trees


@dataclasses.dataclass
class _FoldKernels:
    fold: Callable


def _fold_kernel(f: Field, logn_max: int):
    """Jitted fold: evals (n,)+lim, alpha, inv-twiddles slice -> (n/2,)+lim.

    folded[i] = (e[i]+e[i+h])/2 + alpha * (e[i]-e[i+h])/2 * w^-i
    (cpu_fri_backend.h:113-133).
    """
    inv2 = f.from_ints([pow(2, -1, f.modulus)])[0]

    @jax.jit
    def fold(evals, alpha, inv_tw):
        n = evals.shape[0]
        h = n // 2
        lo, hiv = evals[:h], evals[h:]
        even = f.mul(f.add(lo, hiv), jnp.broadcast_to(inv2, lo.shape))
        odd = f.mul(f.sub(lo, hiv), jnp.broadcast_to(inv2, lo.shape))
        odd = f.mul(odd, inv_tw)
        return f.add(even, f.mul(jnp.broadcast_to(alpha, odd.shape), odd))

    return fold


def _inv_twiddles(f: Field, logn: int) -> jnp.ndarray:
    """w^-i for i in [0, 2^(logn-1)) where w = primitive 2^logn root."""
    w_inv = pow(f.omega(logn), -1, f.modulus)
    half = 1 << (logn - 1)
    vals = []
    cur = 1
    for _ in range(half):
        vals.append(cur)
        cur = (cur * w_inv) % f.modulus
    return f.from_ints(vals)


def fri_prove(f: Field, evals, cfg: FriConfig,
              transcript_cfg: FriTranscriptConfig,
              leaves_hash: Hash, compress_hash: Hash) -> FriProof:
    """Prove proximity of `evals` (size 2^k, natural order rou evaluations)
    to degree <= stopping_degree after log-folding."""
    assert cfg.folding_factor == 2, "reference supports folding_factor=2 only"
    n = evals.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    final_size = cfg.stopping_degree + 1
    log_final = final_size.bit_length() - 1
    assert 1 << log_final == final_size, "stopping_degree+1 must be pow2"
    nof_rounds = log_n - log_final

    elem_words = max(f.nlimbs, 1)
    trees = _make_round_trees(leaves_hash, compress_hash, elem_words, log_n)
    trees = trees[:nof_rounds]
    tr = FriTranscript(f, transcript_cfg, log_n)
    fold = _fold_kernel(f, log_n)

    rounds_evals = []
    cur = evals
    cur_log = log_n
    for r in range(nof_rounds):
        rounds_evals.append(cur)
        leaves = cur.reshape(cur.shape[0], elem_words) if f.limb_shape else \
            cur.reshape(-1, 1)
        trees[r].build(leaves)
        root = trees[r].get_root().astype("<u4").tobytes()
        alpha = tr.get_alpha(root, r == 0)
        alpha_arr = f.from_ints([alpha])[0]
        inv_tw = _inv_twiddles(f, cur_log)
        cur = fold(cur, alpha_arr, inv_tw)
        cur_log -= 1

    final_poly = [int(v) for v in np.atleast_1d(f.to_ints(cur))]

    pow_nonce = 0
    if cfg.pow_bits:
        pow_nonce = tr.solve_pow(cfg.pow_bits)
        tr.set_pow_nonce(pow_nonce)

    queries = tr.rand_queries(cfg.nof_queries, final_size, n, cfg.pow_bits != 0)
    query_proofs = []
    for q in queries:
        per_round = []
        for r in range(nof_rounds):
            round_size = 1 << (log_n - r)
            leaf_idx = q % round_size
            leaf_idx_sym = (q + round_size // 2) % round_size
            leaves_np = np.asarray(rounds_evals[r]).reshape(round_size, elem_words)
            pr = trees[r].get_merkle_proof(leaves_np, leaf_idx, pruned=False)
            prs = trees[r].get_merkle_proof(leaves_np, leaf_idx_sym, pruned=False)
            per_round.append((pr, prs))
        query_proofs.append(per_round)
    return FriProof(query_proofs, final_poly, pow_nonce)


# -- verifier (mirror of src/fri/fri.cpp:41-320) ---------------------------------

def fri_verify(f: Field, proof: FriProof, cfg: FriConfig,
               transcript_cfg: FriTranscriptConfig,
               leaves_hash: Hash, compress_hash: Hash) -> bool:
    p = f.modulus
    final_size = cfg.stopping_degree + 1
    if len(proof.final_poly) != final_size:
        return False
    nof_rounds = proof.nof_rounds
    log_n = nof_rounds + (final_size.bit_length() - 1)
    n = 1 << log_n
    elem_words = max(f.nlimbs, 1)
    trees = _make_round_trees(leaves_hash, compress_hash, elem_words, log_n)
    trees = trees[:nof_rounds]

    tr = FriTranscript(f, transcript_cfg, log_n)
    alphas = []
    for r in range(nof_rounds):
        root = proof.round_root(r).astype("<u4").tobytes()
        alphas.append(tr.get_alpha(root, r == 0))

    if cfg.pow_bits:
        if not tr.verify_pow(proof.pow_nonce, cfg.pow_bits):
            return False
        tr.set_pow_nonce(proof.pow_nonce)

    queries = tr.rand_queries(cfg.nof_queries, final_size, n, cfg.pow_bits != 0)
    w_inv = pow(f.omega(log_n), -1, p)
    inv2 = pow(2, -1, p)

    def words_to_int(words: np.ndarray) -> int:
        v = 0
        for i, w in enumerate(words.astype(np.uint64)):
            v |= int(w) << (32 * i)
        return v

    for qi, q in enumerate(queries):
        for r in range(nof_rounds):
            round_size = 1 << (log_n - r)
            elem_idx = q % round_size
            elem_idx_sym = (q + round_size // 2) % round_size
            pr, prs = proof.query_proofs[qi][r]
            # index consistency (fri.cpp:156-176)
            if pr.leaf_idx != elem_idx or prs.leaf_idx != elem_idx_sym:
                return False
            # all query proofs must commit to the round root the transcript saw
            if not np.array_equal(pr.root, proof.round_root(r)) or \
               not np.array_equal(prs.root, proof.round_root(r)):
                return False
            # merkle path validity (verify recomputes the root from the path)
            if not trees[r].verify(pr) or not trees[r].verify(prs):
                return False
            # collinearity (fri.cpp:192-236)
            lv = words_to_int(pr.leaf)
            lvs = words_to_int(prs.leaf)
            l_even = (lv + lvs) * inv2 % p
            l_odd = (lv - lvs) * inv2 % p
            l_odd = l_odd * pow(w_inv, elem_idx * (1 << r), p) % p
            folded = (l_even + alphas[r] * l_odd) % p
            if r == nof_rounds - 1:
                if proof.final_poly[q % final_size] % p != folded:
                    return False
            else:
                nxt = words_to_int(proof.query_proofs[qi][r + 1][0].leaf)
                if nxt % p != folded:
                    return False
    return True

"""FRI prove/verify + PoW tests (mirrors icicle/tests/test_field_api.cpp FRI
cases :973-1317: roundtrip, tampered proofs, pow grinding)."""

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops import ntt as N
from icicle_tpu.ops.fri import (
    fri_prove, fri_verify, FriConfig, FriTranscriptConfig, MT19937, uniform_int,
)
from icicle_tpu.ops.hash.keccak import Keccak256
from icicle_tpu.ops.pow import proof_of_work, proof_of_work_verify
from icicle_tpu.runtime.config import NTTConfig, NTTDir

F = get_field("babybear")
P = F.modulus


def low_degree_evals(rng, log_n, degree):
    """Evaluations on the 2^log_n rou domain of a random poly of `degree`."""
    n = 1 << log_n
    coeffs = [int(v) for v in rng.integers(0, P, size=degree + 1)] + [0] * (n - degree - 1)
    N.ntt_init_domain(F, log_n)
    return N.ntt_jit(F, F.from_ints(coeffs), NTTDir.FORWARD, NTTConfig())


def test_mt19937_reference_vector():
    """std::mt19937(5489) first outputs (canonical test vector)."""
    g = MT19937(5489)
    assert g.next_u32() == 3499211612
    assert g.next_u32() == 581869302


def test_fri_roundtrip():
    rng = np.random.default_rng(1)
    log_n = 6
    cfg = FriConfig(stopping_degree=0, pow_bits=4, nof_queries=10)
    tcfg = FriTranscriptConfig(domain_separator_label=b"fri-test")
    evals = low_degree_evals(rng, log_n, degree=0)
    h = Keccak256()
    proof = fri_prove(F, evals, cfg, tcfg, h, h)
    assert len(proof.final_poly) == 1
    assert fri_verify(F, proof, cfg, tcfg, h, h)


def test_fri_stopping_degree_3():
    rng = np.random.default_rng(2)
    log_n = 5
    cfg = FriConfig(stopping_degree=3, pow_bits=0, nof_queries=8)
    tcfg = FriTranscriptConfig()
    evals = low_degree_evals(rng, log_n, degree=3)
    h = Keccak256()
    proof = fri_prove(F, evals, cfg, tcfg, h, h)
    assert len(proof.final_poly) == 4
    assert fri_verify(F, proof, cfg, tcfg, h, h)


def test_fri_tampered_proof_fails():
    rng = np.random.default_rng(3)
    log_n = 5
    cfg = FriConfig(stopping_degree=0, pow_bits=0, nof_queries=6)
    tcfg = FriTranscriptConfig()
    evals = low_degree_evals(rng, log_n, degree=0)
    h = Keccak256()
    proof = fri_prove(F, evals, cfg, tcfg, h, h)
    assert fri_verify(F, proof, cfg, tcfg, h, h)
    # tamper with the final polynomial
    proof.final_poly[0] = (proof.final_poly[0] + 1) % P
    assert not fri_verify(F, proof, cfg, tcfg, h, h)


def test_fri_wrong_transcript_labels_fail():
    rng = np.random.default_rng(4)
    evals = low_degree_evals(rng, 5, degree=0)
    h = Keccak256()
    cfg = FriConfig(stopping_degree=0, pow_bits=0, nof_queries=4)
    proof = fri_prove(F, evals, cfg, FriTranscriptConfig(domain_separator_label=b"a"), h, h)
    assert not fri_verify(F, proof, cfg, FriTranscriptConfig(domain_separator_label=b"b"), h, h)


def test_pow_roundtrip():
    h = Keccak256()
    found, nonce, mined = proof_of_work(h, b"icicle-pow-challenge", 10)
    assert found
    ok, mined2 = proof_of_work_verify(h, b"icicle-pow-challenge", 10, nonce)
    assert ok and mined2 == mined
    # wrong nonce (nonce-1 can't also be the smallest solution)
    if nonce > 0:
        ok_bad, _ = proof_of_work_verify(h, b"icicle-pow-challenge", 10, nonce - 1)
        assert not ok_bad


def test_fri_proof_serialization_reference_parity():
    """Serialize a real babybear FRI proof here, deserialize+reserialize it
    through the reference BinarySerializer FFI, and require byte identity
    (serialization.h:40-112 + fri_proof_serializer.h)."""
    from tests import ref_ffi
    if not ref_ffi.available("babybear"):
        pytest.skip("babybear reference build not present")
    rng = np.random.default_rng(77)
    log_n = 6
    cfg = FriConfig(stopping_degree=0, pow_bits=0, nof_queries=4)
    tcfg = FriTranscriptConfig()
    evals = low_degree_evals(rng, log_n, degree=0)
    h = Keccak256()
    proof = fri_prove(F, evals, cfg, tcfg, h, h)
    blob = proof.serialize(F)
    back = ref_ffi.babybear_fri_proof_reserialize(blob)
    assert bytes(back) == blob

"""Sumcheck prove/verify tests (mirrors icicle/tests/test_field_api.cpp
Sumcheck cases: happy path, predefined combine programs, tampered proofs)."""

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops.program import ReturningValueProgram, PreDefined
from icicle_tpu.ops.sumcheck import (
    sumcheck_prove, sumcheck_verify, SumcheckTranscriptConfig, SumcheckProof,
)

F = get_field("babybear")
P = F.modulus


def make_mles(rng, npolys, n):
    ints = [[int(v) for v in rng.integers(0, P, size=n)] for _ in range(npolys)]
    tensors = [F.from_ints(v) for v in ints]
    return ints, tensors


def combine_ref(ints, func):
    n = len(ints[0])
    total = 0
    for i in range(n):
        total = (total + func([row[i] for row in ints])) % P
    return total


@pytest.mark.parametrize("n", [8, 32])
def test_sumcheck_ab_minus_c(n):
    rng = np.random.default_rng(n)
    ints, tensors = make_mles(rng, 3, n)
    prog = ReturningValueProgram(PreDefined.AB_MINUS_C)
    claimed = combine_ref(ints, lambda v: (v[0] * v[1] - v[2]) % P)
    proof, challenges = sumcheck_prove(F, tensors, claimed, prog)
    assert len(proof.round_polys) == n.bit_length() - 1
    assert sumcheck_verify(F, proof, claimed)
    # wrong claimed sum must fail
    assert not sumcheck_verify(F, proof, (claimed + 1) % P)
    # tampered round poly must fail
    bad = SumcheckProof([list(rp) for rp in proof.round_polys])
    bad.round_polys[0][0] = (bad.round_polys[0][0] + 1) % P
    assert not sumcheck_verify(F, bad, claimed)


def test_sumcheck_custom_combine():
    rng = np.random.default_rng(5)
    n = 16
    ints, tensors = make_mles(rng, 2, n)
    prog = ReturningValueProgram(lambda v: v[0] * v[0] * v[1] + 3, nof_inputs=2)
    assert prog.poly_degree == 3
    claimed = combine_ref(ints, lambda v: (v[0] * v[0] * v[1] + 3) % P)
    proof, _ = sumcheck_prove(F, tensors, claimed, prog)
    assert sumcheck_verify(F, proof, claimed)


def test_sumcheck_transcript_labels_matter():
    rng = np.random.default_rng(9)
    n = 8
    ints, tensors = make_mles(rng, 3, n)
    prog = ReturningValueProgram(PreDefined.AB_MINUS_C)
    claimed = combine_ref(ints, lambda v: (v[0] * v[1] - v[2]) % P)
    cfg1 = SumcheckTranscriptConfig(domain_separator_label=b"app1")
    cfg2 = SumcheckTranscriptConfig(domain_separator_label=b"app2")
    proof, _ = sumcheck_prove(F, tensors, claimed, prog, cfg1)
    assert sumcheck_verify(F, proof, claimed, cfg1)
    # different domain separator -> verification of later rounds fails
    # (round 0 check still passes; rounds > 0 use different alphas)
    if len(proof.round_polys) > 1:
        assert not sumcheck_verify(F, proof, claimed, cfg2)


def test_sumcheck_proof_serialization_roundtrip():
    rng = np.random.default_rng(11)
    n = 8
    ints, tensors = make_mles(rng, 3, n)
    prog = ReturningValueProgram(PreDefined.AB_MINUS_C)
    claimed = combine_ref(ints, lambda v: (v[0] * v[1] - v[2]) % P)
    proof, _ = sumcheck_prove(F, tensors, claimed, prog)
    blob = proof.serialize(F)
    back = SumcheckProof.deserialize(F, blob)
    assert back.round_polys == proof.round_polys


def test_keccak_py_vectors():
    """Known vectors: keccak256("") and sha3_256("")."""
    from icicle_tpu.utils import keccak_py
    assert keccak_py.keccak_256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak_py.sha3_256(b"").hex() == \
        "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a"
    assert keccak_py.keccak_256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"

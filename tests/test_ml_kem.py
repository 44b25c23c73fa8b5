"""ML-KEM tests (mirrors icicle/tests/test_pqc_api.cpp: batch roundtrips per
category, implicit rejection, determinism)."""

import numpy as np
import pytest

from icicle_tpu.ops.pqc import keygen, encaps, decaps, PARAMS


@pytest.mark.parametrize("cat", ["512", "768", "1024"])
def test_ml_kem_roundtrip(cat):
    p = PARAMS[cat]
    rng = np.random.default_rng(hash(cat) % 2**32)
    B = 3
    ent = rng.integers(0, 256, size=(B, 64), dtype=np.uint8)
    ek, dk = keygen(cat, ent)
    assert ek.shape == (B, p.ek_bytes)
    assert dk.shape == (B, p.dk_bytes)

    m = rng.integers(0, 256, size=(B, 32), dtype=np.uint8)
    ct, ss = encaps(cat, m, ek)
    assert ct.shape == (B, p.ct_bytes)
    assert ss.shape == (B, 32)

    ss2 = decaps(cat, ct, dk)
    assert np.array_equal(ss, ss2)


def test_ml_kem_deterministic():
    rng = np.random.default_rng(7)
    ent = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    ek1, dk1 = keygen("512", ent)
    ek2, dk2 = keygen("512", ent)
    assert np.array_equal(ek1, ek2) and np.array_equal(dk1, dk2)


def test_ml_kem_implicit_rejection():
    rng = np.random.default_rng(9)
    ent = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    ek, dk = keygen("512", ent)
    m = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    ct, ss = encaps("512", m, ek)
    bad = ct.copy()
    bad[:, 5] ^= 0xFF
    ss_bad = decaps("512", bad, dk)
    # rejection path produces a DIFFERENT but deterministic secret
    assert not np.array_equal(ss, ss_bad)
    ss_bad2 = decaps("512", bad, dk)
    assert np.array_equal(ss_bad, ss_bad2)


def test_ml_kem_wrong_key_rejects():
    rng = np.random.default_rng(11)
    ent = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    ek, dk = keygen("768", ent)
    m = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    ct, ss = encaps("768", m, ek)
    # decapsulate with the OTHER keypair's dk
    ss_cross = decaps("768", ct, dk[::-1])
    assert not np.array_equal(ss, ss_cross)

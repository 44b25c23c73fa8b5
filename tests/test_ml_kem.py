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


REF_DATA = "/root/reference/icicle/backend/cuda_pqc/tests/ml_kem/test_data"


@pytest.mark.parametrize("cat", ["512", "768", "1024"])
def test_ml_kem_kat_reference_seeds(cat):
    """Known-answer validation on the reference's shipped seed files
    (backend/cuda_pqc/tests/ml_kem/test_data/ml_kem_<cat>_data): keygen,
    encaps, and decaps byte-equality against an independent pure-python
    FIPS 203 implementation (tests/mlkem_ref.py) — the same strategy the
    reference uses with kyber_py (batch_tests.py)."""
    import os
    from tests import mlkem_ref as R
    path = os.path.join(REF_DATA, f"ml_kem_{cat}_data",
                        f"ml_kem_{cat}_8192_random_bytes.txt")
    if not os.path.exists(path):
        pytest.skip("reference ML-KEM seed data not present")
    raw = open(path, "rb").read()
    B = 4  # oracle is pure python; a handful of full-KAT rows suffices
    ent = np.frombuffer(raw[:B * 64], dtype=np.uint8).reshape(B, 64)
    ek, dk = keygen(cat, ent)
    rng = np.random.default_rng(12345)
    msgs = rng.integers(0, 256, size=(B, 32), dtype=np.uint8)
    ct, ss = encaps(cat, msgs, ek)
    ss2 = decaps(cat, ct, dk)
    for i in range(B):
        d, z = raw[i * 64:i * 64 + 32], raw[i * 64 + 32:i * 64 + 64]
        ek_r, dk_r = R.keygen(cat, d, z)
        assert bytes(ek[i]) == ek_r, f"ek mismatch row {i}"
        assert bytes(dk[i]) == dk_r, f"dk mismatch row {i}"
        ct_r, ss_r = R.encaps(cat, ek_r, bytes(msgs[i]))
        assert bytes(ct[i]) == ct_r, f"ct mismatch row {i}"
        assert bytes(ss[i]) == ss_r, f"ss mismatch row {i}"
        assert bytes(ss2[i]) == R.decaps(cat, dk_r, ct_r)
        # implicit-rejection path must also agree byte-for-byte
        bad = bytearray(ct_r)
        bad[0] ^= 1
        ss_bad = decaps(cat, np.frombuffer(bytes(bad), dtype=np.uint8)[None, :],
                        dk[i:i + 1])
        assert bytes(ss_bad[0]) == R.decaps(cat, dk_r, bytes(bad))

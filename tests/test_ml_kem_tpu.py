"""Device-resident ML-KEM vs the host-numpy oracle (itself KAT-verified
against the reference's shipped seed files, tests/test_ml_kem.py)."""

import numpy as np
import pytest

from icicle_tpu.ops.pqc import ml_kem as host
from icicle_tpu.ops.pqc import ml_kem_tpu as dev


@pytest.mark.parametrize("cat", ["512", "768", "1024"])
def test_device_matches_host_bitexact(cat, rng):
    B = 3
    entropy = rng.integers(0, 256, size=(B, 64), dtype=np.uint8)
    msgs = rng.integers(0, 256, size=(B, 32), dtype=np.uint8)

    ek_h, dk_h = host.keygen(cat, entropy)
    ek_d, dk_d = dev.keygen(cat, entropy)
    assert np.array_equal(ek_d, ek_h)
    assert np.array_equal(dk_d, dk_h)

    ct_h, ss_h = host.encaps(cat, msgs, ek_h)
    ct_d, ss_d = dev.encaps(cat, msgs, ek_d)
    assert np.array_equal(ct_d, ct_h)
    assert np.array_equal(ss_d, ss_h)

    out_h = host.decaps(cat, ct_h, dk_h)
    out_d = dev.decaps(cat, ct_d, dk_d)
    assert np.array_equal(out_d, out_h)
    assert np.array_equal(out_d, ss_d)  # roundtrip agreement


def test_device_implicit_rejection_matches_host(rng):
    cat = "512"
    entropy = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    msgs = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    ek, dk = dev.keygen(cat, entropy)
    ct, ss = dev.encaps(cat, msgs, ek)
    bad = ct.copy()
    bad[:, 0] ^= 1
    out_d = dev.decaps(cat, bad, dk)
    out_h = host.decaps(cat, bad, dk)
    assert np.array_equal(out_d, out_h)
    assert not np.array_equal(out_d, ss)  # rejected -> different secret

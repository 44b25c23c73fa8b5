"""Poseidon (original) tests.

Structure checks always run; bit-exact golden tests vs the reference C++ CPU
backend (tests/ref_ffi.py) run when the reference build exists (mirrors
icicle/tests/test_hash_api.cpp Poseidon cases).
"""

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops.hash.poseidon import Poseidon, supported_widths
from tests import ref_ffi


def test_widths_available():
    assert supported_widths("babybear") == [3, 5, 9, 12]
    assert supported_widths("bn254_scalar") == [3, 5, 9, 12]


@pytest.mark.parametrize("t", [3, 5, 9, 12])
def test_poseidon_shapes_and_determinism(t):
    f = get_field("babybear")
    h = Poseidon(f, t)
    rng = np.random.default_rng(100 + t)
    x = f.rand(rng, (4, t))
    d1 = np.asarray(h.hash_fields(x))
    d2 = np.asarray(h.hash_fields(x))
    assert d1.shape == (4,)
    assert np.array_equal(d1, d2)
    # different inputs -> different digests (overwhelming probability)
    y = f.rand(rng, (4, t))
    assert not np.array_equal(d1, np.asarray(h.hash_fields(y)))


def test_poseidon_domain_tag_changes_digest():
    f = get_field("babybear")
    rng = np.random.default_rng(7)
    x = f.rand(rng, (2, 2))  # arity = t-1 = 2 with tag
    h_tag0 = Poseidon(f, 3, domain_tag=0)
    h_tag1 = Poseidon(f, 3, domain_tag=1)
    assert not np.array_equal(np.asarray(h_tag0.hash_fields(x)),
                              np.asarray(h_tag1.hash_fields(x)))


needs_ref = pytest.mark.skipif(not ref_ffi.available("babybear"),
                               reason="reference build unavailable")


@needs_ref
@pytest.mark.parametrize("t", [3, 5, 9, 12])
def test_poseidon_babybear_matches_reference(t, rng):
    f = get_field("babybear")
    h = Poseidon(f, t)
    ins = np.asarray(f.rand(rng, (8, t)), dtype=np.uint32)
    ref = ref_ffi.poseidon_hash("babybear", t, ins.view(np.uint8))
    got = np.asarray(h.hash_fields(ins)).astype(np.uint32)
    assert np.array_equal(got.view(np.uint8).reshape(ref.shape), ref)


@needs_ref
def test_poseidon_domain_tag_matches_reference(rng):
    f = get_field("babybear")
    t = 3
    tag = 1234567
    h = Poseidon(f, t, domain_tag=tag)
    ins = np.asarray(f.rand(rng, (4, t - 1)), dtype=np.uint32)
    tag_bytes = np.array([tag], dtype=np.uint32).view(np.uint8)
    ref = ref_ffi.poseidon_hash("babybear", t, ins.view(np.uint8),
                                domain_tag=tag_bytes)
    got = np.asarray(h.hash_fields(ins)).astype(np.uint32)
    assert np.array_equal(got.view(np.uint8).reshape(ref.shape), ref)

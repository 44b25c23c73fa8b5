"""Bit-exactness vs the reference C++ CPU backend (golden vectors via ctypes).

Skipped when the reference build is absent (tools/build_reference.sh creates
it). This mirrors the reference's own reference-vs-main device test pattern
(test_base.h) with ICICLE CPU as reference and the JAX/TPU impl as main.
"""

import numpy as np
import pytest

from tests import ref_ffi
from icicle_tpu.fields.field import get_field
from icicle_tpu.ops import ntt as N
from icicle_tpu.ops.hash.poseidon2 import Poseidon2
from icicle_tpu.runtime.config import NTTConfig, NTTDir, Ordering

pytestmark = pytest.mark.skipif(not ref_ffi.available("babybear"),
                                reason="reference build not present")


@pytest.mark.parametrize("t", [2, 3, 4, 8, 12, 16, 20, 24])
def test_poseidon2_babybear_matches_reference(t, rng):
    f = get_field("babybear")
    batch = 4
    ins = np.array([[int.from_bytes(rng.bytes(8), "little") % f.modulus
                     for _ in range(t)] for _ in range(batch)], dtype=np.uint32)
    ref = ref_ffi.poseidon2_hash("babybear", t, ins.view(np.uint8))
    ref_vals = ref.view(np.uint32).reshape(batch)
    got = np.asarray(Poseidon2(f, t).hash_fields(np.asarray(ins)))
    assert np.array_equal(got, ref_vals), f"t={t}"


@pytest.mark.parametrize("t", [3, 8])
def test_poseidon2_sponge_matches_reference(t, rng):
    f = get_field("babybear")
    n = 2 * (t - 1) + 1  # multi-hasher sponge, no padding ambiguity... and odd
    ins = np.array([[int.from_bytes(rng.bytes(8), "little") % f.modulus
                     for _ in range(n)]], dtype=np.uint32)
    ref = ref_ffi.poseidon2_hash("babybear", t, ins.view(np.uint8))
    got = np.asarray(Poseidon2(f, t).hash_fields(np.asarray(ins)))
    assert int(got[0]) == int(ref.view(np.uint32)[0])


def test_poseidon2_domain_tag_matches_reference(rng):
    f = get_field("babybear")
    t = 4
    tag = 1234567
    ins = np.array([[5, 6, 7]], dtype=np.uint32)
    tag_bytes = np.array([tag], dtype=np.uint32).view(np.uint8)
    ref = ref_ffi.poseidon2_hash("babybear", t, ins.view(np.uint8), domain_tag=tag_bytes)
    got = np.asarray(Poseidon2(f, t, domain_tag=tag).hash_fields(np.asarray(ins)))
    assert int(got[0]) == int(ref.view(np.uint32)[0])


@pytest.mark.parametrize("logn,ordering", [(4, Ordering.NN), (8, Ordering.NN),
                                           (6, Ordering.NR), (6, Ordering.RN)])
def test_ntt_babybear_matches_reference(logn, ordering, rng):
    f = get_field("babybear")
    n = 1 << logn
    a = np.array([int.from_bytes(rng.bytes(8), "little") % f.modulus
                  for _ in range(n)], dtype=np.uint32)
    order_map = {Ordering.NN: 0, Ordering.NR: 1, Ordering.RN: 2, Ordering.RR: 3}
    ref = ref_ffi.ntt("babybear", a, logn_domain=max(logn, 10),
                      ordering=order_map[ordering])
    got = np.asarray(N.ntt(f, np.asarray(a), NTTDir.FORWARD,
                           NTTConfig(ordering=ordering)))
    assert np.array_equal(got, ref)


def test_intt_babybear_matches_reference(rng):
    f = get_field("babybear")
    n = 64
    a = np.array([int.from_bytes(rng.bytes(8), "little") % f.modulus
                  for _ in range(n)], dtype=np.uint32)
    ref = ref_ffi.ntt("babybear", a, logn_domain=10, inverse=True)
    got = np.asarray(N.ntt(f, np.asarray(a), NTTDir.INVERSE))
    assert np.array_equal(got, ref)


def test_coset_ntt_matches_reference(rng):
    f = get_field("babybear")
    n = 32
    gen = 7
    a = np.array([int.from_bytes(rng.bytes(8), "little") % f.modulus
                  for _ in range(n)], dtype=np.uint32)
    gen_le = np.array([gen], dtype=np.uint32).view(np.uint8)
    ref = ref_ffi.ntt("babybear", a, logn_domain=10, coset_gen_le=gen_le)
    got = np.asarray(N.ntt(f, np.asarray(a), NTTDir.FORWARD, NTTConfig(coset_gen=gen)))
    assert np.array_equal(got, ref)

"""Blake3 tests: known vectors + golden comparison vs the reference C++
backend (vendored upstream blake3.c) across chunk/tree boundaries."""

import numpy as np
import pytest

from icicle_tpu.ops.hash.blake3 import Blake3
from tests import ref_ffi


def test_blake3_known_vectors():
    h = Blake3()
    assert h.hash_bytes(b"").hex() == \
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    assert h.hash_bytes(b"\x00").hex() == \
        "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213"
    # official test-vector input pattern: bytes i % 251
    data = bytes(i % 251 for i in range(3))
    assert h.hash_bytes(data).hex() == \
        "e1be4d7a8ab5560aa4199eea339849ba8e293d55ca0a81006726d184519e647f"


needs_ref = pytest.mark.skipif(not ref_ffi.available("babybear"),
                               reason="reference build unavailable")


@needs_ref
# size 0 omitted: the reference hasher asserts size > 0 (hash_backend.h:72)
@pytest.mark.parametrize("nbytes", [1, 65, 1023, 1024, 2048])
def test_blake3_matches_reference(nbytes):
    h = Blake3()
    rng = np.random.default_rng(nbytes)
    data = rng.integers(0, 256, size=(2, nbytes), dtype=np.uint8)
    got = np.frombuffer(h.hash_bytes(data.tobytes(), batch=2),
                        dtype=np.uint8).reshape(2, 32)
    want = ref_ffi.byte_hash("blake3", data, 32)
    assert np.array_equal(got, want), f"nbytes={nbytes}"

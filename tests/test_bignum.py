"""BigNum-surface parity: to/from LE bytes and hex on Field tensors
(reference wrappers/rust/icicle-core/src/bignum.rs to_bytes_le /
from_bytes_le / from_hex semantics, incl. zero-pad and truncation)."""

import numpy as np

from icicle_tpu.fields.field import get_field


def test_bytes_roundtrip_bigfield(rng):
    f = get_field("bn254_scalar")
    vals = [int(rng.integers(1, 1 << 62)) ** 4 % f.modulus for _ in range(5)]
    arr = f.from_ints(vals)
    b = f.to_bytes_le(arr)
    assert b.shape == (5, 32)
    # byte rows match python int encoding
    for i, v in enumerate(vals):
        assert bytes(b[i]) == v.to_bytes(32, "little")
    back = f.from_bytes_le(b)
    assert np.array_equal(np.asarray(back), np.asarray(arr))


def test_bytes_roundtrip_small_field(rng):
    f = get_field("babybear")
    vals = [int(v) for v in rng.integers(0, f.modulus, size=7)]
    arr = f.from_ints(vals)
    b = f.to_bytes_le(arr)
    assert b.shape == (7, 4)
    back = f.from_bytes_le(b)
    assert np.array_equal(np.asarray(back), np.asarray(arr))


def test_from_bytes_pad_and_truncate():
    f = get_field("bn254_scalar")
    # short input zero-pads
    one = f.from_bytes_le(np.array([1], dtype=np.uint8))
    assert int(f.to_ints(one[None])[0]) == 1
    # long input keeps only the first 32 bytes (reference doc: "only takes
    # the first bytes if there are too many")
    long = np.arange(40, dtype=np.uint8)
    got = int(f.to_ints(f.from_bytes_le(long)[None])[0])
    assert got == int.from_bytes(bytes(range(32)), "little")


def test_from_hex():
    f = get_field("bn254_scalar")
    v = f.from_hex("0xdeadbeef")
    assert int(f.to_ints(v[None])[0]) == 0xDEADBEEF
    # odd-length and no-prefix forms
    v2 = f.from_hex("abc")
    assert int(f.to_ints(v2[None])[0]) == 0xABC

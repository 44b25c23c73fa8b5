"""Poseidon2 vs an independent pure-python-int evaluation of the same spec
(round structure per cpu_poseidon2.cpp; see also tests/test_reference_vectors.py
for golden vectors produced by the reference C++ build)."""

import os

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops.hash.poseidon2 import Poseidon2, supported_arities, _load_constants


def py_poseidon2(field, t, inputs, domain_tag=None):
    """Exact-int Poseidon2 (sponge if needed); returns one digest int."""
    p = field.modulus
    c = _load_constants(field.name)
    fr, hf, pr, alpha = (int(v) for v in c[f"t{t}_meta"])
    nl = max(field.nlimbs, 1)

    def ints(rows):
        return [sum(int(rows[i, j]) << (32 * j) for j in range(rows.shape[1]))
                for i in range(rows.shape[0])]

    rc = ints(c[f"t{t}_rc"])
    mds = ints(c[f"t{t}_mds"])
    diag_m1 = [(d - 1) % p for d in ints(c[f"t{t}_diag"])]

    def matmul(s):
        return [sum(mds[r * t + col] * s[col] for col in range(t)) % p for r in range(t)]

    def perm(s):
        s = matmul(s)
        off = 0
        for _ in range(hf):
            s = [(x + rc[off + i]) % p for i, x in enumerate(s)]
            s = [pow(x, alpha, p) for x in s]
            s = matmul(s)
            off += t
        for _ in range(pr):
            s[0] = pow((s[0] + rc[off]) % p, alpha, p)
            tot = sum(s) % p
            s = [(tot + diag_m1[i] * s[i]) % p for i in range(t)]
            off += 1
        for _ in range(hf):
            s = [(x + rc[off + i]) % p for i, x in enumerate(s)]
            s = [pow(x, alpha, p) for x in s]
            s = matmul(s)
            off += t
        return s

    n = len(inputs)
    expect_n = t - 1 if domain_tag is not None else t
    if n == expect_n:
        s = ([domain_tag] if domain_tag is not None else []) + list(inputs)
        s = perm(s)
        return s[1]
    # sponge
    s = [0] * t
    rest = list(inputs)
    if domain_tag is not None:
        s[0] = domain_tag
    else:
        s[0] = rest.pop(0)
    nof_hashers = max(1, -(-len(rest) // (t - 1)))
    pad = nof_hashers * (t - 1) - len(rest)
    if pad:
        rest += [1] + [0] * (pad - 1)
    for h in range(nof_hashers):
        block = rest[h * (t - 1):(h + 1) * (t - 1)]
        for i in range(1, t):
            s[i] = (s[i] + block[i - 1]) % p
        s = perm(s)
    return s[1]


@pytest.mark.parametrize("fname,t", [("babybear", 2), ("babybear", 3), ("babybear", 16),
                                     ("koalabear", 4), ("m31", 8),
                                     ("goldilocks", 4), ("bn254_scalar", 3)])
def test_permutation_vs_python(fname, t, rng):
    f = get_field(fname)
    h = Poseidon2(f, t)
    batch = 5
    ins = [[int.from_bytes(rng.bytes(32), "little") % f.modulus for _ in range(t)]
           for _ in range(batch)]
    got = f.to_ints(h.hash_fields(f.from_ints(ins)))
    for b in range(batch):
        assert got[b] == py_poseidon2(f, t, ins[b]), f"batch {b}"


def test_domain_tag(rng):
    f = get_field("babybear")
    tag = 77
    h = Poseidon2(f, 4, domain_tag=tag)
    ins = [[int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(3)]]
    got = f.to_ints(h.hash_fields(f.from_ints(ins)))
    assert got[0] == py_poseidon2(f, 4, ins[0], domain_tag=tag)


@pytest.mark.parametrize("n", [1, 2, 5, 6, 9])
def test_sponge_lengths(n, rng):
    f = get_field("babybear")
    t = 3
    h = Poseidon2(f, t)
    ins = [[int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]]
    got = f.to_ints(h.hash_fields(f.from_ints(ins)))
    assert got[0] == py_poseidon2(f, t, ins[0]), f"sponge len {n}"


def test_hash_words_and_bytes(rng):
    f = get_field("babybear")
    h = Poseidon2(f, 3)
    ins = [[1, 2, 3], [4, 5, 6]]
    import jax.numpy as jnp
    words = jnp.asarray(np.array(ins, dtype=np.uint32))
    out = np.asarray(h.hash_words(words))
    assert out.shape == (2, 1)
    assert int(out[0, 0]) == py_poseidon2(f, 3, ins[0])
    # byte API round trip
    data = np.array(ins, dtype="<u4").tobytes()
    ob = h.hash_bytes(data, batch=2)
    assert np.frombuffer(ob, dtype="<u4")[0] == out[0, 0]

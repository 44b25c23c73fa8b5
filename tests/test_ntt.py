"""NTT vs naive O(n^2) python evaluation + roundtrip/ordering/coset cases
(mirrors reference ntt tests in tests/test_field_api.cpp)."""

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops import ntt as N
from icicle_tpu.ops.vec_ops import bit_reverse_indices
from icicle_tpu.runtime.config import NTTConfig, NTTDir, Ordering


def naive_ntt(a, omega, p):
    n = len(a)
    return [sum(a[j] * pow(omega, i * j, p) for j in range(n)) % p for i in range(n)]


@pytest.mark.parametrize("name", ["babybear", "goldilocks", "bn254_scalar"])
@pytest.mark.parametrize("logn", [3, 5])
def test_forward_matches_naive(name, logn, rng):
    f = get_field(name)
    n = 1 << logn
    a_i = [int.from_bytes(rng.bytes(32), "little") % f.modulus for _ in range(n)]
    w = f.params.omega(logn)
    want = naive_ntt(a_i, w, f.modulus)
    got = f.to_ints(N.ntt(f, f.from_ints(a_i), NTTDir.FORWARD))
    assert list(got) == want


@pytest.mark.parametrize("name", ["babybear", "stark252"])
def test_roundtrip_and_batch(name, rng):
    f = get_field(name)
    n = 64
    a_i = [[int.from_bytes(rng.bytes(32), "little") % f.modulus for _ in range(n)]
           for _ in range(3)]
    a = f.from_ints(a_i)
    fwd = N.ntt(f, a, NTTDir.FORWARD)
    back = f.to_ints(N.ntt(f, fwd, NTTDir.INVERSE))
    for b in range(3):
        assert list(back[b]) == a_i[b]


def test_orderings(rng):
    f = get_field("babybear")
    n = 32
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    a = f.from_ints(a_i)
    rev = bit_reverse_indices(n)
    nn = np.array(f.to_ints(N.ntt(f, a, NTTDir.FORWARD, NTTConfig(ordering=Ordering.NN))))
    nr = np.array(f.to_ints(N.ntt(f, a, NTTDir.FORWARD, NTTConfig(ordering=Ordering.NR))))
    assert list(nr) == list(nn[rev])
    a_rev = f.from_ints([a_i[r] for r in rev])
    rn = np.array(f.to_ints(N.ntt(f, a_rev, NTTDir.FORWARD, NTTConfig(ordering=Ordering.RN))))
    assert list(rn) == list(nn)
    rr = np.array(f.to_ints(N.ntt(f, a_rev, NTTDir.FORWARD, NTTConfig(ordering=Ordering.RR))))
    assert list(rr) == list(nn[rev])


def test_coset(rng):
    """Coset NTT(x)[i] = sum_j x_j (g w^i)^j; verify against naive eval and
    roundtrip through the inverse coset transform."""
    f = get_field("babybear")
    n = 16
    logn = 4
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    g = 3  # any unit works as coset generator
    cfg = NTTConfig(coset_gen=g)
    got = f.to_ints(N.ntt(f, f.from_ints(a_i), NTTDir.FORWARD, cfg))
    w = f.params.omega(logn)
    p = f.modulus
    want = [sum(a_i[j] * pow(g * 0 + (g * pow(w, i, p)) % p, j, p) for j in range(n)) % p
            for i in range(n)]
    # note: NTT(x .* g^j)[i] = sum_j x_j g^j w^{ij} = x(g w^i): coset evaluation
    assert list(got) == want
    back = f.to_ints(N.ntt(f, N.ntt(f, f.from_ints(a_i), NTTDir.FORWARD, cfg),
                           NTTDir.INVERSE, cfg))
    assert list(back) == a_i


def test_domain_subsampling(rng):
    f = get_field("babybear")
    N.ntt_release_domain(f)
    N.ntt_init_domain(f, 10)  # big domain first
    n = 16
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    got = f.to_ints(N.ntt(f, f.from_ints(a_i), NTTDir.FORWARD))
    want = naive_ntt(a_i, f.params.omega(4), f.modulus)
    assert list(got) == want


def test_polynomial_multiplication_via_ntt(rng):
    """End-to-end sanity: conv(a, b) == INTT(NTT(a) * NTT(b))."""
    f = get_field("koalabear")
    deg = 15
    n = 32
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(deg + 1)]
    b_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(deg + 1)]
    pa = f.from_ints(a_i + [0] * (n - deg - 1))
    pb = f.from_ints(b_i + [0] * (n - deg - 1))
    fa, fb = N.ntt(f, pa), N.ntt(f, pb)
    prod = N.ntt(f, f.mul(fa, fb), NTTDir.INVERSE)
    want = [0] * n
    for i, x in enumerate(a_i):
        for j, y in enumerate(b_i):
            want[i + j] = (want[i + j] + x * y) % f.modulus
    assert list(f.to_ints(prod)) == want


def test_ntt_goldilocks_roundtrip():
    """Goldilocks NTT via the epsilon-reduction engine (2x32 limbs)."""
    import numpy as np
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N
    from icicle_tpu.runtime.config import NTTConfig, NTTDir
    f = get_field("goldilocks")
    logn = 6
    N.ntt_init_domain(f, logn)
    rng = np.random.default_rng(3)
    x = f.rand(rng, (1 << logn,))
    e = N.ntt_jit(f, x, NTTDir.FORWARD, NTTConfig())
    back = N.ntt_jit(f, e, NTTDir.INVERSE, NTTConfig())
    assert np.array_equal(np.asarray(back), np.asarray(x))
    # spot-check lane 0 = sum of inputs
    ints = f.to_ints(x)
    want0 = sum(int(v) for v in ints) % f.modulus
    assert int(f.to_ints(e)[0]) == want0


def test_ntt_stark252_roundtrip():
    """stark252 (8-limb) NTT through the BigField engine."""
    import numpy as np
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N
    from icicle_tpu.runtime.config import NTTConfig, NTTDir
    f = get_field("stark252")
    logn = 5
    N.ntt_init_domain(f, logn)
    rng = np.random.default_rng(4)
    x = f.rand(rng, (1 << logn,))
    e = N.ntt_jit(f, x, NTTDir.FORWARD, NTTConfig())
    back = N.ntt_jit(f, e, NTTDir.INVERSE, NTTConfig())
    assert np.array_equal(np.asarray(back), np.asarray(x))
    ints = f.to_ints(x)
    want0 = sum(int(v) for v in ints) % f.modulus
    assert int(f.to_ints(e)[0]) == want0

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


def test_m_orderings(rng):
    """kNM/kMN (reference ntt.h:32-43): NM output is the documented four-step
    digit permutation of NN; a forward-NM / inverse-MN pair is an identity."""
    f = get_field("babybear")
    logn = 6
    n = 1 << logn
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    a = f.from_ints(a_i)
    dr = N.digit_reverse_indices(logn)
    nn = np.array(f.to_ints(N.ntt(f, a, NTTDir.FORWARD, NTTConfig(ordering=Ordering.NN))))
    nm = np.array(f.to_ints(N.ntt(f, a, NTTDir.FORWARD, NTTConfig(ordering=Ordering.NM))))
    assert list(nm) == list(nn[dr])
    back = f.to_ints(N.ntt(f, f.from_ints([int(v) for v in nm]), NTTDir.INVERSE,
                           NTTConfig(ordering=Ordering.MN)))
    assert list(back) == a_i
    # MN forward over digit-reversed input reproduces NN
    a_m = f.from_ints([a_i[r] for r in dr])
    mn = np.array(f.to_ints(N.ntt(f, a_m, NTTDir.FORWARD, NTTConfig(ordering=Ordering.MN))))
    assert list(mn) == list(nn)


def test_m_ordering_odd_logn_and_coset(rng):
    f = get_field("babybear")
    logn = 5
    n = 1 << logn
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    a = f.from_ints(a_i)
    g = f.params.omega(logn + 1)  # coset generator
    nn = np.array(f.to_ints(N.ntt(f, a, NTTDir.FORWARD,
                                  NTTConfig(ordering=Ordering.NN, coset_gen=g))))
    nm = np.array(f.to_ints(N.ntt(f, a, NTTDir.FORWARD,
                                  NTTConfig(ordering=Ordering.NM, coset_gen=g))))
    assert list(nm) == list(nn[N.digit_reverse_indices(logn)])
    back = f.to_ints(N.ntt(f, f.from_ints([int(v) for v in nm]), NTTDir.INVERSE,
                           NTTConfig(ordering=Ordering.MN, coset_gen=g)))
    assert list(back) == a_i


def test_four_step_branch_on_cpu(monkeypatch, rng):
    """Cover the four-step path off-TPU by lowering its threshold (VERDICT:
    at-scale branches must be CPU-gated); compare vs the plain path."""
    f = get_field("babybear")
    logn = 6
    n = 1 << logn
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    a = f.from_ints(a_i)
    want_f = f.to_ints(N.ntt(f, a, NTTDir.FORWARD))
    want_i = f.to_ints(N.ntt(f, a, NTTDir.INVERSE))
    monkeypatch.setattr(N, "_FOUR_STEP_MIN_LOGN", 4)
    got_f = f.to_ints(N._ntt_xla(f, a, NTTDir.FORWARD, NTTConfig()))
    got_i = f.to_ints(N._ntt_xla(f, a, NTTDir.INVERSE, NTTConfig()))
    assert list(got_f) == list(want_f)
    assert list(got_i) == list(want_i)


def test_ext_field_ntt(rng):
    """EXT_FIELD NTT (cpu_ntt.cpp:41): component-wise base-field transform."""
    from icicle_tpu.fields.extension import get_ext_field
    ef = get_ext_field("babybear")
    f = ef.base
    n, d = 32, ef.engine.degree
    comps = [[int.from_bytes(rng.bytes(8), "little") % f.modulus
              for _ in range(d)] for _ in range(n)]
    x = np.array(comps, dtype=np.uint32)       # (n, D)
    y = np.asarray(N.ntt_ext(ef, x, NTTDir.FORWARD))
    for k in range(d):
        want = f.to_ints(N.ntt(f, f.from_ints([c[k] for c in comps]),
                               NTTDir.FORWARD))
        assert list(y[:, k]) == list(want)
    back = np.asarray(N.ntt_ext(ef, y, NTTDir.INVERSE))
    assert np.array_equal(back, x)


def test_rns_ntt_crt_matches_direct(rng):
    """RING_RNS NTT (cpu_ntt.cpp:45-48): per-plane transforms with the ring
    rou residues CRT-match the direct Zq NTT."""
    from icicle_tpu.rings.babykoala import get_zq, zq_to_rns, rns_to_zq, Q
    zq = get_zq()
    n = 16
    vals = [int.from_bytes(rng.bytes(16), "little") % Q for _ in range(n)]
    direct = zq.to_ints(N.ntt(zq, zq.from_ints(vals), NTTDir.FORWARD))
    rns = zq_to_rns(zq.from_ints(vals))        # (n, 2) residues
    y = N.ntt_rns(rns, NTTDir.FORWARD)
    got = zq.to_ints(rns_to_zq(y))
    assert list(got) == list(direct)
    back = zq.to_ints(rns_to_zq(N.ntt_rns(y, NTTDir.INVERSE)))
    assert list(back) == vals


@pytest.mark.parametrize("field_name", ["babybear", "koalabear"])
def test_mxu_tail_matrix_equals_stage_chain(field_name):
    """The MXU radix-128 epilogue matrix (pallas/ntt_kernel._mxu_tail_matrix)
    must reproduce the last 7 DIF stages exactly (exact integer check — the
    kernel itself is TPU-only, but the matrix math is host-verifiable),
    for every single-limb Mont32 field with enough two-adicity (m31 has
    two-adicity 1 — no radix-2 domains)."""
    import numpy as np
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N_
    from icicle_tpu.pallas.ntt_kernel import _stage_twiddles, _mxu_tail_matrix

    f = get_field(field_name)
    p = f.modulus
    logN = 10
    N = 1 << logN
    N_.ntt_init_domain(f, logN)
    tw = np.asarray(_stage_twiddles(field_name, logN, True)).astype(np.int64)
    r_inv = pow(f.params.r, -1, p)
    rng = np.random.default_rng(7)
    x = rng.integers(0, p, size=(N,), dtype=np.int64)

    def stage(v, s):
        m = N >> (s + 1)
        i = np.arange(N)
        bit = (i & m) != 0
        prt = np.where(bit, v[i - m], v[(i + m) % N])
        top = (v + prt) % p
        bot = ((prt - v) % p) * tw[s] % p * r_inv % p
        return np.where(bit, bot, top)

    head = x.copy()
    for s in range(logN - 7):
        head = stage(head, s)
    full = head.copy()
    for s in range(logN - 7, logN):
        full = stage(full, s)

    digs = _mxu_tail_matrix(field_name, logN, True)
    mt = np.zeros((128, 128), dtype=object)
    for b in range(4):
        mt += digs[b].astype(np.int64).astype(object) * (1 << (8 * b))
    mt %= p
    # digit planes must be bf16-exact: integers in [-128, 127]
    assert np.all(np.abs(digs) <= 128)
    got = (head.reshape(-1, 128).astype(object) @ mt) % p
    assert np.array_equal(got.astype(np.int64).reshape(-1), full)

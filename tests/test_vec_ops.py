"""vec_ops vs python-int ground truth (mirrors icicle/tests/test_field_api.cpp
vector op cases: random sizes/batches, reference-vs-main comparison)."""

import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops import vec_ops as V

FIELDS = ["babybear", "goldilocks", "bn254_scalar"]


def rand_ints(rng, f, n):
    return [int.from_bytes(rng.bytes(64), "little") % f.modulus for _ in range(n)]


@pytest.mark.parametrize("name", FIELDS)
def test_elementwise_and_scalar(name, rng):
    f = get_field(name)
    n = 33
    a_i, b_i = rand_ints(rng, f, n), rand_ints(rng, f, n)
    s_i = rand_ints(rng, f, 1)[0]
    a, b = f.from_ints(a_i), f.from_ints(b_i)
    s = f.from_ints(s_i)
    assert list(f.to_ints(V.vector_add(f, a, b))) == [(x + y) % f.modulus for x, y in zip(a_i, b_i)]
    assert list(f.to_ints(V.vector_sub(f, a, b))) == [(x - y) % f.modulus for x, y in zip(a_i, b_i)]
    assert list(f.to_ints(V.vector_mul(f, a, b))) == [(x * y) % f.modulus for x, y in zip(a_i, b_i)]
    assert list(f.to_ints(V.scalar_add_vec(f, s, a))) == [(s_i + x) % f.modulus for x in a_i]
    assert list(f.to_ints(V.scalar_sub_vec(f, s, a))) == [(s_i - x) % f.modulus for x in a_i]
    assert list(f.to_ints(V.scalar_mul_vec(f, s, a))) == [(s_i * x) % f.modulus for x in a_i]


@pytest.mark.parametrize("name", ["babybear", "goldilocks"])
def test_div_inv(name, rng):
    f = get_field(name)
    n = 9
    a_i, b_i = rand_ints(rng, f, n), rand_ints(rng, f, n)
    b_i = [x or 1 for x in b_i]
    a, b = f.from_ints(a_i), f.from_ints(b_i)
    got = f.to_ints(V.vector_div(f, a, b))
    for i in range(n):
        assert got[i] == (a_i[i] * pow(b_i[i], -1, f.modulus)) % f.modulus


@pytest.mark.parametrize("name", FIELDS)
def test_reductions(name, rng):
    f = get_field(name)
    n = 21  # non-power-of-two: exercises padding
    a_i = rand_ints(rng, f, n)
    a = f.from_ints(a_i)
    want_sum = sum(a_i) % f.modulus
    want_prod = 1
    for x in a_i:
        want_prod = want_prod * x % f.modulus
    assert f.to_ints(V.vector_sum(f, a)).item() == want_sum
    assert f.to_ints(V.vector_product(f, a)).item() == want_prod
    # batched
    a2 = f.from_ints([a_i, a_i[::-1]])
    s2 = f.to_ints(V.vector_sum(f, a2))
    assert s2[0] == want_sum and s2[1] == want_sum


def test_bit_reverse_and_slice(rng):
    f = get_field("babybear")
    n = 16
    a_i = rand_ints(rng, f, n)
    a = f.from_ints(a_i)
    got = f.to_ints(V.bit_reverse(f, a))
    perm = V.bit_reverse_indices(n)
    for i in range(n):
        assert got[i] == a_i[perm[i]]
    # double reverse = identity
    back = f.to_ints(V.bit_reverse(f, V.bit_reverse(f, a)))
    assert list(back) == a_i
    sl = f.to_ints(V.slice_vec(f, a, offset=1, stride=3, size_out=5))
    assert list(sl) == [a_i[1 + 3 * i] for i in range(5)]


def test_highest_non_zero_idx():
    f = get_field("babybear")
    a = f.from_ints([0, 5, 7, 0, 0])
    assert int(V.highest_non_zero_idx(f, a)) == 2
    z = f.from_ints([0, 0])
    assert int(V.highest_non_zero_idx(f, z)) == -1
    g = get_field("bn254_scalar")
    b = g.from_ints([0, 1, 0])
    assert int(V.highest_non_zero_idx(g, b)) == 1


@pytest.mark.parametrize("name", ["babybear", "bn254_scalar"])
def test_polynomial_eval(name, rng):
    f = get_field(name)
    coeffs_i = rand_ints(rng, f, 7)
    dom_i = rand_ints(rng, f, 5)
    coeffs, dom = f.from_ints(coeffs_i), f.from_ints(dom_i)
    got = f.to_ints(V.polynomial_eval(f, coeffs, dom))
    for j, x in enumerate(dom_i):
        want = 0
        for c in reversed(coeffs_i):
            want = (want * x + c) % f.modulus
        assert got[j] == want


def test_polynomial_division(rng):
    f = get_field("babybear")
    num_i = rand_ints(rng, f, 9)
    den_i = rand_ints(rng, f, 4)
    den_i[-1] = den_i[-1] or 1
    num, den = f.from_ints(num_i), f.from_ints(den_i)
    q, r = V.polynomial_division(f, num, den)
    q_i, r_i = list(f.to_ints(q)), list(f.to_ints(r))
    # check num == q*den + r via int polynomial arithmetic
    prod = [0] * (len(q_i) + len(den_i) - 1)
    for i, qi in enumerate(q_i):
        for j, dj in enumerate(den_i):
            prod[i + j] = (prod[i + j] + qi * dj) % f.modulus
    for k in range(len(num_i)):
        lhs = prod[k] if k < len(prod) else 0
        rhs = r_i[k] if k < len(r_i) else 0
        assert (lhs + rhs) % f.modulus == num_i[k], f"coeff {k}"


def test_flat_layout_roundtrip(rng):
    f = get_field("babybear")
    flat = f.from_ints(rand_ints(rng, f, 12))
    for cb in (False, True):
        arr = V.from_flat(f, flat, size=4, batch_size=3, columns_batch=cb)
        assert arr.shape == (3, 4)
        back = V.to_flat(f, arr, columns_batch=cb)
        assert list(f.to_ints(back)) == list(f.to_ints(flat))


def test_dispatcher_registry_surface():
    """Importing the package registers every frontend op (reference
    REGISTER_* points, include/icicle/backend/*.h)."""
    import icicle_tpu  # noqa: F401
    from icicle_tpu.runtime import dispatcher, registry
    apis = dispatcher.registered_apis()
    for api in ("ntt", "msm", "msm_precompute_bases", "ecntt",
                "merkle_tree_factory", "poseidon2_factory",
                "sumcheck_factory", "fri_factory", "negacyclic_ntt",
                "ml_kem_keygen", "matmul", "vec_ops.add"):
        assert api in apis, api
    assert len(apis) >= 40
    # pallas points exist where Mosaic kernels exist
    assert "pallas" in apis["ntt"] and "pallas" in apis["msm"]
    # execute() routes like tIcicleExecuteDispatcher::execute
    import numpy as np
    from icicle_tpu.fields.field import get_field
    f = get_field("babybear")
    a = f.from_ints([1, 2, 3])
    b = f.from_ints([4, 5, 6])
    got = np.asarray(registry.execute("vec_ops.add", f, a, b))
    assert got.tolist() == [5, 7, 9]

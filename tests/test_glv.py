"""GLV endomorphism constants + decomposition (curves/glv.py) and the
device joint ladder (ecntt.scalar_mul_vec_glv) vs the host EC oracle."""

import numpy as np
import pytest

from icicle_tpu.curves.glv import glv_constants, glv_decompose
from icicle_tpu.curves.params import get_curve
from tests.ec_ref import ec_mul


@pytest.mark.parametrize("name", ["bn254", "bls12_377", "bls12_381",
                                  "grumpkin", "bw6_761"])
def test_glv_decompose_short_and_exact(name, rng):
    curve = get_curve(name)
    r = curve.fr.modulus
    _, lam = glv_constants(name)
    half = r.bit_length() // 2 + 2
    for _ in range(50):
        k = int.from_bytes(rng.bytes(48), "little") % r
        k1, k2 = glv_decompose(name, k)
        assert (k1 + k2 * lam) % r == k
        assert abs(k1).bit_length() <= half
        assert abs(k2).bit_length() <= half


def test_glv_beta_matches_endomorphism(rng):
    """(beta*x, y) == lam*(x, y) for random points (not just the generator)."""
    curve = get_curve("bn254")
    q = curve.fq.modulus
    beta, lam = glv_constants("bn254")
    gen = (curve.gen_x, curve.gen_y)
    for _ in range(5):
        k = int.from_bytes(rng.bytes(32), "little") % curve.fr.modulus or 1
        P = ec_mul(gen, k, q)
        assert (P[0] * beta % q, P[1]) == ec_mul(P, lam, q)


def test_glv_ladder_vs_oracle(rng):
    from icicle_tpu.curves.group import get_group
    from icicle_tpu.ops.ecntt import _glv_rows, scalar_mul_vec_glv
    import jax.numpy as jnp

    curve = get_curve("bn254")
    group = get_group("bn254")
    fq, fr = curve.fq, curve.fr
    q = fq.modulus
    gen = (curve.gen_x, curve.gen_y)
    n = 8
    pts = [ec_mul(gen, int(k), q) for k in rng.integers(1, 1 << 30, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]
    scalars[0] = 0           # identity-scalar lane
    scalars[1] = 1
    P = group.from_affine_canonical(
        jnp.asarray(fq.from_ints([p[0] for p in pts])),
        jnp.asarray(fq.from_ints([p[1] for p in pts])))
    rows = tuple(jnp.asarray(a) for a in _glv_rows("bn254", scalars))
    out = scalar_mul_vec_glv(group, P, rows)
    gx, gy = group.to_affine_canonical(out)
    for i in range(n):
        want = ec_mul(pts[i], scalars[i], q)
        want = want if want is not None else (0, 0)
        got = (int(curve.fq.to_ints(np.asarray(gx))[i]),
               int(curve.fq.to_ints(np.asarray(gy))[i]))
        assert got == want, f"lane {i}"

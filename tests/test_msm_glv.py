"""GLV-decomposed MSM (ops/msm_glv.py + msm_tpu3 glv=True).

Checks the device Babai split against the host oracle decomposition and
the full glv pipeline against a random-linear-combination EC oracle.
Reference analog: none (the reference ships no GLV MSM); correctness is
defined by msm semantics (msm.h:107) alone.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.ops.msm_glv import (
    glv_msm_constants, glv_split_bound, glv_split_t,
)
from tests.ec_ref import ec_mul, ec_add


def _limb_int(col):
    v = 0
    for i, w in enumerate(np.asarray(col, dtype=np.uint32)):
        v |= int(w) << (32 * i)
    return v


def test_device_split_matches_identity(rng):
    curve = get_curve("bn254")
    fr = curve.fr
    cst = glv_msm_constants("bn254")
    lam, r = cst["lam"], cst["r"]
    bound = 1 << glv_split_bound("bn254")

    ks = [int.from_bytes(rng.bytes(32), "little") % r for _ in range(64)]
    ks += [0, 1, r - 1, r // 2]
    scal = np.asarray(fr.from_ints(ks))
    m1, s1, m2, s2 = glv_split_t("bn254", jnp.asarray(scal.T))
    m1, s1 = np.asarray(m1), np.asarray(s1)
    m2, s2 = np.asarray(m2), np.asarray(s2)
    for i, k in enumerate(ks):
        k1 = int(s1[i]) * _limb_int(m1[:, i])
        k2 = int(s2[i]) * _limb_int(m2[:, i])
        assert (k1 + k2 * lam) % r == k % r, f"split identity broke at {i}"
        assert abs(k1) < bound and abs(k2) < bound, f"split bound broke: {i}"


def test_phi_is_lambda_mul():
    cst = glv_msm_constants("bn254")
    curve = get_curve("bn254")
    q = curve.fq.modulus
    gen = (curve.gen_x, curve.gen_y)
    assert (gen[0] * cst["beta"] % q, gen[1]) == ec_mul(gen, cst["lam"], q)


@pytest.mark.parametrize("n", [128])
def test_msm_glv_matches_oracle(rng, n):
    from icicle_tpu.ops.msm_tpu3 import msm_tpu3

    curve = get_curve("bn254")
    fr, fq = curve.fr, curve.fq
    mod = fq.modulus
    gen = (curve.gen_x, curve.gen_y)
    base = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 20, size=8)]
    idx = rng.integers(0, 8, size=n)
    si = [int.from_bytes(rng.bytes(32), "little") % fr.modulus
          for _ in range(n)]
    scal = np.asarray(fr.from_ints(si))
    px = np.asarray(fq.from_ints([base[i][0] for i in idx]))
    py = np.asarray(fq.from_ints([base[i][1] for i in idx]))

    got = msm_tpu3("bn254", scal, px, py, c=8, T=64, backend="xla", glv=True)

    coeff = [0] * 8
    for s, i in zip(si, idx):
        coeff[i] = (coeff[i] + s) % fr.modulus
    want = None
    for i in range(8):
        t = ec_mul(base[i], coeff[i], mod)
        want = t if want is None else ec_add(want, t, mod)
    assert got == want

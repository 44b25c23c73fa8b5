"""bn254 golden tests vs the reference C++ CPU backend: MSM result equality
(mirrors icicle/tests/test_curve_api.cpp MSM main-vs-reference-device)."""

import os

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group
from icicle_tpu.ops.msm import msm
from tests import ref_ffi
from tests.ec_ref import ec_mul

needs_bn254 = pytest.mark.skipif(
    not ref_ffi.bn254_available(),
    reason="bn254 reference build / golden store unavailable")


@needs_bn254
def test_msm_matches_reference_cpu():
    curve = get_curve("bn254")
    g = get_group("bn254")
    fq, fr = curve.fq, curve.fr
    mod = fq.modulus
    rng = np.random.default_rng(31)
    n = 32
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 30, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]

    # reference device result (projective, canonical limbs)
    scal_u32 = np.asarray(fr.from_ints(scalars), dtype=np.uint32)
    pts_u32 = np.zeros((n, 16), dtype=np.uint32)
    pts_u32[:, :8] = np.asarray(fq.from_ints([p[0] for p in pts]))
    pts_u32[:, 8:] = np.asarray(fq.from_ints([p[1] for p in pts]))
    ref_proj = ref_ffi.bn254_msm(scal_u32, pts_u32)

    def limb_int(a):
        v = 0
        for i, w in enumerate(a):
            v |= int(w) << (32 * i)
        return v

    zr = limb_int(ref_proj[2])
    zi = pow(zr, -1, mod)
    ref_aff = (limb_int(ref_proj[0]) * zi % mod, limb_int(ref_proj[1]) * zi % mod)

    # our result
    res = msm("bn254", fr.from_ints(scalars),
              fq.from_ints([p[0] for p in pts]),
              fq.from_ints([p[1] for p in pts]))
    x, y = g.to_affine_canonical(res)
    got = (int(fq.to_ints(x)), int(fq.to_ints(y)))
    assert got == ref_aff


@needs_bn254
def test_bn254_scalar_ntt_matches_reference():
    """bn254 scalar-field (8-limb) NTT vs the reference backend."""
    import jax.numpy as jnp
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N
    from icicle_tpu.runtime.config import NTTConfig, NTTDir
    f = get_field("bn254_scalar")
    logn = 6
    n = 1 << logn
    rng = np.random.default_rng(8)
    x = f.rand(rng, (n,))
    ref = ref_ffi.ntt("bn254", np.asarray(x, dtype=np.uint32).reshape(-1), logn)
    N.ntt_init_domain(f, logn)
    got = np.asarray(N.ntt_jit(f, x, NTTDir.FORWARD, NTTConfig()), dtype=np.uint32)
    assert np.array_equal(got.reshape(-1), ref)

"""MSM vs pure-int oracle (mirrors icicle/tests/test_curve_api.cpp MSM cases:
random scalars, small/large windows, batch, skewed distributions)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group
from icicle_tpu.ops.msm import msm, MSMConfig
from tests.ec_ref import ec_mul, ec_add, msm_ref, INF


def make_inputs(curve_name, n, rng, skew=None):
    curve = get_curve(curve_name)
    mod = curve.fq.modulus
    gen = (curve.gen_x, curve.gen_y)
    # random points = k*G with random small k (oracle-side cheap)
    ks = [int(k) for k in rng.integers(1, 1 << 28, size=n)]
    pts = [ec_mul(gen, k, mod) for k in ks]
    if skew == "zeros":
        scalars = [0] * (n // 2) + [int(s) for s in rng.integers(0, 1 << 16, size=n - n // 2)]
    elif skew == "equal":
        s = int.from_bytes(rng.bytes(40), "little") % curve.fr.modulus
        scalars = [s] * n
    else:
        scalars = [int.from_bytes(rng.bytes(40), "little") % curve.fr.modulus
                   for _ in range(n)]
    return scalars, pts


def run_and_read(curve_name, scalars, pts, cfg=None):
    curve = get_curve(curve_name)
    g = get_group(curve_name)
    fr, fq = curve.fr, curve.fq
    s_dev = fr.from_ints(scalars)
    px = fq.from_ints([p[0] for p in pts])
    py = fq.from_ints([p[1] for p in pts])
    res = msm(curve_name, s_dev, px, py, cfg)
    x, y = g.to_affine_canonical(res)
    xi, yi = int(fq.to_ints(x)), int(fq.to_ints(y))
    return INF if (xi == 0 and yi == 0) else (xi, yi)


@pytest.mark.parametrize("curve_name", ["bn254", "bls12_377"])
@pytest.mark.parametrize("n", [13, 64])
def test_msm_random(curve_name, n):
    rng = np.random.default_rng(42 + n)
    scalars, pts = make_inputs(curve_name, n, rng)
    got = run_and_read(curve_name, scalars, pts)
    want = msm_ref(scalars, pts, get_curve(curve_name).fq.modulus)
    assert got == want


@pytest.mark.parametrize("skew", ["zeros", "equal"])
def test_msm_skewed(skew):
    rng = np.random.default_rng(5)
    scalars, pts = make_inputs("bn254", 32, rng, skew=skew)
    got = run_and_read("bn254", scalars, pts)
    want = msm_ref(scalars, pts, get_curve("bn254").fq.modulus)
    assert got == want


def test_msm_explicit_window():
    rng = np.random.default_rng(9)
    scalars, pts = make_inputs("bn254", 16, rng)
    mod = get_curve("bn254").fq.modulus
    want = msm_ref(scalars, pts, mod)
    for c in (4, 8, 13):
        got = run_and_read("bn254", scalars, pts, MSMConfig(c=c))
        assert got == want, f"c={c}"


def test_msm_batch():
    rng = np.random.default_rng(17)
    curve = get_curve("bn254")
    g = get_group("bn254")
    fr, fq = curve.fr, curve.fq
    n, b = 16, 3
    _, pts = make_inputs("bn254", n, rng)
    batches = [[int.from_bytes(rng.bytes(40), "little") % fr.modulus
                for _ in range(n)] for _ in range(b)]
    import jax.numpy as jnp
    s_dev = jnp.stack([fr.from_ints(s) for s in batches])
    px = fq.from_ints([p[0] for p in pts])
    py = fq.from_ints([p[1] for p in pts])
    res = msm("bn254", s_dev, px, py)
    x, y = g.to_affine_canonical(res)
    for i in range(b):
        xi = int(fq.to_ints(x[i]))
        yi = int(fq.to_ints(y[i]))
        want = msm_ref(batches[i], pts, fq.modulus)
        assert (xi, yi) == want


def test_msm_precompute_factor_vs_plain():
    """precompute_factor MSM == plain MSM (msm.h:23-34,107 semantics)."""
    import dataclasses
    from icicle_tpu.ops.msm import msm_precompute_bases, MSMConfig
    curve = get_curve("bn254")
    fr, fq, mod = curve.fr, curve.fq, curve.fq.modulus
    group = get_group("bn254")
    rng = np.random.default_rng(21)
    n = 32
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 28, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]
    px = fq.from_ints([p[0] for p in pts])
    py = fq.from_ints([p[1] for p in pts])
    plain = group.to_affine_canonical(
        msm("bn254", fr.from_ints(scalars), px, py, MSMConfig(c=8)))
    for nu in (2, 4):
        cfg = MSMConfig(c=8, precompute_factor=nu)
        ox, oy = msm_precompute_bases("bn254", np.asarray(px), np.asarray(py),
                                      cfg)
        got = group.to_affine_canonical(
            msm("bn254", fr.from_ints(scalars), jnp.asarray(ox),
                jnp.asarray(oy), cfg))
        assert [np.asarray(a).tolist() for a in got] == \
               [np.asarray(a).tolist() for a in plain], f"nu={nu}"


def test_msm_precompute_bases_reference_parity():
    """Precomputed bases byte-equal the reference msm_precompute_bases FFI."""
    import os
    from tests import ref_ffi
    if not ref_ffi.bn254_available():
        pytest.skip("bn254 reference build / golden store not present")
    from icicle_tpu.ops.msm import msm_precompute_bases, MSMConfig
    curve = get_curve("bn254")
    fq, mod = curve.fq, curve.fq.modulus
    rng = np.random.default_rng(5)
    n = 8
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 28, size=n)]
    px = np.asarray(fq.from_ints([p[0] for p in pts]))
    py = np.asarray(fq.from_ints([p[1] for p in pts]))
    c, nu = 8, 4
    ox, oy = msm_precompute_bases("bn254", px, py,
                                  MSMConfig(c=c, precompute_factor=nu))
    ref = ref_ffi.bn254_msm_precompute_bases(
        np.concatenate([px, py], axis=1), c, nu)
    ours = np.concatenate([ox, oy], axis=1).astype(np.uint32)
    assert np.array_equal(ours, ref)


def test_msm_affine_dispatch():
    """msm routes through the dispatcher registry (R5/R6 parity): the xla
    impl and explicit-backend selection return identical affine results."""
    from icicle_tpu.ops.msm import msm_affine
    from icicle_tpu.runtime import dispatcher
    assert "pallas" in dispatcher.registered_apis()["msm"]
    assert "xla" in dispatcher.registered_apis()["msm"]
    curve = get_curve("bn254")
    fr, fq, mod = curve.fr, curve.fq, curve.fq.modulus
    rng = np.random.default_rng(31)
    n = 16
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 20, size=n)]
    scalars = [int(s) for s in rng.integers(0, 1 << 30, size=n)]
    px = fq.from_ints([p[0] for p in pts])
    py = fq.from_ints([p[1] for p in pts])
    want = msm_ref(scalars, pts, mod)
    want = want if want is not INF else (0, 0)
    got = msm_affine("bn254", fr.from_ints(scalars), px, py,
                     MSMConfig(c=6, backend="xla"))
    assert got == want


@pytest.mark.parametrize("curve_name", ["bls12_381", "bw6_761", "grumpkin"])
def test_msm_all_curves(curve_name):
    """Per-curve MSM coverage (reference per-curve test matrix, ci.yml)."""
    curve = get_curve(curve_name)
    mod = curve.fq.modulus
    fr, fq = curve.fr, curve.fq
    rng = np.random.default_rng(hash(curve_name) % 2**31)
    n = 16
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 20, size=n)]
    scalars = [int(s) for s in rng.integers(0, 1 << 30, size=n)]
    got = get_group(curve_name).to_affine_canonical(
        msm(curve_name, fr.from_ints(scalars),
            fq.from_ints([p[0] for p in pts]),
            fq.from_ints([p[1] for p in pts]), MSMConfig(c=6)))
    want = msm_ref(scalars, pts, mod)
    want = want if want is not INF else (0, 0)
    assert (int(np.atleast_1d(fq.to_ints(got[0]))[0]),
            int(np.atleast_1d(fq.to_ints(got[1]))[0])) == want


def test_msm_batch_vmap_path():
    """Fused vmapped batch graph == per-batch loop (TPU default path; the
    compile is cached persistently so this stays a one-time ~4 min cost on
    the CI host — shapes chosen minimal: B=2, n=8, c=8)."""
    import dataclasses
    from icicle_tpu.ops.msm import MSMConfig

    rng = np.random.default_rng(23)
    curve = get_curve("bn254")
    g = get_group("bn254")
    fr, fq = curve.fr, curve.fq
    n, b = 8, 2
    _, pts = make_inputs("bn254", n, rng)
    batches = [[int.from_bytes(rng.bytes(40), "little") % fr.modulus
                for _ in range(n)] for _ in range(b)]
    import jax.numpy as jnp
    s_dev = jnp.stack([fr.from_ints(s) for s in batches])
    px = fq.from_ints([p[0] for p in pts])
    py = fq.from_ints([p[1] for p in pts])
    res = msm("bn254", s_dev, px, py, MSMConfig(c=8, batch_vmap=True))
    x, y = g.to_affine_canonical(res)
    for i in range(b):
        want = msm_ref(batches[i], pts, fq.modulus)
        assert (int(fq.to_ints(x[i])), int(fq.to_ints(y[i]))) == want

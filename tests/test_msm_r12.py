"""Radix-12 MSM engine (pallas/msm_scan_r12.py) vs python-int oracles.

The r12 mixed-add body is straight-line (~24k primitives); jitting it into
lax.scan is a multi-minute LLVM compile on the single-core CPU CI host, so
the CPU tests here run the SAME formula eagerly (primitive-by-primitive,
no giant compiles) against the exact EC oracle. The jitted/Mosaic paths
run on TPU (env ICICLE_TPU_RUN_SLOW=1 enables them here).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from icicle_tpu.curves.params import get_curve
from icicle_tpu.math.radix12 import Radix12
from icicle_tpu.pallas.msm_kernel import _b3_small
from icicle_tpu.pallas.msm_scan_r12 import _R12Field, _BVal, _madd_r12
from tests.ec_ref import ec_mul, ec_add, msm_ref, INF

CURVES = ["bn254", "bls12_381", "bls12_377", "bw6_761", "grumpkin"]


def test_bw6_761_normalized_margin():
    """761 bits is the edge: 64 words fit i32 columns only when BOTH mul
    operands are carry-normalized (64 * 4095^2 * 2 = 2.146e9 < 2^31).
    The ctor audit must accept it; lazy operands must be rejected so the
    auto-norm in _R12Field.mul kicks in."""
    eng = Radix12(get_curve("bw6_761").fq.modulus)
    with pytest.raises(OverflowError):
        eng.audit_mul(2 * 4095, 4095)


def _r12_setup(curve_name):
    curve = get_curve(curve_name)
    mod = curve.fq.modulus
    eng = Radix12(mod)
    return curve, mod, eng, _R12Field(eng)


def _pt_words(eng, f, v, shape=()):
    """int -> R'-domain normalized _BVal."""
    vm = v * (eng.R % eng.p) % eng.p
    return _BVal([jnp.full(shape, np.int32(w), jnp.int32)
                  for w in __import__(
                      "icicle_tpu.math.radix12", fromlist=["int_to_words"]
                  ).int_to_words(vm, eng.nw)], f.NORM)


def _read_mod(eng, words, idx=0):
    v = 0
    for k, w in enumerate(words):
        v += int(np.asarray(w).reshape(-1)[idx]) << (12 * k)
    return v * pow(eng.R, -1, eng.p) % eng.p


@pytest.mark.parametrize("curve_name", CURVES)
def test_madd_r12_single_step(curve_name):
    """One eager mixed add vs the exact oracle, incl. the b3 constant path."""
    curve, mod, eng, f = _r12_setup(curve_name)
    gen = (curve.gen_x, curve.gen_y)
    P1 = ec_mul(gen, 12345, mod)
    P2 = ec_mul(gen, 67890, mod)
    b3 = _b3_small(curve)
    if b3 is None:
        b3 = _pt_words(eng, f, curve.b3)
    X1 = _pt_words(eng, f, P1[0])
    Y1 = _pt_words(eng, f, P1[1])
    Z1 = _pt_words(eng, f, 1)
    x2 = _pt_words(eng, f, P2[0])
    y2 = _pt_words(eng, f, P2[1])
    ex, ey, ez = _madd_r12(f, X1, Y1, Z1, x2, y2, b3)
    want = ec_add(P1, P2, mod)
    z = _read_mod(eng, ez.w)
    zi = pow(z, -1, mod)
    assert (_read_mod(eng, ex.w) * zi % mod,
            _read_mod(eng, ey.w) * zi % mod) == want


def test_madd_r12_doubling_and_identity():
    """Complete-formula cases: P+P and identity+P (the kernel's init/reset)."""
    curve, mod, eng, f = _r12_setup("bn254")
    gen = (curve.gen_x, curve.gen_y)
    P = ec_mul(gen, 999983, mod)
    b3 = _b3_small(curve)
    pw = (_pt_words(eng, f, P[0]), _pt_words(eng, f, P[1]))
    # identity (0:1:0) + P = P
    ex, ey, ez = _madd_r12(f, _pt_words(eng, f, 0), _pt_words(eng, f, 1),
                           _pt_words(eng, f, 0), pw[0], pw[1], b3)
    z = _read_mod(eng, ez.w)
    zi = pow(z, -1, mod)
    assert (_read_mod(eng, ex.w) * zi % mod,
            _read_mod(eng, ey.w) * zi % mod) == P
    # P + P (doubling through the complete add)
    ex, ey, ez = _madd_r12(f, pw[0], pw[1], _pt_words(eng, f, 1),
                           pw[0], pw[1], b3)
    z = _read_mod(eng, ez.w)
    zi = pow(z, -1, mod)
    want = ec_add(P, P, mod)
    assert (_read_mod(eng, ex.w) * zi % mod,
            _read_mod(eng, ey.w) * zi % mod) == want


def test_scan_r12_eager_chain_lazy_state():
    """A 6-step eager prefix chain exercises the lazy-1 state contract
    (the kernel never norms state between slots) + the canon/u32 output."""
    curve, mod, eng, f = _r12_setup("bn254")
    nl = curve.fq.nlimbs
    gen = (curve.gen_x, curve.gen_y)
    rng = np.random.default_rng(5)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 30, size=6)]
    b3 = _b3_small(curve)
    ex = _pt_words(eng, f, 0)
    ey = _pt_words(eng, f, 1)
    ez = _pt_words(eng, f, 0)
    acc = INF
    LAZY1 = 2 * f.NORM
    for P in pts:
        ex, ey, ez = _madd_r12(
            f, _BVal(ex.w, min(ex.b, LAZY1)), _BVal(ey.w, min(ey.b, LAZY1)),
            _BVal(ez.w, min(ez.b, LAZY1)),
            _pt_words(eng, f, P[0]), _pt_words(eng, f, P[1]), b3)
        acc = ec_add(acc, P, mod)
        # the kernel's per-slot output path: canon to [0,4p) u32 limbs
        u = eng.to_u32(eng.norm(eng.canon_nonneg(ez.w)), nl)
        zval = 0
        for i in range(nl):
            zval |= int(np.asarray(u[i]).reshape(-1)[0]) << (32 * i)
        assert zval < 4 * mod
        z = zval * pow(eng.R, -1, mod) % mod
        zi = pow(z, -1, mod)
        got = (_read_mod(eng, ex.w) * zi % mod,
               _read_mod(eng, ey.w) * zi % mod)
        assert got == acc


@pytest.mark.skipif(os.environ.get("ICICLE_TPU_RUN_SLOW") != "1",
                    reason="unrolled-body jit: multi-minute compile on the "
                           "CPU CI host; run on TPU or with "
                           "ICICLE_TPU_RUN_SLOW=1")
def test_msm_r12_full_pipeline_vs_oracle():
    from icicle_tpu.ops.msm_tpu3 import msm_tpu3

    curve = get_curve("bn254")
    fr, fq, mod = curve.fr, curve.fq, curve.fq.modulus
    rng = np.random.default_rng(65)
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod)
           for k in rng.integers(1, 1 << 28, size=64)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(64)]
    got = msm_tpu3("bn254", fr.from_ints(scalars),
                   fq.from_ints([p[0] for p in pts]),
                   fq.from_ints([p[1] for p in pts]),
                   backend="xla", engine="r12", c=6, T=16)
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))

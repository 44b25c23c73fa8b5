"""ECNTT tests vs naive python-int point DFT (mirrors test_curve_api ECNTT).

All transforms go through ecntt_jit (whole-graph jit): eager complete-adds
dispatch ~1e3 tiny ops each on this 1-core CI host (~4 s/add), while the
jitted graphs compile once and land in the persistent compile cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group
from icicle_tpu.ops.ecntt import ecntt_jit
from icicle_tpu.ops.vec_ops import bit_reverse_indices
from icicle_tpu.runtime.config import NTTDir, NTTConfig, Ordering
from tests.ec_ref import ec_add, ec_mul, INF


def _affine_ints(g, fq, proj):
    x, y = g.to_affine_canonical(proj)
    xi, yi = fq.to_ints(x), fq.to_ints(y)
    return [(int(a), int(b)) for a, b in zip(np.atleast_1d(xi),
                                             np.atleast_1d(yi))]


def test_ecntt_roundtrip_and_dft():
    curve_name = "bn254"
    curve = get_curve(curve_name)
    g = get_group(curve_name)
    mod = curve.fq.modulus
    r = curve.fr.modulus
    rng = np.random.default_rng(4)
    logn = 2
    n = 1 << logn
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 20, size=n)]

    fq = curve.fq
    proj = g.from_affine_canonical(
        fq.from_ints([p[0] for p in pts]),
        fq.from_ints([p[1] for p in pts]))

    out = ecntt_jit(curve_name, proj, NTTDir.FORWARD)
    got = _affine_ints(g, fq, out)

    w = curve.fr.params.omega(logn)
    for k in range(n):
        want = INF
        for j in range(n):
            want = ec_add(want, ec_mul(pts[j], pow(w, j * k, r), mod), mod)
        want = want if want is not INF else (0, 0)
        assert got[k] == want, f"lane {k}"

    # inverse roundtrip
    back = ecntt_jit(curve_name, out, NTTDir.INVERSE)
    assert _affine_ints(g, fq, back) == pts


def test_ecntt_config_surface():
    """Ordering/coset/batch parity: reference routes the full NTTConfig
    through the projective-templated NTT engine (ecntt_backend.h)."""
    curve_name = "bn254"
    curve = get_curve(curve_name)
    g = get_group(curve_name)
    fq, mod, r = curve.fq, curve.fq.modulus, curve.fr.modulus
    n = 4
    gen = (curve.gen_x, curve.gen_y)
    ks = [5, 11, 23, 47]
    pts = [ec_mul(gen, k, mod) for k in ks]
    proj = g.from_affine_canonical(
        fq.from_ints([p[0] for p in pts]), fq.from_ints([p[1] for p in pts]))

    base = _affine_ints(g, fq, ecntt_jit(curve_name, proj, NTTDir.FORWARD))
    rev = [0, 2, 1, 3]
    jrev = jnp.asarray(bit_reverse_indices(n))

    # NR: output is the bit-reversed permutation of NN. NM aliases NR and
    # MN aliases RN by construction (pure radix-2: digit == bit reversal) —
    # assert the alias mapping on the jit cache key rather than re-running
    # identical graphs.
    out = ecntt_jit(curve_name, proj, NTTDir.FORWARD,
                    cfg=NTTConfig(ordering=Ordering.NR))
    assert _affine_ints(g, fq, out) == [base[rev[i]] for i in range(n)]

    # RN: feeding bit-reversed memory order reproduces the NN output
    proj_rev = jax.tree_util.tree_map(lambda a: a[jrev], proj)
    out = ecntt_jit(curve_name, proj_rev, NTTDir.FORWARD,
                    cfg=NTTConfig(ordering=Ordering.RN))
    assert _affine_ints(g, fq, out) == base

    # NM/MN alias NR/RN (pure radix-2: digit reversal == bit reversal); RR
    # composes the two tested flags
    from icicle_tpu.ops.ecntt import _ORDER_FLAGS
    assert _ORDER_FLAGS[Ordering.NM] == _ORDER_FLAGS[Ordering.NR]
    assert _ORDER_FLAGS[Ordering.MN] == _ORDER_FLAGS[Ordering.RN]
    assert _ORDER_FLAGS[Ordering.RR] == (True, True)

    # coset: forward-with-coset == NN forward of {g^j * P_j}; inverse undoes
    cg = 7
    cfg_c = NTTConfig(coset_gen=cg)
    out_c = ecntt_jit(curve_name, proj, NTTDir.FORWARD, cfg=cfg_c)
    scaled = [ec_mul(pts[j], pow(cg, j, r), mod) for j in range(n)]
    proj_s = g.from_affine_canonical(
        fq.from_ints([p[0] for p in scaled]),
        fq.from_ints([p[1] for p in scaled]))
    want = _affine_ints(g, fq, ecntt_jit(curve_name, proj_s, NTTDir.FORWARD))
    assert _affine_ints(g, fq, out_c) == want
    back = ecntt_jit(curve_name, out_c, NTTDir.INVERSE, cfg=cfg_c)
    assert _affine_ints(g, fq, back) == pts


def test_ecntt_batch():
    """Row-major and columns_batch layouts at n=2 (wiring check; the DFT
    math is covered above — n=2 keeps the vmapped graph small)."""
    curve_name = "bn254"
    curve = get_curve(curve_name)
    g = get_group(curve_name)
    fq, mod = curve.fq, curve.fq.modulus
    gen = (curve.gen_x, curve.gen_y)
    rows = [[ec_mul(gen, k, mod) for k in ks_row]
            for ks_row in ([3, 9], [21, 33])]
    projs = [g.from_affine_canonical(
        fq.from_ints([p[0] for p in row]), fq.from_ints([p[1] for p in row]))
        for row in rows]
    bases = [_affine_ints(g, fq, ecntt_jit(curve_name, pr, NTTDir.FORWARD))
             for pr in projs]
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), *projs)
    outb = ecntt_jit(curve_name, stacked, NTTDir.FORWARD,
                     cfg=NTTConfig(batch_size=2))
    for i in range(2):
        row = jax.tree_util.tree_map(lambda a: a[i], outb)
        assert _affine_ints(g, fq, row) == bases[i]

    cols = jax.tree_util.tree_map(lambda a: jnp.swapaxes(a, 0, 1), stacked)
    outc = ecntt_jit(curve_name, cols, NTTDir.FORWARD,
                     cfg=NTTConfig(batch_size=2, columns_batch=True))
    for i in range(2):
        col = jax.tree_util.tree_map(lambda a: a[:, i], outc)
        assert _affine_ints(g, fq, col) == bases[i]

"""ECNTT test vs naive python-int point DFT (mirrors test_curve_api ECNTT)."""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.curves.group import get_group
from icicle_tpu.ops.ecntt import ecntt
from icicle_tpu.runtime.config import NTTDir
from tests.ec_ref import ec_add, ec_mul, INF


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

    out = ecntt(curve_name, proj, NTTDir.FORWARD)
    x, y = g.to_affine_canonical(out)
    xi, yi = fq.to_ints(x), fq.to_ints(y)

    w = curve.fr.params.omega(logn)
    for k in range(n):
        want = INF
        for j in range(n):
            want = ec_add(want, ec_mul(pts[j], pow(w, j * k, r), mod), mod)
        got = (int(xi[k]), int(yi[k]))
        want = want if want is not INF else (0, 0)
        assert got == want, f"lane {k}"

    # inverse roundtrip
    back = ecntt(curve_name, out, NTTDir.INVERSE)
    bx, by = g.to_affine_canonical(back)
    bxi, byi = fq.to_ints(bx), fq.to_ints(by)
    for k in range(n):
        assert (int(bxi[k]), int(byi[k])) == pts[k]

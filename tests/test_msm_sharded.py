"""Sharded MSM over the 8-device virtual CPU mesh vs the python-int oracle."""

import numpy as np
import pytest

from icicle_tpu.curves.params import get_curve
from icicle_tpu.parallel.mesh import make_mesh
from icicle_tpu.parallel.msm_sharded import msm_sharded
from tests.ec_ref import ec_mul, msm_ref, INF


def test_msm_sharded_vs_oracle():
    curve = get_curve("bn254")
    mod = curve.fq.modulus
    fr, fq = curve.fr, curve.fq
    rng = np.random.default_rng(2)
    mesh = make_mesh(8)
    n = 64  # 8 per device
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 24, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]
    got = msm_sharded("bn254", fr.from_ints(scalars),
                      fq.from_ints([p[0] for p in pts]),
                      fq.from_ints([p[1] for p in pts]),
                      mesh, lanes=4)
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))


def test_msm_sharded3_vs_oracle():
    """v3 (prefix-scan) sharded pipeline on the virtual mesh, xla twin."""
    from icicle_tpu.parallel.msm_sharded import msm_sharded3

    curve = get_curve("bn254")
    mod = curve.fq.modulus
    fr, fq = curve.fr, curve.fq
    rng = np.random.default_rng(3)
    mesh = make_mesh(8)
    n = 64  # 8 per device -> per-shard T=256 with zero-padding tails
    gen = (curve.gen_x, curve.gen_y)
    pts = [ec_mul(gen, int(k), mod) for k in rng.integers(1, 1 << 24, size=n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % fr.modulus
               for _ in range(n)]
    got = msm_sharded3("bn254", fr.from_ints(scalars),
                       fq.from_ints([p[0] for p in pts]),
                       fq.from_ints([p[1] for p in pts]),
                       mesh, c=8, T=256, backend="xla")
    want = msm_ref(scalars, pts, mod)
    assert got == (want if want is not INF else (0, 0))

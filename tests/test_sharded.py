"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import numpy as np
import pytest

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops import ntt as N
from icicle_tpu.parallel.mesh import make_mesh
from icicle_tpu.parallel.ntt_sharded import ntt_sharded
from icicle_tpu.runtime.config import NTTDir


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("name", ["babybear", "goldilocks"])
def test_sharded_ntt_matches_single(name, rng):
    f = get_field(name)
    n = 1 << 8  # n1 = n2 = 16, divisible by d=8? 16 % 8 == 0 ok
    mesh = make_mesh(8)
    a_i = [int.from_bytes(rng.bytes(16), "little") % f.modulus for _ in range(n)]
    x = f.from_ints(a_i)
    want = f.to_ints(N.ntt(f, x, NTTDir.FORWARD))
    got = f.to_ints(ntt_sharded(f, x, mesh, NTTDir.FORWARD))
    assert list(got) == list(want)


def test_sharded_ntt_roundtrip(rng):
    f = get_field("babybear")
    n = 1 << 10
    mesh = make_mesh(4)
    a_i = [int.from_bytes(rng.bytes(8), "little") % f.modulus for _ in range(n)]
    x = f.from_ints(a_i)
    y = ntt_sharded(f, x, mesh, NTTDir.FORWARD)
    back = f.to_ints(ntt_sharded(f, jax.device_get(y), mesh, NTTDir.INVERSE))
    assert list(back) == a_i

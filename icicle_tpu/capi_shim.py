"""Byte-level entry points for the C ABI (native/c_api.cpp).

Counterpart of the reference's src/**_c_api.cpp marshaling layer: every
function takes/returns little-endian byte buffers so the embedding C code
never touches numpy/jax object APIs. Kept deliberately tiny — the C side
calls these via PyObject_CallFunction with bytes arguments.
"""

from __future__ import annotations

import numpy as np


def setup(platform: str | None) -> None:
    import os
    if platform == "cpu":
        # the embedding process inherits the terminal env (JAX_PLATFORMS may
        # name plugins whose registration hook never ran in this interpreter)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "0")
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    elif platform is None and "JAX_PLATFORMS" in os.environ:
        # let jax pick from the backends actually registered here
        os.environ["JAX_PLATFORMS"] = ""
    import icicle_tpu  # noqa: F401  (registers ops, enables compile cache)


def field_limbs(field: str) -> int:
    from icicle_tpu.fields.field import get_field
    return get_field(field).nlimbs


def scalar_limbs(curve: str) -> int:
    from icicle_tpu.curves.params import get_curve
    return get_curve(curve).fr.nlimbs


def base_limbs(curve: str) -> int:
    from icicle_tpu.curves.params import get_curve
    return get_curve(curve).fq.nlimbs


def ntt(field: str, data: bytes, n: int, dir: int) -> bytes:
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N
    from icicle_tpu.runtime.config import NTTConfig, NTTDir

    f = get_field(field)
    arr = np.frombuffer(data, dtype="<u4").reshape(
        (n,) if f.nlimbs == 1 else (n, f.nlimbs))
    logn = n.bit_length() - 1
    N.ntt_init_domain(f, logn)
    out = N.ntt(f, arr, NTTDir.INVERSE if dir else NTTDir.FORWARD,
                NTTConfig())
    return np.asarray(out).astype("<u4").tobytes()


def msm(curve: str, scalars: bytes, px: bytes, py: bytes, n: int) -> bytes:
    from icicle_tpu.curves.params import get_curve
    from icicle_tpu.curves.group import get_group
    from icicle_tpu.ops.msm import msm as msm_op

    c = get_curve(curve)
    s = np.frombuffer(scalars, dtype="<u4").reshape(n, c.fr.nlimbs)
    x = np.frombuffer(px, dtype="<u4").reshape(n, c.fq.nlimbs)
    y = np.frombuffer(py, dtype="<u4").reshape(n, c.fq.nlimbs)
    res = msm_op(curve, s, x, y)   # Montgomery projective
    gx, gy = get_group(curve).to_affine_canonical(res)
    out = np.concatenate([np.asarray(gx).reshape(-1),
                          np.asarray(gy).reshape(-1)])
    return out.astype("<u4").tobytes()


def poseidon2(field: str, t: int, inputs: bytes, batch: int) -> bytes:
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops.hash.poseidon2 import Poseidon2

    f = get_field(field)
    arr = np.frombuffer(inputs, dtype="<u4").reshape(batch, -1)
    out = Poseidon2(f, t).hash_fields(arr)
    return np.asarray(out).astype("<u4").tobytes()


def keccak256(data: bytes, chunk_bytes: int, batch: int) -> bytes:
    from icicle_tpu.ops.hash.keccak import Keccak256
    return Keccak256().hash_bytes(data or b"", batch=batch)

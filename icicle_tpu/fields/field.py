"""Field registry and the unified `Field` wrapper.

Mirrors the reference's field surface (include/icicle/fields/{stark,snark}_fields,
fields/field_config.h): each named field exposes canonical-form vectorized
arithmetic over uint32 tensors, with the engine chosen by limb count:

  * single-word p < 2^31 -> :class:`icicle_tpu.math.mont32.Mont32`, flat arrays
  * goldilocks            -> :class:`icicle_tpu.math.gl64.Goldilocks`, (..., 2)
  * multi-limb            -> :class:`icicle_tpu.math.bigint.BigField`, (..., L)

Moduli / roots of unity / nonresidues are the standard public constants, equal to
the reference's config values (verified in tests/test_field_params.py against a
parse of the reference headers).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from icicle_tpu.math.params import FieldParams
from icicle_tpu.math.mont32 import Mont32
from icicle_tpu.math.bigint import BigField
from icicle_tpu.math.gl64 import Goldilocks, GOLDILOCKS_P

# ---------------------------------------------------------------------------
# Field parameter table. rou generates the maximal power-of-two subgroup
# (reference: `rou` members of each fp_config).
# ---------------------------------------------------------------------------
_PARAMS: dict[str, FieldParams] = {}


def _def(name: str, modulus: int, rou: int | None = None,
         nonresidue: int | None = None, generator: int | None = None):
    _PARAMS[name] = FieldParams(name=name, modulus=modulus, rou=rou,
                                nonresidue=nonresidue, generator=generator)


# STARK fields (reference include/icicle/fields/stark_fields/*.h)
_def("babybear", 0x78000001, rou=0x89, nonresidue=11)
_def("koalabear", 0x7F000001, rou=0x6AC49F88, nonresidue=3)
_def("m31", 0x7FFFFFFF, rou=0x7FFFFFFE, nonresidue=-1)
_def("goldilocks", GOLDILOCKS_P, rou=0x185629DCDA58878C, nonresidue=7)
_def("stark252",
     0x800000000000011000000000000000000000000000000000000000000000001,
     rou=0x5282DB87529CFA3F0464519C8B0FA5AD187148E11A61616070024F42F8EF94)

# SNARK fields (reference include/icicle/fields/snark_fields/*.h)
_BN254_R = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001
_BN254_Q = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
_def("bn254_scalar", _BN254_R,
     rou=0x2A3C09F0A58A7E8500E0A7EB8EF62ABC402D111E41112ED49BD61B6E725B19F0)
_def("bn254_base", _BN254_Q, nonresidue=-1)

_BLS12_377_R = 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001
_BLS12_377_Q = 0x1AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001
_def("bls12_377_scalar", _BLS12_377_R,
     rou=0x11D4B7F60CB92CC160C69477D1A8A12F9B506EE363E3F04A476EF4A4EC2A895E)
_def("bls12_377_base", _BLS12_377_Q,
     rou=0x36A92E05198A8030F152488AEFFC9B40FBE05B4512A3D4B44D994A0DDFF8C606DF0A4306FE0BC37ECA603CC563B9A1,
     nonresidue=-5)

_BLS12_381_R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
_BLS12_381_Q = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
_def("bls12_381_scalar", _BLS12_381_R,
     rou=0x212D79E5B416B6F0FD56DC8D168D6C0C4024FF270B3E0941B788F500B912F1F)
_def("bls12_381_base", _BLS12_381_Q, nonresidue=-1)

_BW6_761_Q = 0x122E824FB83CE0AD187C94004FAFF3EB926186A81D14688528275EF8087BE41707BA638E584E91903CEBAFF25B423048689C8ED12F9FD9071DCD3DC73EBFF2E98A116C25667A8F8160CF8AEEAF0A437E6913E6870000082F49D00000000008B
_def("bw6_761_scalar", _BLS12_377_Q,
     rou=_PARAMS["bls12_377_base"].rou)
_def("bw6_761_base", _BW6_761_Q, nonresidue=-1)

# grumpkin is the bn254 2-cycle: its scalar field is bn254's base and vice versa
_def("grumpkin_scalar", _BN254_Q)
_def("grumpkin_base", _BN254_R,
     rou=_PARAMS["bn254_scalar"].rou)


class Field:
    """Named prime field with canonical-form vectorized ops on uint32 tensors."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.name = params.name
        self.modulus = params.modulus
        if params.modulus == GOLDILOCKS_P:
            self.engine = Goldilocks(params)
            self.limb_shape = (2,)
        elif params.bits <= 31:
            self.engine = Mont32(params)
            self.limb_shape = ()
        else:
            self.engine = BigField(params)
            self.limb_shape = (params.nlimbs,)
        self.nlimbs = params.nlimbs
        # jit the multi-primitive ops once per shape: the limb kernels expand
        # to thousands of uint32 primitives, far too many for eager dispatch.
        import jax
        self._jmul = jax.jit(self.engine.mul)
        self._jmul_mont = jax.jit(self.engine.mul_mont)
        self._jadd = jax.jit(self.engine.add)
        self._jsub = jax.jit(self.engine.sub)
        self._jinv = jax.jit(self.engine.inv)
        self._jto_mont = jax.jit(self.engine.to_mont)
        self._jfrom_mont = jax.jit(self.engine.from_mont)

    # -- delegated arithmetic ------------------------------------------------
    def add(self, a, b):
        return self._jadd(a, b)

    def sub(self, a, b):
        return self._jsub(a, b)

    def neg(self, a):
        return self.engine.neg(a)

    def mul(self, a, b):
        return self._jmul(a, b)

    def mul_mont(self, a, b):
        return self._jmul_mont(a, b)

    def to_mont(self, a):
        return self._jto_mont(a)

    def from_mont(self, a):
        return self._jfrom_mont(a)

    def sqr(self, a):
        return self._jmul(a, a)

    def inv(self, a):
        return self._jinv(a)

    def pow_const(self, a, e: int):
        return self.engine.pow_const(a, e)

    def eq(self, a, b):
        return self.engine.eq(a, b)

    def is_zero(self, a):
        if self.limb_shape == ():
            return a == 0
        return self.engine.is_zero(a)

    # -- conversions (test/tooling boundary; numpy/python ints) ---------------
    def from_ints(self, values) -> jnp.ndarray:
        """Python ints (nested lists / numpy object arrays) -> element tensor."""
        arr = np.asarray(values, dtype=object)
        flat = [int(v) % self.modulus for v in arr.reshape(-1)]
        if self.limb_shape == ():
            out = np.array(flat, dtype=np.uint32).reshape(arr.shape)
        else:
            nl = self.limb_shape[0]
            out = np.zeros(arr.shape + (nl,), dtype=np.uint32)
            flat_out = out.reshape(-1, nl)
            for i, v in enumerate(flat):
                for j in range(nl):
                    flat_out[i, j] = (v >> (32 * j)) & 0xFFFFFFFF
        return jnp.asarray(out)

    def to_ints(self, arr) -> np.ndarray:
        """Element tensor -> numpy object array of Python ints."""
        a = np.asarray(arr)
        if self.limb_shape == ():
            return a.astype(object)
        nl = self.limb_shape[0]
        flat = a.reshape(-1, nl)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            v = 0
            for j in range(nl):
                v |= int(flat[i, j]) << (32 * j)
            out[i] = v
        return out.reshape(a.shape[:-1])

    def to_bytes_le(self, arr) -> np.ndarray:
        """Element tensor -> (..., nbytes) uint8 little-endian byte rows
        (reference BigNum::to_bytes_le, wrappers/rust/icicle-core/src/bignum.rs)."""
        a = np.ascontiguousarray(np.asarray(arr), dtype=np.uint32)
        if self.limb_shape == ():
            a = a[..., None]
        return a.view("<u4").view(np.uint8).reshape(a.shape[:-1] + (-1,))

    def from_bytes_le(self, data) -> jnp.ndarray:
        """(..., k) uint8 LE bytes -> element tensor. Zero-pads short rows and
        drops excess bytes, matching BigNum::from_bytes_le semantics."""
        b = np.asarray(data, dtype=np.uint8)
        if b.ndim == 1:
            b = b[None]
            squeeze = True
        else:
            squeeze = False
        nl = self.limb_shape[0] if self.limb_shape else 1
        nbytes = 4 * nl
        if b.shape[-1] < nbytes:
            pad = np.zeros(b.shape[:-1] + (nbytes - b.shape[-1],), np.uint8)
            b = np.concatenate([b, pad], axis=-1)
        b = np.ascontiguousarray(b[..., :nbytes])
        limbs = b.view("<u4").astype(np.uint32).reshape(b.shape[:-1] + (nl,))
        if self.limb_shape == ():
            limbs = limbs[..., 0]
        if squeeze:
            limbs = limbs[0]
        return jnp.asarray(limbs)

    def from_hex(self, s: str) -> jnp.ndarray:
        """Big-endian hex string (with/without 0x) -> single element
        (reference BigNum::from_hex)."""
        s = s[2:] if s.startswith(("0x", "0X")) else s
        raw = bytes.fromhex(s.zfill(len(s) + (len(s) & 1)))
        return self.from_bytes_le(np.frombuffer(raw[::-1], dtype=np.uint8))

    def element_shape(self, batch_shape=()) -> tuple:
        return tuple(batch_shape) + self.limb_shape

    def zeros(self, batch_shape=()):
        return jnp.zeros(self.element_shape(batch_shape), dtype=jnp.uint32)

    def const(self, value: int, batch_shape=()):
        v = value % self.modulus
        if self.limb_shape == ():
            return jnp.broadcast_to(jnp.uint32(v), batch_shape)
        nl = self.limb_shape[0]
        limbs = jnp.array([(v >> (32 * i)) & 0xFFFFFFFF for i in range(nl)],
                          dtype=jnp.uint32)
        return jnp.broadcast_to(limbs, tuple(batch_shape) + (nl,))

    def rand(self, rng: np.random.Generator, batch_shape=()) -> jnp.ndarray:
        """Uniform random canonical elements (host-side rejection-free via mod)."""
        n = int(np.prod(batch_shape)) if batch_shape else 1
        nbytes = (self.modulus.bit_length() + 64) // 8
        raw = rng.bytes(n * nbytes)
        big = [int.from_bytes(raw[i * nbytes:(i + 1) * nbytes], "little") % self.modulus
               for i in range(n)]
        arr = np.array(big, dtype=object).reshape(batch_shape if batch_shape else ())
        return self.from_ints(arr)

    def omega(self, logn: int) -> int:
        return self.params.omega(logn)

    @property
    def two_adicity(self) -> int:
        return self.params.two_adicity


# Field-like objects registered by other modules (e.g. composite rings that
# reuse the Field machinery — icicle_tpu.rings.babykoala).
_EXTRA_FIELDS: dict[str, "Field"] = {}


def register_field_object(f: "Field") -> None:
    _EXTRA_FIELDS[f.name] = f


@functools.lru_cache(maxsize=None)
def get_field(name: str) -> Field:
    if name in _EXTRA_FIELDS:
        return _EXTRA_FIELDS[name]
    if name not in _PARAMS:
        raise KeyError(f"unknown field {name!r}; known: "
                       f"{sorted(_PARAMS) + sorted(_EXTRA_FIELDS)}")
    return Field(_PARAMS[name])


def field_names() -> list[str]:
    return sorted(_PARAMS)

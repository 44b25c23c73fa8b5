"""Derivation of per-field arithmetic constants from the modulus.

The reference generates Montgomery/Barrett constants at C++ compile time
(/root/reference/icicle/include/icicle/fields/params_gen.h). Here we derive the
same quantities with Python big ints at import time; values feed the uint32 limb
kernels in :mod:`icicle_tpu.math.bigint` and :mod:`icicle_tpu.math.mont32`.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

WORD = 32
HALF = 16
WORD_MASK = (1 << WORD) - 1
HALF_MASK = (1 << HALF) - 1


def limbs_of(value: int, n: int, bits: int = WORD) -> list[int]:
    """Little-endian fixed-width limb decomposition of a non-negative int."""
    mask = (1 << bits) - 1
    return [(value >> (bits * i)) & mask for i in range(n)]


def int_of(limbs, bits: int = WORD) -> int:
    out = 0
    for i, limb in enumerate(limbs):
        out |= int(limb) << (bits * i)
    return out


@functools.lru_cache(maxsize=None)
def _derived(modulus: int, nlimbs: int):
    r = 1 << (WORD * nlimbs)
    r2 = (r * r) % modulus
    r3 = (r2 * r) % modulus
    # n' = -p^{-1} mod 2^w, for Montgomery word-by-word reduction.
    inv32 = (-pow(modulus, -1, 1 << WORD)) % (1 << WORD)
    inv16 = (-pow(modulus, -1, 1 << HALF)) % (1 << HALF)
    return r % modulus, r2, r3, inv32, inv16


@dataclasses.dataclass(frozen=True)
class FieldParams:
    """Arithmetic constants for one prime field (or prime-power component)."""

    name: str
    modulus: int
    # Optional NTT data: `rou` generates the full 2^two_adicity subgroup.
    rou: int | None = None
    nonresidue: int | None = None  # extension-field nonresidue (signed)
    generator: int | None = None   # multiplicative generator, if known
    # For composite-modulus rings the 2-adicity of (modulus-1) is meaningless;
    # rings set the order of `rou` explicitly (reference omegas_count).
    two_adicity_override: int | None = None

    @property
    def bits(self) -> int:
        return self.modulus.bit_length()

    @property
    def nlimbs(self) -> int:
        return (self.bits + WORD - 1) // WORD

    @property
    def nhalf(self) -> int:
        return 2 * self.nlimbs

    @property
    def r(self) -> int:  # R mod p (the Montgomery unit)
        return _derived(self.modulus, self.nlimbs)[0]

    @property
    def r2(self) -> int:
        return _derived(self.modulus, self.nlimbs)[1]

    @property
    def r3(self) -> int:
        return _derived(self.modulus, self.nlimbs)[2]

    @property
    def inv32(self) -> int:
        return _derived(self.modulus, self.nlimbs)[3]

    @property
    def inv16(self) -> int:
        return _derived(self.modulus, self.nlimbs)[4]

    @property
    def two_adicity(self) -> int:
        if self.two_adicity_override is not None:
            return self.two_adicity_override
        s, m = 0, self.modulus - 1
        while m % 2 == 0:
            m //= 2
            s += 1
        return s

    # -- numpy constant views (consumed by jnp kernels) --------------------
    def p_limbs32(self) -> np.ndarray:
        return np.array(limbs_of(self.modulus, self.nlimbs), dtype=np.uint32)

    def p_limbs16(self) -> np.ndarray:
        return np.array(limbs_of(self.modulus, self.nhalf, HALF), dtype=np.uint32)

    def const_limbs32(self, value: int) -> np.ndarray:
        return np.array(limbs_of(value % self.modulus, self.nlimbs), dtype=np.uint32)

    def to_mont_int(self, value: int) -> int:
        return (value * (1 << (WORD * self.nlimbs))) % self.modulus

    def from_mont_int(self, value: int) -> int:
        rinv = pow(1 << (WORD * self.nlimbs), -1, self.modulus)
        return (value * rinv) % self.modulus

    def omega(self, logn: int) -> int:
        """Primitive 2^logn-th root of unity (matches reference get_root_of_unity:
        reference derives omegas by repeated squaring of `rou`,
        include/icicle/fields/params_gen.h)."""
        if self.rou is None:
            raise ValueError(f"field {self.name} has no root of unity configured")
        if logn > self.two_adicity:
            raise ValueError(f"requested 2^{logn} domain > two-adicity {self.two_adicity}")
        w = self.rou
        for _ in range(self.two_adicity - logn):
            w = (w * w) % self.modulus
        return w

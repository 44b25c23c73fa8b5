"""icicle_tpu — a TPU-native ZK primitive framework.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of
ingonyama-zk/icicle: finite-field/EC arithmetic, NTT, MSM, hashing, Merkle
trees, Sumcheck, FRI, polynomial API and lattice ops, designed for TPU meshes.
"""

__version__ = "0.1.0"

from icicle_tpu.runtime.cache import enable_compilation_cache as _enable_cache

_enable_cache()

from icicle_tpu.fields.field import get_field, field_names  # noqa: F401

"""icicle_tpu — a TPU-native ZK primitive framework.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of
ingonyama-zk/icicle: finite-field/EC arithmetic, NTT, MSM, hashing, Merkle
trees, Sumcheck, FRI, polynomial API, pairings, lattice ops and ML-KEM,
designed for TPU meshes.

Public surface (mirrors the reference's per-op APIs; see SURVEY.md §2):

    fields:      get_field, field_names, get_ext_field
    curves:      get_curve, curve_names, get_group, pairing (optimal ate),
                 curves.ate.ate_pairing
    ops:         ntt (+ntt_ext/ntt_rns), msm/msm_affine/msm_precompute_bases,
                 msm_tpu2 (suffix-fold pipeline), ecntt/ecntt_jit, vec_ops,
                 mat_ops, lattice, pow
    hashes:      Poseidon, Poseidon2, Keccak256/512, Sha3_256/512, Blake2s,
                 Blake3 (ops.hash), MerkleTree / MerkleProof (ops.merkle)
    protocols:   sumcheck_prove/verify, fri_prove/verify, Program/Symbol
    polynomials: Polynomial
    rings:       babykoala Zq/RNS, Rq negacyclic NTT (rings)
    pqc:         ML-KEM keygen/encaps/decaps (ops.pqc)
    parallel:    make_mesh, ntt_sharded, msm_sharded
"""

__version__ = "0.1.0"

from icicle_tpu.runtime.cache import enable_compilation_cache as _enable_cache

_enable_cache()

from icicle_tpu.fields.field import get_field, field_names  # noqa: F401,E402
from icicle_tpu.fields.extension import get_ext_field  # noqa: F401,E402
from icicle_tpu.curves.params import get_curve, curve_names  # noqa: F401,E402
from icicle_tpu.curves.group import get_group, Projective, Affine  # noqa: F401,E402
from icicle_tpu.runtime.config import (  # noqa: F401,E402
    NTTConfig, NTTDir, Ordering, VecOpsConfig, MerkleTreeConfig,
)
from icicle_tpu.runtime import registry as _registry  # noqa: F401,E402
# registers every frontend op with the dispatcher (reference REGISTER_* analog)
from icicle_tpu.utils.pipeline import stream_map, stream_reduce  # noqa: F401,E402

__all__ = [
    "get_field", "field_names", "get_ext_field",
    "get_curve", "curve_names", "get_group", "Projective", "Affine",
    "NTTConfig", "NTTDir", "Ordering", "VecOpsConfig", "MerkleTreeConfig",
    "stream_map", "stream_reduce",
]

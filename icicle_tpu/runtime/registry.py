"""Backend registration points (reference: include/icicle/backend/*.h
REGISTER_* macros, ~84 points run at backend-DSO static init).

Importing this module registers every frontend op with the dispatcher under
its reference API name, with the "xla" implementation (the portable
bit-exactness backend, analog of the in-tree CPU backend). Ops with Mosaic
kernels additionally register "pallas" at their definition site
(ops/ntt.py, ops/msm.py). `execute(api, *args, backend=None)` is the
tIcicleExecuteDispatcher::execute analog.

Extension-field and RNS variants register as separate points exactly like
the reference (cpu_ntt.cpp:38-48, cpu_vec_ops.cpp:354-806).
"""

from __future__ import annotations

from icicle_tpu.runtime import dispatcher


def _lazy(module: str, attr: str):
    def call(*args, **kwargs):
        import importlib
        fn = getattr(importlib.import_module(module), attr)
        return fn(*args, **kwargs)
    call.__name__ = attr
    return call


_XLA_POINTS = {
    # NTT family (ntt_backend.h; cpu_ntt.cpp:35-49)
    "ntt_init_domain": ("icicle_tpu.ops.ntt", "ntt_init_domain"),
    "ntt_release_domain": ("icicle_tpu.ops.ntt", "ntt_release_domain"),
    "extension_ntt": ("icicle_tpu.ops.ntt", "ntt_ext"),
    "ring_rns_ntt": ("icicle_tpu.ops.ntt", "ntt_rns"),
    "ecntt": ("icicle_tpu.ops.ecntt", "ecntt_jit"),
    # MSM family (msm_backend.h; cpu_msm.cpp:7-12) — "msm" itself registers
    # xla+pallas in ops/msm.py
    "msm_precompute_bases": ("icicle_tpu.ops.msm", "msm_precompute_bases"),
    # curve conversions (cpu_mont_conversion.cpp:22-27)
    "affine_convert_montgomery": ("icicle_tpu.curves.montgomery",
                                  "affine_to_montgomery"),
    # vec_ops long tail (vec_ops_backend.h; cpu_vec_ops.cpp:354-806)
    "vec_ops.sum": ("icicle_tpu.ops.vec_ops", "vector_sum"),
    "vec_ops.product": ("icicle_tpu.ops.vec_ops", "vector_product"),
    "vec_ops.bit_reverse": ("icicle_tpu.ops.vec_ops", "bit_reverse"),
    "vec_ops.slice": ("icicle_tpu.ops.vec_ops", "slice_vec"),
    "vec_ops.highest_non_zero_idx": ("icicle_tpu.ops.vec_ops",
                                     "highest_non_zero_idx"),
    "vec_ops.polynomial_eval": ("icicle_tpu.ops.vec_ops", "polynomial_eval"),
    "vec_ops.polynomial_division": ("icicle_tpu.ops.vec_ops",
                                    "polynomial_division"),
    "vec_ops.execute_program": ("icicle_tpu.ops.vec_ops", "execute_program"),
    # matrix ops (mat_ops_backend.h; cpu_matrix_ops.cpp:367-375)
    "matmul": ("icicle_tpu.ops.mat_ops", "matmul"),
    "matrix_transpose": ("icicle_tpu.ops.mat_ops", "matrix_transpose"),
    # hash object factories (backend/hash/*.h; cpu_keccak.cpp:325 etc.)
    "keccak_256_factory": ("icicle_tpu.ops.hash.keccak", "Keccak256"),
    "keccak_512_factory": ("icicle_tpu.ops.hash.keccak", "Keccak512"),
    "sha3_256_factory": ("icicle_tpu.ops.hash.keccak", "Sha3_256"),
    "sha3_512_factory": ("icicle_tpu.ops.hash.keccak", "Sha3_512"),
    "blake2s_factory": ("icicle_tpu.ops.hash.blake2s", "Blake2s"),
    "blake3_factory": ("icicle_tpu.ops.hash.blake3", "Blake3"),
    "poseidon_factory": ("icicle_tpu.ops.hash.poseidon", "Poseidon"),
    "poseidon2_factory": ("icicle_tpu.ops.hash.poseidon2", "Poseidon2"),
    # merkle tree factory (backend/merkle/*.h; cpu_merkle_tree.cpp:587)
    "merkle_tree_factory": ("icicle_tpu.ops.merkle", "MerkleTree"),
    # pow (cpu_pow.cpp:198-199)
    "pow_solver": ("icicle_tpu.ops.pow", "proof_of_work"),
    "pow_verify": ("icicle_tpu.ops.pow", "proof_of_work_verify"),
    # protocol factories (sumcheck_backend.h, fri_backend.h)
    "sumcheck_factory": ("icicle_tpu.ops.sumcheck", "sumcheck_prove"),
    "fri_factory": ("icicle_tpu.ops.fri", "fri_prove"),
    # ring/lattice ops (backend cpu/src/ring/*.cpp tails)
    "balanced_decompose": ("icicle_tpu.ops.lattice", "decompose_balanced"),
    "balanced_recompose": ("icicle_tpu.ops.lattice", "recompose_balanced"),
    "jl_projection": ("icicle_tpu.ops.lattice", "jl_projection"),
    "norm_check": ("icicle_tpu.ops.lattice", "check_norm_bound"),
    "random_sampling": ("icicle_tpu.ops.lattice", "random_sampling"),
    "negacyclic_ntt": ("icicle_tpu.rings.rq", "negacyclic_ntt"),
    # pqc (backend/pqc/*.h; cuda_pqc registration)
    "ml_kem_keygen": ("icicle_tpu.ops.pqc", "keygen"),
    "ml_kem_encaps": ("icicle_tpu.ops.pqc", "encaps"),
    "ml_kem_decaps": ("icicle_tpu.ops.pqc", "decaps"),
}

for _api, (_mod, _attr) in _XLA_POINTS.items():
    dispatcher.register_impl(_api, dispatcher.XLA, _lazy(_mod, _attr))


def execute(api: str, *args, backend: str | None = None, **kwargs):
    """tIcicleExecuteDispatcher::execute analog (dispatcher.h:38-50)."""
    return dispatcher.dispatch(api, backend)(*args, **kwargs)


# ops that self-register (with both xla and pallas impls) at import time
import icicle_tpu.ops.vec_ops  # noqa: F401,E402
import icicle_tpu.ops.ntt      # noqa: F401,E402
import icicle_tpu.ops.msm      # noqa: F401,E402

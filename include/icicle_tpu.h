/* icicle_tpu C ABI — the non-Python consumption surface.
 *
 * Counterpart of the reference's L5 FFI layer (include/icicle/runtime.h +
 * src/**_c_api.cpp, consumed by wrappers/rust and wrappers/golang): a stable
 * extern "C" boundary so Rust/Go/C++ provers can drive the TPU framework
 * without a Python toolchain. libicicle_tpu.so embeds a CPython runtime that
 * hosts the JAX/XLA compute path; all buffers cross as little-endian uint32
 * limb arrays (the same layout the reference's FFI uses for field elements).
 *
 * Every call returns 0 on success or a nonzero eIcicleError-style code
 * (errors.h mirror: 1=invalid_device .. 8=unknown); icicle_tpu_last_error()
 * returns the most recent error message for this thread-family of calls.
 *
 * Build: tools/build_capi.sh -> build/libicicle_tpu.so
 */
#ifndef ICICLE_TPU_H
#define ICICLE_TPU_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Start the embedded runtime (idempotent). platform: "tpu", "cpu" or NULL
 * for auto. Returns 0 on success. */
int icicle_tpu_init(const char* platform);

/* Tear down the embedded runtime. Safe to call once at process exit. */
void icicle_tpu_shutdown(void);

/* Message for the last failed call ("" if none). Owned by the library. */
const char* icicle_tpu_last_error(void);

/* Number of uint32 limbs per element of `field`/curve base field. */
int icicle_tpu_field_limbs(const char* field);

/* NTT over `field` ("babybear", "koalabear", "stark252", "goldilocks", ...).
 * data/out: n * limbs uint32, canonical form, natural order in and out.
 * dir: 0 = forward, 1 = inverse. */
int icicle_tpu_ntt(const char* field, const uint32_t* data, size_t n,
                   int dir, uint32_t* out);

/* MSM over `curve` ("bn254", "bls12_377", ...). scalars: n * fr_limbs u32;
 * points_x/points_y: n * fq_limbs u32 canonical affine. out: 2 * fq_limbs
 * u32 canonical affine result ((0,0) = identity). */
int icicle_tpu_msm(const char* curve, const uint32_t* scalars,
                   const uint32_t* points_x, const uint32_t* points_y,
                   size_t n, uint32_t* out);

/* Poseidon2 fixed-width hash over `field`: batch rows of t field elements
 * in, batch digests out (1 element each for 31-bit fields). */
int icicle_tpu_poseidon2(const char* field, int t, const uint32_t* inputs,
                         size_t batch, uint32_t* out);

/* Keccak-256 over `batch` equal chunks of `chunk_bytes` bytes; out:
 * batch * 32 bytes. */
int icicle_tpu_keccak256(const uint8_t* data, size_t chunk_bytes,
                         size_t batch, uint8_t* out);

/* Elementwise field vector op; op: "add" | "sub" | "mul".
 * a, b, out: n * limbs uint32 canonical. (reference vec_ops.h FFI) */
int icicle_tpu_vec_op(const char* field, const char* op, const uint32_t* a,
                      const uint32_t* b, size_t n, uint32_t* out);

/* Poseidon2 sponge over `field`: batch items of in_words field elements
 * each (sponge mode when in_words != t); out: batch digests. */
int icicle_tpu_poseidon2_sponge(const char* field, int t, size_t in_words,
                                const uint32_t* inputs, size_t batch,
                                uint32_t* out);

/* Poseidon2 arity-2 Merkle tree over n_leaves single-element leaves
 * (n_leaves a power of two). root_out: limbs uint32.
 * (reference merkle_tree.h FFI) */
int icicle_tpu_merkle_build(const char* field, const uint32_t* leaves,
                            size_t n_leaves, uint32_t* root_out);

/* Build + extract one pruned proof, serialized in the reference
 * BinarySerializer<MerkleProof> layout. On entry *proof_len is the
 * capacity of proof_out; on success it holds the bytes written. */
int icicle_tpu_merkle_proof(const char* field, const uint32_t* leaves,
                            size_t n_leaves, uint64_t leaf_idx,
                            uint8_t* proof_out, size_t* proof_len);

/* Verify a serialized pruned proof; *ok_out = 1 valid / 0 invalid. */
int icicle_tpu_merkle_verify(const char* field, const uint8_t* proof,
                             size_t proof_len, int* ok_out);

/* Sumcheck prove with the predefined a*b-c combine over 3 MLEs of size n
 * (n a power of two). mles: 3 * n * limbs uint32; claimed_sum: limbs
 * uint32. Proof is serialized in the reference layout; capacity/written
 * protocol as merkle_proof. (reference sumcheck.h FFI) */
int icicle_tpu_sumcheck_prove_abc(const char* field, const uint32_t* mles,
                                  size_t n, const uint32_t* claimed_sum,
                                  uint8_t* proof_out, size_t* proof_len);

/* Verify a serialized sumcheck proof; *ok_out = 1 valid / 0 invalid. */
int icicle_tpu_sumcheck_verify_abc(const char* field,
                                   const uint32_t* claimed_sum,
                                   const uint8_t* proof, size_t proof_len,
                                   int* ok_out);

/* FRI prove over n = 2^k rou evaluations (keccak-256 Merkle layers,
 * folding factor 2, reference fri.h FFI). evals: n * limbs uint32.
 * Proof serialized in the reference layout; capacity/written protocol as
 * merkle_proof. */
int icicle_tpu_fri_prove(const char* field, const uint32_t* evals, size_t n,
                         int stopping_degree, int nof_queries, int pow_bits,
                         uint8_t* proof_out, size_t* proof_len);

/* Verify a serialized FRI proof; *ok_out = 1 valid / 0 invalid. */
int icicle_tpu_fri_verify(const char* field, int stopping_degree,
                          int nof_queries, int pow_bits,
                          const uint8_t* proof, size_t proof_len,
                          int* ok_out);

/* ML-KEM (FIPS 203) byte sizes for category "512"|"768"|"1024";
 * which: "ek"|"dk"|"ct"|"ss"|"entropy"|"msg". Returns -1 on error. */
int icicle_tpu_mlkem_size(const char* category, const char* which);

/* ML-KEM batch keygen: entropy = batch * 64 bytes (d||z per row);
 * ek_out = batch * ek_bytes, dk_out = batch * dk_bytes.
 * (reference ml_kem.h FFI) */
int icicle_tpu_mlkem_keygen(const char* category, const uint8_t* entropy,
                            size_t batch, uint8_t* ek_out, uint8_t* dk_out);

/* ML-KEM batch encapsulate: messages = batch * 32 bytes;
 * ct_out = batch * ct_bytes, ss_out = batch * 32. */
int icicle_tpu_mlkem_encaps(const char* category, const uint8_t* messages,
                            const uint8_t* public_keys, size_t batch,
                            uint8_t* ct_out, uint8_t* ss_out);

/* ML-KEM batch decapsulate (implicit rejection): ss_out = batch * 32. */
int icicle_tpu_mlkem_decaps(const char* category, const uint8_t* ciphertexts,
                            const uint8_t* secret_keys, size_t batch,
                            uint8_t* ss_out);

/* Optimal-ate pairing e(P, Q). p: 2*limbs uint32 (x||y affine G1);
 * q: 4*limbs uint32 (x.c0, x.c1, y.c0, y.c1 affine G2); out: 12*limbs
 * uint32 canonical Fp12 coefficients, flat Fp2[w]/(w^6-xi) basis
 * (reference pairing.h:24-27). */
int icicle_tpu_pairing(const char* curve, const uint32_t* p,
                       const uint32_t* q, uint32_t* out);

/* Keccak-256 proof-of-work grind (reference pow.h). *found_out = 1 with
 * the solving nonce and its 64-bit LE hash value, or 0 if the search cap
 * was exhausted (a SUCCESS status, matching the reference proof_of_work's
 * found=false — errors are reserved for internal failures). */
int icicle_tpu_pow_solve(const uint8_t* challenge, size_t challenge_len,
                         int solution_bits, int* found_out,
                         uint64_t* nonce_out, uint64_t* mined_hash_out);

/* Verify a proof-of-work nonce; *ok_out = 1 valid / 0 invalid. */
int icicle_tpu_pow_verify(const uint8_t* challenge, size_t challenge_len,
                          int solution_bits, uint64_t nonce, int* ok_out);

/* ---- lattice ops (babykoala Zq; reference lattice/balanced_decomposition.h,
 * lattice/jl_projection.h, lattice/norm.h). Zq elements are 2 uint32 each,
 * little-endian. ---- */

/* Balanced base-b decomposition of n Zq elements into nof_digits digits,
 * digit-major output (digit d of element i at [d*n + i]); out must hold
 * nof_digits*n elements. nof_digits = 0 is rejected — query the canonical
 * count with ceil(log_base(q)) (+1 when base > 2). */
int icicle_tpu_lattice_decompose(const uint32_t* in, size_t n, uint32_t base,
                                 size_t nof_digits, uint32_t* out);

/* Inverse: total = nof_digits*out_size digit elements -> out_size Zq. */
int icicle_tpu_lattice_recompose(const uint32_t* digits, size_t total,
                                 uint32_t base, size_t out_size,
                                 uint32_t* out);

/* Johnson-Lindenstrauss projection of n Zq elements to output_size via the
 * seeded {0, +-1} matrix (byte-matched to the reference's keccak512
 * expansion). */
int icicle_tpu_jl_projection(const uint32_t* in, size_t n,
                             const uint8_t* seed, size_t seed_len,
                             size_t output_size, uint32_t* out);

/* Norm bound check: norm is "L2" or "LInfinity"; *ok_out = 1 when
 * norm(in) < bound. Inputs must be < sqrt(q) in centered form (error 8
 * otherwise, matching the reference's argument contract). */
int icicle_tpu_norm_check(const uint32_t* in, size_t n, const char* norm,
                          uint64_t bound, int* ok_out);

/* ---- polynomial API (reference polynomials/polynomials.h) ----
 * Coefficients are field elements (field_limbs uint32 each), ascending
 * degree order. */

/* out = a * b: exactly na+nb-1 coefficients. */
int icicle_tpu_poly_mul(const char* field, const uint32_t* a, size_t na,
                        const uint32_t* b, size_t nb, uint32_t* out);

/* Evaluate a at the field element x. */
int icicle_tpu_poly_eval(const char* field, const uint32_t* a, size_t na,
                         const uint32_t* x, uint32_t* out);

/* Euclidean division a = q*b + r: q_out gets max(na-nb+1, 1) coefficients,
 * r_out gets max(nb-1, 1). */
int icicle_tpu_poly_divide(const char* field, const uint32_t* a, size_t na,
                           const uint32_t* b, size_t nb, uint32_t* q_out,
                           uint32_t* r_out);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* ICICLE_TPU_H */

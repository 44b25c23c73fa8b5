/* C ABI smoke test: drives NTT roundtrip, Poseidon2, Keccak-256 and a tiny
 * MSM through libicicle_tpu.so from plain C — the proof that a non-Python
 * consumer (the reference's wrappers/rust|golang role) can use the library.
 *
 * Known answers: NTT fwd+inv == identity; keccak256("") fixed digest;
 * MSM [2,3]*(G,G) == 5*G on bn254 (generator chain precomputed below).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../include/icicle_tpu.h"

static int fail(const char* what) {
  fprintf(stderr, "FAIL %s: %s\n", what, icicle_tpu_last_error());
  return 1;
}

int main(void) {
  if (icicle_tpu_init("cpu") != 0) return fail("init");

  /* --- babybear NTT roundtrip (n = 16) --- */
  {
    enum { N = 16 };
    uint32_t data[N], fwd[N], back[N];
    for (int i = 0; i < N; i++) data[i] = (uint32_t)(i * 2013265920u % 2013265921u);
    if (icicle_tpu_field_limbs("babybear") != 1) return fail("limbs");
    if (icicle_tpu_ntt("babybear", data, N, 0, fwd) != 0) return fail("ntt fwd");
    if (icicle_tpu_ntt("babybear", fwd, N, 1, back) != 0) return fail("ntt inv");
    if (memcmp(data, back, sizeof data) != 0) {
      fprintf(stderr, "FAIL ntt roundtrip mismatch\n");
      return 1;
    }
    printf("ntt roundtrip OK\n");
  }

  /* --- keccak256 of the empty string --- */
  {
    const uint8_t want[32] = {
        0xc5, 0xd2, 0x46, 0x01, 0x86, 0xf7, 0x23, 0x3c, 0x92, 0x7e, 0x7d,
        0xb2, 0xdc, 0xc7, 0x03, 0xc0, 0xe5, 0x00, 0xb6, 0x53, 0xca, 0x82,
        0x27, 0x3b, 0x7b, 0xfa, 0xd8, 0x04, 0x5d, 0x85, 0xa4, 0x70};
    uint8_t out[32];
    if (icicle_tpu_keccak256(NULL, 0, 1, out) != 0) return fail("keccak256");
    if (memcmp(out, want, 32) != 0) {
      fprintf(stderr, "FAIL keccak256(\"\") mismatch\n");
      return 1;
    }
    printf("keccak256 OK\n");
  }

  /* --- poseidon2 babybear t=2: just executes and is deterministic --- */
  {
    uint32_t in[4] = {1, 2, 3, 4}; /* batch=2, t=2 */
    uint32_t out1[2], out2[2];
    if (icicle_tpu_poseidon2("babybear", 2, in, 2, out1) != 0)
      return fail("poseidon2");
    if (icicle_tpu_poseidon2("babybear", 2, in, 2, out2) != 0)
      return fail("poseidon2#2");
    if (memcmp(out1, out2, sizeof out1) != 0 || out1[0] == 0) {
      fprintf(stderr, "FAIL poseidon2 nondeterministic/degenerate\n");
      return 1;
    }
    printf("poseidon2 OK (digest0=%u)\n", out1[0]);
  }

  /* --- bn254 MSM: [2,3] * (G, G) == 5*G --- */
  {
    /* canonical little-endian limbs; G = (1, 2) on bn254 */
    uint32_t scalars[2][8] = {{2, 0, 0, 0, 0, 0, 0, 0},
                              {3, 0, 0, 0, 0, 0, 0, 0}};
    uint32_t px[2][8] = {{1, 0, 0, 0, 0, 0, 0, 0}, {1, 0, 0, 0, 0, 0, 0, 0}};
    uint32_t py[2][8] = {{2, 0, 0, 0, 0, 0, 0, 0}, {2, 0, 0, 0, 0, 0, 0, 0}};
    /* 5*G on bn254, canonical affine limbs (little-endian u32), from the
     * host oracle tests/ec_ref.py */
    const uint32_t want_x[8] = {0xfa163fa9u, 0xe849a8a7u, 0x8953a39cu,
                                0x62e4ded8u, 0x762b7743u, 0x66bc0204u,
                                0x0efee0f7u, 0x17c139dfu};
    uint32_t out[16];
    if (icicle_tpu_msm("bn254", &scalars[0][0], &px[0][0], &py[0][0], 2,
                       out) != 0)
      return fail("msm");
    if (memcmp(out, want_x, sizeof want_x) != 0) {
      fprintf(stderr, "FAIL msm != 5G (x limb0 got %08x)\n", out[0]);
      return 1;
    }
    printf("msm 5G OK\n");
  }

  /* --- vec_ops: add then sub roundtrips, mul vs known square --- */
  {
    enum { N = 8 };
    uint32_t a[N], b[N], s[N], d[N], m[N];
    const uint32_t P = 2013265921u; /* babybear */
    for (int i = 0; i < N; i++) {
      a[i] = (uint32_t)(i * 123456789u % P);
      b[i] = (uint32_t)(i * 987654321u % P);
    }
    if (icicle_tpu_vec_op("babybear", "add", a, b, N, s) != 0)
      return fail("vec add");
    if (icicle_tpu_vec_op("babybear", "sub", s, b, N, d) != 0)
      return fail("vec sub");
    if (memcmp(a, d, sizeof a) != 0) {
      fprintf(stderr, "FAIL vec add/sub roundtrip\n");
      return 1;
    }
    if (icicle_tpu_vec_op("babybear", "mul", a, a, N, m) != 0)
      return fail("vec mul");
    if (m[2] != (uint32_t)((246913578ull * 246913578ull) % P)) {
      fprintf(stderr, "FAIL vec mul value\n");
      return 1;
    }
    printf("vec_ops OK\n");
  }

  /* --- poseidon2 sponge: 5 words into t=3 --- */
  {
    uint32_t in[10] = {1, 2, 3, 4, 5, 6, 7, 8, 9, 10}; /* batch=2, 5 words */
    uint32_t out1[2], out2[2];
    if (icicle_tpu_poseidon2_sponge("babybear", 3, 5, in, 2, out1) != 0)
      return fail("poseidon2 sponge");
    if (icicle_tpu_poseidon2_sponge("babybear", 3, 5, in, 2, out2) != 0)
      return fail("poseidon2 sponge#2");
    if (memcmp(out1, out2, sizeof out1) != 0 || out1[0] == out1[1]) {
      fprintf(stderr, "FAIL sponge nondeterministic/degenerate\n");
      return 1;
    }
    printf("poseidon2 sponge OK\n");
  }

  /* --- merkle: build, prove, verify; tampered proof must fail --- */
  {
    enum { NL = 64 };
    uint32_t leaves[NL], root[1];
    uint8_t proof[4096];
    size_t plen = sizeof proof;
    int ok = -1;
    for (int i = 0; i < NL; i++) leaves[i] = (uint32_t)(i + 1);
    if (icicle_tpu_merkle_build("babybear", leaves, NL, root) != 0)
      return fail("merkle build");
    if (icicle_tpu_merkle_proof("babybear", leaves, NL, 13, proof, &plen) != 0)
      return fail("merkle proof");
    if (icicle_tpu_merkle_verify("babybear", proof, plen, &ok) != 0 || ok != 1)
      return fail("merkle verify");
    proof[17] ^= 1; /* flip a bit inside the leaf bytes (header is 17 B) */
    if (icicle_tpu_merkle_verify("babybear", proof, plen, &ok) != 0 || ok != 0) {
      fprintf(stderr, "FAIL tampered merkle proof verified\n");
      return 1;
    }
    printf("merkle build/prove/verify OK (root=%u, proof=%zu B)\n", root[0],
           plen);
  }

  /* --- sumcheck (a*b - c combine): prove + verify; wrong sum must fail --- */
  {
    enum { N = 8 };
    uint32_t mles[3 * N], claimed[1] = {0};
    uint8_t proof[8192];
    size_t plen = sizeof proof;
    const uint64_t P = 2013265921u;
    uint64_t sum = 0;
    int ok = -1;
    for (int i = 0; i < N; i++) {
      mles[i] = (uint32_t)(i + 3);           /* a */
      mles[N + i] = (uint32_t)(2 * i + 1);   /* b */
      mles[2 * N + i] = (uint32_t)(7 * i);   /* c */
      sum = (sum + (uint64_t)mles[i] * mles[N + i] % P + P -
             mles[2 * N + i]) % P;
    }
    claimed[0] = (uint32_t)sum;
    if (icicle_tpu_sumcheck_prove_abc("babybear", mles, N, claimed, proof,
                                      &plen) != 0)
      return fail("sumcheck prove");
    if (icicle_tpu_sumcheck_verify_abc("babybear", claimed, proof, plen,
                                       &ok) != 0 || ok != 1)
      return fail("sumcheck verify");
    claimed[0] = (uint32_t)((sum + 1) % P);
    if (icicle_tpu_sumcheck_verify_abc("babybear", claimed, proof, plen,
                                       &ok) != 0 || ok != 0) {
      fprintf(stderr, "FAIL sumcheck verified a wrong claimed sum\n");
      return 1;
    }
    printf("sumcheck prove/verify OK (proof=%zu B)\n", plen);
  }

  /* --- FRI: prove over 2^6 evals + verify; tampered proof must fail --- */
  {
    enum { N = 64 };
    uint32_t evals[N];
    uint8_t proof[1 << 16];
    size_t plen = sizeof proof;
    int ok = -1;
    for (int i = 0; i < N; i++) evals[i] = (uint32_t)(i * i + 5);
    if (icicle_tpu_fri_prove("babybear", evals, N, /*stopping_degree=*/0,
                             /*nof_queries=*/6, /*pow_bits=*/0, proof,
                             &plen) != 0)
      return fail("fri prove");
    if (icicle_tpu_fri_verify("babybear", 0, 6, 0, proof, plen, &ok) != 0 ||
        ok != 1)
      return fail("fri verify");
    proof[plen / 2] ^= 1;
    if (icicle_tpu_fri_verify("babybear", 0, 6, 0, proof, plen, &ok) != 0 ||
        ok != 0) {
      fprintf(stderr, "FAIL tampered fri proof verified\n");
      return 1;
    }
    printf("fri prove/verify OK (proof=%zu B)\n", plen);
  }

  /* --- ML-KEM-512: keygen -> encaps -> decaps shared-secret match --- */
  {
    int ekb = icicle_tpu_mlkem_size("512", "ek");
    int dkb = icicle_tpu_mlkem_size("512", "dk");
    int ctb = icicle_tpu_mlkem_size("512", "ct");
    uint8_t entropy[64], msg[32];
    uint8_t ek[8192], dk[8192], ct[8192], ss1[32], ss2[32];
    if (ekb <= 0 || dkb <= 0 || ctb <= 0) return fail("mlkem sizes");
    for (int i = 0; i < 64; i++) entropy[i] = (uint8_t)(i * 7 + 1);
    for (int i = 0; i < 32; i++) msg[i] = (uint8_t)(255 - i);
    if (icicle_tpu_mlkem_keygen("512", entropy, 1, ek, dk) != 0)
      return fail("mlkem keygen");
    if (icicle_tpu_mlkem_encaps("512", msg, ek, 1, ct, ss1) != 0)
      return fail("mlkem encaps");
    if (icicle_tpu_mlkem_decaps("512", ct, dk, 1, ss2) != 0)
      return fail("mlkem decaps");
    if (memcmp(ss1, ss2, 32) != 0) {
      fprintf(stderr, "FAIL mlkem shared secrets differ\n");
      return 1;
    }
    /* implicit rejection: corrupting the ciphertext must change the secret */
    ct[0] ^= 1;
    if (icicle_tpu_mlkem_decaps("512", ct, dk, 1, ss2) != 0)
      return fail("mlkem decaps (tampered)");
    if (memcmp(ss1, ss2, 32) == 0) {
      fprintf(stderr, "FAIL mlkem tampered ct gave the same secret\n");
      return 1;
    }
    printf("mlkem-512 keygen/encaps/decaps OK (ek=%d dk=%d ct=%d B)\n", ekb,
           dkb, ctb);
  }

  /* --- pairing: e(G1, G2) must be deterministic and != 0/1-ish trivial --- */
  {
    /* bn254 G1/G2 generators, canonical LE limbs (curves/params.py) */
    static const uint32_t g1[16] = {1, 0, 0, 0, 0, 0, 0, 0,
                                    2, 0, 0, 0, 0, 0, 0, 0};
    static const uint32_t g2[32] = {
        /* x.c0 */ 0xd992f6ed, 0x46debd5c, 0xf75edadd, 0x674322d4,
                   0x5e5c4479, 0x426a0066, 0x121f1e76, 0x1800deef,
        /* x.c1 */ 0xaef312c2, 0x97e485b7, 0x35a9e712, 0xf1aa4933,
                   0x31fb5d25, 0x7260bfb7, 0x920d483a, 0x198e9393,
        /* y.c0 */ 0x66fa7daa, 0x4ce6cc01, 0x0c43d37b, 0xe3d1e769,
                   0x8dcb408f, 0x4aab7180, 0xdb8c6deb, 0x12c85ea5,
        /* y.c1 */ 0xd122975b, 0x55acdadc, 0x70b38ef3, 0xbc4b3133,
                   0x690c3395, 0xec9e99ad, 0x585ff075, 0x090689d0};
    uint32_t gt1[12 * 8], gt2[12 * 8];
    int nonzero = 0;
    if (icicle_tpu_pairing("bn254", g1, g2, gt1) != 0)
      return fail("pairing");
    if (icicle_tpu_pairing("bn254", g1, g2, gt2) != 0)
      return fail("pairing (2nd)");
    if (memcmp(gt1, gt2, sizeof gt1) != 0) {
      fprintf(stderr, "FAIL pairing nondeterministic\n");
      return 1;
    }
    for (int i = 8; i < 12 * 8; i++) nonzero |= gt1[i] != 0;
    if (!nonzero) {
      fprintf(stderr, "FAIL pairing result looks degenerate\n");
      return 1;
    }
    printf("pairing bn254 OK (c0 limb0=%08x)\n", gt1[0]);
  }

  /* --- proof of work: solve then verify; wrong nonce must fail --- */
  {
    const uint8_t challenge[] = "icicle-tpu-pow-test";
    uint64_t nonce = 0, mined = 0;
    int found = -1, ok = -1;
    if (icicle_tpu_pow_solve(challenge, sizeof challenge - 1, /*bits=*/8,
                             &found, &nonce, &mined) != 0 || found != 1)
      return fail("pow solve");
    if (icicle_tpu_pow_verify(challenge, sizeof challenge - 1, 8, nonce,
                              &ok) != 0 || ok != 1)
      return fail("pow verify");
    /* Deterministic rejection: demand strictly more zero bits than the
       mined hash satisfies — the same nonce must then verify as invalid
       (the old nonce+1 probe only flagged a NOTE 1/256 of the time). */
    {
      /* sat = leading zero bits of mined (bits satisfied: val < 2^(64-b)
         iff clz64(val) >= b); demanding sat+1 must reject. */
      int sat = 0;
      uint64_t v = mined;
      while (sat < 64 && !(v >> 63)) { sat++; v <<= 1; }
      if (sat + 1 <= 60) { /* solver accepts bits in [1,60] only */
        if (icicle_tpu_pow_verify(challenge, sizeof challenge - 1, sat + 1,
                                  nonce, &ok) != 0)
          return fail("pow verify (harder threshold)");
        if (ok != 0) return fail("pow verify accepted an unmet threshold");
      }
    }
    printf("pow solve/verify OK (nonce=%llu)\n",
           (unsigned long long)nonce);
  }

  /* --- lattice: decompose/recompose roundtrip, JL shape, norm check --- */
  {
    enum { N = 8, DIGITS = 16 };
    uint32_t zq[N * 2], digits[DIGITS * N * 2], back[N * 2];
    for (int i = 0; i < N; i++) {           /* small values < sqrt(q) */
      zq[2 * i] = (uint32_t)(i * 1234567 + 1);
      zq[2 * i + 1] = 0;
    }
    if (icicle_tpu_lattice_decompose(zq, N, /*base=*/16, DIGITS, digits) != 0)
      return fail("lattice decompose");
    if (icicle_tpu_lattice_recompose(digits, DIGITS * N, 16, N, back) != 0)
      return fail("lattice recompose");
    for (int i = 0; i < N * 2; i++)
      if (back[i] != zq[i]) return fail("lattice roundtrip mismatch");
    uint32_t proj[4 * 2];
    const uint8_t seed[] = "jl-seed";
    if (icicle_tpu_jl_projection(zq, N, seed, sizeof seed - 1, 4, proj) != 0)
      return fail("jl projection");
    int ok = -1;
    if (icicle_tpu_norm_check(zq, N, "LInfinity", 123456789ULL, &ok) != 0 ||
        ok != 1)
      return fail("norm check (should pass)");
    if (icicle_tpu_norm_check(zq, N, "LInfinity", 2ULL, &ok) != 0 || ok != 0)
      return fail("norm check (should fail)");
    printf("lattice decompose/recompose/jl/norm OK\n");
  }

  /* --- polynomial API: (x+1)*(x+2) = x^2+3x+2; eval; divide back --- */
  {
    uint32_t a[2] = {1, 1}, b[2] = {2, 1};   /* babybear, 1 limb/coeff */
    uint32_t prod[3], x = 5, ev = 0, q[2], r[1];
    if (icicle_tpu_poly_mul("babybear", a, 2, b, 2, prod) != 0)
      return fail("poly mul");
    if (prod[0] != 2 || prod[1] != 3 || prod[2] != 1)
      return fail("poly mul coefficients");
    if (icicle_tpu_poly_eval("babybear", prod, 3, &x, &ev) != 0)
      return fail("poly eval");
    if (ev != (5 + 1) * (5 + 2)) return fail("poly eval value");
    if (icicle_tpu_poly_divide("babybear", prod, 3, a, 2, q, r) != 0)
      return fail("poly divide");
    if (q[0] != 2 || q[1] != 1 || r[0] != 0)
      return fail("poly divide q/r");
    printf("polynomial mul/eval/divide OK\n");
  }

  icicle_tpu_shutdown();
  printf("ALL C ABI CHECKS PASSED\n");
  return 0;
}

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

  icicle_tpu_shutdown();
  printf("ALL C ABI CHECKS PASSED\n");
  return 0;
}

// Native host-side crypto runtime for icicle_tpu.
//
// TPU-native framework design note: bulk hashing runs in vectorized JAX/Pallas
// kernels on the accelerator; this library covers the HOST hot spots the
// reference implements natively too (backend/cpu/src/hash/*): Fiat-Shamir
// transcript hashing (FRI/sumcheck round loops), PoW grinding, and seeded
// lattice sampling expansions. Exposed via a minimal C ABI consumed with
// ctypes (icicle_tpu/utils/native.py) — no pybind11 dependency.
//
// Build: tools/build_native.sh  ->  icicle_tpu/utils/libicicle_host.so

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

const int ROT[5][5] = {{0, 36, 3, 41, 18},
                       {1, 44, 10, 45, 2},
                       {62, 6, 43, 15, 61},
                       {28, 55, 25, 21, 56},
                       {27, 20, 39, 8, 14}};

inline uint64_t rol(uint64_t v, int n) {
  return n == 0 ? v : (v << n) | (v >> (64 - n));
}

void keccak_f(uint64_t s[25]) {
  uint64_t c[5], d[5], b[25];
  for (int r = 0; r < 24; ++r) {
    for (int x = 0; x < 5; ++x)
      c[x] = s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20];
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rol(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) s[x + 5 * y] ^= d[x];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rol(s[x + 5 * y], ROT[x][y]);
    for (int y = 0; y < 5; ++y)
      for (int x = 0; x < 5; ++x)
        s[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
    s[0] ^= RC[r];
  }
}

void sponge(const uint8_t* data, size_t len, int rate, uint8_t pad,
            uint8_t* out, size_t outlen) {
  uint64_t s[25];
  std::memset(s, 0, sizeof(s));
  uint8_t block[200];
  // absorb full blocks
  while (len >= (size_t)rate) {
    for (int i = 0; i < rate / 8; ++i) {
      uint64_t lane;
      std::memcpy(&lane, data + 8 * i, 8);
      s[i] ^= lane;
    }
    keccak_f(s);
    data += rate;
    len -= rate;
  }
  // final padded block
  std::memset(block, 0, rate);
  std::memcpy(block, data, len);
  block[len] = pad;
  block[rate - 1] ^= 0x80;
  for (int i = 0; i < rate / 8; ++i) {
    uint64_t lane;
    std::memcpy(&lane, block + 8 * i, 8);
    s[i] ^= lane;
  }
  keccak_f(s);
  // squeeze
  size_t off = 0;
  while (off < outlen) {
    size_t take = outlen - off < (size_t)rate ? outlen - off : (size_t)rate;
    std::memcpy(out + off, s, take);
    off += take;
    if (off < outlen) keccak_f(s);
  }
}

}  // namespace

extern "C" {

// digest kinds: 0=keccak256 1=keccak512 2=sha3_256 3=sha3_512 4=shake128 5=shake256
int icicle_host_hash(int kind, const uint8_t* data, size_t len, uint8_t* out,
                     size_t outlen) {
  switch (kind) {
    case 0: sponge(data, len, 136, 0x01, out, 32); return 0;
    case 1: sponge(data, len, 72, 0x01, out, 64); return 0;
    case 2: sponge(data, len, 136, 0x06, out, 32); return 0;
    case 3: sponge(data, len, 72, 0x06, out, 64); return 0;
    case 4: sponge(data, len, 168, 0x1F, out, outlen); return 0;
    case 5: sponge(data, len, 136, 0x1F, out, outlen); return 0;
  }
  return -1;
}

// batched equal-size inputs: batch rows of `len` bytes -> batch digests
int icicle_host_hash_batch(int kind, const uint8_t* data, size_t len,
                           size_t batch, uint8_t* out, size_t outlen) {
  for (size_t i = 0; i < batch; ++i) {
    if (icicle_host_hash(kind, data + i * len, len, out + i * outlen, outlen))
      return -1;
  }
  return 0;
}

// PoW grind (cpu_pow.cpp semantics): input = challenge || u64 nonce LE ||
// `padding` zero bytes; solves when first 8 digest bytes (LE u64) < 2^(64-bits).
// Returns 1 if found (nonce in *nonce_out), 0 otherwise.
int icicle_host_pow(int kind, const uint8_t* challenge, size_t challenge_len,
                    int solution_bits, uint32_t padding, uint64_t start,
                    uint64_t max_iters, uint64_t* nonce_out,
                    uint64_t* mined_out) {
  const uint64_t threshold = 1ULL << (64 - solution_bits);
  size_t full = challenge_len + 8 + padding;
  uint8_t* buf = new uint8_t[full];
  std::memset(buf, 0, full);
  std::memcpy(buf, challenge, challenge_len);
  uint8_t digest[64];
  size_t dlen = (kind == 1 || kind == 3) ? 64 : 32;
  for (uint64_t nonce = start; nonce < start + max_iters; ++nonce) {
    std::memcpy(buf + challenge_len, &nonce, 8);
    icicle_host_hash(kind, buf, full, digest, dlen);
    uint64_t v;
    std::memcpy(&v, digest, 8);
    if (v < threshold) {
      *nonce_out = nonce;
      *mined_out = v;
      delete[] buf;
      return 1;
    }
  }
  delete[] buf;
  return 0;
}

}  // extern "C"

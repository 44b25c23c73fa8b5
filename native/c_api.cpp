// icicle_tpu C ABI implementation (include/icicle_tpu.h).
//
// Counterpart of the reference's FFI layer (src/**_c_api.cpp + runtime.h C
// ABI consumed by wrappers/rust, wrappers/golang): embeds a CPython runtime
// hosting the JAX/XLA compute path and marshals raw little-endian buffers
// through icicle_tpu/capi_shim.py. No numpy/jax C APIs are touched here —
// only bytes objects cross the boundary, so the ABI is stable against
// Python-side refactors.
//
// Build: tools/build_capi.sh (g++ -shared, links libpython3.12).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>

#include "../include/icicle_tpu.h"

namespace {

std::mutex g_mu;
PyObject* g_shim = nullptr;   // icicle_tpu.capi_shim module
std::string g_last_error;
bool g_we_initialized = false;

void set_error_from_python() {
  PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  g_last_error = "python error";
  if (value) {
    PyObject* s = PyObject_Str(value);
    if (s) {
      const char* msg = PyUnicode_AsUTF8(s);
      if (msg) g_last_error = msg;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

// Call shim.<fn>(*args); returns new ref or nullptr (error recorded).
// Accepts args == nullptr (a failed Py_BuildValue at the call site): that
// is reported as an error here instead of silently calling fn() with no
// arguments (advisor r4) — call sites pair this with Py_XDECREF(args).
PyObject* shim_call(const char* fn, PyObject* args) {
  if (!args) {
    if (PyErr_Occurred()) set_error_from_python();
    else g_last_error = "argument marshaling failed";
    return nullptr;
  }
  PyObject* f = PyObject_GetAttrString(g_shim, fn);
  if (!f) {
    set_error_from_python();
    return nullptr;
  }
  PyObject* out = PyObject_CallObject(f, args);
  Py_DECREF(f);
  if (!out) set_error_from_python();
  return out;
}

int copy_bytes_out(PyObject* res, void* out, size_t want) {
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(res, &buf, &len) != 0) {
    set_error_from_python();
    return 8;
  }
  if (want && static_cast<size_t>(len) != want) {
    g_last_error = "unexpected result size";
    return 8;
  }
  std::memcpy(out, buf, len);
  return 0;
}

struct Gil {
  PyGILState_STATE st;
  Gil() : st(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(st); }
};

}  // namespace

extern "C" {

int icicle_tpu_init(const char* platform) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (g_shim) return 0;
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_we_initialized = true;
  }
  Gil gil;
  // platform env must be pinned BEFORE the package import below: importing
  // icicle_tpu.capi_shim runs icicle_tpu/__init__, which touches jax.
  if (platform && std::strcmp(platform, "cpu") == 0) {
    PyRun_SimpleString(
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ.setdefault('PALLAS_AXON_REMOTE_COMPILE', '0')\n");
  } else if (!platform) {
    PyRun_SimpleString(
        "import os\nos.environ.pop('JAX_PLATFORMS', None)\n");
  }
  PyObject* mod = PyImport_ImportModule("icicle_tpu.capi_shim");
  if (!mod) {
    set_error_from_python();
    return 3;  // eIcicleError::INVALID_DEVICE-class init failure
  }
  PyObject* args = Py_BuildValue("(z)", platform);
  PyObject* res = nullptr;
  PyObject* f = PyObject_GetAttrString(mod, "setup");
  if (f) {
    res = PyObject_CallObject(f, args);
    Py_DECREF(f);
  }
  Py_XDECREF(args);
  if (!res) {
    set_error_from_python();
    Py_DECREF(mod);
    return 3;
  }
  Py_DECREF(res);
  g_shim = mod;
  return 0;
}

void icicle_tpu_shutdown(void) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (!g_shim) return;
  {
    Gil gil;
    Py_DECREF(g_shim);
  }
  g_shim = nullptr;
  // Finalizing an interpreter that loaded jaxlib is unreliable; leave the
  // runtime alive if we did not create it, and skip Py_Finalize otherwise
  // (process exit reclaims it — same stance as jax's own atexit handling).
}

const char* icicle_tpu_last_error(void) { return g_last_error.c_str(); }

int icicle_tpu_field_limbs(const char* field) {
  if (!g_shim) return -1;
  Gil gil;
  PyObject* args = Py_BuildValue("(s)", field);
  PyObject* res = shim_call("field_limbs", args);
  Py_XDECREF(args);
  if (!res) return -1;
  long v = PyLong_AsLong(res);
  Py_DECREF(res);
  return static_cast<int>(v);
}

int icicle_tpu_ntt(const char* field, const uint32_t* data, size_t n,
                   int dir, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  size_t nbytes = n * limbs * 4;
  PyObject* args = Py_BuildValue(
      "(sy#ni)", field, reinterpret_cast<const char*>(data),
      static_cast<Py_ssize_t>(nbytes), static_cast<Py_ssize_t>(n), dir);
  PyObject* res = shim_call("ntt", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, nbytes);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_msm(const char* curve, const uint32_t* scalars,
                   const uint32_t* points_x, const uint32_t* points_y,
                   size_t n, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  // limb counts come back from the shim result size; scalars use the
  // scalar-field width which the shim derives from the curve
  PyObject* args = Py_BuildValue("(s)", curve);
  PyObject* fr_res = shim_call("scalar_limbs", args);
  Py_XDECREF(args);
  if (!fr_res) return 2;
  long frl = PyLong_AsLong(fr_res);
  Py_DECREF(fr_res);
  args = Py_BuildValue("(s)", curve);
  PyObject* fq_res = shim_call("base_limbs", args);
  Py_XDECREF(args);
  if (!fq_res) return 2;
  long fql = PyLong_AsLong(fq_res);
  Py_DECREF(fq_res);

  args = Py_BuildValue(
      "(sy#y#y#n)", curve,
      reinterpret_cast<const char*>(scalars),
      static_cast<Py_ssize_t>(n * frl * 4),
      reinterpret_cast<const char*>(points_x),
      static_cast<Py_ssize_t>(n * fql * 4),
      reinterpret_cast<const char*>(points_y),
      static_cast<Py_ssize_t>(n * fql * 4),
      static_cast<Py_ssize_t>(n));
  PyObject* res = shim_call("msm", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, 2 * fql * 4);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_poseidon2(const char* field, int t, const uint32_t* inputs,
                         size_t batch, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  size_t in_bytes = batch * t * limbs * 4;
  PyObject* args = Py_BuildValue(
      "(siy#n)", field, t, reinterpret_cast<const char*>(inputs),
      static_cast<Py_ssize_t>(in_bytes), static_cast<Py_ssize_t>(batch));
  PyObject* res = shim_call("poseidon2", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, batch * limbs * 4);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_keccak256(const uint8_t* data, size_t chunk_bytes,
                         size_t batch, uint8_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(y#nn)", reinterpret_cast<const char*>(data),
      static_cast<Py_ssize_t>(chunk_bytes * batch),
      static_cast<Py_ssize_t>(chunk_bytes), static_cast<Py_ssize_t>(batch));
  PyObject* res = shim_call("keccak256", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, batch * 32);
  Py_DECREF(res);
  return rc;
}

namespace {

// Variable-size byte result: copy into (buf, *len) with capacity check.
int copy_bytes_var(PyObject* res, uint8_t* buf, size_t* len) {
  char* src = nullptr;
  Py_ssize_t n = 0;
  if (PyBytes_AsStringAndSize(res, &src, &n) != 0) {
    set_error_from_python();
    return 8;
  }
  if (static_cast<size_t>(n) > *len) {
    g_last_error = "output buffer too small";
    *len = static_cast<size_t>(n);
    return 2;
  }
  std::memcpy(buf, src, n);
  *len = static_cast<size_t>(n);
  return 0;
}

}  // namespace

int icicle_tpu_vec_op(const char* field, const char* op, const uint32_t* a,
                      const uint32_t* b, size_t n, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  size_t nbytes = n * limbs * 4;
  PyObject* args = Py_BuildValue(
      "(ssy#y#n)", field, op, reinterpret_cast<const char*>(a),
      static_cast<Py_ssize_t>(nbytes), reinterpret_cast<const char*>(b),
      static_cast<Py_ssize_t>(nbytes), static_cast<Py_ssize_t>(n));
  PyObject* res = shim_call("vec_op", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, nbytes);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_poseidon2_sponge(const char* field, int t, size_t in_words,
                                const uint32_t* inputs, size_t batch,
                                uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(siny#n)", field, t, static_cast<Py_ssize_t>(in_words),
      reinterpret_cast<const char*>(inputs),
      static_cast<Py_ssize_t>(batch * in_words * limbs * 4),
      static_cast<Py_ssize_t>(batch));
  PyObject* res = shim_call("poseidon2_sponge", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, batch * limbs * 4);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_merkle_build(const char* field, const uint32_t* leaves,
                            size_t n_leaves, uint32_t* root_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#n)", field, reinterpret_cast<const char*>(leaves),
      static_cast<Py_ssize_t>(n_leaves * limbs * 4),
      static_cast<Py_ssize_t>(n_leaves));
  PyObject* res = shim_call("merkle_build", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, root_out, limbs * 4);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_merkle_proof(const char* field, const uint32_t* leaves,
                            size_t n_leaves, uint64_t leaf_idx,
                            uint8_t* proof_out, size_t* proof_len) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#nK)", field, reinterpret_cast<const char*>(leaves),
      static_cast<Py_ssize_t>(n_leaves * limbs * 4),
      static_cast<Py_ssize_t>(n_leaves),
      static_cast<unsigned long long>(leaf_idx));
  PyObject* res = shim_call("merkle_proof", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_var(res, proof_out, proof_len);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_merkle_verify(const char* field, const uint8_t* proof,
                             size_t proof_len, int* ok_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(sy#)", field, reinterpret_cast<const char*>(proof),
      static_cast<Py_ssize_t>(proof_len));
  PyObject* res = shim_call("merkle_verify", args);
  Py_XDECREF(args);
  if (!res) return 8;
  *ok_out = static_cast<int>(PyLong_AsLong(res));
  Py_DECREF(res);
  return 0;
}

int icicle_tpu_sumcheck_prove_abc(const char* field, const uint32_t* mles,
                                  size_t n, const uint32_t* claimed_sum,
                                  uint8_t* proof_out, size_t* proof_len) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#ny#)", field, reinterpret_cast<const char*>(mles),
      static_cast<Py_ssize_t>(3 * n * limbs * 4), static_cast<Py_ssize_t>(n),
      reinterpret_cast<const char*>(claimed_sum),
      static_cast<Py_ssize_t>(limbs * 4));
  PyObject* res = shim_call("sumcheck_prove_abc", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_var(res, proof_out, proof_len);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_sumcheck_verify_abc(const char* field,
                                   const uint32_t* claimed_sum,
                                   const uint8_t* proof, size_t proof_len,
                                   int* ok_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#y#)", field, reinterpret_cast<const char*>(claimed_sum),
      static_cast<Py_ssize_t>(limbs * 4),
      reinterpret_cast<const char*>(proof),
      static_cast<Py_ssize_t>(proof_len));
  PyObject* res = shim_call("sumcheck_verify_abc", args);
  Py_XDECREF(args);
  if (!res) return 8;
  *ok_out = static_cast<int>(PyLong_AsLong(res));
  Py_DECREF(res);
  return 0;
}

int icicle_tpu_fri_prove(const char* field, const uint32_t* evals, size_t n,
                         int stopping_degree, int nof_queries, int pow_bits,
                         uint8_t* proof_out, size_t* proof_len) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#niii)", field, reinterpret_cast<const char*>(evals),
      static_cast<Py_ssize_t>(n * limbs * 4), static_cast<Py_ssize_t>(n),
      stopping_degree, nof_queries, pow_bits);
  PyObject* res = shim_call("fri_prove", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_var(res, proof_out, proof_len);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_fri_verify(const char* field, int stopping_degree,
                          int nof_queries, int pow_bits,
                          const uint8_t* proof, size_t proof_len,
                          int* ok_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(siiiy#)", field, stopping_degree, nof_queries, pow_bits,
      reinterpret_cast<const char*>(proof),
      static_cast<Py_ssize_t>(proof_len));
  PyObject* res = shim_call("fri_verify", args);
  Py_XDECREF(args);
  if (!res) return 8;
  *ok_out = static_cast<int>(PyLong_AsLong(res));
  Py_DECREF(res);
  return 0;
}

int icicle_tpu_mlkem_size(const char* category, const char* which) {
  if (!g_shim) return -1;
  Gil gil;
  PyObject* args = Py_BuildValue("(ss)", category, which);
  PyObject* res = shim_call("mlkem_size", args);
  Py_XDECREF(args);
  if (!res) return -1;
  long v = PyLong_AsLong(res);
  Py_DECREF(res);
  return static_cast<int>(v);
}

int icicle_tpu_mlkem_keygen(const char* category, const uint8_t* entropy,
                            size_t batch, uint8_t* ek_out, uint8_t* dk_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int ekb = icicle_tpu_mlkem_size(category, "ek");
  int dkb = icicle_tpu_mlkem_size(category, "dk");
  if (ekb <= 0 || dkb <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#n)", category, reinterpret_cast<const char*>(entropy),
      static_cast<Py_ssize_t>(batch * 64), static_cast<Py_ssize_t>(batch));
  PyObject* res = shim_call("mlkem_keygen", args);
  Py_XDECREF(args);
  if (!res) return 8;
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(res, &buf, &len) != 0 ||
      static_cast<size_t>(len) != batch * (ekb + dkb)) {
    set_error_from_python();
    Py_DECREF(res);
    return 8;
  }
  std::memcpy(ek_out, buf, batch * ekb);
  std::memcpy(dk_out, buf + batch * ekb, batch * dkb);
  Py_DECREF(res);
  return 0;
}

int icicle_tpu_mlkem_encaps(const char* category, const uint8_t* messages,
                            const uint8_t* public_keys, size_t batch,
                            uint8_t* ct_out, uint8_t* ss_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int ekb = icicle_tpu_mlkem_size(category, "ek");
  int ctb = icicle_tpu_mlkem_size(category, "ct");
  if (ekb <= 0 || ctb <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#y#n)", category, reinterpret_cast<const char*>(messages),
      static_cast<Py_ssize_t>(batch * 32),
      reinterpret_cast<const char*>(public_keys),
      static_cast<Py_ssize_t>(batch * ekb), static_cast<Py_ssize_t>(batch));
  PyObject* res = shim_call("mlkem_encaps", args);
  Py_XDECREF(args);
  if (!res) return 8;
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(res, &buf, &len) != 0 ||
      static_cast<size_t>(len) != batch * (ctb + 32)) {
    set_error_from_python();
    Py_DECREF(res);
    return 8;
  }
  std::memcpy(ct_out, buf, batch * ctb);
  std::memcpy(ss_out, buf + batch * ctb, batch * 32);
  Py_DECREF(res);
  return 0;
}

int icicle_tpu_mlkem_decaps(const char* category, const uint8_t* ciphertexts,
                            const uint8_t* secret_keys, size_t batch,
                            uint8_t* ss_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int dkb = icicle_tpu_mlkem_size(category, "dk");
  int ctb = icicle_tpu_mlkem_size(category, "ct");
  if (dkb <= 0 || ctb <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#y#n)", category, reinterpret_cast<const char*>(ciphertexts),
      static_cast<Py_ssize_t>(batch * ctb),
      reinterpret_cast<const char*>(secret_keys),
      static_cast<Py_ssize_t>(batch * dkb), static_cast<Py_ssize_t>(batch));
  PyObject* res = shim_call("mlkem_decaps", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, ss_out, batch * 32);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_pairing(const char* curve, const uint32_t* p,
                       const uint32_t* q, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  // base-field limb count via the shim (G1/G2 coords live in Fq)
  PyObject* largs = Py_BuildValue("(s)", curve);
  PyObject* lres = shim_call("base_limbs", largs);
  Py_DECREF(largs);
  if (!lres) return 2;
  long limbs = PyLong_AsLong(lres);
  Py_DECREF(lres);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#y#)", curve, reinterpret_cast<const char*>(p),
      static_cast<Py_ssize_t>(2 * limbs * 4),
      reinterpret_cast<const char*>(q),
      static_cast<Py_ssize_t>(4 * limbs * 4));
  PyObject* res = shim_call("pairing", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, 12 * limbs * 4);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_pow_solve(const uint8_t* challenge, size_t challenge_len,
                         int solution_bits, int* found_out,
                         uint64_t* nonce_out, uint64_t* mined_hash_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(y#i)", reinterpret_cast<const char*>(challenge),
      static_cast<Py_ssize_t>(challenge_len), solution_bits);
  PyObject* res = shim_call("pow_solve", args);
  Py_XDECREF(args);
  if (!res) return 8;
  // 1B found || 8B LE nonce || 8B LE mined hash; found=0 is a SUCCESS
  // status (reference proof_of_work semantics: cap exhaustion is not an
  // error — errors stay reserved for internal failures).
  uint8_t buf[17];
  int rc = copy_bytes_out(res, buf, 17);
  Py_DECREF(res);
  if (rc) return rc;
  uint64_t nonce = 0, mined = 0;
  std::memcpy(&nonce, buf + 1, 8);
  std::memcpy(&mined, buf + 9, 8);
  *found_out = buf[0];
  *nonce_out = nonce;
  *mined_hash_out = mined;
  return 0;
}

int icicle_tpu_pow_verify(const uint8_t* challenge, size_t challenge_len,
                          int solution_bits, uint64_t nonce, int* ok_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(y#iK)", reinterpret_cast<const char*>(challenge),
      static_cast<Py_ssize_t>(challenge_len), solution_bits,
      static_cast<unsigned long long>(nonce));
  PyObject* res = shim_call("pow_verify", args);
  Py_XDECREF(args);
  if (!res) return 8;
  *ok_out = static_cast<int>(PyLong_AsLong(res));
  Py_DECREF(res);
  return 0;
}

int icicle_tpu_lattice_decompose(const uint32_t* in, size_t n, uint32_t base,
                                 size_t nof_digits, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(y#nIn)", reinterpret_cast<const char*>(in),
      static_cast<Py_ssize_t>(n * 8), static_cast<Py_ssize_t>(n), base,
      static_cast<Py_ssize_t>(nof_digits));
  PyObject* res = shim_call("lattice_decompose", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, nof_digits * n * 8);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_lattice_recompose(const uint32_t* digits, size_t total,
                                 uint32_t base, size_t out_size,
                                 uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(y#nIn)", reinterpret_cast<const char*>(digits),
      static_cast<Py_ssize_t>(total * 8), static_cast<Py_ssize_t>(total),
      base, static_cast<Py_ssize_t>(out_size));
  PyObject* res = shim_call("lattice_recompose", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, out_size * 8);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_jl_projection(const uint32_t* in, size_t n,
                             const uint8_t* seed, size_t seed_len,
                             size_t output_size, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(y#ny#n)", reinterpret_cast<const char*>(in),
      static_cast<Py_ssize_t>(n * 8), static_cast<Py_ssize_t>(n),
      reinterpret_cast<const char*>(seed),
      static_cast<Py_ssize_t>(seed_len),
      static_cast<Py_ssize_t>(output_size));
  PyObject* res = shim_call("lattice_jl_projection", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, output_size * 8);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_norm_check(const uint32_t* in, size_t n, const char* norm,
                          uint64_t bound, int* ok_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  PyObject* args = Py_BuildValue(
      "(y#nsK)", reinterpret_cast<const char*>(in),
      static_cast<Py_ssize_t>(n * 8), static_cast<Py_ssize_t>(n), norm,
      static_cast<unsigned long long>(bound));
  PyObject* res = shim_call("lattice_norm_check", args);
  Py_XDECREF(args);
  if (!res) return 8;
  *ok_out = static_cast<int>(PyLong_AsLong(res));
  Py_DECREF(res);
  return 0;
}

int icicle_tpu_poly_mul(const char* field, const uint32_t* a, size_t na,
                        const uint32_t* b, size_t nb, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#ny#n)", field, reinterpret_cast<const char*>(a),
      static_cast<Py_ssize_t>(na * limbs * 4), static_cast<Py_ssize_t>(na),
      reinterpret_cast<const char*>(b),
      static_cast<Py_ssize_t>(nb * limbs * 4), static_cast<Py_ssize_t>(nb));
  PyObject* res = shim_call("poly_mul", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, (na + nb - 1) * limbs * 4);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_poly_eval(const char* field, const uint32_t* a, size_t na,
                         const uint32_t* x, uint32_t* out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#ny#)", field, reinterpret_cast<const char*>(a),
      static_cast<Py_ssize_t>(na * limbs * 4), static_cast<Py_ssize_t>(na),
      reinterpret_cast<const char*>(x), static_cast<Py_ssize_t>(limbs * 4));
  PyObject* res = shim_call("poly_eval", args);
  Py_XDECREF(args);
  if (!res) return 8;
  int rc = copy_bytes_out(res, out, limbs * 4);
  Py_DECREF(res);
  return rc;
}

int icicle_tpu_poly_divide(const char* field, const uint32_t* a, size_t na,
                           const uint32_t* b, size_t nb, uint32_t* q_out,
                           uint32_t* r_out) {
  if (!g_shim) {
    g_last_error = "icicle_tpu_init not called";
    return 3;
  }
  Gil gil;
  int limbs = icicle_tpu_field_limbs(field);
  if (limbs <= 0) return 2;
  PyObject* args = Py_BuildValue(
      "(sy#ny#n)", field, reinterpret_cast<const char*>(a),
      static_cast<Py_ssize_t>(na * limbs * 4), static_cast<Py_ssize_t>(na),
      reinterpret_cast<const char*>(b),
      static_cast<Py_ssize_t>(nb * limbs * 4), static_cast<Py_ssize_t>(nb));
  PyObject* res = shim_call("poly_divide", args);
  Py_XDECREF(args);
  if (!res) return 8;
  // quotient (na-nb+1) || remainder (nb-1) coefficient rows
  size_t qn = (na >= nb) ? (na - nb + 1) : 1;
  size_t rn = (nb >= 2) ? (nb - 1) : 1;
  char* buf = nullptr;
  Py_ssize_t len = 0;
  int rc = 0;
  if (PyBytes_AsStringAndSize(res, &buf, &len) != 0 ||
      static_cast<size_t>(len) != (qn + rn) * limbs * 4) {
    g_last_error = "unexpected result size";
    rc = 8;
  } else {
    std::memcpy(q_out, buf, qn * limbs * 4);
    std::memcpy(r_out, buf + qn * limbs * 4, rn * limbs * 4);
  }
  Py_DECREF(res);
  return rc;
}

}  // extern "C"

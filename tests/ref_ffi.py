"""ctypes harness over the reference C++ build (the "reference device").

Loads the ICICLE CPU backend built from /root/reference into /tmp/icicle_build
(see tools/build_reference.sh) and exposes golden-vector generators. This is
the TPU analog of the reference's main-vs-reference-device test pattern
(icicle/tests/test_base.h:22-63): our main device is the JAX implementation,
the reference device is ICICLE's own CPU backend.
"""

from __future__ import annotations

import ctypes as C
import functools
import os
import pickle
import subprocess
import sys

import numpy as np

BUILD_DIR = os.environ.get("ICICLE_REF_BUILD", "/tmp/icicle_build")

# The reference .so and an initialized jaxlib corrupt each other in-process
# (flaky SIGABRT/SIGSEGV on this image). Unless ICICLE_REF_DIRECT is set, each
# golden call runs in a fresh jax-free subprocess and ships arrays via pickle.
_DIRECT = bool(os.environ.get("ICICLE_REF_DIRECT"))


def _subprocess_call(func_name: str, args: tuple, kwargs: dict):
    payload = pickle.dumps((func_name, args, kwargs), protocol=4)
    code = (
        "import pickle, sys, os\n"
        "os.environ['ICICLE_REF_DIRECT'] = '1'\n"
        "sys.path.insert(0, %r)\n"
        "import importlib\n"
        "m = importlib.import_module('tests.ref_ffi')\n"
        "fn, a, kw = pickle.loads(sys.stdin.buffer.read())\n"
        "res = getattr(m, fn)(*a, **kw)\n"
        "sys.stdout.buffer.write(pickle.dumps(res, protocol=4))\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # keep the axon sitecustomize out of it
    env["JAX_PLATFORMS"] = ""
    proc = subprocess.run([sys.executable, "-c", code], input=payload,
                          capture_output=True, env=env, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(f"ref_ffi subprocess failed: {proc.stderr[-500:]}")
    return pickle.loads(proc.stdout)


def _isolated(fn):
    """Route the call through a jax-free subprocess unless running direct."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _DIRECT:
            return fn(*args, **kwargs)
        return _subprocess_call(fn.__name__, args, kwargs)
    return wrapper


# -- golden-vector record/replay ----------------------------------------------
# Checked-in vectors (tests/golden/) let the parity suite run on machines
# WITHOUT the 15-min reference build: every golden call is keyed by a hash of
# its arguments; hits replay from disk, misses fall through to the FFI and
# record. Test inputs are derived from the fixed ICICLE_TPU_TEST_SEED, so the
# same test bodies hash to the same keys on a fresh clone.

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _arg_key(fn_name: str, args: tuple, kwargs: dict) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(fn_name.encode())

    def feed(v):
        if isinstance(v, np.ndarray):
            h.update(b"nd%s%r" % (str(v.dtype).encode(), v.shape))
            h.update(np.ascontiguousarray(v).tobytes())
        elif isinstance(v, (bytes, bytearray)):
            h.update(b"by" + bytes(v))
        else:
            h.update(repr(v).encode())

    for a in args:
        feed(a)
    for k in sorted(kwargs):
        h.update(k.encode())
        feed(kwargs[k])
    return h.hexdigest()[:32]


def _golden(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        path = os.path.join(GOLDEN_DIR,
                            f"{fn.__name__}__{_arg_key(fn.__name__, args, kwargs)}.pkl")
        if os.path.exists(path):
            with open(path, "rb") as fh:
                return pickle.load(fh)
        if not _build_present_for(fn.__name__):
            raise RuntimeError(
                f"no golden vector for this {fn.__name__} call and no "
                f"reference build present; run tools/build_reference.sh to "
                "(re)record (did ICICLE_TPU_TEST_SEED or a test body change?)")
        out = fn(*args, **kwargs)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "wb") as fh:
            pickle.dump(out, fh, protocol=4)
        return out
    return wrapper


def _build_present(field: str = "babybear") -> bool:
    return (os.path.exists(os.path.join(BUILD_DIR, "libicicle_device.so"))
            and os.path.exists(os.path.join(BUILD_DIR, f"libicicle_field_{field}.so")))


def _bn254_build_present() -> bool:
    build = os.environ.get("ICICLE_REF_BUILD_BN254", "/tmp/icicle_build_bn254")
    return os.path.exists(os.path.join(build, "libicicle_curve_bn254.so"))


def _build_present_for(fn_name: str) -> bool:
    if fn_name.startswith("bn254_"):
        return _bn254_build_present()
    return _build_present()


def _golden_store_present() -> bool:
    return os.path.isdir(GOLDEN_DIR) and bool(os.listdir(GOLDEN_DIR))


def available(field: str = "babybear") -> bool:
    """Parity tests run if the reference build OR the recorded store exists."""
    return _build_present(field) or _golden_store_present()


def bn254_available() -> bool:
    return _bn254_build_present() or _golden_store_present()


@functools.lru_cache(maxsize=None)
def _libs(field: str = "babybear"):
    build = BUILD_DIR
    if not os.path.exists(os.path.join(build, f"libicicle_field_{field}.so")):
        alt = os.environ.get(f"ICICLE_REF_BUILD_{field.upper()}",
                             f"/tmp/icicle_build_{field}")
        if os.path.exists(os.path.join(alt, f"libicicle_field_{field}.so")):
            build = alt
    dev = C.CDLL(os.path.join(build, "libicicle_device.so"), mode=C.RTLD_GLOBAL)
    fld = C.CDLL(os.path.join(build, f"libicicle_field_{field}.so"),
                 mode=C.RTLD_GLOBAL)
    try:
        hsh = C.CDLL(os.path.join(build, "libicicle_hash.so"), mode=C.RTLD_GLOBAL)
    except OSError:
        hsh = fld
    return dev, fld, hsh


class HashConfig(C.Structure):
    _fields_ = [("stream", C.c_void_p),
                ("batch", C.c_uint64),
                ("are_inputs_on_device", C.c_bool),
                ("are_outputs_on_device", C.c_bool),
                ("is_async", C.c_bool),
                ("ext", C.c_void_p)]


class NTTInitDomainConfig(C.Structure):
    _fields_ = [("stream", C.c_void_p),
                ("is_async", C.c_bool),
                ("ext", C.c_void_p)]


def ntt_config_struct(scalar_bytes: int):
    class NTTConfig(C.Structure):
        _fields_ = [("stream", C.c_void_p),
                    ("coset_gen", C.c_uint8 * scalar_bytes),
                    ("batch_size", C.c_int),
                    ("columns_batch", C.c_bool),
                    ("ordering", C.c_int),
                    ("are_inputs_on_device", C.c_bool),
                    ("are_outputs_on_device", C.c_bool),
                    ("is_async", C.c_bool),
                    ("ext", C.c_void_p)]
    return NTTConfig


class VecOpsConfig(C.Structure):
    _fields_ = [("stream", C.c_void_p),
                ("is_a_on_device", C.c_bool),
                ("is_b_on_device", C.c_bool),
                ("is_result_on_device", C.c_bool),
                ("is_async", C.c_bool),
                ("batch_size", C.c_int),
                ("columns_batch", C.c_bool),
                ("ext", C.c_void_p)]


def _scalar_bytes(field: str) -> int:
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from icicle_tpu.fields.field import get_field
    return max(get_field(f"{field}_scalar" if field in
                         ("bn254", "bls12_377", "bls12_381", "bw6_761", "grumpkin")
                         else field).nlimbs, 1) * 4


# -- byte hashes (keccak/sha3/blake2s/blake3) ------------------------------------

@_golden
@_isolated
def byte_hash(name: str, inputs: np.ndarray, digest_bytes: int,
              field: str = "babybear") -> np.ndarray:
    """Golden digests via icicle_create_<name>(0) + icicle_hasher_hash.
    inputs: (batch, nbytes) uint8. Returns (batch, digest_bytes) uint8."""
    dev, fld, hsh = _libs(field)
    create = getattr(hsh, f"icicle_create_{name}")
    create.restype = C.c_void_p
    create.argtypes = [C.c_uint64]
    handle = create(0)
    assert handle, f"create {name} failed"
    do_hash = hsh.icicle_hasher_hash
    do_hash.restype = C.c_int
    do_hash.argtypes = [C.c_void_p, C.c_void_p, C.c_uint64, C.c_void_p, C.c_void_p]
    data = np.ascontiguousarray(inputs, dtype=np.uint8)
    batch = data.shape[0]
    cfg = HashConfig(stream=None, batch=batch, are_inputs_on_device=False,
                     are_outputs_on_device=False, is_async=False, ext=None)
    out = np.zeros((batch, digest_bytes), dtype=np.uint8)
    rc = do_hash(handle, data.ctypes.data, data.size // batch, C.byref(cfg),
                 out.ctypes.data)
    assert rc == 0, f"icicle_hasher_hash rc={rc}"
    delete = hsh.icicle_hasher_delete
    delete.argtypes = [C.c_void_p]  # without this ctypes truncates the handle
    delete(handle)
    return out


# -- poseidon / poseidon2 ------------------------------------------------------

@_golden
@_isolated
def poseidon_hash(field: str, t: int, inputs: np.ndarray,
                  domain_tag: np.ndarray | None = None) -> np.ndarray:
    """Original Poseidon via {field}_create_poseidon_hasher."""
    return poseidon2_hash(field, t, inputs, domain_tag, creator="poseidon")


@_golden
@_isolated
def poseidon2_hash(field: str, t: int, inputs: np.ndarray,
                   domain_tag: np.ndarray | None = None,
                   creator: str = "poseidon2") -> np.ndarray:
    """inputs: (batch, n_scalars_in) uint8-viewable scalar array (LE bytes).
    Returns (batch, scalar_bytes) uint8 digests."""
    dev, fld, hsh = _libs(field)
    sb = _scalar_bytes(field)
    create = getattr(fld, f"{field}_create_{creator}_hasher")
    create.restype = C.c_void_p
    create.argtypes = [C.c_uint, C.c_void_p, C.c_uint]
    tag_buf = None
    if domain_tag is not None:
        tag_buf = np.ascontiguousarray(domain_tag, dtype=np.uint8)
        assert tag_buf.size == sb
    handle = create(t, tag_buf.ctypes.data if tag_buf is not None else None, 0)
    assert handle, "create_poseidon2_hasher failed"

    do_hash = hsh.icicle_hasher_hash
    do_hash.restype = C.c_int
    do_hash.argtypes = [C.c_void_p, C.c_void_p, C.c_uint64, C.c_void_p, C.c_void_p]
    data = np.ascontiguousarray(inputs, dtype=np.uint8)
    batch = data.shape[0]
    cfg = HashConfig(stream=None, batch=batch, are_inputs_on_device=False,
                     are_outputs_on_device=False, is_async=False, ext=None)
    out = np.zeros((batch, sb), dtype=np.uint8)
    # input_len is the size of ONE hash's input; config.batch scales it
    # (cpu_poseidon2.cpp: input_size_in_scalars = size / sizeof(S) vs t)
    rc = do_hash(handle, data.ctypes.data, data.size // batch, C.byref(cfg),
                 out.ctypes.data)
    assert rc == 0, f"icicle_hasher_hash rc={rc}"
    delete = hsh.icicle_hasher_delete
    delete.argtypes = [C.c_void_p]
    delete(handle)
    return out


# -- ntt -----------------------------------------------------------------------

_domain_initialized: set = set()


@_golden
@_isolated
def ntt(field: str, inputs_u32: np.ndarray, logn_domain: int, inverse: bool = False,
        ordering: int = 0, batch: int = 1, coset_gen_le: np.ndarray | None = None
        ) -> np.ndarray:
    """inputs_u32: flat uint32 scalars (batch*size*limbs). Returns same shape."""
    dev, fld, hsh = _libs(field)
    sb = _scalar_bytes(field)
    if (field, logn_domain) not in _domain_initialized:
        get_rou = getattr(fld, f"{field}_get_root_of_unity")
        get_rou.argtypes = [C.c_uint64, C.c_void_p]
        rou = np.zeros(sb, dtype=np.uint8)
        assert get_rou(1 << logn_domain, rou.ctypes.data) == 0
        init = getattr(fld, f"{field}_ntt_init_domain")
        init.argtypes = [C.c_void_p, C.c_void_p]
        icfg = NTTInitDomainConfig(stream=None, is_async=False, ext=None)
        assert init(rou.ctypes.data, C.byref(icfg)) == 0
        _domain_initialized.add((field, logn_domain))

    NTTConfig = ntt_config_struct(sb)
    cfg = NTTConfig()
    cfg.stream = None
    one = np.zeros(sb, dtype=np.uint8)
    one[0] = 1
    src = coset_gen_le if coset_gen_le is not None else one
    for i in range(sb):
        cfg.coset_gen[i] = int(src[i])
    cfg.batch_size = batch
    cfg.columns_batch = False
    cfg.ordering = ordering
    cfg.are_inputs_on_device = False
    cfg.are_outputs_on_device = False
    cfg.is_async = False
    cfg.ext = None

    fn = getattr(fld, f"{field}_ntt")
    fn.restype = C.c_int
    fn.argtypes = [C.c_void_p, C.c_int, C.c_int, C.c_void_p, C.c_void_p]
    data = np.ascontiguousarray(inputs_u32, dtype=np.uint32)
    size = data.size // batch // (sb // 4)
    out = np.zeros_like(data)
    rc = fn(data.ctypes.data, size, 1 if inverse else 0, C.byref(cfg), out.ctypes.data)
    assert rc == 0, f"{field}_ntt rc={rc}"
    return out


# -- bn254 msm ------------------------------------------------------------------

class MSMConfigC(C.Structure):
    # mirror of include/icicle/msm.h MSMConfig (field order matters)
    _fields_ = [("stream", C.c_void_p),
                ("precompute_factor", C.c_int),
                ("c", C.c_int),
                ("bitsize", C.c_int),
                ("batch_size", C.c_int),
                ("are_points_shared_in_batch", C.c_bool),
                ("are_scalars_on_device", C.c_bool),
                ("are_scalars_montgomery_form", C.c_bool),
                ("are_points_on_device", C.c_bool),
                ("are_points_montgomery_form", C.c_bool),
                ("are_results_on_device", C.c_bool),
                ("is_async", C.c_bool),
                ("ext", C.c_void_p)]


@_golden
@_isolated
def bn254_msm(scalars_u32: np.ndarray, points_u32: np.ndarray) -> np.ndarray:
    """Golden bn254 G1 MSM. scalars (n, 8) u32 canonical; points (n, 16) u32
    affine (x||y limbs, canonical). Returns projective (3, 8) u32 result."""
    build = os.environ.get("ICICLE_REF_BUILD_BN254", "/tmp/icicle_build_bn254")
    dev = C.CDLL(os.path.join(build, "libicicle_device.so"), mode=C.RTLD_GLOBAL)
    cur = C.CDLL(os.path.join(build, "libicicle_curve_bn254.so"), mode=C.RTLD_GLOBAL)
    fn = cur.bn254_msm
    fn.restype = C.c_int
    fn.argtypes = [C.c_void_p, C.c_void_p, C.c_int, C.c_void_p, C.c_void_p]
    n = scalars_u32.shape[0]
    scal = np.ascontiguousarray(scalars_u32, dtype=np.uint32)
    pts = np.ascontiguousarray(points_u32, dtype=np.uint32)
    cfg = MSMConfigC(stream=None, precompute_factor=1, c=0, bitsize=0,
                     batch_size=1, are_points_shared_in_batch=True,
                     are_scalars_on_device=False,
                     are_scalars_montgomery_form=False,
                     are_points_on_device=False,
                     are_points_montgomery_form=False,
                     are_results_on_device=False, is_async=False, ext=None)
    out = np.zeros((3, 8), dtype=np.uint32)
    rc = fn(scal.ctypes.data, pts.ctypes.data, n, C.byref(cfg), out.ctypes.data)
    assert rc == 0, f"bn254_msm rc={rc}"
    return out


@_golden
@_isolated
def bn254_pairing(p_u32: np.ndarray, q_u32: np.ndarray) -> np.ndarray:
    """Golden bn254 optimal-ate pairing (src/pairing.cpp FFI).

    p (16,) u32 = G1 affine x||y limbs canonical; q (32,) u32 = G2 affine
    x.c0||x.c1||y.c0||y.c1. Returns the Fp12 TargetField as (96,) u32 in
    reference memory order (c0.c0.c0 .. c1.c2.c1, 8 limbs each)."""
    build = os.environ.get("ICICLE_REF_BUILD_BN254", "/tmp/icicle_build_bn254")
    dev = C.CDLL(os.path.join(build, "libicicle_device.so"), mode=C.RTLD_GLOBAL)
    cur = C.CDLL(os.path.join(build, "libicicle_curve_bn254.so"), mode=C.RTLD_GLOBAL)
    fn = cur.bn254_pairing
    fn.restype = None
    fn.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
    p = np.ascontiguousarray(p_u32, dtype=np.uint32)
    q = np.ascontiguousarray(q_u32, dtype=np.uint32)
    out = np.zeros((96,), dtype=np.uint32)
    fn(p.ctypes.data, q.ctypes.data, out.ctypes.data)
    return out


@_golden
@_isolated
def babybear_fri_proof_reserialize(blob_in: bytes) -> bytes:
    """Round a serialized FriProof<babybear> through the reference
    BinarySerializer (fri_c_api.cpp:202-232): deserialize + re-serialize.
    Byte-identical output proves layout parity."""
    dev, fld, hsh = _libs("babybear")
    des = fld.babybear_fri_proof_deserialize
    des.restype = C.c_int
    des.argtypes = [C.POINTER(C.c_void_p), C.c_char_p, C.c_size_t]
    size_fn = fld.babybear_fri_proof_get_serialized_size
    size_fn.restype = C.c_int
    size_fn.argtypes = [C.c_void_p, C.POINTER(C.c_size_t)]
    ser = fld.babybear_fri_proof_serialize
    ser.restype = C.c_int
    ser.argtypes = [C.c_void_p, C.c_char_p, C.c_size_t]

    handle = C.c_void_p()
    rc = des(C.byref(handle), blob_in, len(blob_in))
    assert rc == 0, f"deserialize rc={rc}"
    size = C.c_size_t()
    rc = size_fn(handle, C.byref(size))
    assert rc == 0, f"size rc={rc}"
    buf = C.create_string_buffer(size.value)
    rc = ser(handle, buf, size.value)
    assert rc == 0, f"serialize rc={rc}"
    return np.frombuffer(buf.raw, dtype=np.uint8)


@_golden
@_isolated
def bn254_msm_precompute_bases(points_u32: np.ndarray, c: int,
                               precompute_factor: int) -> np.ndarray:
    """Golden bn254 msm_precompute_bases (src/msm.cpp:45-56). points (n, 16)
    u32 affine canonical -> (n*factor, 16) interleaved precomputed bases."""
    build = os.environ.get("ICICLE_REF_BUILD_BN254", "/tmp/icicle_build_bn254")
    dev = C.CDLL(os.path.join(build, "libicicle_device.so"), mode=C.RTLD_GLOBAL)
    cur = C.CDLL(os.path.join(build, "libicicle_curve_bn254.so"), mode=C.RTLD_GLOBAL)
    fn = cur.bn254_msm_precompute_bases
    fn.restype = C.c_int
    fn.argtypes = [C.c_void_p, C.c_int, C.c_void_p, C.c_void_p]
    n = points_u32.shape[0]
    pts = np.ascontiguousarray(points_u32, dtype=np.uint32)
    cfg = MSMConfigC(stream=None, precompute_factor=precompute_factor, c=c,
                     bitsize=0, batch_size=1, are_points_shared_in_batch=True,
                     are_scalars_on_device=False,
                     are_scalars_montgomery_form=False,
                     are_points_on_device=False,
                     are_points_montgomery_form=False,
                     are_results_on_device=False, is_async=False, ext=None)
    out = np.zeros((n * precompute_factor, 16), dtype=np.uint32)
    rc = fn(pts.ctypes.data, n, C.byref(cfg), out.ctypes.data)
    assert rc == 0, f"precompute rc={rc}"
    return out

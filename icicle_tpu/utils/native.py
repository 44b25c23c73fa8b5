"""ctypes loader for the native host-crypto runtime (native/host_crypto.cpp).

Host transcript hashing (FRI/sumcheck Fiat-Shamir), PoW grinding and seeded
sampling expansions are latency-sensitive scalar paths; the C++ library runs
them ~100x faster than pure python. Falls back to icicle_tpu.utils.keccak_py
transparently when the .so hasn't been built (tools/build_native.sh).
"""

from __future__ import annotations

import ctypes as C
import functools
import os

_KINDS = {"keccak_256": (0, 32), "keccak_512": (1, 64),
          "sha3_256": (2, 32), "sha3_512": (3, 64),
          "shake128": (4, None), "shake256": (5, None)}

_SO = os.path.join(os.path.dirname(__file__), "libicicle_host.so")


@functools.lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO):
        # attempt an on-demand build (g++ is in the image)
        import subprocess
        script = os.path.join(os.path.dirname(__file__), "..", "..",
                              "tools", "build_native.sh")
        try:
            subprocess.run(["bash", script], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = C.CDLL(_SO)
    except OSError:
        return None
    lib.icicle_host_hash.restype = C.c_int
    lib.icicle_host_hash.argtypes = [C.c_int, C.c_char_p, C.c_size_t,
                                     C.c_void_p, C.c_size_t]
    lib.icicle_host_pow.restype = C.c_int
    lib.icicle_host_pow.argtypes = [C.c_int, C.c_char_p, C.c_size_t, C.c_int,
                                    C.c_uint32, C.c_uint64, C.c_uint64,
                                    C.POINTER(C.c_uint64), C.POINTER(C.c_uint64)]
    return lib


def available() -> bool:
    return _lib() is not None


def host_hash(kind: str, data: bytes, outlen: int | None = None) -> bytes:
    k, fixed = _KINDS[kind]
    outlen = fixed or outlen
    assert outlen
    lib = _lib()
    if lib is None:
        from icicle_tpu.utils import keccak_py
        if kind in ("keccak_256", "keccak_512", "sha3_256", "sha3_512"):
            return getattr(keccak_py, kind)(data)
        rate = 168 if kind == "shake128" else 136
        return keccak_py._sponge(data, rate, outlen, 0x1F)
    out = C.create_string_buffer(outlen)
    rc = lib.icicle_host_hash(k, data, len(data), out, outlen)
    assert rc == 0
    return out.raw


def keccak_256(data: bytes) -> bytes:
    return host_hash("keccak_256", data)


def keccak_512(data: bytes) -> bytes:
    return host_hash("keccak_512", data)


def sha3_256(data: bytes) -> bytes:
    return host_hash("sha3_256", data)


def sha3_512(data: bytes) -> bytes:
    return host_hash("sha3_512", data)


def host_pow(kind: str, challenge: bytes, solution_bits: int,
             padding: int = 24, start: int = 0,
             max_iters: int = 1 << 40) -> tuple[bool, int, int]:
    lib = _lib()
    if lib is None:
        return None  # caller falls back to the python/JAX grind
    nonce = C.c_uint64(0)
    mined = C.c_uint64(0)
    k, _ = _KINDS[kind]
    found = lib.icicle_host_pow(k, challenge, len(challenge), solution_bits,
                                padding, start, max_iters,
                                C.byref(nonce), C.byref(mined))
    return bool(found), nonce.value, mined.value

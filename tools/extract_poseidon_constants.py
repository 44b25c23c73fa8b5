"""One-time extraction of (original) Poseidon optimized constants from the
reference headers into .npz files under icicle_tpu/ops/hash/data/.

The reference stores them as raw little-endian scalar byte arrays
(include/icicle/hash/poseidon_constants/constants/<field>_poseidon.h), laid
out per width T as: RoundConstants | MDSMatrix | pre_matrix | sparse matrices
(cpu_poseidon.cpp init_default_constants:48-108). These are the public
Filecoin-spec optimized Poseidon parameters — data, not code.

Run: python tools/extract_poseidon_constants.py
"""

from __future__ import annotations

import os
import re

import numpy as np

REF = "/root/reference/icicle/include/icicle/hash/poseidon_constants/constants"
OUT = os.path.join(os.path.dirname(__file__), "..", "icicle_tpu", "ops", "hash", "data")

# header base name -> (our field name, scalar bytes)
FIELDS = {
    "babybear": ("babybear", 4),
    "koalabear": ("koalabear", 4),
    "m31": ("m31", 4),
    "stark252": ("stark252", 32),
    "bn254": ("bn254_scalar", 32),
    "bls12_377": ("bls12_377_scalar", 32),
    "bls12_381": ("bls12_381_scalar", 32),
    "bw6_761": ("bw6_761_scalar", 48),
    "grumpkin": ("grumpkin_scalar", 32),
}
# goldilocks has no poseidon1 header in the reference (poseidon2 only).

WIDTHS = [3, 5, 9, 12]


def parse_header(path: str):
    src = open(path).read()
    meta = {}
    for m in re.finditer(r"int\s+(full_rounds|half_full_rounds|partial_rounds)_(\d+)\s*=\s*(\d+)\s*;", src):
        meta.setdefault(int(m.group(2)), {})[m.group(1)] = int(m.group(3))
    arrays = {}
    for m in re.finditer(r"unsigned char\s+poseidon_constants_(\d+)\s*\[\]\s*=\s*\{([^;]*?)\};", src, re.S):
        t = int(m.group(1))
        byte_vals = [int(v, 0) for v in re.findall(r"0[xX][0-9a-fA-F]+|\d+", m.group(2))]
        arrays[t] = np.array(byte_vals, dtype=np.uint8)
    return meta, arrays


def main():
    os.makedirs(OUT, exist_ok=True)
    for base, (field_name, el_bytes) in FIELDS.items():
        path = os.path.join(REF, f"{base}_poseidon.h")
        if not os.path.exists(path):
            print(f"skip {base}: no header")
            continue
        meta, arrays = parse_header(path)
        nl = el_bytes // 4
        out = {"arities": np.array(sorted(arrays), dtype=np.int32)}
        for t, raw in sorted(arrays.items()):
            mm = meta[t]
            half = mm["half_full_rounds"]
            partial = mm["partial_rounds"]
            # bls12_381 t=3 ships fewer elements than the header's
            # partial_rounds implies (the reference CPU backend reads past the
            # array there — UB). Clamp to what the data actually contains.
            n_have = len(raw) // el_bytes
            implied = (n_have - 2 * half * t - 2 * t * t) // (2 * t)
            if implied < partial:
                print(f"WARN {base} t={t}: header partial={partial} but data "
                      f"holds {implied}; clamping")
                partial = implied
            rc_len = t * 2 * half + partial
            mds_len = t * t
            sparse_len = partial * (2 * t - 1)
            total = rc_len + 2 * mds_len + sparse_len
            els = raw.view("<u4").reshape(-1, nl)
            # some headers (babybear t=3/5) carry trailing unused elements; the
            # CPU backend reads offsets from the header round counts, i.e. a
            # prefix of the array (cpu_poseidon.cpp:97-106) — mirror that.
            assert els.shape[0] >= total, \
                f"{base} t={t}: have {els.shape[0]} elements, want >= {total}"
            o = 0
            def take(n):
                nonlocal o
                v = els[o:o + n]
                o += n
                return np.ascontiguousarray(v)
            out[f"t{t}_meta"] = np.array(
                [mm["full_rounds"], half, partial, 5], dtype=np.int64)
            out[f"t{t}_rc"] = take(rc_len)
            out[f"t{t}_mds"] = take(mds_len)
            out[f"t{t}_pre"] = take(mds_len)
            out[f"t{t}_sparse"] = take(sparse_len)
        dst = os.path.join(OUT, f"poseidon_{field_name}.npz")
        np.savez_compressed(dst, **out)
        print(f"{field_name}: widths {sorted(arrays)} -> {dst}")


if __name__ == "__main__":
    main()

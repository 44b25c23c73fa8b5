"""One-time extraction of Poseidon2 round constants from the reference headers
into .npz data files committed under icicle_tpu/ops/hash/data/.

The constants themselves are public parameters (generated per the Horizen Labs
poseidon2 parameter scripts); the reference stores them as C++ string tables
(include/icicle/hash/poseidon2_constants/constants/<field>_poseidon2.h). We
re-encode the *values* as uint32 limb arrays — data, not code.

Run: python tools/extract_poseidon2_constants.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

REF = "/root/reference/icicle/include/icicle/hash/poseidon2_constants/constants"
OUT = os.path.join(os.path.dirname(__file__), "..", "icicle_tpu", "ops", "hash", "data")

FIELDS = {
    "babybear": "babybear",
    "koalabear": "koalabear",
    "m31": "m31",
    "goldilocks": "goldilocks",
    "stark252": "stark252",
    "bn254": "bn254_scalar",
    "bls12_377": "bls12_377_scalar",
    "bls12_381": "bls12_381_scalar",
    "bw6_761": "bw6_761_scalar",
    "grumpkin": "grumpkin_scalar",
}


def parse_header(path: str) -> dict:
    src = open(path).read()
    out = {}
    for m in re.finditer(r"int\s+(full_rounds|half_full_rounds|partial_rounds|alpha)_(\d+)\s*=\s*(\d+)\s*;", src):
        out.setdefault(int(m.group(2)), {})[m.group(1)] = int(m.group(3))
    for m in re.finditer(
            r"(rounds_constants|mds_matrix|partial_matrix_diagonal)_(\d+)\s*\[\]\s*=\s*\{([^;]*?)\};",
            src, re.S):
        kind, t = m.group(1), int(m.group(2))
        vals = [int(v, 16) for v in re.findall(r'"(0x[0-9a-fA-F]+)"', m.group(3))]
        out.setdefault(t, {})[kind] = vals
    return out


def limbs(vals: list[int], nlimbs: int) -> np.ndarray:
    arr = np.zeros((len(vals), nlimbs), dtype=np.uint32)
    for i, v in enumerate(vals):
        for j in range(nlimbs):
            arr[i, j] = (v >> (32 * j)) & 0xFFFFFFFF
    return arr


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from icicle_tpu.fields.field import get_field

    os.makedirs(OUT, exist_ok=True)
    for ref_name, field_name in FIELDS.items():
        path = os.path.join(REF, f"{ref_name}_poseidon2.h")
        if not os.path.exists(path):
            print(f"skip {ref_name}: header missing")
            continue
        f = get_field(field_name)
        nlimbs = max(f.nlimbs, 1)
        data = {}
        parsed = parse_header(path)
        arities = []
        for t, tbl in sorted(parsed.items()):
            # large fields only ship t<=8 (zeroed stubs otherwise, matching the
            # reference's is_large_field gate in cpu_poseidon2.cpp)
            if not tbl.get("rounds_constants") or tbl.get("full_rounds", 0) == 0:
                continue
            arities.append(t)
            data[f"t{t}_meta"] = np.array(
                [tbl["full_rounds"], tbl["half_full_rounds"],
                 tbl["partial_rounds"], tbl.get("alpha", 5)], dtype=np.int64)
            data[f"t{t}_rc"] = limbs(tbl["rounds_constants"], nlimbs)
            data[f"t{t}_mds"] = limbs(tbl["mds_matrix"], nlimbs)
            data[f"t{t}_diag"] = limbs(tbl["partial_matrix_diagonal"], nlimbs)
            # sanity: counts must match the round structure
            fr, hf, pr = tbl["full_rounds"], tbl["half_full_rounds"], tbl["partial_rounds"]
            assert len(tbl["rounds_constants"]) == fr * t + pr, (ref_name, t)
            assert len(tbl["mds_matrix"]) == t * t
            assert len(tbl["partial_matrix_diagonal"]) == t
            for v in tbl["rounds_constants"] + tbl["mds_matrix"] + tbl["partial_matrix_diagonal"]:
                assert v < f.modulus, (ref_name, t, hex(v))
        data["arities"] = np.array(arities, dtype=np.int64)
        out_path = os.path.join(OUT, f"poseidon2_{field_name}.npz")
        np.savez_compressed(out_path, **data)
        print(f"{field_name}: arities {arities} -> {out_path}")


if __name__ == "__main__":
    main()

"""Byte-level entry points for the C ABI (native/c_api.cpp).

Counterpart of the reference's src/**_c_api.cpp marshaling layer: every
function takes/returns little-endian byte buffers so the embedding C code
never touches numpy/jax object APIs. Kept deliberately tiny — the C side
calls these via PyObject_CallFunction with bytes arguments.
"""

from __future__ import annotations

import numpy as np


def setup(platform: str | None) -> None:
    import os
    if platform == "cpu":
        # the embedding process inherits the terminal env (JAX_PLATFORMS may
        # name plugins whose registration hook never ran in this interpreter)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "0")
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    elif platform is None and "JAX_PLATFORMS" in os.environ:
        # let jax pick from the backends actually registered here
        os.environ["JAX_PLATFORMS"] = ""
    import icicle_tpu  # noqa: F401  (registers ops, enables compile cache)


def field_limbs(field: str) -> int:
    from icicle_tpu.fields.field import get_field
    return get_field(field).nlimbs


def scalar_limbs(curve: str) -> int:
    from icicle_tpu.curves.params import get_curve
    return get_curve(curve).fr.nlimbs


def base_limbs(curve: str) -> int:
    from icicle_tpu.curves.params import get_curve
    return get_curve(curve).fq.nlimbs


def ntt(field: str, data: bytes, n: int, dir: int) -> bytes:
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N
    from icicle_tpu.runtime.config import NTTConfig, NTTDir

    f = get_field(field)
    arr = np.frombuffer(data, dtype="<u4").reshape(
        (n,) if f.nlimbs == 1 else (n, f.nlimbs))
    logn = n.bit_length() - 1
    N.ntt_init_domain(f, logn)
    out = N.ntt(f, arr, NTTDir.INVERSE if dir else NTTDir.FORWARD,
                NTTConfig())
    return np.asarray(out).astype("<u4").tobytes()


def msm(curve: str, scalars: bytes, px: bytes, py: bytes, n: int) -> bytes:
    from icicle_tpu.curves.params import get_curve
    from icicle_tpu.curves.group import get_group
    from icicle_tpu.ops.msm import msm as msm_op

    c = get_curve(curve)
    s = np.frombuffer(scalars, dtype="<u4").reshape(n, c.fr.nlimbs)
    x = np.frombuffer(px, dtype="<u4").reshape(n, c.fq.nlimbs)
    y = np.frombuffer(py, dtype="<u4").reshape(n, c.fq.nlimbs)
    res = msm_op(curve, s, x, y)   # Montgomery projective
    gx, gy = get_group(curve).to_affine_canonical(res)
    out = np.concatenate([np.asarray(gx).reshape(-1),
                          np.asarray(gy).reshape(-1)])
    return out.astype("<u4").tobytes()


def poseidon2(field: str, t: int, inputs: bytes, batch: int) -> bytes:
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops.hash.poseidon2 import Poseidon2

    f = get_field(field)
    arr = np.frombuffer(inputs, dtype="<u4").reshape(batch, -1)
    out = Poseidon2(f, t).hash_fields(arr)
    return np.asarray(out).astype("<u4").tobytes()


def keccak256(data: bytes, chunk_bytes: int, batch: int) -> bytes:
    from icicle_tpu.ops.hash.keccak import Keccak256
    return Keccak256().hash_bytes(data or b"", batch=batch)


def vec_op(field: str, op: str, a: bytes, b: bytes, n: int) -> bytes:
    """Elementwise field vec_ops (reference vec_ops.h add/sub/mul FFI)."""
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import vec_ops as V

    f = get_field(field)
    shape = (n,) if f.nlimbs == 1 else (n, f.nlimbs)
    av = np.frombuffer(a, dtype="<u4").reshape(shape)
    bv = np.frombuffer(b, dtype="<u4").reshape(shape)
    fn = {"add": V.vector_add, "sub": V.vector_sub, "mul": V.vector_mul}[op]
    return np.asarray(fn(f, av, bv)).astype("<u4").tobytes()


def poseidon2_sponge(field: str, t: int, in_words: int, inputs: bytes,
                     batch: int) -> bytes:
    """Arbitrary-width Poseidon2 (sponge mode when in_words != t)."""
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops.hash.poseidon2 import Poseidon2

    f = get_field(field)
    arr = np.frombuffer(inputs, dtype="<u4").reshape(batch, in_words)
    out = Poseidon2(f, t).hash_fields(arr)
    return np.asarray(out).astype("<u4").tobytes()


def _merkle_tree(field: str, depth: int):
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops.hash.poseidon2 import Poseidon2
    from icicle_tpu.ops.merkle import MerkleTree

    f = get_field(field)
    return MerkleTree([Poseidon2(f, 2)] * depth, leaf_words=f.nlimbs), f


def merkle_build(field: str, leaves: bytes, n_leaves: int) -> bytes:
    """Poseidon2 arity-2 tree; returns the root words (merkle_tree.h FFI)."""
    depth = (n_leaves - 1).bit_length()
    tree, f = _merkle_tree(field, depth)
    arr = np.frombuffer(leaves, dtype="<u4").reshape(n_leaves, f.nlimbs)
    root = tree.build(arr)
    return np.asarray(root).astype("<u4").tobytes()


def merkle_proof(field: str, leaves: bytes, n_leaves: int,
                 leaf_idx: int) -> bytes:
    """Build + extract one pruned proof, serialized (merkle_proof.h layout)."""
    depth = (n_leaves - 1).bit_length()
    tree, f = _merkle_tree(field, depth)
    arr = np.frombuffer(leaves, dtype="<u4").reshape(n_leaves, f.nlimbs)
    tree.build(arr)
    return tree.get_merkle_proof(arr, leaf_idx, pruned=True).serialize()


def merkle_verify(field: str, proof: bytes) -> int:
    from icicle_tpu.ops.merkle import MerkleProof

    from icicle_tpu.fields.field import get_field
    f = get_field(field)
    p = MerkleProof.deserialize(proof)
    path_words = sum(seg.size for seg in p.path)
    depth = path_words // f.nlimbs        # arity-2 pruned: 1 sibling/layer
    tree, _ = _merkle_tree(field, depth)
    return int(tree.verify(p))


def sumcheck_prove_abc(field: str, mles: bytes, n: int,
                       claimed_sum: bytes) -> bytes:
    """Sumcheck with the predefined a*b-c combine over 3 MLEs of size n
    (reference sumcheck.h FFI + PreDefinedPrograms::AB_MINUS_C)."""
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops.program import PreDefined, ReturningValueProgram
    from icicle_tpu.ops.sumcheck import sumcheck_prove

    f = get_field(field)
    shape = (3, n) if f.nlimbs == 1 else (3, n, f.nlimbs)
    arr = np.frombuffer(mles, dtype="<u4").reshape(shape)
    cs = int.from_bytes(claimed_sum, "little")
    combine = ReturningValueProgram(PreDefined.AB_MINUS_C)
    proof, _ = sumcheck_prove(f, [arr[0], arr[1], arr[2]], cs, combine)
    return proof.serialize(f)


def sumcheck_verify_abc(field: str, claimed_sum: bytes, proof: bytes) -> int:
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops.sumcheck import SumcheckProof, sumcheck_verify

    f = get_field(field)
    cs = int.from_bytes(claimed_sum, "little")
    return int(sumcheck_verify(f, SumcheckProof.deserialize(f, proof), cs))


def _fri_setup(field: str, stopping_degree: int, nof_queries: int,
               pow_bits: int):
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops.fri import FriConfig, FriTranscriptConfig
    from icicle_tpu.ops.hash.keccak import Keccak256

    f = get_field(field)
    cfg = FriConfig(stopping_degree=stopping_degree, nof_queries=nof_queries,
                    pow_bits=pow_bits)
    h = Keccak256()
    return f, cfg, FriTranscriptConfig(), h


def fri_prove(field: str, evals: bytes, n: int, stopping_degree: int,
              nof_queries: int, pow_bits: int) -> bytes:
    """FRI prove over 2^k rou evaluations, keccak-256 Merkle layers
    (reference fri.h FFI; serialized in the reference proof layout)."""
    from icicle_tpu.ops.fri import fri_prove as prove

    f, cfg, tcfg, h = _fri_setup(field, stopping_degree, nof_queries,
                                 pow_bits)
    arr = np.frombuffer(evals, dtype="<u4").reshape(
        (n,) if f.nlimbs == 1 else (n, f.nlimbs))
    return prove(f, arr, cfg, tcfg, h, h).serialize(f)


def fri_verify(field: str, stopping_degree: int, nof_queries: int,
               pow_bits: int, proof: bytes) -> int:
    from icicle_tpu.ops.fri import FriProof, fri_verify as verify

    f, cfg, tcfg, h = _fri_setup(field, stopping_degree, nof_queries,
                                 pow_bits)
    try:
        p = FriProof.deserialize(f, proof)
        return int(verify(f, p, cfg, tcfg, h, h))
    except Exception:
        # Untrusted-proof boundary: bytes that parse but are internally
        # inconsistent (e.g. Merkle path length vs tree depth) must verify
        # as FALSE, not surface as an FFI error (advisor r4).
        return 0


def mlkem_size(category: str, which: str) -> int:
    """ek/dk/ct/ss byte sizes per FIPS 203 category ("512"/"768"/"1024")."""
    from icicle_tpu.ops.pqc.ml_kem import PARAMS
    p = PARAMS[category]
    return {"ek": p.ek_bytes, "dk": p.dk_bytes, "ct": p.ct_bytes,
            "ss": 32, "entropy": 64, "msg": 32}[which]


def mlkem_keygen(category: str, entropy: bytes, batch: int) -> bytes:
    """entropy: batch * 64 bytes (d||z rows). Returns ek rows || dk rows."""
    from icicle_tpu.ops.pqc.ml_kem import keygen

    ent = np.frombuffer(entropy, dtype=np.uint8).reshape(batch, 64)
    ek, dk = keygen(category, ent)
    return ek.tobytes() + dk.tobytes()


def mlkem_encaps(category: str, messages: bytes, public_keys: bytes,
                 batch: int) -> bytes:
    """messages: batch * 32 bytes. Returns ciphertext rows || secret rows."""
    from icicle_tpu.ops.pqc.ml_kem import encaps

    m = np.frombuffer(messages, dtype=np.uint8).reshape(batch, 32)
    ek = np.frombuffer(public_keys, dtype=np.uint8).reshape(batch, -1)
    ct, ss = encaps(category, m, ek)
    return ct.tobytes() + ss.tobytes()


def mlkem_decaps(category: str, ciphertexts: bytes, secret_keys: bytes,
                 batch: int) -> bytes:
    """Returns batch * 32 shared-secret bytes (implicit rejection inside)."""
    from icicle_tpu.ops.pqc.ml_kem import decaps

    ct = np.frombuffer(ciphertexts, dtype=np.uint8).reshape(batch, -1)
    dk = np.frombuffer(secret_keys, dtype=np.uint8).reshape(batch, -1)
    return decaps(category, ct, dk).tobytes()


def pairing(curve: str, p: bytes, q: bytes) -> bytes:
    """Optimal-ate e(P, Q). p: 2*L u32 (x||y); q: 4*L u32 (x0,x1,y0,y1).
    Returns the Fp12 element as 12*L u32 canonical coefficients in the flat
    Fp2[w]/(w^6-xi) basis (reference pairing.h:24-27)."""
    from icicle_tpu.curves.params import get_curve
    from icicle_tpu.curves.pairing import pairing as pair

    c = get_curve(curve)
    nl = c.fq.nlimbs
    pv = np.frombuffer(p, dtype="<u4").reshape(2, nl)
    qv = np.frombuffer(q, dtype="<u4").reshape(4, nl)

    def to_int(row):
        v = 0
        for i, w in enumerate(row):
            v |= int(w) << (32 * i)
        return v

    res = pair(curve, (to_int(pv[0]), to_int(pv[1])),
               ((to_int(qv[0]), to_int(qv[1])),
                (to_int(qv[2]), to_int(qv[3]))))
    out = np.zeros((12, nl), dtype="<u4")
    flat = [x for fp2 in res for x in fp2]
    for j, v in enumerate(flat):
        for i in range(nl):
            out[j, i] = (v >> (32 * i)) & 0xFFFFFFFF
    return out.tobytes()


def pow_solve(challenge: bytes, solution_bits: int) -> bytes:
    """Keccak-256 proof-of-work grind (reference pow.h cpu_pow). Returns
    1B found || 8B LE nonce || 8B LE mined hash. Search-cap exhaustion is
    found=0 with a SUCCESS status — the reference proof_of_work reports
    found=false the same way (advisor r4), errors stay reserved for
    genuine internal failures."""
    from icicle_tpu.ops.hash.keccak import Keccak256
    from icicle_tpu.ops.pow import proof_of_work

    found, nonce, mined = proof_of_work(Keccak256(), challenge,
                                        solution_bits)
    return (bytes([int(found)]) + int(nonce).to_bytes(8, "little")
            + int(mined).to_bytes(8, "little"))


def pow_verify(challenge: bytes, solution_bits: int, nonce: int) -> int:
    from icicle_tpu.ops.hash.keccak import Keccak256
    from icicle_tpu.ops.pow import proof_of_work_verify

    ok, _ = proof_of_work_verify(Keccak256(), challenge, solution_bits,
                                 nonce)
    return int(ok)


# -- lattice ops (reference backend/cpu/src/ring/*; babykoala Zq) -----------

def lattice_decompose(data: bytes, n: int, base: int, nof_digits: int) -> bytes:
    """(n, 2)-u32 Zq rows -> (nof_digits*n, 2) balanced digits, digit-major
    (reference cpu_decompose_balanced_digits layout)."""
    from icicle_tpu.ops.lattice import decompose_balanced, compute_nof_digits

    arr = np.frombuffer(data, dtype="<u4").reshape(n, 2)
    nof = nof_digits or compute_nof_digits(base)
    return np.asarray(decompose_balanced(arr, base, nof)).astype("<u4").tobytes()


def lattice_recompose(data: bytes, total: int, base: int,
                      out_size: int) -> bytes:
    from icicle_tpu.ops.lattice import recompose_balanced

    arr = np.frombuffer(data, dtype="<u4").reshape(total, 2)
    return np.asarray(recompose_balanced(arr, base, out_size)).astype(
        "<u4").tobytes()


def lattice_jl_projection(data: bytes, n: int, seed: bytes,
                          output_size: int) -> bytes:
    from icicle_tpu.ops.lattice import jl_projection

    arr = np.frombuffer(data, dtype="<u4").reshape(n, 2)
    return np.asarray(jl_projection(arr, seed, output_size)).astype(
        "<u4").tobytes()


def lattice_norm_check(data: bytes, n: int, norm: str, bound: int) -> int:
    from icicle_tpu.ops.lattice import check_norm_bound

    arr = np.frombuffer(data, dtype="<u4").reshape(n, 2)
    return int(check_norm_bound(arr, norm, bound))


# -- polynomial API (reference polynomials/polynomials.h via C) -------------

def _poly(field: str, coeffs: bytes, n: int):
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.polynomials.polynomial import Polynomial

    f = get_field(field)
    arr = np.frombuffer(coeffs, dtype="<u4").reshape(
        (n,) if f.nlimbs == 1 else (n, f.nlimbs))
    return f, Polynomial.from_coeffs(f, arr)


def _coeff_bytes(f, p, count: int) -> bytes:
    """First `count` coefficient rows as bytes, zero-padded if the padded
    pow2 storage is shorter."""
    arr = np.asarray(p.copy_coeffs(0, min(count, p.size))).astype("<u4")
    rows = arr.reshape(arr.shape[0], -1) if arr.ndim > 1 else \
        arr.reshape(-1, 1)
    if rows.shape[0] < count:
        rows = np.concatenate(
            [rows, np.zeros((count - rows.shape[0], rows.shape[1]),
                            dtype="<u4")])
    return rows.tobytes()


def poly_mul(field: str, a: bytes, na: int, b: bytes, nb: int) -> bytes:
    """Coefficient product, exactly na+nb-1 coefficients returned."""
    f, pa = _poly(field, a, na)
    _, pb = _poly(field, b, nb)
    return _coeff_bytes(f, pa * pb, na + nb - 1)


def poly_eval(field: str, a: bytes, na: int, x: bytes) -> bytes:
    f, pa = _poly(field, a, na)
    xv = np.frombuffer(x, dtype="<u4").reshape(
        (1,) if f.nlimbs == 1 else (1, f.nlimbs))
    res = pa.eval(xv[0] if f.nlimbs > 1 else xv)
    return np.asarray(res).astype("<u4").tobytes()


def poly_divide(field: str, a: bytes, na: int, b: bytes, nb: int) -> bytes:
    """Euclidean division: quotient (na-nb+1 coeffs) || remainder (nb-1)."""
    f, pa = _poly(field, a, na)
    _, pb = _poly(field, b, nb)
    q, r = pa.divide(pb)
    qn = na - nb + 1 if na >= nb else 1
    rn = nb - 1 if nb >= 2 else 1
    return _coeff_bytes(f, q, qn) + _coeff_bytes(f, r, rn)

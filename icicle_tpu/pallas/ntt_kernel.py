"""Pallas TPU kernel for large NTTs: fused VMEM-resident DIF stage groups.

Reference blocking strategy: the CPU backend splits logn into cached-size
sub-NTT layers (backend/cpu/include/ntt_data.h:8-60 layers_sub_logn +
ntt_task.h butterfly cores). TPU redesign: the four-step decomposition
n = n1*n2 runs each pass as ONE Pallas kernel that keeps a (TR, N) tile in
VMEM and executes ALL log2(N) radix-2 DIF stages before writing back —
instead of the XLA lowering's one-HBM-roundtrip-per-stage. Butterflies run
along the 128-lane axis via cyclic rolls + selects; per-stage twiddle
vectors are precomputed (Montgomery form) and broadcast from VMEM.

Single-limb Mont32 fields only (babybear/koalabear/m31 — the fields the
reference's NTT perf story is about); multi-limb fields use the XLA path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icicle_tpu.fields.field import Field, get_field


@functools.lru_cache(maxsize=None)
def _stage_twiddles(field_name: str, logN: int, forward: bool) -> np.ndarray:
    """(S, N) per-stage DIF twiddle vectors in Montgomery form.

    Stage s (half-block m = N >> (s+1)): bottom lane i multiplies by
    w^((i & (m-1)) << s); top lanes hold 1 (unused)."""
    f = get_field(field_name)
    p = f.modulus
    from icicle_tpu.ops.ntt import get_domain
    dom = get_domain(f, logN)
    w = dom.w_int if forward else dom.w_inv_int
    N = 1 << logN
    r = f.params.r
    out = np.zeros((logN, N), dtype=np.uint32)
    for s in range(logN):
        m = N >> (s + 1)
        j = np.arange(N, dtype=np.int64) & (m - 1)
        out[s] = np.array(
            [(pow(w, int(e) << s, p) * r) % p for e in range(m)],
            dtype=np.uint32)[j]
    return out


@functools.lru_cache(maxsize=None)
def make_dif_kernel(field_name: str, logN: int, TR: int):
    """DIF pass over the LAST axis: (rows, N) natural-order in ->
    bit-reversed out; all stages fused in VMEM. invoke(x, tw) with
    tw = (S, N) stage twiddles (Montgomery), rows % TR == 0."""
    f = get_field(field_name)
    assert f.limb_shape == (), "pallas NTT kernel serves single-limb fields"
    N = 1 << logN
    S = logN
    p_int = f.modulus
    pinv_int = int(f.params.inv32)
    MASK16 = 0xFFFF

    def kernel(tw_ref, x_ref, o_ref):
        # Mont32 ops inlined with literal constants (closure-captured device
        # arrays are rejected by pallas_call)
        p = jnp.uint32(p_int)
        pinv = jnp.uint32(pinv_int)

        def fadd(a, b):
            s_ = a + b
            return jnp.where(s_ >= p, s_ - p, s_).astype(jnp.uint32)

        def fsub(a, b):
            d = a - b
            return jnp.where(a < b, d + p, d).astype(jnp.uint32)

        def mulhilo(a, b):
            a0, a1 = a & MASK16, a >> 16
            b0, b1 = b & MASK16, b >> 16
            ll = a0 * b0
            mid = (ll >> 16) + ((a0 * b1) & MASK16) + ((a1 * b0) & MASK16)
            lo = (ll & MASK16) | (mid << 16)
            hi = a1 * b1 + (a0 * b1 >> 16) + (a1 * b0 >> 16) + (mid >> 16)
            return hi.astype(jnp.uint32), lo.astype(jnp.uint32)

        def fmul_mont(a, b):
            hi, lo = mulhilo(a, b)
            m_ = (lo * pinv).astype(jnp.uint32)
            mp_hi, _ = mulhilo(m_, p)
            t = hi + mp_hi + (lo != 0).astype(jnp.uint32)
            return jnp.where(t >= p, t - p, t).astype(jnp.uint32)

        x = x_ref[0]                      # (TR, N)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, N), 1)
        for s in range(S):
            m = N >> (s + 1)
            bit = (lane & m) != 0
            pa = pltpu.roll(x, N - m, 1)  # partner for top lanes: x[i+m]
            pb = pltpu.roll(x, m, 1)      # partner for bottom lanes: x[i-m]
            prt = jnp.where(bit, pb, pa)
            tw = jnp.broadcast_to(tw_ref[s, :][None, :], (TR, N))
            top = fadd(x, prt)
            bot = fmul_mont(fsub(prt, x), tw)
            x = jnp.where(bit, bot, top)
        o_ref[0] = x

    def invoke(x, tw):
        rows = x.shape[0]
        assert rows % TR == 0, (rows, TR)
        call = pl.pallas_call(
            kernel,
            grid=(rows // TR,),
            in_specs=[pl.BlockSpec((S, N), lambda r: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, TR, N), lambda r: (0, r, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TR, N), lambda r: (0, r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, rows, N), jnp.uint32),
        )
        return call(tw, x[None])[0]

    return invoke


@functools.lru_cache(maxsize=None)
def _mxu_tail_matrix(field_name: str, logN: int, forward: bool) -> np.ndarray:
    """(4, 128, 128) bf16-safe balanced-base-256 digit planes of M^T, where
    M[i, k] = w128^(brev7(i) * k) mod p and w128 = w^(N/128): the dense
    matrix equal to the LAST 7 DIF stages applied per 128-lane block
    (those stages form an independent plain 128-point DIF sub-NTT with the
    same twiddles in every block; DIF emits bit-reversed order, hence the
    brev7 row permutation). Returned transposed (k-major) so the kernel
    contracts x's lane axis directly. float32 container; values are
    integers in [-128, 127], exact in bf16."""
    f = get_field(field_name)
    p = f.modulus
    from icicle_tpu.ops.ntt import get_domain
    dom = get_domain(f, logN)
    w = dom.w_int if forward else dom.w_inv_int
    N = 1 << logN
    w128 = pow(w, N // 128, p)
    brev = np.zeros(128, dtype=np.int64)
    for i in range(128):
        brev[i] = int(f"{i:07b}"[::-1], 2)
    jk = (brev[:, None] * np.arange(128)[None, :]) % (128)
    # M[i, k] = w128^(brev(i)*k); exponent mod 128 is NOT valid (order of
    # w128 is 128, so it is) — w128^128 == 1
    M = np.zeros((128, 128), dtype=np.int64)
    pw = [pow(w128, e, p) for e in range(128)]
    for i in range(128):
        for k in range(128):
            M[i, k] = pw[int(jk[i, k])]
    # balanced base-256 digits of each entry (4 digits, each in [-128,127])
    digs = np.zeros((4, 128, 128), dtype=np.float32)
    v = M.copy()
    carry = np.zeros_like(v)
    for b in range(4):
        byte = (v & 0xFF) + carry
        carry = (byte >= 128).astype(np.int64)
        d = byte - (carry << 8)
        digs[b] = d.astype(np.float32)
        v >>= 8
    assert np.all((v + carry) == 0), "entry overflowed 4 balanced digits"
    # transpose each plane: kernel computes x (R, k) . MT (k, i)
    return np.ascontiguousarray(np.transpose(digs, (0, 2, 1)))


@functools.lru_cache(maxsize=None)
def make_dif_kernel_mxu(field_name: str, logN: int, TR: int,
                        pre_mul: bool = False):
    """DIF pass with an MXU radix-128 epilogue: the first logN-7 stages run
    as VPU butterflies with vreg-granular (>=128-lane) rolls; the last 7
    stages — whose rolls rotate WITHIN vregs and dominated the measured
    kernel time (tools/ntt_stage_split_probe.py) — are replaced by a dense
    per-128-block matmul against the precomputed sub-NTT matrix in
    balanced-base-256 digit planes on the MXU (bf16 x bf16 -> f32 dots are
    exact: |digits| <= 128, block sums < 2^24). Same I/O contract as
    make_dif_kernel. Single-limb Mont32 fields, logN >= 7.

    pre_mul=True streams one extra (rows, N) Montgomery-form factor and
    multiplies it in during load — the four-step folds its inter-pass
    twiddle matrix into the second kernel this way, removing a whole HBM
    round trip."""
    f = get_field(field_name)
    assert f.limb_shape == (), "pallas NTT kernel serves single-limb fields"
    assert logN >= 7
    N = 1 << logN
    NB = N // 128
    S = logN
    S_vpu = logN - 7
    p_int = f.modulus
    assert p_int < (1 << 31)
    pinv_int = int(f.params.inv32)
    r_mod = f.params.r % p_int
    # c_t = 2^(16t) * R mod p: fmul_mont(q, c_t) == q * 2^(16t) mod p
    c_consts = [(1 << (16 * t)) * r_mod % p_int for t in (1, 2, 3)]
    MASK16 = 0xFFFF

    def kernel(tw_ref, mt_ref, x_ref, *rest):
        if pre_mul:
            ft_ref, o_ref = rest
        else:
            (o_ref,) = rest
        p = jnp.uint32(p_int)
        pinv = jnp.uint32(pinv_int)

        def fadd(a, b):
            s_ = a + b
            return jnp.where(s_ >= p, s_ - p, s_).astype(jnp.uint32)

        def fsub(a, b):
            d = a - b
            return jnp.where(a < b, d + p, d).astype(jnp.uint32)

        def mulhilo(a, b):
            a0, a1 = a & MASK16, a >> 16
            b0, b1 = b & MASK16, b >> 16
            ll = a0 * b0
            mid = (ll >> 16) + ((a0 * b1) & MASK16) + ((a1 * b0) & MASK16)
            lo = (ll & MASK16) | (mid << 16)
            hi = a1 * b1 + (a0 * b1 >> 16) + (a1 * b0 >> 16) + (mid >> 16)
            return hi.astype(jnp.uint32), lo.astype(jnp.uint32)

        def fmul_mont(a, b):
            hi, lo = mulhilo(a, b)
            m_ = (lo * pinv).astype(jnp.uint32)
            mp_hi, _ = mulhilo(m_, p)
            t = hi + mp_hi + (lo != 0).astype(jnp.uint32)
            return jnp.where(t >= p, t - p, t).astype(jnp.uint32)

        xb = x_ref[0].reshape(TR, NB, 128)
        if pre_mul:
            # fold the inter-pass twiddle multiply into the load
            xb = fmul_mont(xb, ft_ref[0].reshape(TR, NB, 128))
        blk = jax.lax.broadcasted_iota(jnp.int32, (TR, NB, 128), 1)
        for s in range(S_vpu):
            m = N >> (s + 1)
            mb = m // 128
            bit = (blk & mb) != 0
            pa = pltpu.roll(xb, NB - mb, 1)      # partner for top: x[i+m]
            pb = pltpu.roll(xb, mb, 1)           # partner for bottom: x[i-m]
            prt = jnp.where(bit, pb, pa)
            tw = jnp.broadcast_to(tw_ref[s, :].reshape(1, NB, 128),
                                  (TR, NB, 128))
            top = fadd(xb, prt)
            bot = fmul_mont(fsub(prt, xb), tw)
            xb = jnp.where(bit, bot, top)

        # --- MXU radix-128 epilogue ---
        xf = xb.reshape(TR * NB, 128)
        # balanced base-256 digits of x (plain, < p < 2^31): 4 bf16 planes
        xd = []
        carry = jnp.zeros_like(xf)
        for b in range(4):
            byte = ((xf >> (8 * b)) & jnp.uint32(0xFF)) + carry
            carry = (byte >= 128).astype(jnp.uint32)
            d = byte.astype(jnp.int32) - (carry << 8).astype(jnp.int32)
            xd.append(d.astype(jnp.bfloat16))
        # P_s = sum_{b1+b2=s} xd[b1] . MT[b2]   (f32 accumulation, exact)
        planes = [None] * 7
        for b1 in range(4):
            for b2 in range(4):
                dmat = jax.lax.dot_general(
                    xd[b1], mt_ref[b2].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s_ = b1 + b2
                planes[s_] = dmat if planes[s_] is None else planes[s_] + dmat
        pi = [pl_.astype(jnp.int32) for pl_ in planes]
        # Q_t = P_{2t} + 256*P_{2t+1}, |Q| < 2^30 < p: one select to [0, p)
        y = None
        pi.append(jnp.zeros_like(pi[0]))  # P_7 = 0 pairs with P_6
        for t in range(4):
            q = pi[2 * t] + pi[2 * t + 1] * 256
            qm = jnp.where(q < 0, q + jnp.int32(p_int), q).astype(jnp.uint32)
            qm = jnp.where(qm >= p, qm - p, qm)
            if t == 0:
                y = qm
            else:
                y = fadd(y, fmul_mont(qm, jnp.uint32(c_consts[t - 1])))
        o_ref[0] = y.reshape(TR, N)

    def invoke(x, tw, mt, ft=None):
        rows = x.shape[0]
        assert rows % TR == 0, (rows, TR)
        specs = [pl.BlockSpec((S, N), lambda r: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((4, 128, 128), lambda r: (0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, TR, N), lambda r: (0, r, 0),
                              memory_space=pltpu.VMEM)]
        args = [tw, mt, x[None]]
        if pre_mul:
            assert ft is not None
            specs.append(pl.BlockSpec((1, TR, N), lambda r: (0, r, 0),
                                      memory_space=pltpu.VMEM))
            args.append(ft[None])
        call = pl.pallas_call(
            kernel,
            grid=(rows // TR,),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, TR, N), lambda r: (0, r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, rows, N), jnp.uint32),
        )
        return call(*args)[0]

    return invoke


def ntt_four_step_pallas(f: Field, x, dir, fs_tw=None):
    """Four-step NTT with Pallas DIF passes (natural in/out, single vector).

    x: (n,) canonical; returns (n,) canonical. `fs_tw` is the (n1, n2)
    inter-pass twiddle matrix (pass as a jit argument at large n)."""
    from icicle_tpu.ops.ntt import get_domain, NTTDir
    from icicle_tpu.ops.vec_ops import bit_reverse_indices
    from icicle_tpu.parallel import ntt_sharded as _ns

    n = x.shape[0]
    logn = n.bit_length() - 1
    log_n1 = logn // 2
    log_n2 = logn - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    fwd = dir == NTTDir.FORWARD
    dom = get_domain(f, logn)
    if fs_tw is None:
        fs_tw = _ns._twiddle_matrix(f, n1, n2, dir)

    twA = jnp.asarray(_stage_twiddles(f.name, log_n1, fwd))
    twB = jnp.asarray(_stage_twiddles(f.name, log_n2, fwd))
    rev1 = jnp.asarray(bit_reverse_indices(n1))
    rev2 = jnp.asarray(bit_reverse_indices(n2))

    def pick_tr(rows, N):
        # ~1MB blocks: the kernel keeps ~7 (TR, N) temps live plus double-
        # buffered in/out blocks inside the 16MB VMEM budget
        budget = (1 << 20) // (N * 4)
        tr = max(8, min(rows, budget))
        while rows % tr:
            tr //= 2
        return tr

    # MXU radix-128 epilogue variant when the pass is big enough (the last
    # 7 stages' intra-vreg lane rotates dominate the plain kernel; see
    # make_dif_kernel_mxu). ICICLE_TPU_NTT_MXU=0 falls back.
    import os as _os
    use_mxu = (_os.environ.get("ICICLE_TPU_NTT_MXU", "1") != "0")

    def make(logN, tr, pre_mul=False):
        if use_mxu and logN >= 9:
            k = make_dif_kernel_mxu(f.name, logN, tr, pre_mul)
            mt = jnp.asarray(_mxu_tail_matrix(f.name, logN, fwd))
            if pre_mul:
                return lambda v, tw, ft: k(v, tw, mt, ft)
            return lambda v, tw: k(v, tw, mt)
        assert not pre_mul
        return make_dif_kernel(f.name, logN, tr)

    kA = make(log_n1, pick_tr(n2, n1))
    fold_tw = use_mxu and log_n2 >= 9
    kB = make(log_n2, pick_tr(n1, n2), pre_mul=fold_tw)

    a = x.reshape(n1, n2).T               # (n2, n1): rows i2
    a = kA(a, twA)                        # [i2, bitrev(k1)]
    a = a.T                               # (n1, n2): rows bitrev(k1)
    a = jnp.take(a, rev1, axis=0)         # [k1, i2]
    if fold_tw:
        # inter-pass twiddle multiply folded into kernelB's load (one
        # fewer HBM round trip; make_dif_kernel_mxu pre_mul)
        a = kB(a, twB, fs_tw)             # [k1, bitrev(k2)]
    else:
        a = f.engine.mul_mont(a, fs_tw)   # inter-pass twiddles
        a = kB(a, twB)                    # [k1, bitrev(k2)]
    a = a.T                               # (n2, n1): rows bitrev(k2)
    a = jnp.take(a, rev2, axis=0)         # [k2, k1]
    out = a.reshape(n)                    # flat p = n1*k2 + k1: natural
    if not fwd:
        out = f.engine.mul_mont(out, dom.n_inv_mont)
    return out

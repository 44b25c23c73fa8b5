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

    kA = make_dif_kernel(f.name, log_n1, pick_tr(n2, n1))
    kB = make_dif_kernel(f.name, log_n2, pick_tr(n1, n2))

    a = x.reshape(n1, n2).T               # (n2, n1): rows i2
    a = kA(a, twA)                        # [i2, bitrev(k1)]
    a = a.T                               # (n1, n2): rows bitrev(k1)
    a = jnp.take(a, rev1, axis=0)         # [k1, i2]
    a = f.engine.mul_mont(a, fs_tw)       # inter-pass twiddles
    a = kB(a, twB)                        # [k1, bitrev(k2)]
    a = a.T                               # (n2, n1): rows bitrev(k2)
    a = jnp.take(a, rev2, axis=0)         # [k2, k1]
    out = a.reshape(n)                    # flat p = n1*k2 + k1: natural
    if not fwd:
        out = f.engine.mul_mont(out, dom.n_inv_mont)
    return out

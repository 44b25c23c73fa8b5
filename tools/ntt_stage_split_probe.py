"""Which DIF stages cost what: time kernel variants running only the FIRST
k stages (stride >= N/2^k) of the fused pass at the headline shape.

If the high-stride stages (vreg-granular rolls) are cheap and the last 7
(intra-vreg lane rotates, stride < 128) dominate, an MXU radix-128
epilogue (dense 128x128 byte-plane matmul) is the right replacement —
this probe decides that before any kernel surgery.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ntt_stage_split_probe.py
"""

import time

import numpy as np


def make_partial_kernel(field_name, logN, TR, n_stages):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from icicle_tpu.fields.field import get_field

    f = get_field(field_name)
    N = 1 << logN
    S = logN
    p_int = f.modulus
    pinv_int = int(f.params.inv32)
    MASK16 = 0xFFFF

    def kernel(tw_ref, x_ref, o_ref):
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

        x = x_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, N), 1)
        for s in range(n_stages):
            m = N >> (s + 1)
            bit = (lane & m) != 0
            pa = pltpu.roll(x, N - m, 1)
            pb = pltpu.roll(x, m, 1)
            prt = jnp.where(bit, pb, pa)
            tw = jnp.broadcast_to(tw_ref[s, :][None, :], (TR, N))
            top = fadd(x, prt)
            bot = fmul_mont(fsub(prt, x), tw)
            x = jnp.where(bit, bot, top)
        o_ref[0] = x

    def invoke(x, tw):
        rows = x.shape[0]
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


def main():
    import jax
    import jax.numpy as jnp
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N_
    from icicle_tpu.pallas.ntt_kernel import _stage_twiddles

    logN = 13
    rows = 1 << 13
    TR = 32
    f = get_field("babybear")
    N_.ntt_init_domain(f, 26)
    tw = jnp.asarray(_stage_twiddles("babybear", logN, True))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, f.modulus,
                                 size=(rows, 1 << logN), dtype=np.uint32))

    for k in (0, 6, 9, 13):
        fn = make_partial_kernel("babybear", logN, TR, k)
        y = jax.block_until_ready(fn(x, tw))
        t0 = time.perf_counter()
        for _ in range(5):
            y = fn(x, tw)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / 5
        print(f"first {k:2d} stages: {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

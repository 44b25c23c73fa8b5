"""Per-stage wall-clock breakdown of the v3 MSM pipeline at a given size.

Reference analog: the CPU backend's MEASURE_MSM_TIMES phase timers
(backend/cpu/src/curve/cpu_msm.hpp:31). Each v3 stage runs as its own jit
with synthetic inputs at the exact shapes the real pipeline would use, so
the montmul-heavy stages (whose timing is data-independent) can be
attributed individually:

  sort      key packing + lax.sort        (wg, tiles, T)
  permute   one-hot MXU point routing     chunked scan
  scan      Pallas prefix-scan kernel     grid (C/G, K), 13 montmuls/slot
  extract   one-hot MXU prefix extraction chunked scan (M-blocks)
  reduce    cross-tile ec_reduce kernel   grid (wg*M/G, tiles)

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/msm_stage_probe.py
Env: PROBE_LOGN (default 20), PROBE_C, PROBE_T, PROBE_WG (default: _plan3).
"""

import os
import time

import numpy as np


def _t(fn, *args, iters=3, label=""):
    import jax
    y = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>10}: {dt * 1e3:8.1f} ms", flush=True)
    return dt


def main() -> None:
    logn = int(os.environ.get("PROBE_LOGN", "20"))
    n = 1 << logn

    import jax
    import jax.numpy as jnp
    from icicle_tpu.curves.params import get_curve
    from icicle_tpu.ops.msm_tpu3 import _plan3
    from icicle_tpu.pallas.msm_scan import make_prefix_scan
    from icicle_tpu.pallas.ec_reduce import make_ec_reduce

    curve = get_curve("bn254")
    nl = curve.fq.nlimbs
    nbits = curve.fr.modulus.bit_length()
    c = int(os.environ.get("PROBE_C", "0")) or None
    T = int(os.environ.get("PROBE_T", "0")) or None
    wg = int(os.environ.get("PROBE_WG", "0")) or None
    c, M, T, tiles, n_windows, wg = _plan3(n, c, nbits, T, wg)
    C = wg * tiles
    b = max(1, 1024 // wg)
    B_g = min(tiles, 1 << (b.bit_length() - 1))
    G = wg * B_g
    ng = C // G
    K = T
    oh_budget = 2 << 30
    B_p = max(1, min(B_g, oh_budget // (wg * K * T)))
    B_p = 1 << (B_p.bit_length() - 1)
    G_p = wg * B_p
    ng_p = tiles // B_p
    MB = max(1, min(M, oh_budget // (G * K)))
    MB = 1 << (MB.bit_length() - 1)
    print(f"logn={logn} c={c} M={M} T={T} tiles={tiles} W={n_windows} "
          f"wg={wg} C={C} G={G} B_p={B_p} MB={MB}")

    rng = np.random.default_rng(0)

    # ---- sort ----
    digits = jnp.asarray(rng.integers(-(M - 1), M, size=(wg, tiles, T),
                                      dtype=np.int32))
    iota_t = jnp.arange(T, dtype=jnp.uint32)

    @jax.jit
    def sort_stage(dg):
        key = jnp.abs(dg).astype(jnp.uint32)
        neg = (dg < 0).astype(jnp.uint32)
        pack = ((jnp.uint32(M) - key) << 14) | (neg << 13) | iota_t[None, None]
        return jax.lax.sort([pack], dimension=2, num_keys=1)[0]

    _t(sort_stage, digits, label="sort")

    # ---- permute (one-hot route) ----
    pts_u8 = jnp.asarray(rng.integers(0, 128, size=(tiles, T, 8 * nl),
                                      dtype=np.int8))
    sidx = jnp.asarray(rng.integers(0, T, size=(tiles, wg, K),
                                    dtype=np.int32))

    @jax.jit
    def permute_stage(si, pb):
        def chunk(_, args):
            s, p = args
            oh = (s.reshape(-1, wg * K)[:, :, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
                  ).astype(jnp.int8)
            out = jax.lax.dot_general(
                oh, p, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            return None, out

        _, o = jax.lax.scan(chunk, None,
                            (si.reshape(ng_p, B_p, wg, K),
                             pb.reshape(ng_p, B_p, T, 8 * nl)))
        return o

    _t(permute_stage, sidx, pts_u8, label="permute")

    # ---- Pallas prefix-scan kernel ----
    scan = make_prefix_scan("bn254", K, C, G)
    plimbs = jnp.asarray(rng.integers(0, 2**32, size=(ng, K, 2 * nl, G),
                                      dtype=np.uint64).astype(np.uint32))
    scan_j = jax.jit(scan)
    _t(scan_j, plimbs, iters=1, label="scan")

    # ---- extraction (one-hot over E-stream bytes, M-blocks) ----
    estream = jnp.asarray(rng.integers(0, 2**32, size=(ng, K, 3 * nl, G),
                                       dtype=np.uint64).astype(np.uint32))
    skey = jnp.asarray(rng.integers(0, M, size=(ng, G, K), dtype=np.int32))

    @jax.jit
    def extract_stage(sk_all, es_all):
        def chunk(_, args):
            sk, es = args
            eb = jnp.stack([(es >> (8 * i)).astype(jnp.uint8).astype(jnp.int8)
                            for i in range(4)], axis=-2)
            eb = eb.reshape(K, 12 * nl, G)
            eb = jnp.transpose(eb, (2, 0, 1))

            def mblock(_, j):
                ids = (jnp.int32(M) - j * MB -
                       jax.lax.broadcasted_iota(jnp.int32, (1, 1, MB), 2))
                oh = (sk[:, :, None] == ids).astype(jnp.int8)
                out = jax.lax.dot_general(
                    oh, eb, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
                return None, out

            if M > MB:
                _, o = jax.lax.scan(mblock, None,
                                    jnp.arange(M // MB, dtype=jnp.int32))
            else:
                o = mblock(None, jnp.int32(0))[1]
            return None, o

        _, out = jax.lax.scan(chunk, None, (sk_all, es_all))
        return out

    _t(extract_stage, skey, estream, label="extract")

    # ---- cross-tile ec_reduce ----
    reduce_tiles = make_ec_reduce("bn254", tiles, wg * M)
    buckets = jnp.asarray(rng.integers(
        0, 2**32, size=(tiles, 3 * nl, wg * M),
        dtype=np.uint64).astype(np.uint32))
    _t(jax.jit(reduce_tiles), buckets, iters=1, label="reduce")

    total_groups = -(-n_windows // wg)
    print(f"(stages above are PER WINDOW-GROUP; x{total_groups} groups "
          f"+ digits/final for the full MSM)")


if __name__ == "__main__":
    main()

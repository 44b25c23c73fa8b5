"""Per-stage wall-clock breakdown of the four-step Pallas NTT at 2^BENCH.

The headline sits at ~55% of the 61 G butterflies/s issue-rate SOL
(docs/performance.md); the named suspects are inter-pass HBM round trips
and the bit-reversal row gathers. This probe times each stage of
pallas/ntt_kernel.ntt_four_step_pallas in isolation at the exact shapes
the real pipeline uses, and prints bytes-moved so each stage can be
compared against HBM bandwidth directly (VERDICT r4 ask #4: either close
the gap or prove it is bandwidth).

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/ntt_stage_probe.py
Env: PROBE_LOGN (default 26).
"""

import os
import time

import numpy as np


def _t(fn, *args, iters=5, label="", bytes_moved=0):
    import jax
    y = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    bw = bytes_moved / dt / 1e9 if bytes_moved else 0
    print(f"{label:>22}: {dt * 1e3:8.2f} ms"
          + (f"  ({bw:6.0f} GB/s apparent)" if bw else ""), flush=True)
    return y, dt


def main() -> None:
    logn = int(os.environ.get("PROBE_LOGN", "26"))
    n = 1 << logn

    import jax
    import jax.numpy as jnp
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N
    from icicle_tpu.ops.vec_ops import bit_reverse_indices
    from icicle_tpu.pallas.ntt_kernel import make_dif_kernel, _stage_twiddles
    from icicle_tpu.parallel import ntt_sharded as _ns
    from icicle_tpu.runtime.config import NTTDir

    f = get_field("babybear")
    N.ntt_init_domain(f, logn)
    log_n1 = logn // 2
    log_n2 = logn - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    print(f"logn={logn} n1={n1} n2={n2}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, f.modulus, size=(n,), dtype=np.uint32))
    fs_tw = _ns._twiddle_matrix(f, n1, n2, NTTDir.FORWARD)
    twA = jnp.asarray(_stage_twiddles(f.name, log_n1, True))
    twB = jnp.asarray(_stage_twiddles(f.name, log_n2, True))
    rev1 = jnp.asarray(bit_reverse_indices(n1))
    rev2 = jnp.asarray(bit_reverse_indices(n2))

    def pick_tr(rows, cols):
        budget = (1 << 20) // (cols * 4)
        tr = max(8, min(rows, budget))
        while rows % tr:
            tr //= 2
        return tr

    kA = make_dif_kernel(f.name, log_n1, pick_tr(n2, n1))
    kB = make_dif_kernel(f.name, log_n2, pick_tr(n1, n2))

    nbytes = n * 4
    a0 = jnp.reshape(x, (n1, n2))
    t1, _ = _t(jax.jit(lambda v: jnp.transpose(v)), a0, label="transpose1",
               bytes_moved=2 * nbytes)
    a1, _ = _t(jax.jit(lambda v: kA(v, twA)), t1, label="kernelA",
               bytes_moved=2 * nbytes)
    t2, _ = _t(jax.jit(lambda v: jnp.transpose(v)), a1, label="transpose2",
               bytes_moved=2 * nbytes)
    g1, _ = _t(jax.jit(lambda v: jnp.take(v, rev1, axis=0)), t2,
               label="rev1 row-take", bytes_moved=2 * nbytes)
    m1, _ = _t(jax.jit(lambda v, t: f.engine.mul_mont(v, t)), g1, fs_tw,
               label="inter-pass twiddle", bytes_moved=3 * nbytes)
    a2, _ = _t(jax.jit(lambda v: kB(v, twB)), m1, label="kernelB",
               bytes_moved=2 * nbytes)
    t3, _ = _t(jax.jit(lambda v: jnp.transpose(v)), a2, label="transpose3",
               bytes_moved=2 * nbytes)
    _t(jax.jit(lambda v: jnp.take(v, rev2, axis=0)), t3,
       label="rev2 row-take", bytes_moved=2 * nbytes)

    # fused composition timing (what the real jitted four-step achieves
    # after XLA fusion of the non-kernel glue). fs_tw must be an ARGUMENT:
    # closure-captured large constants blow the remote-compile request
    # (HTTP 413) — see the verify notes.
    def full(v, tw):
        from icicle_tpu.pallas.ntt_kernel import ntt_four_step_pallas
        return ntt_four_step_pallas(f, v, NTTDir.FORWARD, tw)

    _, dt = _t(jax.jit(full), x, fs_tw, label="full four-step")
    bf = logn * (n // 2)
    print(f"{'':>22}  = {bf / dt / 1e9:.1f} G butterflies/s", flush=True)


if __name__ == "__main__":
    main()

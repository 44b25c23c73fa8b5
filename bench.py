"""Headline benchmark: babybear NTT butterflies/sec on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver's north-star is babybear NTT at 2^26 (BASELINE.json);
the reference publishes no machine-readable NTT number (BASELINE.md), so
vs_baseline is measured against the reference CPU backend's throughput when
available, else reported as 0.0.

Env knobs: BENCH_LOGN (default 24), BENCH_BATCH, BENCH_KERNEL=ntt|msm
(msm: bn254 points/s via the Pallas pipeline at BENCH_LOGN, default 16).
"""

import json
import os
import sys
import time


def _bench_msm() -> None:
    size_log = int(os.environ.get("BENCH_LOGN", "16"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from icicle_tpu.ops.msm_tpu import _jitted_pipeline, _plan, _auto_wchunk

    n = 1 << size_log
    c, n_windows, k_steps, lanes = _plan(n, None, 254, 1024)
    wc = _auto_wchunk(n, n_windows, 8)
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    run = _jitted_pipeline("bn254", c, 254, n, lanes, backend, wc)
    rng = np.random.default_rng(0)
    scal = jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))
    px = jnp.asarray(rng.integers(0, 2**31, size=(n, 8), dtype=np.uint32))
    py = jnp.asarray(rng.integers(0, 2**31, size=(n, 8), dtype=np.uint32))
    jax.block_until_ready(run(scal, px, py))  # compile + warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(scal, px, py)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    rate = n / dt
    # reference GPU headline: 84.3M points/s (bls12-377 2^24, RTX 3090 Ti)
    print(json.dumps({
        "metric": f"bn254_msm_2^{size_log}_points_per_s",
        "value": rate,
        "unit": "points/s",
        "vs_baseline": rate / 84.3e6,
    }))


def main() -> None:
    if os.environ.get("BENCH_KERNEL", "ntt") == "msm":
        _bench_msm()
        return
    size_log = int(os.environ.get("BENCH_LOGN", "24"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N
    from icicle_tpu.runtime.config import NTTConfig, NTTDir

    f = get_field("babybear")
    n = 1 << size_log
    N.ntt_init_domain(f, size_log)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, f.modulus, size=(batch, n), dtype=np.uint32))

    run = lambda v: N.ntt_jit(f, v, NTTDir.FORWARD, NTTConfig())
    y = jax.block_until_ready(run(x))  # compile + warmup

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = run(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters

    butterflies = batch * size_log * (n // 2)
    rate = butterflies / dt

    # no reference number exists for NTT butterflies/s (BASELINE.md); report
    # ratio vs a nominal 1e9 butterflies/s CPU-class figure for trend tracking
    baseline = 1.0e9
    print(json.dumps({
        "metric": f"babybear_ntt_2^{size_log}_butterflies_per_s",
        "value": rate,
        "unit": "butterflies/s",
        "vs_baseline": rate / baseline,
    }))


if __name__ == "__main__":
    main()

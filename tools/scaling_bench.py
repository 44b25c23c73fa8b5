"""Scaling-efficiency harness: ops/s for the sharded kernels at 1/2/4/8+
devices (BASELINE.json config 5: >= 80% linear scaling 1 -> 4 hosts).

Runs sharded babybear NTT and sharded bn254 MSM over meshes of increasing
size and reports throughput + efficiency vs the 1-device run. On real
multi-chip hardware this measures true ICI scaling; on a single host with
XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT virtual devices it validates the
sharded paths end-to-end and measures collective/overhead costs only (all
virtual devices share the host's cores — efficiencies are not hardware
numbers there, and the report says so).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/scaling_bench.py [--ntt-logn 18] [--msm-logn 14]
Writes SCALING.json next to the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def bench_ntt(mesh, logn: int, iters: int = 3) -> float:
    import jax
    import jax.numpy as jnp
    from icicle_tpu.fields.field import get_field
    from icicle_tpu.ops import ntt as N
    from icicle_tpu.parallel.ntt_sharded import ntt_sharded
    from icicle_tpu.runtime.config import NTTDir

    f = get_field("babybear")
    # materialize all twiddle domains OUTSIDE any mesh context: tables built
    # while tracing a shard_map capture that mesh's aval and poison reuse
    # under a different mesh size
    N.ntt_init_domain(f, logn)
    for sub in range(1, logn):
        N.get_domain(f, sub)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, f.modulus, size=(1 << logn,),
                                 dtype=np.uint32))
    run = jax.jit(lambda v: ntt_sharded(f, v, mesh, NTTDir.FORWARD))
    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = run(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    butterflies = logn * (1 << logn) // 2
    return butterflies / dt


def bench_msm(mesh, logn: int, iters: int = 1, pipeline: str = "v1") -> float:
    from icicle_tpu.parallel.msm_sharded import msm_sharded, msm_sharded3

    n = 1 << logn
    rng = np.random.default_rng(0)
    scal = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    px = rng.integers(0, 2**31, size=(n, 8), dtype=np.uint32)
    py = rng.integers(0, 2**31, size=(n, 8), dtype=np.uint32)
    import jax
    backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if pipeline == "v3":
        run = lambda: msm_sharded3("bn254", scal, px, py, mesh,
                                   backend=backend)
    else:
        run = lambda: msm_sharded("bn254", scal, px, py, mesh)
    run()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    return n / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntt-logn", type=int, default=18)
    ap.add_argument("--msm-logn", type=int, default=14)
    ap.add_argument("--msm-pipeline", choices=("v1", "v3"), default="v1",
                    help="v3 = prefix-scan engine (pallas on TPU meshes)")
    ap.add_argument("--skip-msm", action="store_true")
    args = ap.parse_args()

    import jax
    from icicle_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= len(devs)]
    virtual = len({getattr(d, "process_index", 0) for d in devs}) <= 1 \
        and devs[0].platform == "cpu"

    report = {
        "devices": len(devs),
        "platform": devs[0].platform,
        "virtual_single_host": bool(virtual),
        "note": ("virtual CPU mesh: validates sharded paths + collective "
                 "overheads; not a hardware scaling number"
                 if virtual else "hardware mesh"),
        "ntt": {}, "msm": {},
    }
    base = {}
    for d in sizes:
        mesh = make_mesh(d)
        ntt_rate = bench_ntt(mesh, args.ntt_logn)
        row = {"butterflies_per_s": ntt_rate}
        if d == 1:
            base["ntt"] = ntt_rate
        row["efficiency_vs_1dev"] = ntt_rate / (base["ntt"] * d)
        report["ntt"][str(d)] = row
        print(f"NTT 2^{args.ntt_logn} @ {d} dev: {ntt_rate/1e9:.3f} G bf/s "
              f"(eff {row['efficiency_vs_1dev']*100:.0f}%)", flush=True)
        if not args.skip_msm:
            msm_rate = bench_msm(mesh, args.msm_logn,
                                 pipeline=args.msm_pipeline)
            row = {"points_per_s": msm_rate}
            if d == 1:
                base["msm"] = msm_rate
            row["efficiency_vs_1dev"] = msm_rate / (base["msm"] * d)
            report["msm"][str(d)] = row
            print(f"MSM 2^{args.msm_logn} @ {d} dev: {msm_rate/1e3:.1f} K "
                  f"pts/s (eff {row['efficiency_vs_1dev']*100:.0f}%)",
                  flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""TPU MSM pipeline shootout: v3 u32 vs v3 r12 vs v2, bit-exactness gated.

Run on the TPU (remote compile ON):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_msm_bench.py

Env: MSM_LOGN (default 20), MSM_PIPES (csv of v3:u32,v3:r12,v2; default all).
Prints per-pipeline wall time + points/s; every run is checked against the
(sum of scalars) * P oracle (points are a repeated real curve point).
"""

import os
import time

import numpy as np


def main() -> None:
    size_log = int(os.environ.get("MSM_LOGN", "20"))
    pipes = os.environ.get("MSM_PIPES", "v3:u32,v3:r12,v2").split(",")
    n = 1 << size_log

    from icicle_tpu.curves.params import get_curve
    from tests.ec_ref import ec_mul

    curve = get_curve("bn254")
    fr, fq = curve.fr, curve.fq
    mod = fq.modulus
    rng = np.random.default_rng(99)

    words = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint64)
    scal = words.astype(np.uint32)
    svals = [int.from_bytes(w.astype("<u4").tobytes(), "little") % fr.modulus
             for w in words]
    # canonicalize the limbs the same way msm does (mod r)
    scal = np.asarray(fr.from_ints(svals))

    P = ec_mul((curve.gen_x, curve.gen_y), 0xDEADBEEF, mod)
    px = np.broadcast_to(np.asarray(fq.from_ints([P[0]]))[0], (n, 8)).copy()
    py = np.broadcast_to(np.asarray(fq.from_ints([P[1]]))[0], (n, 8)).copy()
    want = ec_mul(P, sum(svals) % fr.modulus, mod)

    results = {}
    for pipe in pipes:
        if pipe == "v2":
            from icicle_tpu.ops.msm_tpu2 import msm_tpu2

            def run():
                return msm_tpu2("bn254", scal, px, py, backend="pallas")
        else:
            engine = pipe.split(":")[1]
            from icicle_tpu.ops.msm_tpu3 import msm_tpu3, msm_tpu3_prepare

            prepared = msm_tpu3_prepare("bn254", px, py, engine=engine)

            def run(engine=engine, prepared=prepared):
                return msm_tpu3("bn254", scal, backend="pallas",
                                engine=engine, prepared=prepared)

        print(f"--- {pipe} warm-up (compile)...", flush=True)
        t0 = time.perf_counter()
        res = run()
        warm = time.perf_counter() - t0
        ok = res == want
        print(f"{pipe}: warm {warm:.2f}s bit_exact={ok}", flush=True)
        if not ok:
            results[pipe] = ("WRONG", warm)
            continue
        iters = 2 if size_log <= 20 else 1
        t0 = time.perf_counter()
        for _ in range(iters):
            res = run()
        dt = (time.perf_counter() - t0) / iters
        results[pipe] = (n / dt / 1e6, dt)
        print(f"{pipe}: {dt*1e3:.1f} ms, {n/dt/1e6:.3f} M pts/s", flush=True)

    print("\nsummary 2^%d:" % size_log)
    for k, v in results.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()

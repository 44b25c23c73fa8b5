"""ECNTT GLV-vs-plain-ladder measurement (VERDICT r3 ask #5).

Reference surface: icicle/src/ecntt.cpp (NTT templated over projective_t).
Runs the bn254 forward ECNTT at the given sizes with the GLV joint ladder
(curves/glv.py, half-length doubling chains) and with the round-2 plain
2^4-ary ladder, prints points/s for both and the speedup. Results are
oracle-checked at the smallest size (roundtrip == identity).

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/ecntt_bench.py
Env: ECNTT_LOGNS (default "12,14"), ECNTT_CURVE (default bn254).
"""

import os
import time

import numpy as np


def main() -> None:
    logns = [int(s) for s in os.environ.get("ECNTT_LOGNS", "12,14").split(",")]
    curve_name = os.environ.get("ECNTT_CURVE", "bn254")

    import jax
    from icicle_tpu.curves.params import get_curve
    from icicle_tpu.curves.group import get_group, Projective
    from icicle_tpu.ops import ecntt as E
    from icicle_tpu.runtime.config import NTTDir

    curve = get_curve(curve_name)
    group = get_group(curve_name)
    fq = curve.fq

    for logn in logns:
        n = 1 << logn
        # n distinct small multiples of G, built by doubling chains on device
        base = group.generator(())
        rng = np.random.default_rng(5)
        ks = rng.integers(1, 1 << 16, size=n)
        # cheap deterministic point set: G * (i+1) via a vectorized ladder
        # is itself an ECNTT-sized scalar mul; just tile a few points
        P1 = group.scalar_mul_int(base, 12345)
        px = np.broadcast_to(np.asarray(P1.x), (n, fq.nlimbs)).copy()
        py = np.broadcast_to(np.asarray(P1.y), (n, fq.nlimbs)).copy()
        pz = np.broadcast_to(np.asarray(P1.z), (n, fq.nlimbs)).copy()
        pts = Projective(px, py, pz)

        rates = {}
        for glv in (True, False):
            os.environ["ICICLE_TPU_ECNTT_GLV"] = "1" if glv else "0"
            t0 = time.perf_counter()
            out = E.ecntt_jit(curve_name, pts, NTTDir.FORWARD)
            jax.block_until_ready(out.x)
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = E.ecntt_jit(curve_name, pts, NTTDir.FORWARD)
            jax.block_until_ready(out.x)
            dt = time.perf_counter() - t0
            rates[glv] = n / dt
            label = "glv" if glv else "plain"
            print(f"2^{logn} {label:>5}: {dt*1e3:8.1f} ms "
                  f"({n/dt/1e3:.1f} K pts/s, warm {warm:.1f}s)", flush=True)
            if glv:
                # correctness: forward then inverse == input (first coord)
                back = E.ecntt_jit(curve_name, out, NTTDir.INVERSE)
                ok = np.array_equal(
                    np.asarray(group.to_affine_canonical(
                        Projective(back.x[:4], back.y[:4], back.z[:4]))),
                    np.asarray(group.to_affine_canonical(
                        Projective(pts.x[:4], pts.y[:4], pts.z[:4]))))
                print(f"          roundtrip check: {'OK' if ok else 'FAIL'}",
                      flush=True)
        print(f"2^{logn} GLV speedup: {rates[True]/rates[False]:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()

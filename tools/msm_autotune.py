"""MSM auto-tuning sweep: measure (c, T) candidates on the target device
and persist the winners into icicle_tpu/data/msm_tuning.json.

Reference analog: the fitted decision trees the CPU backend ships per
vendor (cpu_msm.hpp:199-224, decision_tree_params/*.h) — here the "tree" is
a measured table refreshed by running this tool on the actual chip.

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/msm_autotune.py

Env:
    TUNE_CURVE   (default bn254)
    TUNE_LOGNS   csv of logn values (default "16,20,24")
    TUNE_PIPE    v3:u32 | v3:r12 (default v3:u32)
    TUNE_CS      csv of window sizes to try (default "12,13,14,15,16")
    TUNE_TS      csv of tile sizes to try (default "2048,4096,8192")
    TUNE_NU      precompute factor (default 1)
    TUNE_GLV     1 = on-device GLV split over [P, phi(P)] bases (default 0)
Every timed run is bit-exactness-gated against the (sum of scalars)*P
oracle before its number is recorded.
"""

import os
import time

import numpy as np


def main() -> None:
    curve_name = os.environ.get("TUNE_CURVE", "bn254")
    logns = [int(s) for s in os.environ.get("TUNE_LOGNS", "16,20,24").split(",")]
    pipe = os.environ.get("TUNE_PIPE", "v3:u32")
    cs = [int(s) for s in os.environ.get("TUNE_CS", "12,13,14,15,16").split(",")]
    ts = [int(s) for s in os.environ.get("TUNE_TS", "2048,4096,8192").split(",")]
    nu = int(os.environ.get("TUNE_NU", "1"))
    glv = bool(int(os.environ.get("TUNE_GLV", "0")))
    engine = pipe.split(":", 1)[1] if ":" in pipe else "u32"

    from icicle_tpu.curves.params import get_curve
    from icicle_tpu.ops.msm_tpu3 import msm_tpu3
    from icicle_tpu.ops.msm import msm_precompute_bases, MSMConfig
    from icicle_tpu.ops import msm_tuning
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.ec_ref import ec_mul, INF

    curve = get_curve(curve_name)
    fr, fq = curve.fr, curve.fq
    mod = fq.modulus
    P = ec_mul((curve.gen_x, curve.gen_y), 0xDEADBEEF, mod)

    for logn in logns:
        n = 1 << logn
        rng = np.random.default_rng(7 + logn)
        # vectorized scalar generation (python-int canonicalization costs
        # minutes at 2^24): full-width limbs but top limb clamped below the
        # modulus top word, so every row is canonical ( < r) by construction
        scal = rng.integers(0, 1 << 32, size=(n, fr.nlimbs),
                            dtype=np.uint64).astype(np.uint32)
        top = int(fr.modulus >> (32 * (fr.nlimbs - 1)))
        scal[:, -1] = rng.integers(0, max(top, 1), size=n,
                                   dtype=np.uint64).astype(np.uint32)
        total = 0
        for limb in range(fr.nlimbs):
            total += int(np.sum(scal[:, limb], dtype=np.uint64)) << (32 * limb)
        total %= fr.modulus
        px = np.broadcast_to(np.asarray(fq.from_ints([P[0]]))[0],
                             (n, fq.nlimbs)).copy()
        py = np.broadcast_to(np.asarray(fq.from_ints([P[1]]))[0],
                             (n, fq.nlimbs)).copy()
        want = ec_mul(P, total, mod)
        # device-resident scalars (reference: are_scalars_on_device=true);
        # the axon tunnel H2D path is MB/s-slow and is NOT the thing tuned
        import jax
        import jax.numpy as jnp
        scal = jax.block_until_ready(jnp.asarray(scal))

        for c in cs:
            bx, by = px, py
            if nu > 1:
                bx, by = msm_precompute_bases(
                    curve_name, px, py, MSMConfig(c=c, precompute_factor=nu))
            for T in ts:
                try:
                    from icicle_tpu.ops.msm_tpu3 import msm_tpu3_prepare
                    prepared = msm_tpu3_prepare(
                        curve_name, bx, by, c=c, T=T, engine=engine,
                        precompute_factor=nu, glv=glv)
                    t0 = time.perf_counter()
                    got = msm_tpu3(curve_name, scal, engine=engine,
                                   precompute_factor=nu, prepared=prepared,
                                   glv=glv)
                    warm = time.perf_counter() - t0  # includes compile
                    t0 = time.perf_counter()
                    got = msm_tpu3(curve_name, scal, engine=engine,
                                   precompute_factor=nu, prepared=prepared,
                                   glv=glv)
                    dt = time.perf_counter() - t0
                except Exception as exc:  # OOM / Mosaic reject: skip point
                    print(f"logn={logn} c={c} T={T}: FAILED {type(exc).__name__}: {exc}")
                    continue
                ok = got == ((0, 0) if want is INF else want)
                pps = n / dt
                print(f"logn={logn} c={c} T={T} nu={nu} glv={int(glv)}: "
                      f"{dt*1e3:.1f} ms ({pps/1e6:.2f} M pts/s) "
                      f"warm={warm:.1f}s bit_exact={ok}")
                if ok:
                    msm_tuning.record(pipe + (":glv" if glv else ""),
                                      curve_name, logn,
                                      {"c": c, "T": T}, pps,
                                      precompute_factor=nu)
    print("table written to icicle_tpu/data/msm_tuning.json")


if __name__ == "__main__":
    main()

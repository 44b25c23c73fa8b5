"""ML-KEM example (mirrors reference examples/c++/pqc-package + go mlkem):
batched keygen / encaps / decaps for all security categories.
Run: PYTHONPATH=.:/root/.axon_site python examples/mlkem_example.py
"""

import time

import numpy as np

from icicle_tpu.ops.pqc import keygen, encaps, decaps, PARAMS


def main():
    rng = np.random.default_rng(0)
    for cat in ("512", "768", "1024"):
        p = PARAMS[cat]
        B = 16
        ent = rng.integers(0, 256, size=(B, 64), dtype=np.uint8)
        t0 = time.time()
        ek, dk = keygen(cat, ent)
        m = rng.integers(0, 256, size=(B, 32), dtype=np.uint8)
        ct, ss = encaps(cat, m, ek)
        ss2 = decaps(cat, ct, dk)
        dt = time.time() - t0
        assert np.array_equal(ss, ss2)
        print(f"ML-KEM-{cat}: batch={B} keygen+encaps+decaps {dt*1000:.0f} ms "
              f"(ek {p.ek_bytes}B, ct {p.ct_bytes}B)  shared secrets agree")


if __name__ == "__main__":
    main()

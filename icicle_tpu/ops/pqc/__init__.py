from icicle_tpu.ops.pqc.ml_kem import (
    keygen, encaps, decaps, MlKemConfig,
    KYBER_512, KYBER_768, KYBER_1024, PARAMS,
)

__all__ = ["keygen", "encaps", "decaps", "MlKemConfig",
           "KYBER_512", "KYBER_768", "KYBER_1024", "PARAMS"]

"""Back-compat re-export: the batch numpy keccak engine moved to
icicle_tpu.utils.keccak_np (it is the host engine for transcripts AND the
ML-KEM oracle; one implementation serves both)."""

from icicle_tpu.utils.keccak_np import (  # noqa: F401
    keccak_f, _sponge, sha3_256, sha3_512, shake128, shake256,
)

"""Hash facade (reference F7: include/icicle/hash/hash.h Hash over HashBackend).

TPU-native contract: every hash exposes a vectorized word-level interface
``hash_words((batch, in_words) uint32) -> (batch, digest_words) uint32`` —
uniform across field hashes (Poseidon/Poseidon2, words = field limbs) and byte
hashes (Keccak/SHA3/Blake, words = LE 32-bit words). The Merkle builder and
Fiat-Shamir transcript compose hashes purely at this level; `hash_bytes` is the
host-convenience boundary matching the reference's byte API.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Hash:
    """Abstract vectorized hash."""

    #: digest size in uint32 words
    digest_words: int = 0
    #: natural input block in uint32 words (0 = any length)
    default_input_words: int = 0

    def hash_words(self, x: jnp.ndarray) -> jnp.ndarray:
        """(batch, in_words) uint32 -> (batch, digest_words) uint32."""
        raise NotImplementedError

    @property
    def output_size(self) -> int:
        """Digest size in bytes (reference Hash::output_size())."""
        return self.digest_words * 4

    def with_input_words(self, words: int) -> "Hash":
        """A view of this hash pinned to a fixed input width — used by Merkle
        layers to declare arity (reference passes explicit input sizes to the
        hash creators, e.g. create_keccak_256_hash(input_size))."""
        import copy
        h = copy.copy(self)
        h.default_input_words = words
        return h

    # -- host byte boundary ----------------------------------------------------
    def hash_bytes(self, data: bytes, batch: int = 1) -> bytes:
        """Hash `batch` equal-size byte chunks (reference Hash::hash byte API).

        Input bytes are interpreted as little-endian uint32 words; inputs whose
        length is not a word multiple are zero-padded to the next word (byte
        hashes override this to honor exact byte lengths).
        """
        assert len(data) % batch == 0
        chunk = len(data) // batch
        padded = chunk + (-chunk) % 4
        buf = np.zeros((batch, padded), dtype=np.uint8)
        raw = np.frombuffer(data, dtype=np.uint8).reshape(batch, chunk)
        buf[:, :chunk] = raw
        words = buf.view(np.uint32 if np.little_endian else np.uint32)
        x = jnp.asarray(words.reshape(batch, padded // 4))
        out = np.asarray(self.hash_words(x)).astype("<u4")
        return out.tobytes()

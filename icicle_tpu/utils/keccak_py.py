"""Pure-Python Keccak-f[1600] sponge for host-side Fiat-Shamir transcripts.

Transcript hashing is a few hundred bytes per round — host Python is the right
tool (the batched JAX Keccak kernel in ops/hash/keccak.py is for bulk data).
Semantics match the reference's keccak/sha3 creators
(backend/cpu/src/hash/cpu_keccak.cpp): keccak pads 0x01, sha3 pads 0x06.
"""

from __future__ import annotations

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]
_M64 = (1 << 64) - 1


def _rol(v, n):
    return ((v << n) | (v >> (64 - n))) & _M64


def _f1600(lanes):
    for rnd in range(24):
        # theta
        c = [lanes[x][0] ^ lanes[x][1] ^ lanes[x][2] ^ lanes[x][3] ^ lanes[x][4]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                lanes[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(lanes[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                lanes[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & _M64)
        # iota
        lanes[0][0] ^= _RC[rnd]
    return lanes


def _sponge(data: bytes, rate: int, out_len: int, pad_byte: int) -> bytes:
    lanes = [[0] * 5 for _ in range(5)]

    def absorb(block: bytes):
        for i in range(rate // 8):
            x, y = i % 5, i // 5
            lanes[x][y] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        _f1600(lanes)

    # pad10*1
    data = bytearray(data)
    pad_len = rate - (len(data) % rate)
    data += bytes([pad_byte] + [0] * (pad_len - 2) + [0x80]) if pad_len >= 2 \
        else bytes([pad_byte | 0x80])
    for off in range(0, len(data), rate):
        absorb(bytes(data[off:off + rate]))

    out = bytearray()
    while len(out) < out_len:
        for i in range(rate // 8):
            x, y = i % 5, i // 5
            out += lanes[x][y].to_bytes(8, "little")
            if len(out) >= out_len:
                break
        if len(out) < out_len:
            _f1600(lanes)
    return bytes(out[:out_len])


def keccak_256(data: bytes) -> bytes:
    return _sponge(data, 136, 32, 0x01)


def keccak_512(data: bytes) -> bytes:
    return _sponge(data, 72, 64, 0x01)


def sha3_256(data: bytes) -> bytes:
    return _sponge(data, 136, 32, 0x06)


def sha3_512(data: bytes) -> bytes:
    return _sponge(data, 72, 64, 0x06)

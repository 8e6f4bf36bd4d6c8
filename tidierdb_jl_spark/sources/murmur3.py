"""murmur3_x86_32 — the hash Apache Iceberg's bucket transform requires.

Iceberg's spec (Appendix B "32-bit Hash Requirements") pins bucket
partitioning to the PUBLIC MurmurHash3 x86 32-bit variant, seed 0
(https://github.com/aappleby/smhasher/blob/master/src/MurmurHash3.cpp),
over the type's single-value byte form: int/long/date/time/timestamp
hash as the 8-byte LITTLE-ENDIAN long (so ``bucket(34) ==
bucket(34L)``), strings as UTF-8 bytes, binary/fixed as raw bytes.
No murmur wheel ships in this image, so this module implements it —
a scalar reference plus a NUMPY-VECTORIZED long path (the hot case: a
bucket transform over a numeric key column hashes every row of every
batch).

Verified against the canonical smhasher vectors AND the Iceberg spec's
own Appendix-B examples (``bucket`` hash of 34 -> 2017239379,
"iceberg" -> 1210000089, ...) in ``tests/test_murmur3.py`` — the
published-vector strategy that keeps an encoder/decoder pair from
agreeing on a shared mistake.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["murmur3_32", "murmur3_32_long_vec"]

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Scalar murmur3_x86_32; returns a SIGNED int32 (what java's
    ``hashBytes`` returns and the Iceberg spec tables list)."""
    h = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    tail = data[nblocks * 4:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h = _fmix32(h)
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_32_long_vec(values) -> np.ndarray:
    """Vectorized murmur3_x86_32 over int64 values hashed as their
    8-byte little-endian form (the Iceberg long/int/date/timestamp
    bucket input) — two 4-byte blocks, no tail.  Returns int32 hashes;
    numpy-whole-array ops, no Python per-row loop."""
    # int64 first, then a two's-complement REINTERPRETATION — a direct
    # negative->uint64 cast warns (and will error in future numpy)
    v = np.asarray(values)
    if v.dtype != np.uint64:
        v = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)

    def _mix(h, k):
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h = h ^ k
        h = ((h << 13) | (h >> 19)) & _M32
        return (h * 5 + 0xE6546B64) & _M32

    h = np.zeros(len(v), dtype=np.uint64)  # seed 0
    h = _mix(h, v & _M32)          # low word first (little-endian)
    h = _mix(h, (v >> 32) & _M32)  # then the high word
    h = h ^ 8  # total length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h.astype(np.uint32).astype(np.int32)

"""Murmur3 x86 32-bit hash — the Iceberg bucket-transform hash.

Pure-Python scalar implementation plus a numpy-vectorized variant for
8-byte little-endian inputs (int/long/date/time/timestamp all hash as
their 64-bit value per the Iceberg spec, Appendix B).

Parity target: /root/reference/icelake/src/types/transform/bucket.rs:23-66
(which delegates to the public `murmur3` crate, seed 0). Validated against
the Iceberg-spec test vectors in bucket.rs:152-230.
"""

from __future__ import annotations

import struct

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def hash_bytes(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 over raw bytes; returns signed int32."""
    h = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    # tail
    k = 0
    tail = data[nblocks * 4 :]
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
    # finalize
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def hash_long(v: int) -> int:
    """Hash a 64-bit integer as its 8-byte little-endian encoding."""
    return hash_bytes(struct.pack("<q", v))


def hash_int(v: int) -> int:
    return hash_long(v)


def hash_decimal(unscaled: int) -> int:
    """Hash a decimal's unscaled value: minimal two's-complement BE bytes.

    Matches bucket.rs:56-64 (which strips leading zero bytes of the
    16-byte BE encoding; for negative values Java's BigInteger minimal
    encoding keeps leading 0xFF bytes down to the minimal length).
    """
    # minimal two's-complement length, as Java BigInteger.toByteArray():
    # for v >= 0, bit_length+1 bits (sign) rounded up; for v < 0 the
    # exact boundary values (-128, -32768, ...) need no extra sign byte,
    # so measure (|v|-1) = ~v's bit length instead — max(1,...) covers 0
    if unscaled >= 0:
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
    else:
        nbytes = max(1, ((~unscaled).bit_length() + 8) // 8)
    data = unscaled.to_bytes(nbytes, "big", signed=True)
    return hash_bytes(data)


def hash_str(s: str) -> int:
    return hash_bytes(s.encode("utf-8"))


def hash_long_vec(values: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 of int64 values as 8-byte LE blocks.

    The 8-byte input means exactly two 4-byte blocks and no tail, so the
    whole hash unrolls into branch-free uint32 numpy arithmetic. Used by
    the Arrow-batched bucket-transform pandas_udf so Python-side hashing
    stays ~vectorized instead of per-row.
    """
    v = values.astype(np.int64, copy=False).view(np.uint64)
    lo = (v & np.uint64(_M32)).astype(np.uint32)
    hi = (v >> np.uint64(32)).astype(np.uint32)
    h = np.zeros(len(v), dtype=np.uint32)
    with np.errstate(over="ignore"):
        for blk in (lo, hi):
            k = blk * np.uint32(_C1)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(_C2)
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)

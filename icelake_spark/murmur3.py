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
    # minimal two's-complement length, as Java BigInteger.toByteArray()
    # — the shared definition (bound encoding and Avro decimals use the
    # same helper; review r10 deduplication)
    from .types.datatypes import min_twos_complement

    return hash_bytes(min_twos_complement(unscaled))


def hash_str(s: str) -> int:
    return hash_bytes(s.encode("utf-8"))


def hash_bytes_vec(buf: np.ndarray, starts: np.ndarray,
                   lengths: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized murmur3_x86_32 over MANY variable-length byte strings.

    `buf` is one uint8 array holding all inputs back to back;
    (starts[i], lengths[i]) delimit input i — exactly the layout of an
    Arrow string/binary array's (data, offsets) buffers, so callers
    hash a whole Arrow batch with zero per-row Python.

    Strategy: advance block index j over all strings simultaneously;
    each iteration gathers the j-th 4-byte LE word of every string that
    still has one and applies the mix to just those lanes. Cost is
    O(max_blocks) numpy passes over shrinking index sets — for
    partition-key-sized strings a handful of vectorized sweeps replaces
    len(batch) Python hash calls. Tails and finalization are fully
    branch-free masked ops. Returns int32, identical to hash_bytes row
    by row (property-tested in tests/test_kernels.py).
    """
    n = len(starts)
    starts = starts.astype(np.int64, copy=False)
    lengths = lengths.astype(np.int64, copy=False)
    h = np.full(n, seed, dtype=np.uint32)
    nblocks = lengths // 4
    max_b = int(nblocks.max()) if n else 0
    b = buf
    with np.errstate(over="ignore"):
        for j in range(max_b):
            act = np.nonzero(nblocks > j)[0]
            idx = starts[act] + 4 * j
            k = (b[idx].astype(np.uint32)
                 | (b[idx + 1].astype(np.uint32) << np.uint32(8))
                 | (b[idx + 2].astype(np.uint32) << np.uint32(16))
                 | (b[idx + 3].astype(np.uint32) << np.uint32(24)))
            k = k * np.uint32(_C1)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(_C2)
            hh = h[act] ^ k
            hh = (hh << np.uint32(13)) | (hh >> np.uint32(19))
            h[act] = hh * np.uint32(5) + np.uint32(0xE6546B64)
        tail_start = starts + nblocks * 4
        tlen = lengths - nblocks * 4
        k = np.zeros(n, dtype=np.uint32)
        m3 = tlen == 3
        m2 = tlen >= 2
        m1 = tlen >= 1
        if m3.any():
            k[m3] ^= b[tail_start[m3] + 2].astype(np.uint32) << np.uint32(16)
        if m2.any():
            k[m2] ^= b[tail_start[m2] + 1].astype(np.uint32) << np.uint32(8)
        if m1.any():
            k[m1] ^= b[tail_start[m1]].astype(np.uint32)
            km = k[m1] * np.uint32(_C1)
            km = (km << np.uint32(15)) | (km >> np.uint32(17))
            km = km * np.uint32(_C2)
            h[m1] ^= km
        h ^= lengths.astype(np.uint32)
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


def int128_minimal_be_vec(le_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Arrow decimal128 data buffer (n×16 little-endian int128 rows) →
    minimal two's-complement BE encodings as (buf, starts, lengths).

    Strips leading sign-filler bytes (0x00 for ≥0, 0xFF for <0) down to
    Java BigInteger's minimal form, keeping one filler byte back when
    the first significant byte's top bit disagrees with the sign."""
    be = le_bytes[:, ::-1]
    n = len(be)
    sign = be[:, 0] >= 128
    filler = np.where(sign, 0xFF, 0x00).astype(np.uint8)
    is_fill = be == filler[:, None]
    lead = np.argmin(is_fill, axis=1)
    lead[is_fill.all(axis=1)] = 16
    keep = 16 - lead
    first_kept = be[np.arange(n), np.minimum(lead, 15)]
    disagree = (first_kept >= 128) != sign
    nbytes = np.maximum(1, keep + np.where((keep == 0) | disagree, 1, 0))
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    total = int(starts[-1] + nbytes[-1]) if n else 0
    row_idx = np.repeat(np.arange(n), nbytes)
    k = np.arange(total) - np.repeat(starts, nbytes)
    col = np.repeat(16 - nbytes, nbytes) + k
    return be[row_idx, col], starts, nbytes


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

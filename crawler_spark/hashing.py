"""Pure-Python XXH64 compatible with Spark SQL's ``xxhash64`` expression.

The URL-seen set is keyed by ``xxhash64(canonical_url)`` (BASELINE.json
north_star). On the Spark side that is the built-in JVM expression
``F.xxhash64(col)``; this module provides the bit-identical driver/oracle
side so pytest can verify seen-set parity without a JVM round-trip, and so
the Bloom-filter blobs built inside ``applyInPandas`` workers hash
identically to the plan-side expression.

XXH64 is the public xxHash algorithm (Yann Collet, BSD). Spark hashes the
UTF-8 bytes of a string with seed 42 and returns a *signed* 64-bit long.
``xxhash64_long`` mirrors Spark's long-input path (little-endian 8-byte
block fed through the tail rounds).
"""

from __future__ import annotations

import struct

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK


def xxhash64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data``; returns an *unsigned* 64-bit int."""
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        limit = n - 32
        while idx <= limit:
            b = struct.unpack_from("<4Q", data, idx)
            v1 = _round(v1, b[0])
            v2 = _round(v2, b[1])
            v3 = _round(v3, b[2])
            v4 = _round(v4, b[3])
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK

    h = (h + n) & _MASK

    while idx + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, idx)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        idx += 8
    if idx + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, idx)
        h ^= (k1 * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        idx += 4
    while idx < n:
        h ^= (data[idx] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        idx += 1

    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Spark-compatible ``xxhash64(string_col)``: signed 64-bit of UTF-8."""
    return _to_signed(xxhash64_bytes(s.encode("utf-8"), seed))


def xxhash64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Spark-compatible ``xxhash64(long_col)``: hashes the LE 8-byte block."""
    return _to_signed(xxhash64_bytes(struct.pack("<q", v), seed))

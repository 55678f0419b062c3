"""XXH64: driver-side replica of Spark's ``xxhash64`` expression.

The index build hashes every token JVM-side (``xxhash64`` inside a
``transform`` lambda — whole-stage codegen), so the Arrow boundary ships
``array<bigint>`` term codes instead of per-token Python strings and the
posting layout is keyed by ``term_hash``. At query time the engine must
produce the SAME hash for a handful of query terms without launching a
Spark job — this module is a pure-Python XXH64 (public-domain algorithm,
Yann Collet, https://github.com/Cyan4973/xxHash) over the term's UTF-8
bytes with Spark's fixed seed 42, byte-for-byte compatible with the JVM
expression (equality asserted in tests/test_hashing.py against
``F.xxhash64`` output).

Collision note (honest bound): 64-bit term hashing makes two distinct
terms share a posting list with probability ~n²/2⁶⁵ over an n-term
vocabulary — ≈3·10⁻⁴ for n=10⁸ (a 100-TB code corpus), the standard
engineering trade (Lucene's own BloomFilteringPostingsFormat, CityHash
term dictionaries in ClickHouse). The docs-table sha256 per-row invariant
is unaffected.
"""

from __future__ import annotations

import struct

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # org.apache.spark.sql.catalyst.expressions.XxHash64 default


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of raw bytes -> SIGNED int64 (Spark's bigint convention)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            lanes = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, lanes[0])
            v2 = _round(v2, lanes[1])
            v3 = _round(v3, lanes[2])
            v4 = _round(v4, lanes[3])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    # two's-complement to Spark's signed bigint
    return h - (1 << 64) if h >= (1 << 63) else h


def term_hash(term: str) -> int:
    """Spark-compatible hash of one term string (UTF-8, seed 42)."""
    return xxh64(term.encode("utf-8"))

"""Delta + varint posting-list codec, vectorized in numpy.

This is the from-scratch replacement for Lucene's posting encoding (the
reference delegates it to Elasticsearch — /root/reference/README.md:46; no
reference code exists for it). Postings are stored as two binary blobs per
(term, segment): delta-encoded varint docIDs and varint term frequencies.

All encode/decode paths are numpy-vectorized (no per-element Python in the
hot loop: the only Python-level loops are over the ≤10 varint byte
positions, each iteration a full-array numpy op).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (uint64 range)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (1..10)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for j in range(1, 10):
        nbytes += (v >= (_U64(1) << _U64(7 * j))).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxb = int(nbytes.max())
    for j in range(maxb):
        mask = nbytes > j
        pos = starts[mask] + j
        byte = ((v[mask] >> _U64(7 * j)) & _MASK7).astype(np.uint8)
        cont = (nbytes[mask] > (j + 1)).astype(np.uint8) << 7
        out[pos] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    # group id for every byte
    gidx = np.zeros(b.size, dtype=np.int64)
    gidx[starts[1:]] = 1
    gidx = np.cumsum(gidx)
    pos_in_group = (np.arange(b.size, dtype=np.int64) - starts[gidx]).astype(np.uint64)
    vals7 = (b & 0x7F).astype(np.uint64) << (_SEVEN * pos_in_group)
    return np.add.reduceat(vals7, starts)


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Encode a strictly-increasing id array as varint(first, gaps...)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return b""
    d = np.empty_like(a)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    return varint_encode(d)


def delta_decode(buf: bytes) -> np.ndarray:
    d = varint_decode(buf)
    if d.size == 0:
        return d
    return np.cumsum(d, dtype=np.uint64)

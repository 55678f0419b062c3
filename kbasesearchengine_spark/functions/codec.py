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


def varint_sizes(v: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte length (1..10). The compare loop stops at the
    width the LARGEST value needs (doc-gap streams are 1-3 bytes — 9
    fixed passes over the array tripled the sizing cost for nothing).

    Dtype-NATIVE: accepts any non-negative integer dtype and never widens
    the input (the shift/mask constants are Python ints, which numpy
    folds to the array's dtype) — int32 tf/dl lanes stay 4-byte through
    sizing, halving the bytes this DRAM-bound pass moves vs the previous
    mandatory uint64 inputs. Comparisons only run while
    ``vmax >= 2**(7j)``, so the threshold always fits the input dtype."""
    nbytes = np.ones(v.shape, dtype=np.int64)
    if v.size == 0:
        return nbytes
    vmax = int(v.max())
    for j in range(1, 10):
        if vmax < (1 << (7 * j)):
            break
        nbytes += (v >= (1 << (7 * j))).astype(np.int64)
    return nbytes


def _varint_into(v: np.ndarray, nbytes: np.ndarray) -> np.ndarray:
    """Dtype-native byte scatter: ``(v >> 7j) & 0x7F`` runs in the input's
    own dtype (values are non-negative, so arithmetic shift == logical
    shift; j is bounded by the dtype's own varint width, so the shift
    amount never exceeds the lane width)."""
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]) if len(ends) else 0, dtype=np.uint8)
    maxb = int(nbytes.max()) if len(nbytes) else 0
    for j in range(maxb):
        mask = nbytes > j
        pos = starts[mask] + j
        byte = ((v[mask] >> (7 * j)) & 0x7F).astype(np.uint8)
        cont = (nbytes[mask] > (j + 1)).astype(np.uint8) << 7
        out[pos] = byte | cont
    return out


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (uint64 range)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    return _varint_into(v, varint_sizes(v)).tobytes()


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


def encode_grouped(
    doc: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    block_size: int = 128,
) -> dict:
    """Batch-encode MANY posting groups in three varint passes total.

    doc/tf/dl: concatenated per-group arrays (any non-negative integer
    dtype — int64 doc + int32 tf/dl end-to-end is the build kernel's
    layout; nothing is widened to uint64 here, the sizing/scatter math is
    dtype-native), sorted by doc within each group; starts/ends: group
    boundaries. Returns dict of per-group
    lists: doc_ids, tfs, dls (bytes), block_last, block_max_tf,
    block_min_dl (lists).

    Block metadata is avgdl-INDEPENDENT: (max tf, min dl) per block gives
    the query-time upper bound tf_norm(max_tf, min_dl, avgdl) — valid for
    any current avgdl, so incremental adds (which change N/avgdl) never
    stale the pruning bounds.

    The per-group Python work is reduced to buffer slicing — all arithmetic
    (delta, byte sizing, byte scatter, block reductions) is whole-array.
    """
    n = len(doc)
    n_groups = len(starts)
    lens = ends - starts

    # block starts at every (within-group pos % B == 0) — derived in
    # O(total blocks), NOT by a per-posting modulo pass (blocks are ~1% of
    # postings; the per-pair arange/gather/modulo version was the single
    # most expensive step of the whole encoder)
    blocks_per_group = (lens + block_size - 1) // block_size
    goff = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(blocks_per_group, out=goff[1:])
    total_blocks = int(goff[-1])
    bgidx = np.repeat(np.arange(n_groups), blocks_per_group)
    block_in_group = np.arange(total_blocks, dtype=np.int64) - goff[bgidx]
    bstarts = starts[bgidx] + block_in_group * block_size

    # delta-encode doc ids with per-group reset
    d = doc.copy()
    d[1:] = doc[1:] - doc[:-1]
    d[starts] = doc[starts]

    out: dict = {}
    for name, arr in (("doc_ids", d), ("tfs", tf), ("dls", dl)):
        sizes = varint_sizes(arr)
        buf = _varint_into(arr, sizes).tobytes()
        boff = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=boff[1:])
        out[name] = [
            buf[boff[s]:boff[e]] for s, e in zip(starts, ends)
        ]
        # per-block byte offsets RELATIVE to the group's blob start — the
        # lazy-decode index (wand.py): a block's bytes are
        # blob[off[j] : off[j+1]] (last block ends at len(blob)), so
        # query-time pruning skips DECODING, not just scoring
        off_global = boff[bstarts]
        out[f"block_{'doc' if name == 'doc_ids' else name[:-1]}_off"] = [
            (off_global[goff[i]:goff[i + 1]] - boff[starts[i]]).tolist()
            for i in range(n_groups)
        ]

    bends = np.append(bstarts[1:], n) - 1
    bmax_tf = (
        np.maximum.reduceat(tf, bstarts).astype(np.int64)
        if n else np.empty(0, dtype=np.int64)
    )
    bmin_dl = (
        np.minimum.reduceat(dl, bstarts).astype(np.int64)
        if n else np.empty(0, dtype=np.int64)
    )
    blast = doc[bends].astype(np.int64) if n else np.empty(0, dtype=np.int64)
    out["block_last"] = [
        blast[goff[i]:goff[i + 1]].tolist() for i in range(n_groups)
    ]
    out["block_max_tf"] = [
        bmax_tf[goff[i]:goff[i + 1]].tolist() for i in range(n_groups)
    ]
    out["block_min_dl"] = [
        bmin_dl[goff[i]:goff[i + 1]].tolist() for i in range(n_groups)
    ]
    return out

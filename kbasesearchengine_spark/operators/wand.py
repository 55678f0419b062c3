"""Block-max WAND: top-k pruning over compressed postings — lazy decode.

The reference gets this from Lucene inside Elasticsearch (per-shard top-k
heaps + WAND-style skipping — implicit, no reference code; SURVEY §4).
Here it is from scratch, shaped for vectorized execution:

Instead of the classic one-doc-at-a-time WAND loop (pointer-chasing —
hostile to numpy), we run a *block-interval sweep*:

 1. Every posting block contributes an interval [start_doc, last_doc]
    with upper bound ub = idf(t) * block_max_tf_norm (stored at build
    time, indexer.py).
 2. Doc space is cut at all block boundaries into elementary intervals;
    each interval's total upper bound = Σ_t ub of the overlapping block
    of t (0 if t has no block there).
 3. Intervals are processed in DESCENDING total-ub order; each interval's
    docs are exactly scored (vectorized OR-accumulation over decoded
    block slices) and pushed into a bounded k-heap. As soon as the next
    interval's ub ≤ current θ (k-th best score), everything left is
    provably below the heap floor — stop.

Decode is LAZY per block (the Lucene skip-list analog): posting blobs
stay raw bytes; the per-block byte offsets stored at encode time
(codec.encode_grouped block_*_off) locate each 128-posting block's slice,
and a block is varint-decoded only when the sweep actually scores an
interval inside it. Absolute doc ids of block j recover from
block_last[j-1] + cumsum(gaps) — no prefix decode needed. Pruning
therefore skips BYTES, not just FLOPs: on a stopword OR query most of
the stopword's blocks are never decoded (decoded-bytes counter asserted
in tests/test_wand.py).

This is the same pruning guarantee as block-max WAND (never skips a doc
that could enter the top-k) with batch-friendly inner loops. Equality
with the exhaustive scorer is asserted in tests on every fixture query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.bm25 import tf_norm
from ..functions.codec import varint_decode


class _LazyTermPostings:
    """One query term's posting rows (possibly split across build
    partitions — disjoint ordered doc ranges), indexed for per-block
    decode. Only metadata arrays are materialized up front; payload bytes
    are sliced and decoded per block, memoized."""

    __slots__ = (
        "rows", "block_row", "block_local", "block_last", "block_start",
        "ub", "n_blocks", "_cache", "stats", "need_payload",
    )

    def __init__(
        self,
        rows: list[dict],
        avgdl: float,
        idf: float,
        stats: dict,
        need_payload: bool = True,
    ):
        # need_payload=False: intersection-only callers (non-relevance
        # pages, counts) never read tf/dl — those byte streams are not
        # even sliced, let alone decoded
        self.need_payload = need_payload
        # rows sorted by first block_last (disjoint doc ranges)
        rows = sorted(rows, key=lambda r: int(r["block_last"][0]))
        self.rows = rows
        self.stats = stats
        block_row, block_local, last_l, ub_l = [], [], [], []
        for ri, r in enumerate(rows):
            bl = np.asarray(r["block_last"], dtype=np.int64)
            block_row.append(np.full(len(bl), ri, dtype=np.int64))
            block_local.append(np.arange(len(bl), dtype=np.int64))
            last_l.append(bl)
            if need_payload:
                # block upper bounds (used by the OR-path WAND sweep
                # only). Match-only callers arrive on a column-pruned
                # frame that carries neither the tf/dl byte streams nor
                # their block metadata (topk projects them out of the
                # parquet scan) — and never reads ub.
                bmax = np.asarray(r["block_max_tf"], dtype=np.float64)
                bmin = np.asarray(r["block_min_dl"], dtype=np.float64)
                ub_l.append(idf * tf_norm(bmax, bmin, avgdl))
                stats["total_bytes"] += (
                    len(r["doc_ids"]) + len(r["tfs"]) + len(r["dls"])
                )
            else:
                ub_l.append(np.zeros(len(bl), dtype=np.float64))
                stats["total_bytes"] += len(r["doc_ids"]) + (
                    len(r["tfs"]) + len(r["dls"])
                    if "tfs" in r else 0
                )
            stats["total_blocks"] += len(bl)
        self.block_row = np.concatenate(block_row)
        self.block_local = np.concatenate(block_local)
        self.block_last = np.concatenate(last_l)
        self.ub = np.concatenate(ub_l)
        self.n_blocks = len(self.block_last)
        # conservative block starts: previous block's last + 1 (0 for the
        # very first block — a valid lower bound; looser only for the ub
        # coverage test, never for scoring, which decodes exact ids)
        self.block_start = np.empty(self.n_blocks, dtype=np.int64)
        self.block_start[0] = 0
        self.block_start[1:] = self.block_last[:-1] + 1
        self._cache: dict = {}

    def _slice(self, blob: bytes, offs, j: int) -> bytes:
        lo = int(offs[j])
        hi = int(offs[j + 1]) if j + 1 < len(offs) else len(blob)
        return blob[lo:hi]

    def decode_block(self, b: int):
        """(ids, tfs, dls) of global block b — decoded on first touch."""
        hit = self._cache.get(b)
        if hit is not None:
            return hit
        ri = int(self.block_row[b])
        j = int(self.block_local[b])
        r = self.rows[ri]
        doc_b = self._slice(bytes(r["doc_ids"]), r["block_doc_off"], j)
        gaps = varint_decode(doc_b).astype(np.int64)
        ids = np.cumsum(gaps)
        if j > 0:
            # first gap of a non-first block is relative to the previous
            # block's last doc (delta stream is contiguous per row)
            ids += int(r["block_last"][j - 1])
        if self.need_payload:
            tf_b = self._slice(bytes(r["tfs"]), r["block_tf_off"], j)
            dl_b = self._slice(bytes(r["dls"]), r["block_dl_off"], j)
            out = (
                ids,
                varint_decode(tf_b).astype(np.float64),
                varint_decode(dl_b).astype(np.float64),
            )
        else:
            tf_b = dl_b = b""
            out = (ids, None, None)
        self.stats["decoded_bytes"] += len(doc_b) + len(tf_b) + len(dl_b)
        self.stats["decoded_blocks"] += 1
        self._cache[b] = out
        return out


def and_topk_segment(
    pdf: pd.DataFrame,
    idfs: dict[int, float],
    avgdl: float,
    k: int | None,
    allowed: np.ndarray | None = None,
    scores: bool = True,
    stats: dict | None = None,
) -> pd.DataFrame:
    """Conjunctive (AND) match with block-granularity skipping — the
    skip-list intersection Lucene runs for ``operator:"and"`` queries
    (implicit in the reference's ES hand-off, ElasticIndexingStorage.
    java:1364-1375; SURVEY §4).

    The rarest term's postings are decoded in full and become the
    candidate list; every OTHER term then decodes ONLY the blocks a
    surviving candidate can fall in (searchsorted over block_last — the
    block directory is the skip list). A stopword AND a rare term decodes
    the rare list plus a handful of the stopword's blocks instead of the
    stopword's entire postings — pruning skips BYTES (decoded-bytes
    counter shared with the OR-path WAND, asserted in tests/test_wand.py).

    scores=False (intersection-only: non-relevance pages, counts) skips
    the tf/dl streams entirely and returns just the doc_id column.
    Score reduction runs in idfs insertion order (= sorted-term order)
    over the final candidate set — bit-identical to the exhaustive
    kernel's contract.
    """
    if stats is None:
        stats = {}
    for key in ("decoded_bytes", "total_bytes", "decoded_blocks",
                "total_blocks"):
        stats.setdefault(key, 0)
    if scores:
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    else:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})

    by_term: dict[int, list] = {}
    for _, row in pdf.iterrows():
        if len(row["block_last"]) == 0:
            continue
        by_term.setdefault(row["term_hash"], []).append(row)
    if any(t not in by_term for t in idfs):
        return empty  # conjunctive: a term absent from this segment
    lazy = {
        t: _LazyTermPostings(by_term[t], avgdl, idfs[t], stats,
                             need_payload=scores)
        for t in idfs
    }

    # rarest-first: fewest blocks ≈ smallest df drives the intersection
    order_terms = sorted(lazy, key=lambda t: lazy[t].n_blocks)
    t0 = lazy[order_terms[0]]
    cand = np.concatenate(
        [t0.decode_block(b)[0] for b in range(t0.n_blocks)]
    )
    if allowed is not None:
        # applying the filter FIRST shrinks the candidate set before any
        # other term decodes — fewer blocks touched downstream
        if len(allowed):
            pos = np.searchsorted(allowed, cand)
            pos = np.minimum(pos, len(allowed) - 1)
            cand = cand[allowed[pos] == cand]
        else:
            cand = cand[:0]
    if cand.size == 0:
        return empty

    decoded: dict[int, tuple] = {}
    for t in order_terms[1:]:
        tp = lazy[t]
        bi = np.searchsorted(tp.block_last, cand)
        needed = np.unique(bi[bi < tp.n_blocks])
        if needed.size == 0:
            return empty
        parts = [tp.decode_block(int(b)) for b in needed]
        # blocks are doc-ordered (rows sorted by first block_last,
        # disjoint ranges) — concatenation stays sorted for searchsorted
        ids = np.concatenate([p[0] for p in parts])
        pos = np.searchsorted(ids, cand)
        pos = np.minimum(pos, len(ids) - 1)
        cand = cand[ids[pos] == cand]
        if cand.size == 0:
            return empty
        if scores:
            decoded[t] = (
                ids,
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )

    if not scores:
        return pd.DataFrame({"doc_id": cand})

    score = np.zeros(cand.size, dtype=np.float64)
    for t in idfs:  # idfs order = sorted-term order (score contract)
        if t in decoded:
            ids, tfs, dls = decoded[t]
        else:  # the rarest term: gather from its (memoized) full decode
            tp = lazy[t]
            parts = [tp.decode_block(b) for b in range(tp.n_blocks)]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
        pos = np.searchsorted(ids, cand)
        score += idfs[t] * tf_norm(tfs[pos], dls[pos], avgdl)

    if k is not None and cand.size > k:
        # tie-aware selection (same contract as the exhaustive kernel)
        part = np.argpartition(-score, k - 1)
        kth = score[part[k - 1]]
        keep = score >= kth
        cand, score = cand[keep], score[keep]
    order = np.lexsort((cand, -score))
    if k is not None:
        order = order[:k]
    return pd.DataFrame({"doc_id": cand[order], "score": score[order]})


def wand_topk_segment(
    pdf: pd.DataFrame,
    idfs: dict[int, float],
    avgdl: float,
    k: int,
    stats: dict | None = None,
) -> pd.DataFrame:
    """Disjunctive (OR) block-max top-k for one segment's query postings.

    pdf: posting rows (term_hash, doc_ids, tfs, dls, block_*). idfs is
    keyed by term_hash; its insertion order is the term-lexicographic
    query order, which pins the float reduction order (bit-identical to
    the exhaustive kernel). stats (optional dict) accumulates
    decoded/total bytes+blocks — the lazy-decode evidence. Returns ≤k
    (doc_id, score) rows, score desc / doc_id asc.
    """
    if stats is None:
        stats = {}
    for key in ("decoded_bytes", "total_bytes", "decoded_blocks",
                "total_blocks"):
        stats.setdefault(key, 0)
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "score": pd.Series([], dtype="float64")}
    )
    if len(pdf) == 0:
        return empty

    by_term: dict[int, list] = {}
    for _, row in pdf.iterrows():
        if len(row["block_last"]) == 0:
            continue
        by_term.setdefault(row["term_hash"], []).append(row)
    # idfs-order iteration (= sorted-term order) pins the float reduction
    # order so WAND and the exhaustive kernel produce bit-identical scores
    terms: list[tuple[_LazyTermPostings, float]] = []
    for t in idfs:
        rows = by_term.get(t)
        if rows:
            terms.append((_LazyTermPostings(rows, avgdl, idfs[t], stats),
                          idfs[t]))
    if not terms:
        return empty

    # elementary intervals: cut doc space at every block boundary
    cuts = np.unique(
        np.concatenate(
            [tp.block_start for tp, _ in terms]
            + [tp.block_last + 1 for tp, _ in terms]
        )
    )
    lo = cuts[:-1]
    hi = cuts[1:] - 1  # inclusive
    total_ub = np.zeros(lo.shape, dtype=np.float64)
    for tp, _ in terms:
        bl, starts, ub = tp.block_last, tp.block_start, tp.ub
        # block covering interval i: first block with last_doc >= lo_i
        bi = np.searchsorted(bl, lo)
        safe = np.minimum(bi, len(bl) - 1)
        valid = (bi < len(bl)) & (starts[safe] <= hi)
        total_ub += np.where(valid, ub[safe], 0.0)

    order = np.argsort(-total_ub, kind="stable")

    top_docs = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=np.float64)
    theta = -np.inf
    for i in order:
        if total_ub[i] <= 0:
            break
        # strict margin: an interval whose bound ties θ could still hold a
        # lower-doc_id tie for k-th place, and float sums can differ by an
        # ulp — only skip when provably below the floor
        if len(top_docs) >= k and total_ub[i] < theta - 1e-9:
            break
        a, b = int(lo[i]), int(hi[i])
        # exact OR-scoring of docs in [a, b]: decode ONLY the covering
        # block of each term (intervals are elementary — within one block)
        ids_all, contrib_all = [], []
        for tp, idf in terms:
            bi = int(np.searchsorted(tp.block_last, a))
            if bi >= tp.n_blocks or tp.block_start[bi] > b:
                continue
            ids, tfs, dls = tp.decode_block(bi)
            s = int(np.searchsorted(ids, a, side="left"))
            e = int(np.searchsorted(ids, b, side="right"))
            if e > s:
                ids_all.append(ids[s:e])
                contrib_all.append(idf * tf_norm(tfs[s:e], dls[s:e], avgdl))
        if not ids_all:
            continue
        cat = np.concatenate(ids_all)
        con = np.concatenate(contrib_all)
        o = np.argsort(cat, kind="stable")
        cat, con = cat[o], con[o]
        starts_ = np.flatnonzero(np.concatenate(([True], cat[1:] != cat[:-1])))
        docs = cat[starts_]
        scores = np.add.reduceat(con, starts_)

        top_docs = np.concatenate([top_docs, docs])
        top_scores = np.concatenate([top_scores, scores])
        if len(top_docs) > k:
            # tie-aware prune: keep every doc tied with the k-th score —
            # a tied doc dropped here could be the deterministic (doc_id
            # asc) winner of the k-th slot
            part = np.argpartition(-top_scores, k - 1)
            kth = float(top_scores[part[k - 1]])
            keep = top_scores >= kth
            top_docs, top_scores = top_docs[keep], top_scores[keep]
            theta = kth
        elif len(top_docs) == k:
            theta = float(np.min(top_scores))

    if top_docs.size == 0:
        return empty
    o = np.lexsort((top_docs, -top_scores))[:k]
    return pd.DataFrame({"doc_id": top_docs[o], "score": top_scores[o]})

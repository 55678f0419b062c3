"""Block-max WAND: top-k pruning over compressed postings.

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
    docs are exactly scored (vectorized OR-accumulation over the decoded
    block slices) and pushed into a bounded k-heap. As soon as the next
    interval's ub ≤ current θ (k-th best score), everything left is
    provably below the heap floor — stop without decoding it.

This is the same pruning guarantee as block-max WAND (never skips a doc
that could enter the top-k) with batch-friendly inner loops. Equality
with the exhaustive scorer is asserted in tests on every fixture query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.bm25 import tf_norm
from ..functions.codec import delta_decode, varint_decode


def _decode_term(row) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    ids = delta_decode(bytes(row["doc_ids"])).astype(np.int64)
    tfs = varint_decode(bytes(row["tfs"])).astype(np.float64)
    dls = varint_decode(bytes(row["dls"])).astype(np.float64)
    block_last = np.asarray(row["block_last"], dtype=np.int64)
    return ids, tfs, dls, block_last


def _block_ub(row, avgdl: float) -> np.ndarray:
    """Per-block tf_norm upper bound from avgdl-independent metadata:
    tf_norm is increasing in tf and decreasing in dl, so
    tf_norm(max_tf, min_dl, avgdl) bounds every posting in the block —
    for the CURRENT avgdl (stays valid after incremental adds)."""
    max_tf = np.asarray(row["block_max_tf"], dtype=np.float64)
    min_dl = np.asarray(row["block_min_dl"], dtype=np.float64)
    return tf_norm(max_tf, min_dl, avgdl)


def wand_topk_segment(
    pdf: pd.DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
) -> pd.DataFrame:
    """Disjunctive (OR) block-max top-k for one segment's query postings.

    pdf: posting rows (term, doc_ids, tfs, dls, block_last, block_max).
    Returns ≤k (doc_id, score) rows, score desc / doc_id asc.
    """
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "score": pd.Series([], dtype="float64")}
    )
    if len(pdf) == 0:
        return empty

    # merge duplicate term rows (posting split across build partitions:
    # disjoint, ordered doc ranges — block arrays concatenate in doc order)
    by_term: dict[str, list] = {}
    for _, row in pdf.iterrows():
        ids, tfs, dls, block_last = _decode_term(row)
        if len(ids) == 0:
            continue
        bmax = _block_ub(row, avgdl)
        by_term.setdefault(row["term"], []).append(
            (ids, tfs, dls, block_last, bmax)
        )
    # sorted-term iteration pins the float reduction order so WAND and the
    # exhaustive kernel produce bit-identical OR scores
    terms = []
    for t, ps in sorted(by_term.items()):
        ps.sort(key=lambda p: int(p[0][0]))
        ids = np.concatenate([p[0] for p in ps])
        tfs = np.concatenate([p[1] for p in ps])
        dls = np.concatenate([p[2] for p in ps])
        block_last = np.concatenate([p[3] for p in ps])
        ub = np.concatenate([p[4] for p in ps]) * idfs[t]
        # block start docs: previous block's last + 1 (first block: ids[0])
        starts = np.empty_like(block_last)
        starts[0] = ids[0]
        starts[1:] = block_last[:-1] + 1
        terms.append((t, ids, tfs, dls, block_last, starts, ub))

    # elementary intervals: cut doc space at every block boundary
    cuts = np.unique(
        np.concatenate(
            [s for (_, _, _, _, bl, s, _) in terms]
            + [bl + 1 for (_, _, _, _, bl, _, _) in terms]
        )
    )
    lo = cuts[:-1]
    hi = cuts[1:] - 1  # inclusive
    total_ub = np.zeros(lo.shape, dtype=np.float64)
    for (_t, _ids, _tfs, _dls, bl, starts, ub) in terms:
        # block covering interval i: first block with last_doc >= lo_i
        bi = np.searchsorted(bl, lo)
        valid = (bi < len(bl)) & (np.where(bi < len(bl), starts[np.minimum(bi, len(bl) - 1)], 0) <= hi)
        contrib = np.where(valid, ub[np.minimum(bi, len(ub) - 1)], 0.0)
        total_ub += contrib

    order = np.argsort(-total_ub, kind="stable")

    top_docs = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=np.float64)
    theta = -np.inf
    decoded_blocks = 0
    for i in order:
        if total_ub[i] <= 0:
            break
        # strict margin: an interval whose bound ties θ could still hold a
        # lower-doc_id tie for k-th place, and float sums can differ by an
        # ulp — only skip when provably below the floor
        if len(top_docs) >= k and total_ub[i] < theta - 1e-9:
            break
        a, b = lo[i], hi[i]
        # exact OR-scoring of docs in [a, b]
        ids_all, contrib_all = [], []
        for (t, ids, tfs, dls, _bl, _st, _ub) in terms:
            s = np.searchsorted(ids, a, side="left")
            e = np.searchsorted(ids, b, side="right")
            if e > s:
                decoded_blocks += 1
                ids_all.append(ids[s:e])
                contrib_all.append(
                    idfs[t] * tf_norm(tfs[s:e], dls[s:e], avgdl)
                )
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

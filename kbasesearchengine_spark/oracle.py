"""Brute-force pure-Python BM25 oracle.

The analog of the reference's embedded-Elasticsearch assertions
(test/src/kbasesearchengine/test/search/ElasticIndexingStorageTest.java:
testMultiwordSearch 1382-1411 pins conjunctive AND semantics): an
independent implementation the Spark engine must rank-match exactly.
No Spark, no numpy tricks — deliberately naive.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from .functions.bm25 import B, K1
from .functions.tokenize import tokenize_py


@dataclass
class OracleIndex:
    doc_ids: list[int]
    tfs: list[Counter]  # per doc: term -> tf
    dls: list[int]
    n_docs: int
    avgdl: float
    df: Counter  # term -> doc freq


def build_oracle_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: list of (doc_id, text)."""
    doc_ids, tfs, dls = [], [], []
    df: Counter = Counter()
    for doc_id, text in docs:
        toks = tokenize_py(text)
        c = Counter(toks)
        doc_ids.append(doc_id)
        tfs.append(c)
        dls.append(len(toks))
        df.update(c.keys())
    n = len(doc_ids)
    avgdl = (sum(dls) / n) if n else 0.0
    return OracleIndex(doc_ids, tfs, dls, n, avgdl, df)


def import_math_idf(df: int, n: int) -> float:
    import math

    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def oracle_topk(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "and",
) -> list[tuple[int, float]]:
    """Rank by BM25 desc, tie-break doc_id asc.

    mode='and': doc must contain every distinct query token (reference
    `match` with operator "and", ElasticIndexingStorage.java:1364-1375).
    mode='or' : any token.
    """
    terms = sorted(set(tokenize_py(query)))
    if not terms:
        return []
    scored: list[tuple[int, float]] = []
    for i, doc_id in enumerate(idx.doc_ids):
        c = idx.tfs[i]
        present = [t for t in terms if c.get(t, 0) > 0]
        if mode == "and" and len(present) != len(terms):
            continue
        if not present:
            continue
        dl = idx.dls[i]
        s = 0.0
        for t in present:
            tf = c[t]
            s += import_math_idf(idx.df[t], idx.n_docs) * (
                tf / (tf + K1 * (1.0 - B + B * dl / idx.avgdl))
            )
        scored.append((doc_id, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]

"""Block-max WAND == exhaustive scoring, on every fixture query (the
north-rule proof obligation: pruning must be rank-identical)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.corpus import generate_corpus
from kbasesearchengine_spark.operators.indexer import IndexBuilder
from kbasesearchengine_spark.operators.topk import (
    InvertedIndex,
    _segment_topk_kernel,
    topk,
)
from kbasesearchengine_spark.functions.bm25 import idf as bm25_idf
from kbasesearchengine_spark.functions.hashing import term_hash


@pytest.fixture(scope="module")
def built(shared_index_dir):
    return shared_index_dir


QUERIES = [
    "license import",       # stopwords: dense postings, heavy pruning load
    "parser http cache",
    "rfah license",
    "quorum",
    "the import license parse",
]


@pytest.mark.parametrize("query", QUERIES)
def test_wand_equals_exhaustive_per_segment(spark, built, query):
    index = InvertedIndex(spark, built)
    terms = sorted(set(query.split()))
    n, avgdl = index.stats["n_docs"], index.stats["avgdl"]
    dfs = index.term_dfs(terms)
    terms = [t for t in terms if t in dfs]
    idfs = {term_hash(t): float(bm25_idf(dfs[t], n)) for t in terms}
    postings = index.postings.where(
        F.col("term_hash").isin(list(idfs))
    ).toPandas()
    for seg, pdf in postings.groupby("segment"):
        wand = _segment_topk_kernel(pdf, idfs, avgdl, 10, "or", use_wand=True)
        exact = _segment_topk_kernel(pdf, idfs, avgdl, 10, "or", use_wand=False)
        assert list(wand["doc_id"]) == list(exact["doc_id"]), f"seg {seg}"
        np.testing.assert_allclose(wand["score"], exact["score"], atol=1e-9)


def test_wand_end_to_end_matches_naive(spark, built):
    index = InvertedIndex(spark, built)
    got = topk(index, "license import the", k=10, mode="or", hydrate=False).collect()
    from kbasesearchengine_spark.operators.topk import topk_naive

    exp = topk_naive(index.docs, "license import the", k=10, mode="or").collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
    np.testing.assert_allclose(
        [r["score"] for r in got], [r["score"] for r in exp], atol=1e-9
    )


def test_wand_skips_decoding_bytes():
    """Lazy decode is real: on a stopword-heavy OR query the sweep stops
    before touching most of the stopword's blocks — decoded BYTES (not
    just scored FLOPs) are a fraction of the postings' total bytes, and
    results still equal the exhaustive kernel. Kernel-level with a
    synthetic 5000-doc segment (the shared fixture's ~100-doc segments
    fit in one 128-posting block — nothing to skip there)."""
    import pandas as pd

    from kbasesearchengine_spark.functions.codec import encode_grouped
    from kbasesearchengine_spark.functions.bm25 import idf as _idf
    from kbasesearchengine_spark.operators.wand import wand_topk_segment

    n = 5000
    rng = np.random.default_rng(7)

    def row(th, ids, tfs, dls):
        ids = np.asarray(ids, dtype=np.uint64)
        enc = encode_grouped(
            ids, np.asarray(tfs, dtype=np.uint64),
            np.asarray(dls, dtype=np.uint64),
            np.array([0]), np.array([len(ids)]), 128,
        )
        return {"term_hash": th, "df": len(ids),
                **{k: v[0] for k, v in enc.items()}}

    # stopword: every doc, tf 1, dl 100 -> ~39 blocks, tiny ub
    common = row(1, np.arange(n), np.ones(n), np.full(n, 100))
    # rare: 50 CLUSTERED docs (one doc-id region -> its single block's
    # upper bound covers only the intervals there), huge tf, small dl ->
    # dominates top-10; everywhere else only the stopword's negligible
    # upper bound remains and the sweep stops without decoding
    rare_ids = np.arange(1000, 1050)
    rare = row(2, rare_ids, rng.integers(5, 21, 50), np.full(50, 50))
    pdf = pd.DataFrame([common, rare])

    avgdl = 100.0
    idfs = {1: float(_idf(n, n)), 2: float(_idf(50, n))}
    agg = {"decoded_bytes": 0, "total_bytes": 0,
           "decoded_blocks": 0, "total_blocks": 0}
    wand = wand_topk_segment(pdf, idfs, avgdl, 10, stats=agg)
    exact = _segment_topk_kernel(pdf, idfs, avgdl, 10, "or", use_wand=False)
    assert list(wand["doc_id"]) == list(exact["doc_id"])
    np.testing.assert_allclose(wand["score"], exact["score"], atol=1e-9)
    assert agg["total_blocks"] > 35  # ~40 common + 1 rare
    # the pruning skips MOST of the stopword's blocks, by bytes
    assert agg["decoded_blocks"] < agg["total_blocks"] * 0.6, agg
    assert agg["decoded_bytes"] < agg["total_bytes"] * 0.6, agg

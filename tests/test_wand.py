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
    idfs = {t: float(bm25_idf(dfs[t], n)) for t in terms}
    postings = index.postings.where(F.col("term").isin(terms)).toPandas()
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

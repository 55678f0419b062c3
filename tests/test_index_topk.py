"""End-to-end golden tests: build index → query → rank-identical to oracle.

The analog of the reference's embedded-ES integration suite
(ElasticIndexingStorageTest.java): full pipeline on a deterministic corpus,
asserting exact top-k docIDs, scores (atol 1e-9), and the per-row sha256
invariant.
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.corpus import generate_corpus, generate_corpus_pandas
from kbasesearchengine_spark.operators.indexer import IndexBuilder
from kbasesearchengine_spark.operators.topk import InvertedIndex, topk, topk_naive
from kbasesearchengine_spark.oracle import build_oracle_index, oracle_topk

from conftest import SHARED_ROWS

N_ROWS = SHARED_ROWS

QUERIES = [
    "rfah",               # rare planted term
    "license",            # stopword (in >90% of docs)
    "parser http",        # two mid-frequency terms, AND
    "quorum license",     # rare + stopword
    "license import the", # stopwords only, 3-term AND
    "zz_absent_token",    # not in corpus -> empty
    "RfaH",               # case variant must equal lowercase
    "parse_",             # term with underscore prefix handling
]


@pytest.fixture(scope="module")
def built(spark, shared_index_dir):
    import json, os
    with open(os.path.join(shared_index_dir, "stats.json")) as f:
        stats = json.load(f)
    return shared_index_dir, stats


@pytest.fixture(scope="module")
def oracle_idx():
    pdf = generate_corpus_pandas(N_ROWS)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    docs = list(zip(range(len(pdf)), pdf["content"]))
    return build_oracle_index(docs), pdf


def test_stats_match_oracle(built, oracle_idx):
    _, stats = built
    oidx, _ = oracle_idx
    assert stats["n_docs"] == oidx.n_docs == N_ROWS
    assert abs(stats["avgdl"] - oidx.avgdl) < 1e-9


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("mode", ["and", "or"])
def test_topk_rank_identical(spark, built, oracle_idx, query, mode):
    idx_dir, _ = built
    oidx, _ = oracle_idx
    index = InvertedIndex(spark, idx_dir)
    got = topk(index, query, k=10, mode=mode, hydrate=False).collect()
    exp = oracle_topk(oidx, query, k=10, mode=mode)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp], f"{query} {mode}"
    np.testing.assert_allclose(
        [r["score"] for r in got], [s for _, s in exp], atol=1e-9
    )


@pytest.mark.parametrize("query", ["rfah", "parser http", "license import"])
def test_naive_path_matches_indexed(spark, built, query):
    idx_dir, _ = built
    index = InvertedIndex(spark, idx_dir)
    got_idx = topk(index, query, k=10, mode="and", hydrate=False).collect()
    got_naive = topk_naive(index.docs, query, k=10, mode="and").collect()
    assert [r["doc_id"] for r in got_idx] == [r["doc_id"] for r in got_naive]
    np.testing.assert_allclose(
        [r["score"] for r in got_idx],
        [r["score"] for r in got_naive],
        atol=1e-9,
    )


def test_sha256_invariant(spark, built, oracle_idx):
    """Every hydrated result row's sha256 equals sha256 of corpus content."""
    idx_dir, _ = built
    _, pdf = oracle_idx
    index = InvertedIndex(spark, idx_dir)
    res = topk(index, "parser http", k=10, mode="and").collect()
    assert len(res) > 0
    by_key = {
        (r.repo, r.path, r.commit): hashlib.sha256(r.content.encode()).hexdigest()
        for _, r in pdf.iterrows()
    }
    for row in res:
        assert row["sha256"] == by_key[(row["repo"], row["path"], row["commit"])]
        assert (
            hashlib.sha256(row["content"].encode()).hexdigest() == row["sha256"]
        )


def test_doc_filter_applied_before_ranking(spark, built):
    idx_dir, _ = built
    index = InvertedIndex(spark, idx_dir)
    res = topk(
        index, "license", k=10, mode="and", doc_filter=F.col("lang") == "python"
    ).collect()
    assert len(res) > 0
    assert all(r["lang"] == "python" for r in res)
    # the filtered top-k must contain python docs ranked by score among
    # python docs only — i.e. not just the unfiltered winners post-filtered
    unfiltered = topk(index, "license", k=10, mode="and", hydrate=False).collect()
    assert {r["doc_id"] for r in res} != set() and len(res) == 10 or len(unfiltered) < 10


def test_doc_id_assignment_is_sorted_rank(spark, built, oracle_idx):
    idx_dir, _ = built
    _, pdf = oracle_idx
    index = InvertedIndex(spark, idx_dir)
    docs = index.docs.select("doc_id", "repo", "path", "commit").orderBy("doc_id")
    got = docs.collect()
    assert [r["doc_id"] for r in got] == list(range(N_ROWS))
    assert [(r["repo"], r["path"], r["commit"]) for r in got] == list(
        zip(pdf["repo"], pdf["path"], pdf["commit"])
    )


def test_doc_id_offsets_broadcast_path_identical(spark, monkeypatch):
    """assign_doc_ids has two physical offset-lookup plans (literal array
    vs broadcast join past _OFFSETS_LITERAL_MAX partitions — the 10^4+
    partition regime of a real cluster). Both must assign identical ids."""
    from kbasesearchengine_spark.operators import indexer as ix

    df = spark.createDataFrame(
        [("r%03d" % (i % 37), "p%03d" % i, "c", "x y z") for i in range(200)],
        "repo string, path string, commit string, content string",
    )
    lit_ids, _, _ = ix.assign_doc_ids(df, ["repo", "path"], num_partitions=8,
                                      compute_dl="content")
    a = {(r["repo"], r["path"]): r["doc_id"] for r in lit_ids.collect()}
    monkeypatch.setattr(ix, "_OFFSETS_LITERAL_MAX", 2)
    bj_ids, _, _ = ix.assign_doc_ids(df, ["repo", "path"], num_partitions=8,
                                     compute_dl="content")
    b = {(r["repo"], r["path"]): r["doc_id"] for r in bj_ids.collect()}
    assert a == b
    assert sorted(a.values()) == list(range(200))


def test_tiny_flush_buffer_rank_identical(spark, monkeypatch, tmp_path):
    """KBSE_FLUSH_PAIRS bounds the flush kernel's working set (sized for
    the cache tier — see indexer.build_postings_from_docs). A tiny budget
    forces MANY flushes per partition, so every common term's posting
    splits into fragment rows; readers must merge them back to results
    identical to the shared (single-flush) index."""
    corpus = generate_corpus(spark, 400, parallelism=4)
    # a flush can only trigger BETWEEN Arrow batches — shrink the batch
    # so each build partition spans several, then every batch overflows
    # the 100-pair budget and flushes
    monkeypatch.setenv("KBSE_FLUSH_PAIRS", "100")
    batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old_batch = spark.conf.get(batch_key, None)
    spark.conf.set(batch_key, "4")
    frag_dir = str(tmp_path / "frag_idx")
    try:
        IndexBuilder(spark, frag_dir, num_segments=4, segments_per_commit=4).build(
            corpus, key_cols=["repo", "path", "commit"]
        )
    finally:
        if old_batch is None:
            spark.conf.unset(batch_key)
        else:
            spark.conf.set(batch_key, old_batch)
    monkeypatch.delenv("KBSE_FLUSH_PAIRS")
    ref_dir = str(tmp_path / "ref_idx")
    IndexBuilder(spark, ref_dir, num_segments=4, segments_per_commit=4).build(
        corpus, key_cols=["repo", "path", "commit"]
    )
    frag, ref = InvertedIndex(spark, frag_dir), InvertedIndex(spark, ref_dir)
    # the tiny budget really did fragment the postings
    assert frag.postings.count() > 1.5 * ref.postings.count()
    for q, mode in [("license import", "and"), ("parser http", "or"), ("rfah", "and")]:
        a = [(r["doc_id"], round(r["score"], 9))
             for r in topk(frag, q, k=10, mode=mode, hydrate=False).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in topk(ref, q, k=10, mode=mode, hydrate=False).collect()]
        assert a == b, q

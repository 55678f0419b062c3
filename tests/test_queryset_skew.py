"""Full reference query set rank-identity + pathological skew build."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.corpus import generate_corpus_pandas
from kbasesearchengine_spark.functions.hashing import term_hash
from kbasesearchengine_spark.operators.indexer import IndexBuilder
from kbasesearchengine_spark.operators.topk import InvertedIndex, topk
from kbasesearchengine_spark.oracle import build_oracle_index, oracle_topk
from kbasesearchengine_spark.queryset import reference_queries


@pytest.fixture(scope="module")
def oracle_idx():
    pdf = generate_corpus_pandas(800)
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return build_oracle_index(list(zip(range(len(pdf)), pdf["content"])))


def test_reference_query_set_rank_identity(spark, shared_index_dir, oracle_idx):
    """All 50 reference queries, both against the brute-force oracle."""
    index = InvertedIndex(spark, shared_index_dir)
    qs = reference_queries()
    assert len(qs) == 50
    failures = []
    for qid, text, mode in qs:
        got = topk(index, text, k=10, mode=mode, hydrate=False).collect()
        exp = oracle_topk(oracle_idx, text, k=10, mode=mode)
        if [r["doc_id"] for r in got] != [d for d, _ in exp]:
            failures.append((qid, text, mode, "rank"))
            continue
        if not np.allclose(
            [r["score"] for r in got], [s for _, s in exp], atol=1e-9
        ):
            failures.append((qid, text, mode, "score"))
    assert not failures, failures


def test_pathological_skew_build(spark, tmp_path):
    """A term present in EVERY doc with high tf (worst-case stopword skew)
    must build and query correctly — the segment sharding is the salt."""
    n = 400
    rows = [
        (
            f"org{i}", f"p{i}.py", f"c{i:040d}", "python",
            ("omnipresent " * 50) + f"unique_{i} filler{i % 7}",
        )
        for i in range(n)
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    idx_dir = str(tmp_path / "skew")
    IndexBuilder(spark, idx_dir, num_segments=8, segments_per_commit=8).build(
        corpus, key_cols=["repo", "path", "commit"]
    )
    index = InvertedIndex(spark, idx_dir)
    # the stopword's postings are split across all 8 segments
    segs = {
        r["segment"]
        for r in index.postings.where(
            F.col("term_hash") == term_hash("omnipresent")
        ).collect()
    }
    assert len(segs) == 8
    assert index.term_dfs(["omnipresent"])["omnipresent"] == n
    res = topk(index, "omnipresent", k=10, mode="and", hydrate=False).collect()
    assert len(res) == 10
    # a unique term co-occurring with the stopword still resolves exactly
    res2 = topk(index, "omnipresent unique_37", k=10, mode="and").collect()
    assert len(res2) == 1 and res2[0]["path"] == "p37.py"


def test_minhash_mega_cluster_bounded(spark):
    """A 500-way identical-doc cluster must NOT emit 500²/2 LSH pairs
    (dedup.py bucket fan-out guards): the exact-dup prefilter collapses
    the cluster to one representative, and the representative still pairs
    with true near-dups. dedup_exact owns the identical-pair set."""
    from kbasesearchengine_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(500)]
    # two near-dups of the cluster text (one token changed) + unrelated
    rows += [(1000, base.replace("lazy", "sleepy")),
             (1001, base.replace("quick", "speedy")),
             (2000, "completely different content with other words entirely")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    pairs = dedup.dedup_minhash_candidates(docs, "doc_id", "text").collect()
    ids_in_pairs = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    # bounded: the 500-cluster contributes ONE representative (min id 0),
    # not 124,750 intra-cluster pairs
    assert len(pairs) <= 10, f"fan-out not bounded: {len(pairs)} pairs"
    assert 0 in ids_in_pairs           # representative survives
    assert not ids_in_pairs & set(range(1, 500))  # dups collapsed
    assert {1000, 1001} <= ids_in_pairs  # true near-dups still found
    # the identical pairs come from the exact path
    exact = dedup.dedup_exact(docs, "doc_id", "text")
    assert exact.count() == 499
    assert exact.agg(F.min("dup_of")).collect()[0][0] == 0

    # the max_bucket backstop alone (prefilter off) also bounds the blast:
    # with a cap the mega-bucket is dropped wholesale
    capped = dedup.dedup_minhash_candidates(
        docs, "doc_id", "text", max_bucket=50, exact_prefilter=False
    ).collect()
    intra = [r for r in capped
             if r["id_a"] < 500 and r["id_b"] < 500]
    assert not intra, "over-cap bucket must not emit intra-cluster pairs"

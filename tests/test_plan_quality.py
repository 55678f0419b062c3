"""Physical-plan audits: the 100-TB checklist, asserted from explain().

Catalyst must be doing the work we rely on at scale: filter pushdown to
parquet, column pruning, broadcast joins for dims, partition pruning on
the segment directory layout.
"""

import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.corpus import generate_corpus
from kbasesearchengine_spark.operators.indexer import IndexBuilder
from kbasesearchengine_spark.operators.topk import InvertedIndex


@pytest.fixture(scope="module")
def index(spark, shared_index_dir):
    return InvertedIndex(spark, shared_index_dir)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _full_plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_term_filter_pushed_to_postings_scan(index):
    from kbasesearchengine_spark.functions.hashing import term_hash

    df = index.postings.where(
        F.col("term_hash").isin(term_hash("license"), term_hash("parser"))
    )
    plan = _full_plan(df)
    assert "PushedFilters" in plan
    assert (
        "In(term_hash" in plan
        or "term_hash" in plan.split("PushedFilters")[1][:200]
    )


def test_postings_scan_prunes_columns(index):
    from kbasesearchengine_spark.functions.hashing import term_hash

    df = index.postings.where(
        F.col("term_hash") == term_hash("license")
    ).select("segment", "df")
    plan = _full_plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_ids" not in read_schema  # heavy blob column NOT read
    assert "tfs" not in read_schema


def test_segment_partition_pruning(index):
    df = index.postings.where(F.col("segment") == 2)
    plan = _full_plan(df)
    # segment is a hive-style partition column -> partition filters, and the
    # blob columns are still listed in schema but only matching dirs scanned
    assert "PartitionFilters" in plan
    seg_part = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "segment" in seg_part


def test_docs_metadata_filter_pushed(index):
    df = index.docs.where(F.col("lang") == "python").select("doc_id")
    plan = _full_plan(df)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "lang" in pushed


def test_small_dim_join_broadcasts(spark, index):
    dim = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    j = index.docs.join(F.broadcast(dim), "doc_id")
    assert "BroadcastHashJoin" in _plan(j)


def test_topk_final_sort_is_bounded(index):
    """Global top-k must be TakeOrdered (k-row heap merge), not a full sort."""
    from kbasesearchengine_spark.operators.topk import topk

    df = topk(index, "license import", k=10, mode="and", hydrate=False)
    assert "TakeOrderedAndProject" in _plan(df)


def test_ann_bucketed_partition_pruning(spark, tmp_path):
    """The write_bucketed ANN layout must turn bucket probing into
    PARTITION pruning (directory-level), not a data filter — the whole
    point of the layout at 100 TB."""
    import numpy as np

    from kbasesearchengine_spark.operators import ann

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((300, 16)).astype("float32")
    pdf = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(pdf, "vec_id bigint, embedding array<float>")
    path = str(tmp_path / "emb_bucketed")
    ann.write_bucketed(emb, path, dim=16)

    q = [float(x) for x in vecs[0]]
    out = ann.cosine_topk_lsh_indexed(spark, path, q, k=5)
    plan = out._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "bucket" in part

    # and the probe answers match the scan-time LSH variant exactly
    got = [(r["vec_id"], round(r["cosine"], 9)) for r in out.collect()]
    exp = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ann.cosine_topk_lsh(emb, q, k=5).collect()
    ]
    assert got == exp
    assert got[0][0] == 0  # the query vector itself is its own top-1


def test_filtered_topk_broadcasts_candidates_not_docs(index):
    """Conjunctive filtered BM25 must ship the (df-bounded) CANDIDATE set
    to the predicate-pruned docs scan — NOT the full filtered doc list
    into a per-segment cogroup (at 10^12 docs a lang='en'-style predicate
    passes ~10^11 rows; candidates are bounded by the rarest term's df).
    The stopword fallback (candidate estimate above FILTER_CANDIDATE_MAX)
    keeps the cogroup."""
    from kbasesearchengine_spark.operators import topk as topk_mod
    from kbasesearchengine_spark.operators.topk import topk

    df = topk(index, "license import", k=10, mode="and",
              doc_filter=F.col("lang") == "python", hydrate=False)
    plan = _plan(df)
    full = _full_plan(df)
    # the candidate set is the broadcast side of a hash join
    assert "BroadcastHashJoin" in plan
    # no cogroup on the selective path
    assert "FlatMapCoGroupsInPandas" not in plan
    # the doc predicate reaches the parquet scan
    pushed = full.split("PushedFilters:")
    assert any("lang" in p.splitlines()[0] for p in pushed[1:])
    # results identical to the cogroup fallback (force it via the bound)
    rows_fast = [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]
    orig = topk_mod.FILTER_CANDIDATE_MAX
    topk_mod.FILTER_CANDIDATE_MAX = 0
    try:
        df_slow = topk(index, "license import", k=10, mode="and",
                       doc_filter=F.col("lang") == "python", hydrate=False)
        assert "FlatMapCoGroupsInPandas" in _plan(df_slow)
        rows_slow = [(r["doc_id"], round(r["score"], 9))
                     for r in df_slow.collect()]
    finally:
        topk_mod.FILTER_CANDIDATE_MAX = orig
    assert rows_fast == rows_slow and len(rows_fast) > 0

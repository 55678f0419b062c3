"""Incremental add (M6) + merge-after-add: queries see the union with
updated global stats, verified against the oracle over the full corpus.
Also pins the O(new) property (base partitions untouched by an add) and
the batch_id idempotence token."""

import os

import numpy as np
import pytest

from kbasesearchengine_spark.corpus import generate_corpus, generate_corpus_pandas
from kbasesearchengine_spark.operators.indexer import IndexBuilder, add_documents
from kbasesearchengine_spark.operators.topk import InvertedIndex, topk
from kbasesearchengine_spark.oracle import build_oracle_index, oracle_topk


def _partition_snapshot(root: str) -> dict:
    """{segment dir -> sorted (file, mtime_ns)} for change detection."""
    out = {}
    for d in os.listdir(root):
        if not d.startswith("segment="):
            continue
        p = os.path.join(root, d)
        out[d] = sorted(
            (f, os.stat(os.path.join(p, f)).st_mtime_ns)
            for f in os.listdir(p)
            if not f.startswith((".", "_"))
        )
    return out

BASE, EXTRA = 400, 150


def test_incremental_add_matches_full_oracle(spark, tmp_path):
    idx_dir = str(tmp_path / "incidx")
    full_pdf = generate_corpus_pandas(BASE + EXTRA)

    base = generate_corpus(spark, BASE, parallelism=4)
    IndexBuilder(spark, idx_dir, num_segments=4, segments_per_commit=4).build(
        base, key_cols=["repo", "path", "commit"]
    )

    # the incremental batch = rows BASE..BASE+EXTRA of the same generator
    extra_pdf = generate_corpus_pandas(BASE + EXTRA).iloc[BASE:]
    extra = spark.createDataFrame(extra_pdf)
    info = add_documents(spark, idx_dir, extra, key_cols=["repo", "path", "commit"])
    assert info["added"] == EXTRA
    assert info["n_docs"] == BASE + EXTRA

    index = InvertedIndex(spark, idx_dir)

    # oracle over the UNION corpus in engine doc order: base sorted block,
    # then extra sorted block at the new segment boundary
    base_sorted = full_pdf.iloc[:BASE].sort_values(["repo", "path", "commit"])
    extra_sorted = extra_pdf.sort_values(["repo", "path", "commit"])
    docs_rows = index.docs.select("doc_id", "repo", "path", "commit").collect()
    id_by_key = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in docs_rows}
    oracle_docs = [
        (id_by_key[(r.repo, r.path, r.commit)], r.content)
        for _, r in base_sorted.iterrows()
    ] + [
        (id_by_key[(r.repo, r.path, r.commit)], r.content)
        for _, r in extra_sorted.iterrows()
    ]
    oidx = build_oracle_index(oracle_docs)

    for query, mode in [("license import", "and"), ("rfah", "and"),
                        ("parser http cache", "or")]:
        got = topk(index, query, k=10, mode=mode, hydrate=False).collect()
        exp = oracle_topk(oidx, query, k=10, mode=mode)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], (query, mode)
        np.testing.assert_allclose(
            [r["score"] for r in got], [s for _, s in exp], atol=1e-9
        )


def test_add_is_o_new_and_idempotent(spark, tmp_path):
    """An incremental add must not rewrite existing docs/postings/terms
    files (O(new) commits), and retrying the same logical add with a
    batch_id token must be a no-op."""
    idx_dir = str(tmp_path / "onew")
    base = generate_corpus(spark, 300, parallelism=4)
    IndexBuilder(spark, idx_dir, num_segments=4, segments_per_commit=4).build(
        base, key_cols=["repo", "path", "commit"]
    )
    before_p = _partition_snapshot(os.path.join(idx_dir, "postings"))
    before_d = _partition_snapshot(os.path.join(idx_dir, "docs"))

    extra_pdf = generate_corpus_pandas(400).iloc[300:]
    extra = spark.createDataFrame(extra_pdf)
    info = add_documents(
        spark, idx_dir, extra, key_cols=["repo", "path", "commit"],
        batch_id="batch-A",
    )
    assert info["added"] == 100

    after_p = _partition_snapshot(os.path.join(idx_dir, "postings"))
    after_d = _partition_snapshot(os.path.join(idx_dir, "docs"))
    # every pre-existing partition byte-identical (same files, same mtimes)
    for seg, files in before_p.items():
        assert after_p[seg] == files, f"base postings partition {seg} rewritten"
    for seg, files in before_d.items():
        assert after_d[seg] == files, f"base docs partition {seg} rewritten"
    assert len(after_p) > len(before_p)  # new segments appended
    # terms: per-batch partitions, base batch untouched
    tdirs = sorted(
        d for d in os.listdir(os.path.join(idx_dir, "terms"))
        if d.startswith("batch=")
    )
    assert len(tdirs) == 2 and tdirs[0] == "batch=0"

    # exactly-once: same batch_id retries without duplicating anything
    stats_before = InvertedIndex(spark, idx_dir).stats
    info2 = add_documents(
        spark, idx_dir, extra, key_cols=["repo", "path", "commit"],
        batch_id="batch-A",
    )
    assert info2["added"] == 100  # reported from the committed marker
    idx = InvertedIndex(spark, idx_dir)
    assert idx.stats["n_docs"] == stats_before["n_docs"] == 400
    assert idx.docs.count() == 400
    assert _partition_snapshot(os.path.join(idx_dir, "postings")) == after_p


def test_add_to_empty_index(spark, tmp_path):
    """max(doc_id) on an empty docs table must not crash the add."""
    idx_dir = str(tmp_path / "emptyadd")
    empty = generate_corpus(spark, 50, parallelism=2).limit(0)
    IndexBuilder(spark, idx_dir, num_segments=2, segments_per_commit=2).build(
        empty, key_cols=["repo", "path", "commit"]
    )
    extra = generate_corpus(spark, 50, parallelism=2)
    info = add_documents(spark, idx_dir, extra, key_cols=["repo", "path", "commit"])
    assert info["added"] == 50
    assert InvertedIndex(spark, idx_dir).stats["n_docs"] == 50

"""Incremental add (M6) + merge-after-add: queries see the union with
updated global stats, verified against the oracle over the full corpus."""

import numpy as np
import pytest

from kbasesearchengine_spark.corpus import generate_corpus, generate_corpus_pandas
from kbasesearchengine_spark.operators.indexer import IndexBuilder, add_documents
from kbasesearchengine_spark.operators.topk import InvertedIndex, topk
from kbasesearchengine_spark.oracle import build_oracle_index, oracle_topk

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

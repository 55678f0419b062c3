"""Round-6 phase-isolation benchmarks (guide §1.4): noop sinks, per-phase
timings, labelled jobs. NOT the driver bench — bench.py stays frozen; this
file exists so OPTIMIZATION_r06.md can cite phase-level numbers.

Usage: python bench_extra.py [phase ...]
  phases: dedup, build, queries, ann, all (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from kbasesearchengine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS_ROWS = int(os.environ.get("BENCH_CORPUS_ROWS", "20000"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, n=3):
    """Best + worst of n runs, labelled in the UI."""
    runs = []
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return {"best": min(runs), "worst": max(runs), "runs": runs}


def main() -> None:
    phases = set(sys.argv[1:]) or {"all"}
    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out: dict = {"sf": SF_DIR, "cpus": CPUS}

    if phases & {"dedup", "all"}:
        from kbasesearchengine_spark.operators import dedup

        # full operator, as bench.py times it
        out["dedup_minhash_count"] = timed(
            spark, "dedup_minhash: full count",
            lambda: dedup.dedup_minhash_candidates(docs, "doc_id", "text").count(),
        )
        # phase isolation
        d = docs.select(F.col("doc_id").alias("id"), F.col("text").alias("__t"))
        surv = (
            d.select("id", F.md5("__t").alias("__h"))
            .groupBy("__h").agg(F.min("id").alias("id")).select("id")
        )
        pre = d.join(surv, "id", "left_semi")
        out["dedup_prefilter"] = timed(
            spark, "dedup: exact prefilter", lambda: noop(pre.select("id")))
        sigs = dedup.minhash_signatures(pre, "id", "__t")
        out["dedup_signatures"] = timed(
            spark, "dedup: signatures", lambda: noop(sigs))
        buckets = dedup.minhash_band_buckets(sigs)
        out["dedup_buckets"] = timed(
            spark, "dedup: band buckets", lambda: noop(buckets))

    if phases & {"build", "all"}:
        from kbasesearchengine_spark.corpus import generate_corpus
        from kbasesearchengine_spark.operators.indexer import IndexBuilder

        corpus_dir = tempfile.mkdtemp(prefix="kbse_bx_corpus_")
        corpus_pq = os.path.join(corpus_dir, "corpus.parquet")
        generate_corpus(spark, CORPUS_ROWS, parallelism=CPUS).write.mode(
            "overwrite").parquet(corpus_pq)
        corpus = spark.read.parquet(corpus_pq)

        def build_once(tag):
            idx = tempfile.mkdtemp(prefix=f"kbse_bx_idx_{tag}_")
            b = IndexBuilder(spark, idx, num_segments=CPUS,
                             segments_per_commit=CPUS)
            b.build(corpus, key_cols=["repo", "path", "commit"], resume=False)

        out["index_build_corpus"] = timed(
            spark, "build: corpus full", lambda: build_once("c"), n=3)

        def build_docs_once(tag):
            idx = tempfile.mkdtemp(prefix=f"kbse_bx_idxd_{tag}_")
            b = IndexBuilder(spark, idx, num_segments=max(4, CPUS // 4),
                             segments_per_commit=max(4, CPUS // 4))
            b.build(docs, key_cols=["doc_id"], text_col="text",
                    doc_id_col="doc_id", resume=False)

        out["index_build_documents"] = timed(
            spark, "build: documents full", lambda: build_docs_once("d"), n=3)

        # sub-phases of the corpus build
        from kbasesearchengine_spark.operators.indexer import (
            build_docs as _bdocs, build_postings_from_docs)

        def phase_docs():
            d2, n, tdl = _bdocs(corpus, ["repo", "path", "commit"],
                                "content", None, CPUS, carry_tokens=True)
            noop(d2.select("doc_id", "segment", "dl"))
            sc = getattr(d2, "_kbse_sort_cache", None)
            if sc is not None:
                sc.unpersist()

        out["build_phase_assign_ids"] = timed(
            spark, "build: assign ids + tokenize", phase_docs, n=2)

        d2, n, tdl = _bdocs(corpus, ["repo", "path", "commit"], "content",
                            None, CPUS, carry_tokens=True)
        cached = d2.persist()
        cached.count()
        out["build_phase_postings_kernel"] = timed(
            spark, "build: postings kernel (noop)",
            lambda: noop(build_postings_from_docs(cached, "content",
                                                  pre_partitioned=True)),
            n=2)
        idxp = tempfile.mkdtemp(prefix="kbse_bx_post_")
        out["build_phase_postings_write"] = timed(
            spark, "build: postings write parquet",
            lambda: build_postings_from_docs(cached, "content",
                                             pre_partitioned=True)
            .write.mode("overwrite").partitionBy("segment")
            .parquet(os.path.join(idxp, "postings")),
            n=2)
        cached.unpersist()

    if phases & {"queries", "all"}:
        from kbasesearchengine_spark.corpus import generate_corpus
        from kbasesearchengine_spark.operators.indexer import IndexBuilder
        from kbasesearchengine_spark.operators.topk import InvertedIndex, topk

        corpus_dir = tempfile.mkdtemp(prefix="kbse_bx_corpus2_")
        corpus_pq = os.path.join(corpus_dir, "corpus.parquet")
        generate_corpus(spark, CORPUS_ROWS, parallelism=CPUS).write.mode(
            "overwrite").parquet(corpus_pq)
        corpus = spark.read.parquet(corpus_pq)
        idx_dir = tempfile.mkdtemp(prefix="kbse_bx_qidx_")
        IndexBuilder(spark, idx_dir, num_segments=CPUS,
                     segments_per_commit=CPUS).build(
            corpus, key_cols=["repo", "path", "commit"], resume=False)
        index = InvertedIndex(spark, idx_dir)
        for name, text, mode in [
            ("q_and_common", "parser http", "and"),
            ("q_and_rare", "rfah", "and"),
            ("q_or", "quorum parser cache", "or"),
            ("q_and_stop", "license import the", "and"),
        ]:
            out[name] = timed(
                spark, f"query: {name}",
                lambda text=text, mode=mode: topk(
                    index, text, k=10, mode=mode, hydrate=False).collect(),
                n=5)
        # term_dfs job alone (the first of the two jobs every query pays)
        out["q_term_dfs_only"] = timed(
            spark, "query: term_dfs job",
            lambda: index.term_dfs(["parser", "http"]), n=5)

    if phases & {"ann", "all"}:
        from kbasesearchengine_spark.operators import ann

        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        qvec = [float(x) for x in
                emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
        out["ann_cosine_topk"] = timed(
            spark, "ann: cosine topk",
            lambda: ann.cosine_topk(emb, qvec, k=10).collect(), n=5)
        out["ann_rows_dims"] = {
            "rows": emb.count(),
            "dim": len(qvec),
        }

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

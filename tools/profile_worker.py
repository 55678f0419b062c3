"""Per-stage build profiler: one fresh JVM at a given parallelism level.

Decomposes the posting-build ("group-0") phase into its pipeline stages by
timing successively larger prefixes of the stage graph over the SAME
persisted assigned-docs frame:

  jvm     = JVM-only tokenize+hash (sum(size(hash_tokens_expr)); no Arrow)
  arrow   = jvm + Arrow transfer + minimal Python (sum of lens per batch)
  kernel  = arrow + tf-aggregation + sort + varint encode (count(), no write)
  full    = kernel + parquet write (the real group-0)

Stage deltas isolate: Arrow boundary cost (arrow-jvm), numpy kernel cost
(kernel-arrow), write cost (full-kernel). Run at two levels under taskset
to see WHICH stage fails to scale.

Usage: python tools/profile_worker.py <cores> <corpus_parquet> <workdir>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kbasesearchengine_spark.functions.tokenize import hash_tokens_expr  # noqa: E402
from kbasesearchengine_spark.operators.indexer import (  # noqa: E402
    build_docs,
    build_postings_from_docs,
)
from kbasesearchengine_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    corpus_pq = sys.argv[2]
    work = sys.argv[3]
    spark = get_spark(f"prof-{cores}", cores=cores, shuffle_partitions=cores)
    corpus = spark.read.parquet(corpus_pq)

    # warmup: small end-to-end build (JIT the codegen'd regex/hash +
    # spin up python workers) — steady-state measurement
    wdocs, _, _ = build_docs(
        corpus.limit(20000), ["repo", "path", "commit"], "content", None, 4,
        carry_tokens=True, keep_text=False,
    )
    wframe = wdocs.persist()
    build_postings_from_docs(wframe, "content", pre_partitioned=True).agg(
        F.count("*")
    ).collect()
    wframe.unpersist()

    t = {}

    # carry-tokens layout: the ONE tokenize+hash pass runs inside this
    # persisted frame (shuffle_persist therefore includes it)
    t0 = time.time()
    docs, n_docs, total_dl = build_docs(
        corpus, ["repo", "path", "commit"], "content", None, 32,
        carry_tokens=True, keep_text=False,
    )
    frame = docs.persist()
    frame.count()
    t["shuffle_tokenize_persist"] = round(time.time() - t0, 2)
    sc = getattr(docs, "_kbse_sort_cache", None)

    t0 = time.time()
    frame.drop("_toks").write.mode("overwrite").partitionBy("segment").parquet(
        os.path.join(work, f"docs{cores}")
    )
    t["docs_write"] = round(time.time() - t0, 2)
    if sc is not None:
        sc.unpersist()

    src = frame.select("doc_id", "segment", "dl", "_toks")

    t0 = time.time()
    jvm_total = src.select(F.sum(F.size("_toks"))).collect()[0][0]
    t["jvm_tokenize_hash"] = round(time.time() - t0, 2)

    def consume(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tot = 0
        for pdf in batches:
            toks_list = pdf["_toks"]
            tot += int(
                np.fromiter(
                    (len(x) for x in toks_list), dtype=np.int64,
                    count=len(toks_list),
                ).sum()
            )
        yield pd.DataFrame({"n": [tot]})

    t0 = time.time()
    arrow_total = (
        src.mapInPandas(consume, schema="n bigint")
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    t["arrow_consume"] = round(time.time() - t0, 2)
    assert arrow_total == jvm_total, (arrow_total, jvm_total)

    t0 = time.time()
    postings = build_postings_from_docs(frame, "content", pre_partitioned=True)
    m = postings.agg(F.count("*"), F.sum("df")).collect()[0]
    t["kernel_no_write"] = round(time.time() - t0, 2)

    t0 = time.time()
    postings = build_postings_from_docs(frame, "content", pre_partitioned=True)
    postings.write.mode("overwrite").partitionBy("segment").parquet(
        os.path.join(work, f"post{cores}")
    )
    t["full_group"] = round(time.time() - t0, 2)

    shutil.rmtree(os.path.join(work, f"docs{cores}"), ignore_errors=True)
    shutil.rmtree(os.path.join(work, f"post{cores}"), ignore_errors=True)
    print(json.dumps({
        "cores": cores, "n_docs": int(n_docs), "total_tokens": int(jvm_total),
        "posting_rows": int(m[0]), "postings": int(m[1]), "stages": t,
    }))


if __name__ == "__main__":
    main()

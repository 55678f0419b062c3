"""Scaling-bench worker: one fresh JVM at a given parallelism level.

Reads a pre-generated corpus parquet (identical input at every level),
builds the inverted index, runs the reference query set, and prints one
JSON line with timings + full top-10 results (for cross-level
rank-identity verification).

Usage: python tools/scale_worker.py <cores> <corpus_parquet> <out_index_dir>
"""

from __future__ import annotations

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kbasesearchengine_spark.operators.indexer import IndexBuilder  # noqa: E402
from kbasesearchengine_spark.operators.topk import InvertedIndex, topk  # noqa: E402
from kbasesearchengine_spark.session import get_spark  # noqa: E402

QUERIES = [
    ("parser http", "and"),
    ("rfah", "and"),
    ("license import the", "and"),
    ("quorum parser cache", "or"),
    ("helicase plasmid", "or"),
]


def main() -> None:
    cores = int(sys.argv[1])
    corpus_pq = sys.argv[2]
    idx_dir = sys.argv[3]
    spark = get_spark(f"scale-{cores}", cores=cores, shuffle_partitions=cores)
    corpus = spark.read.parquet(corpus_pq)
    n_rows = corpus.count()

    t0 = time.time()
    builder = IndexBuilder(spark, idx_dir, num_segments=32, segments_per_commit=32)
    # store_text=False: the scale layout — content stays in the source
    # table; the index stores keys/metadata/dl/sha256 (halves build I/O)
    builder.build(
        corpus, key_cols=["repo", "path", "commit"], resume=False,
        store_text=False,
    )
    build_sec = time.time() - t0

    index = InvertedIndex(spark, idx_dir)
    results = {}
    q_times = {}
    for text, mode in QUERIES:
        best, rows = None, None
        for _ in range(3):  # warm runs; report the best (noise floor)
            t0 = time.time()
            rows = topk(index, text, k=10, mode=mode, hydrate=False).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        q_times[f"{text}|{mode}"] = round(best, 3)
        results[f"{text}|{mode}"] = [
            [int(r["doc_id"]), float(r["score"])] for r in rows
        ]

    print(
        json.dumps(
            {
                "cores": cores,
                "n_rows": n_rows,
                "build_sec": round(build_sec, 3),
                "docs_per_sec": round(n_rows / build_sec, 2),
                "query_sec": q_times,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()

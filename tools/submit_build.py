"""spark-submit entry point for the index build (north rule: the pipeline
runs via ``spark-submit --py-files`` on a multi-executor cluster).

Cluster usage (package the library, ship it to executors):

    cd /root/repo && zip -r /tmp/kbse.zip kbasesearchengine_spark
    spark-submit \
        --master <cluster-master> \
        --py-files /tmp/kbse.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        tools/submit_build.py \
        --corpus <iceberg table or parquet path> \
        --index-dir <output dir> \
        --num-segments <corpus_rows / segment_doc_budget> \
        [--resume]

Local smoke (this sandbox): spark-submit --master 'local[8]' works the
same; the SparkSession is taken from the submit context (getOrCreate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--num-segments", type=int, default=64)
    ap.add_argument("--segments-per-commit", type=int, default=8)
    ap.add_argument("--key-cols", default="repo,path,commit")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("kbse-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from kbasesearchengine_spark.operators.indexer import IndexBuilder
    from kbasesearchengine_spark.sources.catalog import read_corpus

    corpus = read_corpus(spark, args.corpus)
    builder = IndexBuilder(
        spark,
        args.index_dir,
        num_segments=args.num_segments,
        segments_per_commit=args.segments_per_commit,
    )
    stats = builder.build(
        corpus,
        key_cols=args.key_cols.split(","),
        text_col=args.text_col,
        resume=not args.no_resume,
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()

"""Segment merge: the Lucene-merge analog for multi-batch index builds.

Incremental adds (NEW_VERSION events) create new doc_id ranges = new
segments; over time many small segments hurt query fan-out. The merge
stage rewrites a set of source segments into one target segment per
group: postings with the same term are concatenated (doc_id ranges are
disjoint and segment-ordered, so the k-way merge is an ordered concat)
and re-compressed, block-max metadata rebuilt.

Expressed as groupBy(new_segment, term) + applyInPandas — one shuffle,
bounded groups (total postings of the merged segments per term).
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codec import delta_decode, encode_grouped, varint_decode
from .indexer import BLOCK_SIZE, POSTING_SCHEMA


def merge_postings(
    postings: DataFrame, seg_map: Mapping[int, int]
) -> DataFrame:
    """Rewrite postings under a segment remapping {old_seg -> new_seg}.

    Segments not in seg_map pass through unchanged (narrow filter); the
    merged ones shuffle once on (new_segment, term).
    """
    spark = postings.sparkSession
    keep = postings.where(~F.col("segment").isin([int(s) for s in seg_map]))
    to_merge = postings.where(F.col("segment").isin([int(s) for s in seg_map]))
    map_expr = F.create_map(
        *[F.lit(x) for kv in seg_map.items() for x in kv]
    )
    remapped = to_merge.withColumn("new_segment", map_expr[F.col("segment")])

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        new_seg = int(pdf["new_segment"].iloc[0])
        term = int(pdf["term_hash"].iloc[0])
        parts = [
            (
                delta_decode(bytes(r["doc_ids"])),
                varint_decode(bytes(r["tfs"])),
                varint_decode(bytes(r["dls"])),
            )
            for _, r in pdf.iterrows()
        ]
        parts = [p for p in parts if len(p[0])]
        # disjoint doc ranges (a source segment may also be split across
        # build partitions) — order by first doc id
        parts.sort(key=lambda p: int(p[0][0]))
        ids = np.concatenate([p[0] for p in parts]).astype(np.uint64)
        tfs = np.concatenate([p[1] for p in parts]).astype(np.uint64)
        dls = np.concatenate([p[2] for p in parts]).astype(np.uint64)
        assert np.all(np.diff(ids.astype(np.int64)) > 0), "overlapping segments"
        n = len(ids)
        # re-encode through the SAME batch encoder the build uses — block
        # metadata AND lazy-decode byte offsets rebuilt consistently
        enc = encode_grouped(
            ids, tfs, dls,
            np.array([0], dtype=np.int64), np.array([n], dtype=np.int64),
            BLOCK_SIZE,
        )
        return pd.DataFrame(
            {
                "segment": [new_seg],
                "term_hash": [term],
                "df": [n],
                "doc_ids": enc["doc_ids"],
                "tfs": enc["tfs"],
                "dls": enc["dls"],
                "block_last": enc["block_last"],
                "block_max_tf": enc["block_max_tf"],
                "block_min_dl": enc["block_min_dl"],
                "block_doc_off": enc["block_doc_off"],
                "block_tf_off": enc["block_tf_off"],
                "block_dl_off": enc["block_dl_off"],
            }
        )

    merged = remapped.groupBy("new_segment", "term_hash").applyInPandas(
        merge_group, schema=POSTING_SCHEMA
    )
    return keep.unionByName(merged)


def merge_docs(docs: DataFrame, seg_map: Mapping[int, int]) -> DataFrame:
    """Rewrite the docs table's segment column under the same remapping —
    postings and docs MUST move together or the per-segment cogroup in
    topk (doc_filter path) pairs postings with empty allowed lists and
    filtered results silently vanish."""
    map_expr = F.create_map(*[F.lit(x) for kv in seg_map.items() for x in kv])
    return docs.withColumn(
        "segment",
        F.coalesce(map_expr[F.col("segment")], F.col("segment")).cast("int"),
    )


def apply_merge(
    spark, index_dir: str, seg_map: Mapping[int, int]
) -> dict:
    """Apply a segment merge to an on-disk index: rewrite the affected
    postings AND docs partitions consistently, drop the emptied source
    partitions, and record the mapping in lineage.

    Only partitions named in seg_map are read (partition pruning) or
    written (dynamic overwrite) — cost is O(merged segments), not O(index).
    At 100 TB this is the Lucene background-merge analog: many small
    incremental segments -> few big ones, bounded I/O per merge round.
    """
    import json
    import os
    import shutil

    from .indexer import IndexBuilder

    seg_map = {int(k): int(v) for k, v in seg_map.items()}
    sources = [s for s, t in seg_map.items() if s != t]
    targets = sorted({t for t in seg_map.values()})
    if not sources:
        return {"merged": 0, "targets": []}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    postings_path = os.path.join(index_dir, "postings")
    docs_path = os.path.join(index_dir, "docs")
    affected = sorted(seg_map)

    # Spark refuses to overwrite a path it is reading from — stage the
    # rewritten partitions through a scratch dir, then dynamic-overwrite
    tmp = os.path.join(index_dir, "_merge_tmp")

    postings = spark.read.parquet(postings_path).where(
        F.col("segment").isin(affected)
    )
    merged = merge_postings(postings, seg_map)
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "postings"))
    spark.read.parquet(os.path.join(tmp, "postings")).write.mode(
        "overwrite"
    ).partitionBy("segment").parquet(postings_path)

    docs = spark.read.parquet(docs_path).where(F.col("segment").isin(affected))
    merge_docs(docs, seg_map).write.mode("overwrite").parquet(
        os.path.join(tmp, "docs")
    )
    spark.read.parquet(os.path.join(tmp, "docs")).write.mode(
        "overwrite"
    ).partitionBy("segment").parquet(docs_path)

    # drop emptied source partitions (at scale: a metastore/Iceberg
    # drop-partition; local fs here)
    for base in (postings_path, docs_path):
        for s in sources:
            d = os.path.join(base, f"segment={s}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    shutil.rmtree(tmp, ignore_errors=True)

    IndexBuilder(spark, index_dir).write_marker(
        f"merge-{min(sources)}-{max(sources)}",
        {"seg_map": {str(k): v for k, v in seg_map.items()},
         "sources": sources, "targets": targets},
    )
    return {"merged": len(sources), "targets": targets}


def plan_merges(
    segment_sizes: Mapping[int, int], target_size: int
) -> dict[int, int]:
    """Greedy merge policy: pack undersized segments (ascending id) into
    target-size bins. Returns {old_seg -> new_seg (the bin's first seg)}."""
    seg_map: dict[int, int] = {}
    current, acc = None, 0
    for seg in sorted(segment_sizes):
        size = segment_sizes[seg]
        if size >= target_size:
            continue
        if current is None or acc + size > target_size:
            current, acc = seg, 0
        if current != seg:
            seg_map[seg] = current
        seg_map.setdefault(current, current)
        acc += size
    return seg_map

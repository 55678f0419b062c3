"""In-place document mutations: the update-by-query family (M2-M7).

The reference mutates docs with ES `_update_by_query` painless scripts —
share/unshare (M2/M3, ElasticIndexingStorage.java:666-763), publish/
unpublish (M4/M5, :765-835), set field / set flags (M6/M7, :837-915).
Spark-first disposition: immutable files + partition-scoped rewrite —
find the segments containing matches (one pruned pre-scan), rewrite ONLY
those partitions through a staging dir and a dynamic partition overwrite.
Cost is O(matched segments), never O(index). On a lakehouse catalog this
is exactly `MERGE INTO docs USING ... WHEN MATCHED THEN UPDATE`.

Postings are untouched: mutated fields are metadata (filter context),
not indexed text — matching the reference, whose update scripts never
re-analyze content.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from .indexer import IndexBuilder


def update_docs_fields(
    spark: SparkSession,
    index_dir: str,
    predicate: Column,
    assignments: dict,
) -> dict:
    """Set fields on every doc matching `predicate` (update-by-query).

    assignments: {column: value-or-Column}. New columns are created
    (null outside the match set); existing columns keep their old value
    outside the match set. Returns {updated_rows, updated_segments}.
    """
    docs_path = os.path.join(index_dir, "docs")
    docs = spark.read.parquet(docs_path)

    segs = [
        int(r["segment"])
        for r in docs.where(predicate).select("segment").distinct().collect()
    ]
    if not segs:
        return {"updated_rows": 0, "updated_segments": []}

    part = docs.where(F.col("segment").isin(segs))
    updated = part
    for col, val in assignments.items():
        expr = val if isinstance(val, Column) else F.lit(val)
        if col in part.columns:
            updated = updated.withColumn(
                col, F.when(predicate, expr).otherwise(F.col(col))
            )
        else:
            updated = updated.withColumn(col, F.when(predicate, expr))
    n = part.where(predicate).count()

    # stage, then dynamic-overwrite only the affected partitions (Spark
    # refuses to overwrite a path it is reading from)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tmp = os.path.join(index_dir, "_update_tmp")
    updated.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").partitionBy(
        "segment"
    ).parquet(docs_path)
    shutil.rmtree(tmp, ignore_errors=True)

    # marker name must be stable ACROSS processes (idempotence protocol:
    # md5, not Python's per-process-salted hash()) yet UNIQUE per logical
    # mutation — it hashes the assignment VALUES (a Column stringifies to
    # its expression tree) as well as the field names, so consecutive
    # share calls for different groups over the same segments each leave
    # their own lineage record instead of overwriting one marker
    # (ADVICE r4), while a retry of the SAME mutation stays idempotent.
    field_tag = hashlib.md5(
        (str(predicate) + "|" + ",".join(
            f"{k}={assignments[k]}" for k in sorted(
                str(k) for k in assignments
            )
        )).encode()
    ).hexdigest()[:8]
    IndexBuilder(spark, index_dir).write_marker(
        f"update-{min(segs)}-{max(segs)}-{field_tag}",
        {"updated_rows": int(n), "updated_segments": sorted(segs),
         "fields": sorted(str(k) for k in assignments)},
    )
    return {"updated_rows": int(n), "updated_segments": sorted(segs)}


# -- the reference's concrete mutations, expressed over metadata ----------


def publish_objects(spark, index_dir: str, predicate: Column) -> dict:
    """M4 publish: set the public flag (ElasticIndexingStorage.java:
    765-800 setObjectsPublic)."""
    return update_docs_fields(spark, index_dir, predicate, {"is_public": True})


def unpublish_objects(spark, index_dir: str, predicate: Column) -> dict:
    """M5 unpublish (:802-835)."""
    return update_docs_fields(spark, index_dir, predicate, {"is_public": False})


def set_access_group(
    spark, index_dir: str, predicate: Column, group: int, shared: bool = True
) -> dict:
    """M2/M3 share/unshare collapsed to metadata (SURVEY §2.3): record the
    access group and the shared flag on matching docs
    (ElasticIndexingStorage.java:666-763). Single-group legacy form; the
    multi-group array semantics live in share_with_group/unshare_group."""
    return update_docs_fields(
        spark, index_dir, predicate,
        {"access_group": int(group), "shared": bool(shared)},
    )


def share_with_group(spark, index_dir: str, predicate: Column, group: int) -> dict:
    """M2 share, multi-group: the reference stores per-version group ARRAYS
    (lastin[]/groups[], ElasticIndexingStorage.java:666-763 — one doc can
    be shared into several groups; exercised by testSharing :726-773).
    access_groups is array<int>; sharing is an idempotent array_union."""
    g = int(group)
    return update_docs_fields(
        spark, index_dir, predicate,
        {"access_groups": F.array_union(_groups_col(spark, index_dir),
                                        F.array(F.lit(g)))},
    )


def unshare_group(spark, index_dir: str, predicate: Column, group: int) -> dict:
    """M3 unshare, multi-group: remove ONE group, keep the rest
    (ElasticIndexingStorage.java unshare script removes the id from the
    arrays without touching other grants)."""
    return update_docs_fields(
        spark, index_dir, predicate,
        {"access_groups": F.array_remove(_groups_col(spark, index_dir),
                                         int(group))},
    )


def _groups_col(spark, index_dir: str) -> Column:
    """Current access_groups value, [] when the column doesn't exist yet
    (first share on a fresh index can't reference a missing column).

    A legacy scalar ``access_group`` (set_access_group) is MIGRATED into
    the array here: the first array-API touch of a row folds the scalar
    grant in, so the search predicate's array-authoritative precedence
    (plans/search.AccessFilter) never drops a pre-existing scalar grant
    and unshare_group can actually revoke it (ADVICE r4)."""
    empty = F.expr("CAST(array() AS array<int>)")
    cols = spark.read.parquet(os.path.join(index_dir, "docs")).columns
    parts = []
    if "access_groups" in cols:
        parts.append(F.col("access_groups"))
    if "access_group" in cols:
        parts.append(
            F.when(F.col("access_group").isNotNull(),
                   F.array(F.col("access_group").cast("int")))
        )
    parts.append(empty)
    return F.coalesce(*parts)

"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path — candidate generation via
bounded bucket join, exact re-rank inside buckets.

All vector math stays in built-in higher-order functions
(F.aggregate/F.zip_with → JVM codegen); no Python in the scoring path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against one query vector.

    Single scan + TakeOrderedAndProject — no shuffle beyond the final
    k-row merge; the scan parallelizes over partitions.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    scored = emb.select(
        F.col(id_col).alias("vec_id"),
        (
            _dot(F.col(vec_col).cast("array<double>"), q)
            / (_norm(F.col(vec_col).cast("array<double>")) * F.lit(qn))
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Random-hyperplane signature as an int column (built-in ops only)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col.cast("array<double>"), plane) > 0, 1).otherwise(0)
        bucket = bucket + bit * F.lit(1 << i)
    return bucket


def probe_buckets(
    query_vec: list[float],
    n_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
) -> list[int]:
    """Multi-probe set: the query's signature bucket plus every bucket
    within `probe_hamming` sign flips."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for i, p in enumerate(planes):
        if float(np.dot(qv, p)) > 0:
            qsig |= 1 << i
    probes = {qsig}
    if probe_hamming >= 1:
        probes.update(qsig ^ (1 << i) for i in range(n_planes))
    if probe_hamming >= 2:
        probes.update(
            qsig ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        )
    return sorted(int(x) for x in probes)


def cosine_topk_lsh(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """ANN variant: multi-probe the query's LSH bucket (hamming ≤
    probe_hamming neighbors), exact cosine re-rank inside probed buckets.

    This form computes signatures at query time (one full scan) — use
    write_bucketed + cosine_topk_lsh_indexed for the at-scale path where
    probing is pure partition pruning.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    probes = probe_buckets(query_vec, n_planes, probe_hamming, seed)
    bucketed = emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    cand = bucketed.where(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def write_bucketed(
    emb: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    """Materialize the embeddings table PARTITIONED BY LSH bucket — the
    100-TB serving layout: a query probes ≤ 1 + C(p,1) + C(p,2) partition
    directories (37 of 256 at p=8, hamming ≤ 2) and never scans the rest.
    Signatures are computed once at write time, JVM-side."""
    planes = hyperplanes(dim, n_planes, seed)
    emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def cosine_topk_lsh_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """ANN over a write_bucketed table: the bucket isin predicate is a
    PARTITION filter (directory pruning — verified by plan assertion in
    tests), so query cost is proportional to the probed buckets only."""
    probes = probe_buckets(query_vec, n_planes, probe_hamming, seed)
    cand = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)

"""Dedup family + ANN operator tests over the driver documents table."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.operators import ann, dedup


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_dedup_exact_matches_pandas(docs):
    d = docs.withColumn("k", F.substring("text", 1, 60))
    got = {(r["id"], r["dup_of"]) for r in
           dedup.dedup_exact(d, "doc_id", "k").collect()}
    pdf = docs.select("doc_id", F.substring("text", 1, 60).alias("k")).toPandas()
    exp = set()
    for _, grp in pdf.groupby("k"):
        ids = sorted(grp["doc_id"])
        exp.update((i, ids[0]) for i in ids[1:])
    assert got == exp


def test_minhash_catches_known_near_dups(docs):
    """Jaccard≥0.95 pairs must be recalled by 16-perm/4-band LSH."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.95
        ).collect()
    }
    assert exact, "fixture should contain planted near-dups"
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_minhash_candidates(docs, "doc_id", "text").collect()
    }
    missed = exact - cand
    assert not missed, f"LSH missed high-sim pairs: {missed}"


def test_simhash_pigeonhole_equals_exhaustive(docs):
    sigs = dedup.simhash64(docs, "doc_id", "text").collect()
    ids = np.array([r["id"] for r in sigs])
    sh = np.array([r["simhash"] for r in sigs], dtype=np.int64)
    exp = set()
    for i in range(len(ids)):
        ham = np.array([bin(int(sh[i]) ^ int(x)).count("1") for x in sh])
        for j in np.nonzero((ham <= 3) & (ids > ids[i]))[0]:
            exp.add((int(ids[i]), int(ids[j])))
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_pairs(docs, "doc_id", "text", 3).collect()
    }
    assert got == exp


def test_cosine_topk_matches_numpy(emb):
    pdf = emb.toPandas()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    q = mat[pdf["vec_id"].tolist().index(0)]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))[:10]
    exp = [int(pdf["vec_id"].iloc[i]) for i in order]
    got = [r["vec_id"] for r in ann.cosine_topk(emb, list(q), k=10).collect()]
    assert got == exp


def test_lsh_topk_recall(emb):
    pdf = emb.toPandas()
    q = [float(x) for x in pdf[pdf.vec_id == 0]["embedding"].iloc[0]]
    exact = {r["vec_id"] for r in ann.cosine_topk(emb, q, k=10).collect()}
    approx = {r["vec_id"] for r in ann.cosine_topk_lsh(emb, q, k=10).collect()}
    # hyperplane LSH with hamming-1 probing: expect decent recall@10
    assert len(exact & approx) >= 5
    assert 0 in approx  # the query vector itself must be found


def test_minhash_kernel_matches_expression(spark, docs):
    """The r6 mapInArrow signature/band kernel must be bit-equivalent to
    the original expression pipeline (shingles_df -> minhash_signatures
    -> minhash_band_buckets -> bucket join), including on corpora with
    byte-identical and near-duplicate rows and under a tiny bucket cap."""
    dup = docs.limit(4).withColumn("doc_id", F.col("doc_id") + 100000)
    near = (
        docs.limit(4)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail_tok qq")))
    )
    aug = docs.unionByName(dup).unionByName(near)

    def expression_pipeline(src, max_bucket):
        d = src.select(F.col("doc_id").alias("id"), F.col("text").alias("t"))
        surv = (
            d.select("id", F.md5("t").alias("h"))
            .groupBy("h").agg(F.min("id").alias("id")).select("id")
        )
        d = d.join(surv, "id", "left_semi")
        sigs = dedup.minhash_signatures(d, "id", "t", 3)
        buckets = dedup.minhash_band_buckets(sigs)
        sizes = buckets.groupBy("band", "bucket").agg(F.count("*").alias("n"))
        buckets = buckets.join(
            sizes.where(F.col("n") <= max_bucket), ["band", "bucket"]
        )
        a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
        b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
        return (
            a.join(b, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct()
        )

    for cap in (1000, 2):
        exp = sorted(
            (r["id_a"], r["id_b"])
            for r in expression_pipeline(aug, cap).collect()
        )
        got = sorted(
            (r["id_a"], r["id_b"])
            for r in dedup.dedup_minhash_candidates(
                aug, "doc_id", "text", max_bucket=cap
            ).collect()
        )
        assert got == exp


def test_cosine_kernel_bit_equals_hof(spark, emb):
    """The r6 mapInArrow cosine kernel must reproduce the former JVM
    aggregate(zip_with(...)) fold bit-for-bit (np.cumsum is the same
    strict left-to-right double summation), including the null-padding
    semantics for malformed rows."""
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    qn = float(np.sqrt(np.dot(qvec, qvec)))

    def hof_dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    def hof_norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))

    # malformed rows: too short, and a null element
    bad = spark.createDataFrame(
        [(900001, [1.0, 2.0]), (900002, [None] + qvec[1:])],
        f"vec_id bigint, embedding array<double>",
    )
    aug = emb.select("vec_id", F.col("embedding").cast("array<double>")
                     .alias("embedding")).unionByName(bad)

    expected = aug.select(
        "vec_id",
        (hof_dot(F.col("embedding"), q)
         / (hof_norm(F.col("embedding")) * F.lit(qn))).alias("cosine"),
    ).orderBy(F.desc("cosine"), F.asc("vec_id")).collect()
    got = ann.cosine_topk(aug, qvec, k=len(expected)).collect()
    assert [(r.vec_id, r.cosine) for r in got] == [
        (r.vec_id, r.cosine) for r in expected
    ]

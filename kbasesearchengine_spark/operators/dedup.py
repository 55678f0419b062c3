"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (its dedup is event-id dropDuplicates,
events/EventQueue.java:86-99): exact, MinHash+LSH, SimHash, and n-gram
Jaccard near-dup — each expressed as DataFrame transforms whose hashing is
derived from md5 so an independent SQL oracle (DuckDB) can reproduce the
results bit-for-bit.

Scale notes (100 TB): every operator here is a pure shuffle-on-key
pipeline — no driver materialization, no cross-join. Candidate generation
always goes through a bounded-key join (LSH band buckets / rare shingles),
never O(n²).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_py

# md5-derived 52-bit hash: identical in Spark and DuckDB, and small enough
# that a*h+b stays inside int64 in both engines (no overflow divergence).
#   spark:  conv(substring(md5(x),1,13),16,10)::bigint
#   duckdb: ('0x'||substr(md5(x),1,13))::bigint  (see oracle SQL)
HASH_HEX_CHARS = 13
HASH_BITS = 52


def _h52(col):
    return F.conv(F.substring(F.md5(col), 1, HASH_HEX_CHARS), 16, 10).cast("bigint")


MINHASH_PERMS = 16
MINHASH_BANDS = 4  # rows per band = MINHASH_PERMS // MINHASH_BANDS
MERSENNE = (1 << 61) - 1


def tokens_df(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token) using the engine tokenizer expressed in SQL so the
    oracle can reproduce it: regexp_extract_all equivalent via split."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0)")
        ).alias("pos", "token"),
    )


def _shingle_arrays(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, _sh) — the distinct word n-gram shingles of each doc as ONE
    array column, built entirely inside the row (tokens split JVM-side,
    shingles from transform(sequence)+slice, per-doc dedup via
    array_distinct) — zero shuffles, zero per-token rows."""
    sh = F.expr(
        f"CASE WHEN size(_t) >= {n} THEN array_distinct(transform("
        f"sequence(1, size(_t) - {n} + 1), i -> concat_ws(' ', slice(_t, i, {n}))))"
        f" ELSE CAST(array() AS array<string>) END"
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0)"
        ).alias("_t"),
    ).select("id", sh.alias("_sh"))


def shingles_df(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) distinct word n-gram shingles as strings (exploded
    rows over _shingle_arrays; already distinct per (id, shingle))."""
    return _shingle_arrays(docs, id_col, text_col, n).select(
        "id", F.explode("_sh").alias("shingle")
    )


# ------------------------------------------------------------------- exact


def dedup_exact(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash; survivor = min id per group.

    Returns (id, dup_of) for every duplicated row that is not the survivor.
    Hash-groupBy — one shuffle on md5(text), partial agg handles skew."""
    h = docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h"))
    surv = h.groupBy("h").agg(F.min("id").alias("dup_of"), F.count("*").alias("n"))
    return (
        h.join(surv, "h")
        .where((F.col("n") > 1) & (F.col("id") != F.col("dup_of")))
        .select("id", "dup_of")
    )


# ----------------------------------------------------------------- minhash


def minhash_signatures(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3,
    perms: int = MINHASH_PERMS,
) -> DataFrame:
    """(id, perm, minhash) — perms universal-hash minima over n-gram shingles.

    h_i(x) = (a_i * h52(x) + b_i) mod M61, with a_i = 2i+1, b_i = 12345i+7 —
    deterministic and SQL-reproducible. ONE groupBy(id) with `perms` min
    aggregates (no crossJoin row explosion: the shuffle carries one row per
    shingle, not per (shingle, perm))."""
    sh = shingles_df(docs, id_col, text_col, n).withColumn("hx", _h52(F.col("shingle")))
    aggs = [
        F.min(
            (F.lit(2 * i + 1) * F.col("hx") + F.lit(12345 * i + 7))
            % F.lit(MERSENNE)
        ).alias(f"m{i}")
        for i in range(perms)
    ]
    wide = sh.groupBy("id").agg(*aggs)
    stack_args = ", ".join(f"'{i}', m{i}" for i in range(perms))
    return wide.selectExpr(
        "id", f"stack({perms}, {stack_args}) as (perm, minhash)"
    ).withColumn("perm", F.col("perm").cast("int"))


def minhash_band_buckets(
    sigs: DataFrame, bands: int = MINHASH_BANDS, perms: int = MINHASH_PERMS
) -> DataFrame:
    """(id, band, bucket) — LSH: hash each band's signature slice."""
    rows_per_band = perms // bands
    banded = sigs.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
    return (
        banded.groupBy("id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list(F.concat_ws(":", "perm", "minhash")))
                )
            ).alias("bucket")
        )
    )


def _minhash_band_rows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    perms: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """(id, band, bucket) LSH band-bucket rows in ONE mapInArrow pass.

    Replaces the expression pipeline (shingle explode -> groupBy(id) with
    `perms` min aggregates -> stack -> groupBy(id, band) collect_list/md5)
    with a single partition-local kernel: tokenize (tokenize_py — the
    engine tokenizer, JVM-equivalence pinned in pytest), distinct word
    n-gram shingles, the md5-derived 52-bit hash, and the `perms`
    universal-hash minima via one np.minimum.reduceat per permutation.
    Zero shuffles and zero per-shingle JVM expression trees — measured
    5.4s -> ~0.4s for the signature phase at sf1.0 (guide §4.2: batch the
    heavy per-item work into native code inside the partition; md5 here
    is hashlib's C implementation, the same per-shingle digest any
    engine pays). Bit-equivalence with the expression pipeline is pinned
    by tests/test_dedup_ann.py::test_minhash_kernel_matches_expression.

    The per-band bucket strings reproduce minhash_band_buckets exactly:
    md5 over the lexicographically sorted "perm:minhash" strings of the
    band, comma-joined (Python sorted() on ASCII == Spark sort_array ==
    the oracle's ORDER BY under binary collation)."""
    from hashlib import md5 as _md5

    rows_per_band = perms // bands
    a_coef = np.array([2 * i + 1 for i in range(perms)], dtype=np.int64)
    b_coef = np.array([12345 * i + 7 for i in range(perms)], dtype=np.int64)
    id_field = docs.schema[id_col].dataType.simpleString()
    src = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:  # noqa: F821
        import pyarrow as pa

        for rb in batches:
            ids_arr = rb.column(0)
            texts = rb.column(1).to_pylist()
            keep_idx: list[int] = []
            h_chunks: list[np.ndarray] = []
            lens: list[int] = []
            for i, t in enumerate(texts):
                toks = tokenize_py(t)
                if len(toks) < n:
                    continue
                # distinct shingles (the expression path's array_distinct)
                sh = {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}
                # h52: first 13 hex chars of md5 = first 7 digest bytes >> 4
                hs = np.fromiter(
                    (int.from_bytes(_md5(s.encode()).digest()[:7], "big") >> 4
                     for s in sh),
                    dtype=np.int64, count=len(sh),
                )
                keep_idx.append(i)
                h_chunks.append(hs)
                lens.append(len(hs))
            if not keep_idx:
                continue
            flat = np.concatenate(h_chunks)
            starts = np.concatenate(
                ([0], np.cumsum(lens[:-1], dtype=np.int64))
            ).astype(np.int64)
            # per-doc minima for each permutation; (a*h+b) stays < 2^57
            # (a <= 31, h < 2^52) so the int64 arithmetic is exact and the
            # mod-M61 matches the SQL bigint arithmetic bit-for-bit
            mins = np.empty((perms, len(lens)), dtype=np.int64)
            for p in range(perms):
                mins[p] = np.minimum.reduceat(
                    (a_coef[p] * flat + b_coef[p]) % MERSENNE, starts
                )
            # band buckets: md5 of sorted "perm:minhash" strings, per band
            n_docs = len(keep_idx)
            buckets = [[None] * n_docs for _ in range(bands)]
            for d in range(n_docs):
                col = mins[:, d]
                for b in range(bands):
                    parts = sorted(
                        f"{p}:{col[p]}"
                        for p in range(b * rows_per_band,
                                       (b + 1) * rows_per_band)
                    )
                    buckets[b][d] = _md5(",".join(parts).encode()).hexdigest()
            out_ids = ids_arr.take(
                pa.array(np.repeat(np.asarray(keep_idx, dtype=np.int64),
                                   bands))
            )
            band_col = pa.array(
                np.tile(np.arange(bands, dtype=np.int32), n_docs))
            bucket_col = pa.array(
                [buckets[b][d] for d in range(n_docs) for b in range(bands)])
            yield pa.RecordBatch.from_arrays(
                [out_ids, band_col, bucket_col], ["id", "band", "bucket"]
            )

    return src.mapInArrow(
        gen, schema=f"id {id_field}, band int, bucket string"
    )


def dedup_minhash_candidates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_bucket: int | None = 1000,
    exact_prefilter: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band bucket.

    The join key is (band, bucket); two guards bound the per-bucket pair
    fan-out at crawl scale (a 100-TB corpus has million-way duplicate
    clusters whose single bucket would emit m²/2 pairs):

      exact_prefilter  collapse byte-identical texts to their min-id
                       representative BEFORE shingling (one md5 groupBy +
                       an id semi-join). Exact clusters are dedup_exact's
                       job; LSH only needs one member per cluster, and the
                       representative still pairs with true NEAR-dups.
      max_bucket       drop (band, bucket) groups larger than this —
                       skew backstop for near-identical (not byte-equal)
                       mega-clusters. Recall trade, documented: members
                       of an over-cap bucket can still pair through their
                       other bands; a cluster saturating EVERY band is
                       effectively an exact-dup family at shingle level
                       and belongs to the prefilter/dedup_exact path.

    Both are no-ops on corpora without such clusters (the driver oracle
    reproduces the uncapped pipeline and stays hash-identical at sf0.01;
    the skew behavior is pinned by tests/test_queryset_skew.py)."""
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    sc = docs.sparkSession.sparkContext
    nump = max(sc.defaultParallelism, d.rdd.getNumPartitions())
    if exact_prefilter:
        # min-id survivor per byte-identical text as ONE window over the
        # content hash (row_number == 1 ⇔ min id — ids are unique). The
        # former groupBy(md5).min(id) + left-semi-join shape shuffled the
        # TEXT payload across the join exchange AND paid two extra
        # metadata exchanges (hash agg + semi join build); this shape
        # moves the text exactly once, into hash-spread partitions that
        # double as the signature kernel's parallelism (guide §2.3-2.4,
        # §8: move heavy bytes once). The explicit repartition count is
        # AQE-stable and keeps the kernel spread across cores when a
        # small corpus arrives as 1-2 scan splits (no-op width at scale).
        from pyspark.sql import Window

        d = (
            d.withColumn("__h", F.md5("__t"))
            .repartition(nump, "__h")
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("__h").orderBy(F.asc("id"))
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("__h", "_rn")
        )
    elif d.rdd.getNumPartitions() < sc.defaultParallelism:
        # scale-adaptive parallelism floor: a small corpus parquet
        # arrives as 1-2 scan splits, which would serialize the whole
        # signature kernel onto one core. At scale the scan already has
        # >= defaultParallelism splits and this is a no-op (guide §2.5
        # input skew / §2.6 idle capacity).
        d = d.repartition(sc.defaultParallelism)
    # ONE mapInArrow pass (zero shuffle) for signatures + band buckets,
    # then ONE groupBy(band, bucket) with in-row pair expansion replaces
    # the former sizes-agg + size join + a×b self-join (three extra
    # exchanges of the bucket rows; guide §2.4). collect_list is bounded
    # per group by max_bucket (the skew backstop — groups over the cap
    # are dropped whole, exactly like the former size join).
    buckets = _minhash_band_rows(d, "id", "__t", n)
    grouped = buckets.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    if max_bucket is not None:
        grouped = grouped.where(F.size("ids") <= max_bucket)
    # pairwise (id_a < id_b) expansion inside the row: ids is sorted asc,
    # so element i pairs with every element after it
    pairs = (
        grouped.where(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
    )
    return pairs.distinct()


# ------------------------------------------------------------ ngram jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 50,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets for candidate pairs.

    Candidates share ≥1 *rare* shingle (df ≤ max_shingle_df) — the df cap
    bounds the per-shingle pair fan-out (skew guard), standard for
    all-pairs similarity at scale. Returns (id_a, id_b, jaccard ≥ threshold).
    """
    base = _shingle_arrays(docs, id_col, text_col, n)
    sh = base.select("id", F.explode("_sh").alias("shingle"))
    # per-doc set size comes straight off the in-row array — the former
    # groupBy(id) over the exploded shingle rows was a pure extra shuffle
    # (the arrays are already distinct per doc; guide §2.4)
    sizes = base.select("id", F.size("_sh").cast("bigint").alias("sz"))
    sh_df = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    rare = sh.join(sh_df.where(F.col("sdf") <= max_shingle_df), "shingle")
    a = rare.select(F.col("id").alias("id_a"), "shingle")
    b = rare.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------- embedding near-dup


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    max_hamming: int = 2,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine ≥
    threshold).

    Candidate generation via random-hyperplane LSH (sign-bit signatures,
    operators/ann.py planes): cos(a,b) ≥ t ⟹ the expected fraction of
    disagreeing sign bits is arccos(t)/π (~7.9% at t=0.97), so near-dup
    pairs agree on almost all planes — candidates = pairs whose
    signatures differ in ≤ max_hamming bits, generated by a pigeonhole
    chunk join (bounded keys, no O(n²) crossJoin). Exact cosine verify on
    candidates, all in JVM higher-order functions.

    The pigeonhole join can emit the same pair from several chunk tables;
    the dedup ``.distinct()`` runs on bare (id_a, id_b) pairs BEFORE the
    vectors are joined back for the cosine verify — at 768-dim × 10⁹ rows
    the distinct exchange must not carry vector payloads.

    dim: vector width. Pass it when known (at 100 TB the embedding width
    is part of the table contract); if None, one `.first()` action probes
    it from the data.
    """
    from .ann import hyperplanes, lsh_bucket_col

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    sig = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        lsh_bucket_col(F.col(vec_col), planes).cast("bigint").alias("sig"),
    )

    n_chunks = max_hamming + 1
    base, extra = divmod(n_planes, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    starts = [sum(widths[:i]) for i in range(n_chunks)]
    keys = F.array(
        *[
            F.struct(
                F.lit(c).cast("int").alias("tbl"),
                (
                    F.shiftrightunsigned(F.col("sig"), starts[c])
                    % (1 << widths[c])
                ).alias("ckey"),
            )
            for c in range(n_chunks)
        ]
    )
    # candidate stream carries ONLY (id, sig, chunk key) — vectors stay out
    # of the pigeonhole join and the dedup exchange entirely
    allc = sig.select("id", "sig", F.explode(keys).alias("k")).select(
        "id", "sig", F.col("k.tbl").alias("tbl"), F.col("k.ckey").alias("ckey")
    )
    a = allc.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "tbl", "ckey"
    )
    b = allc.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "tbl", "ckey"
    )
    cand = (
        a.join(b, ["tbl", "ckey"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= max_hamming
        )
        .select("id_a", "id_b")
        .distinct()  # 16-byte pairs through the exchange, not 2 vectors
    )

    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )

    def norm(c):
        return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))

    vecs = sig.select("id", "v")
    return (
        cand.join(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")),
                  "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")),
              "id_b")
        .withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.col("cosine"))
    )


# ----------------------------------------------------------------- simhash


def simhash64(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over tokens, tf-weighted.

    Bit j of simhash = 1 iff sum over distinct tokens of
    tf * sign(bit j of h52(token)) > 0. Pure groupBy aggregation —
    expressed with built-in bit ops so an SQL oracle can replicate it.

    The sum is LINEAR in token occurrences (Σ_distinct tf·sign ≡
    Σ_occurrences sign), so the former groupBy(id, token) tf
    pre-aggregation was a pure extra shuffle: one groupBy(id) over the
    exploded (id, hx) rows computes the identical bit sums, and the
    partial (map-side) aggregation collapses the shuffle to one row of
    52 longs per id per map partition (guide §2.3-2.4)."""
    hx = tokens_df(docs, id_col, text_col).select(
        "id", _h52(F.col("token")).alias("hx")
    )
    bit_terms = []
    for j in range(HASH_BITS):
        bit = F.shiftrightunsigned(F.col("hx"), j) % 2
        contrib = F.sum(bit * 2 - 1)
        bit_terms.append(
            F.when(contrib > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0))
        )
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return hx.groupBy("id").agg(total.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_chunks: int = 6,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Candidate generation is the Manku/Jain/Sarma multi-table pigeonhole
    (WWW'07 detecting near-duplicates): split the hash into ``n_chunks``
    pieces; a pair within radius h agrees fully on ≥ n_chunks - h chunks,
    so it shares at least one of the C(n_chunks, n_chunks-h) chunk
    COMBINATIONS. Each combination's concatenated value is a join key —
    with 6 chunks / radius 3 the keys are ~26 bits wide, bounding expected
    candidates at ~n²/2²⁶ per table (vs n²/2¹³ for the naive
    (h+1)-chunk split — the difference between feasible and quadratic at
    10⁹+ docs). n_chunks = max_hamming+1 degenerates to the classic
    single-chunk scheme. Exact hamming verify on candidates either way.
    """
    from itertools import combinations

    assert n_chunks > max_hamming, "need more chunks than the radius"
    sh = simhash64(docs, id_col, text_col)
    base, extra = divmod(HASH_BITS, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    starts = [sum(widths[:i]) for i in range(n_chunks)]

    def chunk_val(i):
        return F.shiftrightunsigned(F.col("simhash"), starts[i]) % (1 << widths[i])

    agree = n_chunks - max_hamming
    combos = list(combinations(range(n_chunks), agree))

    def combo_key(combo):
        key = F.lit(0).cast("bigint")
        for i in combo:
            key = key * F.lit(1 << widths[i]) + chunk_val(i)
        return key

    keys = F.array(
        *[
            F.struct(
                F.lit(ci).cast("int").alias("tbl"), combo_key(c).alias("ckey")
            )
            for ci, c in enumerate(combos)
        ]
    )
    allc = sh.select("id", "simhash", F.explode(keys).alias("k")).select(
        "id", "simhash", F.col("k.tbl").alias("tbl"), F.col("k.ckey").alias("ckey")
    )
    a = allc.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "tbl", "ckey"
    )
    b = allc.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "tbl", "ckey"
    )
    return (
        a.join(b, ["tbl", "ckey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

"""Inverted-index build: the engine's write path.

From-scratch replacement for what the reference delegates to
Elasticsearch/Lucene (bulk indexing at
lib/src/kbasesearchengine/search/ElasticIndexingStorage.java:322-379; the
whole event->index pipeline of main/IndexerWorker.java collapses into this
single batch DAG, per SURVEY.md §3.2).

Physical design (built for 100 TB, tested on local[32]):

  corpus ──assign_doc_ids──► docs(doc_id, keys…, lang, sha256, dl, segment)
          (dense, partition-invariant: doc_id = rank over sorted keys)
  docs ──agg──► stats(N, avgdl)                       [tiny, broadcast]
  docs ──repartitionByRange(segment, doc_id)──mapInPandas(JVM tokenize+
         xxhash64 → int64 tf-aggregate + sort + compress)──►
         postings(segment, term_hash, df, doc_ids␣Δvarint, tfs␣varint,
         dls␣varint, block_last/block_max_tf/block_min_dl)
          [build_postings_from_docs — the DEFAULT one-shuffle RAM-buffer
           build, the Lucene flush model; memory bound = partition's doc
           budget, consolidated later by the merge stage]
  postings ──groupBy(term_hash).agg(sum df)──► terms(term_hash, df)

An alternative sort-based two-stage path (tokenize_tf + build_postings:
explode (doc,term,tf) rows, shuffle on (segment, term), in-JVM spill sort,
streaming encode) is kept for memory-constrained segments.

Skew: postings are sharded by `segment`, a bounded doc-range bucket — a
stopword's postings split across every segment (the salt role of the north
rule's "salted repartitioning by term-hash"); no single task ever holds
more than one doc-range of one term. tf is pre-aggregated inside the Arrow
batch (map-side combine) before anything shuffles.

Resume: segments are built in groups; each group is committed with a
dynamic-partition-overwrite (idempotent) followed by a lineage marker with
metrics. A killed build reruns only unmarked groups (north rule:
per-partition lineage + metrics checkpoints).
"""

from __future__ import annotations

import json
import math
import os
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import encode_grouped
from ..functions.tokenize import hash_tokens_expr, token_count_expr

BLOCK_SIZE = 128  # postings per block-max block
_OFFSETS_LITERAL_MAX = 4096  # partition-offset literal-array plan cutover
FORMAT_VERSION = 4  # bump on any index layout/schema change
# v3: docs/ partitioned by segment (partition-pruned reads; idempotent
#     incremental adds + merge write-back), terms/ partitioned by batch
#     (each add contributes its own partition — O(new) increments, global
#     df aggregated lazily at read time), stats carries max_doc_id/total_dl
# v4: postings + terms keyed by term_hash (bigint, Spark xxhash64 of the
#     token, hashed JVM-side inside the tokenize transform) instead of the
#     term string. The Arrow boundary ships array<bigint> — no per-token
#     Python strings anywhere in the build; parquet pushdown on int64 is
#     cheaper than string at query time; query terms are hashed
#     driver-side by the compatible pure-Python XXH64
#     (functions/hashing.py; collision bound documented there).

POSTING_SCHEMA = (
    "segment int, term_hash bigint, df int, doc_ids binary, tfs binary, "
    "dls binary, block_last array<bigint>, block_max_tf array<bigint>, "
    "block_min_dl array<bigint>, block_doc_off array<bigint>, "
    "block_tf_off array<bigint>, block_dl_off array<bigint>"
)


# ---------------------------------------------------------------- doc ids


def assign_doc_ids(
    df: DataFrame,
    key_cols: list[str],
    num_partitions: int | None = None,
    compute_dl: str | None = None,
    post_shuffle=None,
) -> tuple[DataFrame, int, int | None]:
    """Dense doc_id = rank of row under ORDER BY key_cols (unique keys).

    Partition-count-invariant (FIXTURES.md §1): the id is the global sort
    rank, which does not depend on where range-partition boundaries fall,
    so local[8] and local[32] assign identical ids. ENTIRELY JVM-side:
    one offsets job (groupBy partition id) plus a projection that combines
    the broadcast offset array with monotonically_increasing_id's
    within-partition sequence (lower 33 bits — rows flow in sorted order,
    so the sequence IS the partition-local rank). No Arrow crossing, no
    per-row Python, no driver collect of data rows. Returns
    (df_with_doc_id, n_rows, total_dl) — count and (with compute_dl or a
    post_shuffle hook that adds a ``dl`` column) total token count fall
    out of the offset pass.

    post_shuffle: optional DataFrame->DataFrame hook applied AFTER the
    range shuffle and INSIDE the persisted frame — expensive derived
    columns (tokenization, hashing, digests) land here so they are
    computed ONCE, after the partitioner's sampling job (which re-executes
    the pre-shuffle plan), and reused by every downstream pass off the
    persisted blocks.
    """
    spark = df.sparkSession
    nump = num_partitions or spark.sparkContext.defaultParallelism
    sorted_df = df.repartitionByRange(nump, *key_cols).sortWithinPartitions(
        *key_cols
    )
    if post_shuffle is not None:
        sorted_df = post_shuffle(sorted_df)
    elif compute_dl:
        # dl computed AFTER the range shuffle (see post_shuffle note).
        # JVM regexp_count (codegen) — no Python worker in this pass.
        sorted_df = sorted_df.withColumn("dl", token_count_expr(compute_dl))
    want_dl = bool(compute_dl) or (
        post_shuffle is not None and "dl" in sorted_df.columns
    )
    sorted_df = sorted_df.withColumn("_pid", F.spark_partition_id()).persist()
    aggs = [F.count("*").alias("cnt")]
    if want_dl:
        aggs.append(F.sum("dl").alias("sdl"))
    rows = sorted_df.groupBy("_pid").agg(*aggs).collect()
    counts = {r["_pid"]: r["cnt"] for r in rows}
    total_dl = sum(int(r["sdl"] or 0) for r in rows) if want_dl else None
    offsets, acc = {}, 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    # doc_id = offset[_pid] + within-partition row sequence. The sequence
    # comes from monotonically_increasing_id's low 33 bits (its contract:
    # partition id in the high bits, per-partition record number in the
    # low 33); evaluated over the persisted sorted partitions it counts
    # rows in sorted order. Up to _OFFSETS_LITERAL_MAX partitions the
    # offset lookup is element_at on a literal array (O(1), whole-stage
    # codegen); past that the literal plan itself becomes the bottleneck
    # (expression-tree size), so a broadcast hash join on _pid takes over
    # — streaming per partition, so the within-partition row order (and
    # hence the id sequence) is unchanged. Equality of the two paths is
    # asserted in tests.
    seq = F.monotonically_increasing_id() % F.lit(1 << 33)
    keep = [c for c in sorted_df.columns if c != "_pid"]
    if not offsets:  # empty input: keep the schema, zero rows
        result = (
            sorted_df.select(*keep)
            .withColumn("doc_id", F.lit(0).cast("bigint"))
            .limit(0)
        )
    elif len(offsets) <= _OFFSETS_LITERAL_MAX:
        offsets_arr = F.array(
            *[
                F.lit(offsets.get(p, 0)).cast("bigint")
                for p in range(len(offsets))
            ]
        )
        result = sorted_df.select(
            *keep,
            (
                F.element_at(offsets_arr, F.col("_pid").cast("int") + 1)
                + seq
            ).alias("doc_id"),
        )
    else:
        off_df = spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            "_pid int, _off bigint",
        )
        result = (
            sorted_df.join(F.broadcast(off_df), "_pid")
            .select(*keep, (F.col("_off") + seq).alias("doc_id"))
        )
    # expose the persisted sort cache so the caller can unpersist it once
    # the downstream frame is materialized (it's a full raw-corpus copy in
    # executor memory — dead weight after the first pass)
    result._kbse_sort_cache = sorted_df
    return result, acc, total_dl


# ---------------------------------------------------------------- docs/stats


def build_docs(
    corpus: DataFrame,
    key_cols: list[str],
    text_col: str = "content",
    doc_id_col: str | None = None,
    num_segments: int = 16,
    id_partitions: int | None = None,
    carry_tokens: bool = False,
    keep_text: bool = True,
) -> tuple[DataFrame, int, int | None]:
    """docs table: doc_id, keys, metadata, sha256(content), dl, segment.

    sha256 is the per-row invariant carried through the engine (reference
    analog: the md5 system field, ElasticIndexingStorage.java:404-410).
    Returns (docs, n_docs). The segment is a contiguous doc_id range bucket.

    carry_tokens=True adds a ``_toks`` column (hash_tokens_expr — the
    hashed token array) computed ONCE inside the post-shuffle persisted
    frame, with dl = size(_toks): the posting build then consumes the
    cached arrays instead of re-running the tokenize regex over the full
    corpus — the whole build touches each document's text with the
    tokenizer exactly once. keep_text=False additionally drops the raw
    text from the persisted frame (the store_text=False scale layout:
    after sha256/dl/_toks are derived, the payload is dead weight in
    executor memory).
    """
    total_dl = None
    if doc_id_col is None:
        if carry_tokens:
            def _prep(sdf: DataFrame) -> DataFrame:
                sdf = sdf.withColumn("_toks", hash_tokens_expr(text_col))
                sdf = sdf.withColumn("dl", F.size("_toks").cast("int"))
                sdf = sdf.withColumn("sha256", F.sha2(F.col(text_col), 256))
                return sdf if keep_text else sdf.drop(text_col)

            with_ids, n_docs, total_dl = assign_doc_ids(
                corpus, key_cols, id_partitions, post_shuffle=_prep
            )
        else:
            with_ids, n_docs, total_dl = assign_doc_ids(
                corpus, key_cols, id_partitions, compute_dl=text_col
            )
    else:
        with_ids = corpus.withColumn(
            "doc_id", F.col(doc_id_col).cast("bigint")
        )
        if carry_tokens:
            with_ids = with_ids.withColumn(
                "_toks", hash_tokens_expr(text_col)
            ).withColumn("dl", F.size("_toks").cast("int"))
        else:
            with_ids = with_ids.withColumn("dl", token_count_expr(text_col))
        n_docs = with_ids.count()
    seg_size = max(1, math.ceil(n_docs / num_segments))
    docs = with_ids
    if "sha256" not in docs.columns:
        docs = docs.withColumn("sha256", F.sha2(F.col(text_col), 256))
    docs = docs.withColumn(
        "segment", (F.col("doc_id") / F.lit(seg_size)).cast("int")
    )
    docs._kbse_sort_cache = getattr(with_ids, "_kbse_sort_cache", None)
    return docs, n_docs, total_dl


def compute_stats(docs: DataFrame) -> dict:
    row = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        F.max("doc_id").alias("max_doc_id"),
    ).collect()[0]
    n = int(row["n_docs"])
    return {
        "n_docs": n,
        "avgdl": (row["total_dl"] or 0) / n if n else 0.0,
        "total_dl": int(row["total_dl"] or 0),
        "max_doc_id": int(row["max_doc_id"]) if row["max_doc_id"] is not None else -1,
    }


# ---------------------------------------------------------------- tokens


def tokenize_tf(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, segment, term_hash, tf, dl) — tf aggregated inside the
    Arrow batch, so the shuffle moves one row per distinct (doc, term),
    not one per token occurrence (map-side combine before the exchange).

    Tokenize AND hash happen JVM-side (hash_tokens_expr, whole-stage
    codegen); the Arrow boundary carries int64 hash arrays and Python only
    does whole-array numpy aggregation — no per-row Python, no per-token
    Python objects at all (input_hint)."""
    src = docs.select(
        "doc_id", "segment", "dl", hash_tokens_expr(text_col).alias("_toks")
    )

    def explode_tf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks_list = pdf["_toks"]  # Series of numpy int64 arrays
            lens = np.fromiter(
                (len(t) for t in toks_list), dtype=np.int64, count=len(toks_list)
            )
            if lens.sum() == 0:
                continue
            ridx = np.repeat(
                np.arange(len(toks_list), dtype=np.int32), lens
            )
            flat = np.concatenate([t for t in toks_list if len(t)])
            # integer-key tf aggregation: factorize the int64 hashes once
            # (vectorized int hashing), then one np.unique over composite
            # (row, term) keys — int32-narrowed when the range fits (see
            # build_postings_from_docs)
            codes, uniq_hashes = pd.factorize(flat, sort=False)
            n_uniq = len(uniq_hashes)
            if len(toks_list) * n_uniq < (1 << 31):
                key = ridx * np.int32(n_uniq) + codes.astype(
                    np.int32, copy=False
                )
            else:
                key = ridx.astype(np.int64) * np.int64(n_uniq) + codes
            ukey, counts = np.unique(key, return_counts=True)
            rr = (ukey // n_uniq).astype(np.int64)
            tcode = (ukey % n_uniq).astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[rr],
                    "segment": pdf["segment"].to_numpy()[rr].astype(np.int32),
                    "term_hash": np.asarray(uniq_hashes, dtype=np.int64)[tcode],
                    "tf": counts.astype(np.int32),
                    "dl": pdf["dl"].to_numpy()[rr].astype(np.int32),
                }
            )

    return src.mapInPandas(
        explode_tf,
        schema="doc_id bigint, segment int, term_hash bigint, tf int, dl int",
    )


# ---------------------------------------------------------------- postings


def _encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
    """Encode one sorted run of token rows into posting rows.

    pdf is sorted by (segment, term_hash, doc_id). All arithmetic (group
    boundaries, delta, varint byte scatter, block maxima) is whole-array;
    per-group Python is reduced to buffer slicing (codec.encode_grouped).
    """
    n = len(pdf)
    if n == 0:
        return pd.DataFrame(
            columns=[
                "segment", "term_hash", "df", "doc_ids", "tfs", "dls",
                "block_last", "block_max_tf", "block_min_dl",
                "block_doc_off", "block_tf_off", "block_dl_off",
            ]
        )
    seg = pdf["segment"].to_numpy()
    term = pdf["term_hash"].to_numpy()
    # no uint64 widening — the codec is dtype-native (r5)
    doc = pdf["doc_id"].to_numpy()
    tf = pdf["tf"].to_numpy()
    dl = pdf["dl"].to_numpy()
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (seg[1:] != seg[:-1]) | (term[1:] != term[:-1])
    starts = np.flatnonzero(new_group)
    ends = np.append(starts[1:], n)

    enc = encode_grouped(doc, tf, dl, starts, ends, BLOCK_SIZE)
    return pd.DataFrame(
        {
            "segment": seg[starts].astype(np.int32),
            "term_hash": term[starts].astype(np.int64),
            "df": (ends - starts).astype(np.int32),
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


def build_postings(
    tokens: DataFrame,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Sort-based posting construction (the Lucene-analog merge sort).

    Shuffle key (segment, term) bounds every reducer group by the segment
    size regardless of term frequency — stopword-skew safe by construction.
    """
    spark = tokens.sparkSession
    nump = shuffle_partitions or spark.sparkContext.defaultParallelism

    arranged = tokens.repartition(
        nump, "segment", "term_hash"
    ).sortWithinPartitions("segment", "term_hash", "doc_id")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            seg = pdf["segment"].to_numpy()
            term = pdf["term_hash"].to_numpy()
            # hold back the (possibly incomplete) trailing group
            last_seg, last_term = seg[-1], term[-1]
            tail_start = len(pdf)
            while tail_start > 0 and seg[tail_start - 1] == last_seg and term[
                tail_start - 1
            ] == last_term:
                tail_start -= 1
            carry = pdf.iloc[tail_start:]
            head = pdf.iloc[:tail_start]
            if len(head):
                yield _encode_groups(head)
        if carry is not None and len(carry):
            yield _encode_groups(carry)

    return arranged.mapInPandas(encode, schema=POSTING_SCHEMA)


_POSTING_PA_SCHEMA = None  # built lazily (pyarrow import at worker use)


def _posting_pa_schema():
    global _POSTING_PA_SCHEMA
    if _POSTING_PA_SCHEMA is None:
        import pyarrow as pa

        _POSTING_PA_SCHEMA = pa.schema(
            [
                ("segment", pa.int32()),
                ("term_hash", pa.int64()),
                ("df", pa.int32()),
                ("doc_ids", pa.binary()),
                ("tfs", pa.binary()),
                ("dls", pa.binary()),
                ("block_last", pa.list_(pa.int64())),
                ("block_max_tf", pa.list_(pa.int64())),
                ("block_min_dl", pa.list_(pa.int64())),
                ("block_doc_off", pa.list_(pa.int64())),
                ("block_tf_off", pa.list_(pa.int64())),
                ("block_dl_off", pa.list_(pa.int64())),
            ]
        )
    return _POSTING_PA_SCHEMA


def build_postings_from_docs(
    docs: DataFrame,
    text_col: str = "content",
    num_partitions: int | None = None,
    pre_partitioned: bool = False,
    tokens_col: str = "_toks",
) -> DataFrame:
    """One-shuffle posting build (the Lucene RAM-buffer flush model).

    Raw docs are range-partitioned on (segment, doc_id) — each partition a
    contiguous doc range — then ONE mapInPandas stage tokenizes, tf-
    aggregates, groups and compresses. Compared to the two-stage
    tokenize→shuffle-token-rows→encode plan this moves ~1/2 the bytes
    (raw text once instead of the exploded (doc,term,tf,dl) stream) and
    crosses the Arrow boundary twice instead of four times.

    Memory: one partition's uncompressed postings (bounded by the doc-range
    budget — at scale, size partitions/segments so this fits the worker;
    the merge stage consolidates many small segments afterwards).

    A (segment, term) posting may split across a partition boundary —
    readers merge duplicate term rows (disjoint, ordered doc ranges).
    """
    spark = docs.sparkSession
    nump = num_partitions or spark.sparkContext.defaultParallelism
    if tokens_col in docs.columns:
        # the assigned frame already carries hashed-token arrays (computed
        # once, post-shuffle, inside the persisted frame — build_docs
        # carry_tokens): consume them directly, zero re-tokenization
        src = docs.select(
            "doc_id", "segment", "dl", F.col(tokens_col).alias("_toks")
        )
        if not pre_partitioned:
            src = src.repartitionByRange(
                nump, "segment", "doc_id"
            ).sortWithinPartitions("segment", "doc_id")
    else:
        src = docs.select(
            "doc_id", "segment", "dl", F.col(text_col).alias("_text")
        )
        if not pre_partitioned:
            src = src.repartitionByRange(
                nump, "segment", "doc_id"
            ).sortWithinPartitions("segment", "doc_id")
        # tokenize AND hash JVM-side (codegen'd regexp + xxhash64
        # transform) AFTER the shuffle — raw text moves over the exchange,
        # not token arrays; the Arrow boundary then carries int64 hash
        # arrays and the kernel is whole-array numpy only
        src = src.select(
            "doc_id", "segment", "dl", hash_tokens_expr("_text").alias("_toks")
        )

    # RAM-buffer budget per flush, in (doc,term) pairs. Sized for the
    # CACHE tier, not for RAM: the flush kernel is argsort + 5-lane
    # gather over ~28 B/pair, and with all cores sharing one memory
    # system the kernel-shape microbench (tools/flush_scaling_probe.py)
    # runs 4.3x faster at 8 procs and scales 0.92 (vs 0.31) when the
    # working set drops from 336 MB (12M pairs) to 42 MB/proc. Real
    # 450k-doc A/B in matched host windows: group-0 68->20.6 s at 8
    # cores, 76.5->50.3 s at 2 cores. 750k pairs was tried and is WORSE
    # (group-0 58.7 s vs 24.2 s at 8 cores, same window) — per-flush
    # fixed costs dominate below ~1M pairs. Smaller flushes emit more
    # split posting rows per (segment, term) — readers merge those
    # (disjoint doc ranges; test_tiny_flush_buffer_rank_identical) and
    # the merge stage consolidates, so the trade is fragment count
    # (~2x rows, equal bytes at 450k docs) for cache residency.
    FLUSH_PAIRS = int(os.environ.get("KBSE_FLUSH_PAIRS", "1500000"))

    def _flush(seg_l, doc_l, dl_l, tf_l, code_l):
        seg = np.concatenate(seg_l)
        doc = np.concatenate(doc_l)
        dl = np.concatenate(dl_l)
        tf = np.concatenate(tf_l)
        codes = np.concatenate(code_l)
        # input rows are already in (segment, doc) order — a STABLE sort by
        # term hash alone yields contiguous (term, segment, doc) runs (one
        # int sort). Codes are the GLOBAL xxhash64 term hashes, so the
        # buffered state between batches is pure int64 — no object arrays
        # held, nothing re-hashed at flush time, and no per-partition
        # vocab dict at all. (The round-1 design re-factorized a string
        # column here — the single biggest memory-bandwidth cost in the
        # build; round 2 kept a string->code dict; v4 removes strings from
        # the kernel entirely.)
        #
        # Sort strategy note (r4, measured): numpy's kind="stable" for
        # int64 IS an LSD radix sort — O(n) sequential streaming passes
        # that hardware-prefetch well even with 8 pinned processes
        # contending for one memory system. A top-byte pre-bucket +
        # 256 cache-resident sub-sorts variant was tried and REVERTED:
        # single-process it wins ~1.5x, but under 8-way contention its
        # random-access gathers scale ~2.5x WORSE than the streaming
        # radix passes (A/B: plain 3.30 vs pre-bucket 1.32 sorts/s at 8
        # pinned procs on 12M-pair buffers; in-situ group-0 regressed
        # 46->122s at 8 cores). Keep the plain stable argsort.
        order = np.argsort(codes, kind="stable")
        seg, doc, dl, tf, codes = (
            seg[order], doc[order], dl[order], tf[order], codes[order]
        )
        n = len(doc)
        new_group = np.ones(n, dtype=bool)
        new_group[1:] = (seg[1:] != seg[:-1]) | (codes[1:] != codes[:-1])
        starts = np.flatnonzero(new_group)
        ends = np.append(starts[1:], n)
        # dtype-NATIVE hand-off (r5): int64 doc + int32 tf/dl flow into
        # the codec as-is — the three astype(uint64) widening copies this
        # replaces were ~40% of the gathered bytes in a kernel measured
        # AT its DRAM-streaming ceiling (VERDICT r4), pure waste
        enc = encode_grouped(doc, tf, dl, starts, ends, BLOCK_SIZE)
        return pd.DataFrame(
            {
                "segment": seg[starts].astype(np.int32),
                "term_hash": codes[starts].astype(np.int64),
                "df": (ends - starts).astype(np.int32),
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

    def build(batches):
        # mapInArrow: the _toks list<int64> column is consumed as ONE flat
        # contiguous values buffer + a lengths vector — zero per-row
        # ndarray objects, zero np.concatenate copies (mapInPandas
        # materializes a small numpy array PER ROW and re-concatenates;
        # at ~1k tokens/doc that is the whole Arrow-boundary cost)
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = _posting_pa_schema()
        seg_l, doc_l, dl_l, tf_l, code_l = [], [], [], [], []
        pending = 0
        cols = None
        for rb in batches:
            if cols is None:
                cols = {n: i for i, n in enumerate(rb.schema.names)}
            toks = rb.column(cols["_toks"])
            if len(toks) == 0:
                continue
            lens_arr = toks.value_lengths()
            if lens_arr.null_count:  # null rows flatten() to nothing
                lens_arr = pc.fill_null(lens_arr, 0)
            lens = np.asarray(
                lens_arr.to_numpy(zero_copy_only=False), dtype=np.int64
            )
            flat = toks.flatten().to_numpy(zero_copy_only=False)
            if flat.size == 0:
                continue
            ridx = np.repeat(
                np.arange(len(toks), dtype=np.int32), lens
            )
            # tf aggregation on int64 hashes: factorize (vectorized int
            # hashing — no Python-object traffic), then one np.unique
            # over composite (row, term) keys. The kernel is DRAM-bound,
            # so the composite key narrows to int32 whenever
            # rows x batch-vocab fits — the unique's sort then moves half
            # the bytes (typical: ~10k rows x vocab well under 2^31);
            # gigantic per-batch vocabularies fall back to int64.
            codes, uniq_hashes = pd.factorize(flat, sort=False)
            n_uniq = len(uniq_hashes)
            if len(toks) * n_uniq < (1 << 31):
                key = ridx * np.int32(n_uniq) + codes.astype(
                    np.int32, copy=False
                )
            else:
                key = ridx.astype(np.int64) * np.int64(n_uniq) + codes
            ukey, counts = np.unique(key, return_counts=True)
            rr = (ukey // n_uniq).astype(np.int64)
            tcode = (ukey % n_uniq).astype(np.int64)
            seg_np = rb.column(cols["segment"]).to_numpy(zero_copy_only=False)
            doc_np = rb.column(cols["doc_id"]).to_numpy(zero_copy_only=False)
            dl_np = rb.column(cols["dl"]).to_numpy(zero_copy_only=False)
            # int32 buffers for seg/dl/tf (dl, tf < 2^31 by contract;
            # doc_id stays int64 — global ids exceed int32 at scale):
            # the flush's sort-gather is bandwidth-bound, narrower lanes
            # move ~30% fewer bytes
            seg_l.append(seg_np[rr].astype(np.int32, copy=False))
            doc_l.append(doc_np[rr])
            dl_l.append(dl_np[rr].astype(np.int32))
            tf_l.append(counts.astype(np.int32))
            code_l.append(np.asarray(uniq_hashes, dtype=np.int64)[tcode])
            pending += len(ukey)
            if pending >= FLUSH_PAIRS:
                # RAM-buffer flush (Lucene-style): emit a sub-range of the
                # partition as posting rows; readers merge split rows
                yield pa.RecordBatch.from_pandas(
                    _flush(seg_l, doc_l, dl_l, tf_l, code_l),
                    schema=out_schema, preserve_index=False,
                )
                seg_l, doc_l, dl_l, tf_l, code_l = [], [], [], [], []
                pending = 0
        if seg_l:
            yield pa.RecordBatch.from_pandas(
                _flush(seg_l, doc_l, dl_l, tf_l, code_l),
                schema=out_schema, preserve_index=False,
            )

    return src.mapInArrow(build, schema=POSTING_SCHEMA)


def build_terms(postings: DataFrame) -> DataFrame:
    """Global term-hash dictionary: df per term_hash (collection frequency
    is derivable). groupBy with a pre-aggregated input (one row per
    (segment, term)) — partial aggregation makes stopwords harmless here.

    Strings are intentionally absent (v4): BM25 only needs (hash -> df);
    query terms are hashed driver-side (functions/hashing.py). A
    human-readable vocab table can be derived offline with one JVM pass
    (explode(array_distinct(tokens)) + groupBy) when term browsing is
    needed — it is not on the build or query hot path."""
    return postings.groupBy("term_hash").agg(F.sum("df").alias("df"))


# ---------------------------------------------------------------- full build


class IndexBuilder:
    """End-to-end builder with per-segment-group lineage + resume.

    Layout under index_dir/:
      docs/        parquet
      postings/    parquet, partitioned by segment
      terms/       parquet (term, df)
      stats.json   {n_docs, avgdl, num_segments, seg_size, k1, b}
      _lineage/    docs.json + group-<i>.json markers with metrics
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        num_segments: int = 16,
        segments_per_commit: int = 4,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.num_segments = num_segments
        self.segments_per_commit = segments_per_commit
        self.lineage_dir = os.path.join(index_dir, "_lineage")

    # -- lineage helpers ---------------------------------------------------
    def _marker_path(self, name: str) -> str:
        return os.path.join(self.lineage_dir, f"{name}.json")

    def has_marker(self, name: str) -> bool:
        return os.path.exists(self._marker_path(name))

    def write_marker(self, name: str, payload: dict) -> None:
        os.makedirs(self.lineage_dir, exist_ok=True)
        tmp = self._marker_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        os.replace(tmp, self._marker_path(name))  # atomic

    def read_marker(self, name: str) -> dict | None:
        if not self.has_marker(name):
            return None
        with open(self._marker_path(name)) as f:
            return json.load(f)

    # -- build -------------------------------------------------------------
    def build(
        self,
        corpus: DataFrame,
        key_cols: list[str],
        text_col: str = "content",
        doc_id_col: str | None = None,
        resume: bool = True,
        max_groups: int | None = None,
        store_text: bool = True,
    ) -> dict:
        """Build (or resume) the index. Returns final stats dict.

        max_groups: fault-injection knob for resume tests — abort after
        committing this many segment groups (simulates a mid-build kill).

        store_text=False drops the raw text column from the WRITTEN docs
        table (keys, metadata, dl, sha256 stay) — the 100-TB layout: the
        source Iceberg table already holds the content; duplicating it
        into the index doubles the corpus write. Hydration then joins the
        source by key. A resume re-derives the assigned frame from the
        corpus instead of re-reading stored docs (deterministic ids).
        """
        spark = self.spark
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        t_all = time.time()
        # observe()-based write metrics are exactly-once only when no task
        # is executed twice successfully — rule out speculative duplicates
        # (stage-retry reruns are already impossible in local mode, and
        # the legacy agg re-read stays as the fallback)
        use_observe = (
            spark.conf.get("spark.speculation", "false").lower() != "true"
        )

        docs_path = os.path.join(self.index_dir, "docs")
        cached_docs = None
        docs_write_task = None
        if not (resume and self.has_marker("docs")):
            t0 = time.time()
            docs, n_docs, total_dl = build_docs(
                corpus, key_cols, text_col, doc_id_col, self.num_segments,
                carry_tokens=True, keep_text=store_text,
            )
            # keep the assigned frame: it is already range-partitioned in
            # doc_id order AND carries the hashed-token arrays, so the
            # posting build runs on it directly — no docs re-read, no
            # second shuffle, and no second tokenizer pass over the text
            cached_docs = docs.persist()
            base = [
                c for c in cached_docs.columns
                if c not in ("_toks", "doc_id", "sha256", "segment")
            ]
            to_store = cached_docs.select(*base, "doc_id", "sha256", "segment")
            doc_obs = None
            if total_dl is None and use_observe:
                # stats fall out of the docs write itself — no separate
                # compute_stats aggregation job (guide §1.2: don't compute
                # things twice)
                from pyspark.sql import Observation

                doc_obs = Observation()
                to_store = to_store.observe(
                    doc_obs,
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("total_dl"),
                    F.max("doc_id").alias("max_doc_id"),
                )

            def docs_write_task(
                _to_store=to_store, _n_docs=n_docs,
                _total_dl=total_dl, _obs=doc_obs, _t0=t0,
            ):
                spark.sparkContext.setJobDescription("index build: docs table")
                _to_store.write.mode("overwrite").partitionBy(
                    "segment"
                ).parquet(docs_path)
                if _n_docs == 0:
                    # a zero-row partitionBy write emits NO files — leave a
                    # schema-bearing empty partition so every reader (and
                    # the first incremental add) still infers the layout
                    _to_store.drop("segment").limit(0).write.mode(
                        "overwrite"
                    ).parquet(os.path.join(docs_path, "segment=-1"))
                if _total_dl is not None:
                    st = {"n_docs": _n_docs,
                          "avgdl": _total_dl / _n_docs if _n_docs else 0.0,
                          "total_dl": int(_total_dl),
                          "max_doc_id": _n_docs - 1}
                elif _obs is not None:
                    m = _obs.get
                    nd = int(m["n_docs"] or 0)
                    st = {"n_docs": nd,
                          "avgdl": (m["total_dl"] or 0) / nd if nd else 0.0,
                          "total_dl": int(m["total_dl"] or 0),
                          "max_doc_id": int(m["max_doc_id"])
                          if m["max_doc_id"] is not None else -1}
                else:
                    st = compute_stats(cached_docs)
                st["num_segments"] = self.num_segments
                st["seg_size"] = max(
                    1, math.ceil(st["n_docs"] / self.num_segments)
                )
                st["k1"], st["b"] = 1.2, 0.75
                st["format_version"] = FORMAT_VERSION
                with open(os.path.join(self.index_dir, "stats.json"), "w") as f:
                    json.dump(st, f)
                self.write_marker(
                    "docs", {"rows": st["n_docs"], "seconds": time.time() - _t0}
                )
                return st

            # the posting groups only need seg_size, which is a pure
            # function of n_docs — the docs write itself can run
            # CONCURRENTLY with them (guide §2.6: overlap independent
            # jobs; both read the same persisted frame, and resume
            # markers stay ordered per artifact)
            stats = {"n_docs": n_docs}
            seg_size = max(1, math.ceil(n_docs / self.num_segments))
        else:
            with open(os.path.join(self.index_dir, "stats.json")) as f:
                stats = json.load(f)
            seg_size = stats["seg_size"]

        docs_df = cached_docs
        if docs_df is None:
            stored = spark.read.parquet(docs_path)
            if text_col in stored.columns:
                docs_df = stored
            else:
                # store_text=False resume: re-derive the assigned frame
                # from the corpus (doc_id = sort rank — deterministic)
                docs, _, _ = build_docs(
                    corpus, key_cols, text_col, doc_id_col, self.num_segments,
                    carry_tokens=True, keep_text=False,
                )
                cached_docs = docs.persist()
                docs_df = cached_docs
        n_segments = max(1, math.ceil(stats["n_docs"] / seg_size))

        groups = [
            list(range(g, min(g + self.segments_per_commit, n_segments)))
            for g in range(0, n_segments, self.segments_per_commit)
        ]
        postings_path = os.path.join(self.index_dir, "postings")

        def build_group(gi: int, segs: list[int]) -> None:
            t0 = time.time()
            spark.sparkContext.setJobDescription(
                f"index build: postings group {gi}"
            )
            lo, hi = segs[0] * seg_size, (segs[-1] + 1) * seg_size
            part = docs_df.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            # the freshly-assigned cached frame is already partitioned by
            # contiguous doc ranges (range partition on the sort key whose
            # rank IS the doc_id) — no shuffle needed; the parquet re-read
            # path (resume) re-partitions explicitly
            postings = build_postings_from_docs(
                part, text_col, pre_partitioned=cached_docs is not None
            )
            # marker metrics observed DURING the write (one job instead of
            # write + column-pruned re-read; exactly-once under the
            # use_observe guard above)
            obs = None
            if use_observe:
                from pyspark.sql import Observation

                obs = Observation()
                postings = postings.observe(
                    obs,
                    F.count(F.lit(1)).alias("rows"),
                    F.sum("df").alias("postings"),
                )
            postings.write.mode("overwrite").partitionBy("segment").parquet(
                postings_path
            )
            if not any(
                e.name.startswith("segment=")
                for e in os.scandir(postings_path)
                if e.is_dir()
            ):
                # empty corpus: leave a schema-bearing empty partition
                spark.createDataFrame(
                    [], POSTING_SCHEMA.replace("segment int, ", "")
                ).write.mode("overwrite").parquet(
                    os.path.join(postings_path, "segment=-1")
                )
            if obs is not None:
                m = obs.get
            else:
                # fallback: column-pruned (segment, df) re-read — never
                # re-decodes the posting payload bytes it just wrote
                m = (
                    spark.read.parquet(postings_path)
                    .where(F.col("segment").isin([int(s) for s in segs]))
                    .agg(F.count("*").alias("rows"),
                         F.sum("df").alias("postings"))
                    .collect()[0]
                )
            nbytes = 0
            for s in segs:
                seg_dir = os.path.join(postings_path, f"segment={s}")
                if os.path.isdir(seg_dir):
                    nbytes += sum(
                        e.stat().st_size
                        for e in os.scandir(seg_dir)
                        if e.is_file() and not e.name.startswith((".", "_"))
                    )
            self.write_marker(
                f"group-{gi}",
                {
                    "segments": segs,
                    "rows": int(m["rows"] or 0),
                    "postings": int(m["postings"] or 0),
                    "bytes": nbytes,
                    "seconds": time.time() - t0,
                },
            )

        pending = [
            (gi, segs)
            for gi, segs in enumerate(groups)
            if not (resume and self.has_marker(f"group-{gi}"))
        ]
        if max_groups is not None:
            # fault-injection path (resume tests): serial, deterministic
            if docs_write_task is not None:
                stats = docs_write_task()
                sc_cache = getattr(docs_df, "_kbse_sort_cache", None)
                if sc_cache is not None:
                    sc_cache.unpersist()
            for built, (gi, segs) in enumerate(pending):
                if built >= max_groups:
                    raise RuntimeError("fault injection: killed mid-build")
                build_group(gi, segs)
        elif docs_write_task is not None or pending:
            # docs write FIRST, serially: that pass materializes the shared
            # persisted frame (one computation, no cold-cache race); the
            # posting groups then run CONCURRENTLY over the warm cache.
            if docs_write_task is not None:
                stats = docs_write_task()
                sort_cache = getattr(docs_df, "_kbse_sort_cache", None)
                if sort_cache is not None:
                    sort_cache.unpersist()  # raw-corpus copy, dead now
            if len(pending) == 1:
                build_group(*pending[0])
            elif pending:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(len(pending), 8)
                ) as ex:
                    futures = [ex.submit(build_group, gi, segs)
                               for gi, segs in pending]
                    for f in futures:
                        f.result()  # surface the first failure

        if not (resume and self.has_marker("terms")):
            t0 = time.time()
            postings = spark.read.parquet(postings_path)
            # batch=0 partition: incremental adds later contribute their own
            # batch partitions (O(new) increments); readers aggregate df
            # across batches lazily (InvertedIndex.terms)
            # sortWithinPartitions(term_hash): zero extra exchange (the
            # groupBy already hash-partitioned the dictionary), but each
            # output file becomes hash-ordered, so parquet row-group
            # min/max stats prune point lookups — a query-term lookup
            # reads ~1 row group per file instead of every row group
            # (guide §6: sort order on write makes stats effective)
            terms = (
                build_terms(postings)
                .sortWithinPartitions("term_hash")
                .withColumn("batch", F.lit(0))
            )
            terms.write.mode("overwrite").partitionBy("batch").parquet(
                os.path.join(self.index_dir, "terms")
            )
            if stats["n_docs"] == 0:
                spark.createDataFrame(
                    [], "term_hash bigint, df bigint"
                ).write.mode("overwrite").parquet(
                    os.path.join(self.index_dir, "terms", "batch=0")
                )
            self.write_marker("terms", {"seconds": time.time() - t0})

        if cached_docs is not None:
            cached_docs.unpersist()
        stats["build_seconds"] = time.time() - t_all
        return stats


# ---------------------------------------------------------------- field index


def build_field_index(
    spark: SparkSession,
    index_dir: str,
    field: str,
    num_segments: int | None = None,
    drop_cols: tuple = (),
) -> str:
    """Per-field postings (P5): a sub-index over one column of the primary
    docs table, with its OWN df/avgdl statistics — the reference matches on
    `oname` separately from `_all` (ElasticIndexingStorage.java:1381-1383),
    i.e. Lucene's per-field posting lists + per-field norms.

    doc_ids are shared with the primary index (read straight from the
    primary docs table), so results join/hydrate against primary docs with
    no translation. Layout: <index_dir>/fields/<field>/{docs,postings,
    terms,stats.json} — same format, same readers, same resume protocol.
    The sub-docs table keeps metadata columns (doc_filter predicates work
    field-scoped) but drops the primary text payload.
    """
    with open(os.path.join(index_dir, "stats.json")) as f:
        primary = json.load(f)
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).drop(
        "dl", "sha256", "segment", *drop_cols
    )
    sub_dir = os.path.join(index_dir, "fields", field)
    nseg = num_segments or primary.get("num_segments", 16)
    b = IndexBuilder(spark, sub_dir, num_segments=nseg, segments_per_commit=nseg)
    b.build(docs, key_cols=["doc_id"], text_col=field, doc_id_col="doc_id")
    return sub_dir


def build_from_spec(
    spark: SparkSession,
    index_dir: str,
    objects: DataFrame,
    spec,
    key_cols: list[str],
    version: int | None = None,
    json_col: str | None = None,
    num_segments: int = 16,
    segments_per_commit: int | None = None,
    lookups: dict | None = None,
) -> dict:
    """Spec-driven index build (S7 end-to-end): extraction, storage and
    indexing decisions all come from a versioned YAML TypeSpec
    (functions/typespec.py — the reference's ObjectTypeParsingRules →
    KeywordParser → ElasticIndexingStorage pipeline).

      - every rule output is STORED on the docs table
      - the first indexable full-text key becomes the primary BM25 index
      - each additional indexable full-text key gets a field index (P5)
      - full-text keys marked not-indexed are stored WITHOUT postings
        (T9, IndexingRules.java:77-82 "keep on document, exclude from
        index")
      - lookups: {dim: (df, key_col)} registry for T6 `lookup.` rules
        (KeywordParser.java:309-324) — compiled to broadcast joins
    """
    from ..functions.transforms import apply_rules

    rules = spec.rules(version)
    docs_src = apply_rules(objects, rules, json_col=json_col, lookups=lookups)
    indexed = set(spec.indexed_keys(version))
    ft = [r.name for r in rules if r.full_text and r.name in indexed]
    if not ft:
        raise ValueError(f"spec {spec.name}: no indexable full-text key")
    primary, *extra = ft
    cols = list(dict.fromkeys(key_cols + [r.name for r in rules]))
    builder = IndexBuilder(
        spark, index_dir, num_segments, segments_per_commit or num_segments
    )
    stats = builder.build(docs_src.select(*cols), key_cols=key_cols,
                          text_col=primary)
    for f in extra:
        build_field_index(spark, index_dir, f)
    stats["indexed_fields"] = ft
    stats["stored_only"] = [
        r.name for r in rules if r.full_text and r.name not in indexed
    ]
    if getattr(spec, "sub_object_path", None):
        stats["sub_index"] = build_sub_index(
            spark, index_dir, docs_src, spec, key_cols,
            num_segments=num_segments,
        )
    return stats


def build_sub_index(
    spark: SparkSession,
    index_dir: str,
    docs_src: DataFrame,
    spec,
    key_cols: list[str],
    num_segments: int = 4,
) -> dict:
    """Physical `*_sub` child index from the spec's sub-object-path
    (reference: ObjectTypeParsingRules subObjectType + path-to-sub-objects,
    GenomeFeature.yaml:6-8; per-(type,version) `_sub` index naming
    ElasticIndexingStorage.java:297-302; default searches exclude
    `-*_sub`, :62,1544-1546 — here the exclusion is structural: child
    postings live under <index_dir>/sub/ and the primary index never
    sees them).

    Each element of the repeated field becomes its own child document
    (composite GUID `<parent-key>:<ordinal>`, KeywordParser.java:273-293)
    with ITS OWN postings and BM25 statistics — a GenomeFeature-style
    user searches child docs through child-scoped df/avgdl, exactly
    Lucene's separate-index semantics. Same format/readers/resume
    protocol as the primary (InvertedIndex.sub_index())."""
    from ..functions.transforms import explode_subobjects

    children = explode_subobjects(
        docs_src, key_cols, spec.sub_object_path
    )
    sub_dir = os.path.join(index_dir, "sub")
    b = IndexBuilder(
        spark, sub_dir, num_segments=num_segments,
        segments_per_commit=num_segments,
    )
    stats = b.build(children, key_cols=["sub_id"], text_col="sub_value")
    stats["sub_object_type"] = getattr(spec, "sub_object_type", None)
    return {"n_children": stats["n_docs"], "dir": sub_dir,
            "sub_object_type": stats["sub_object_type"]}


def build_versioned_from_spec(
    spark: SparkSession,
    base_dir: str,
    objects: DataFrame,
    spec,
    key_cols: list[str],
    version_router,
    json_col: str | None = None,
    num_segments: int = 4,
) -> dict:
    """Type-version PHYSICAL coexistence: one index per spec version under
    ``<base_dir>/v<N>/`` — the naming analog of the reference's
    ``prefix + type + "_" + version`` per-(type,version) ES indexes
    (ElasticIndexingStorage.java:297-302), whose coexistence of
    INCOMPATIBLE versions is proven by testTypeVersions
    (ElasticIndexingStorageTest.java:961-1014).

    version_router: a Column expression assigning each object row its
    search-type version (the TypeMapping routing of typespec.resolve_rules
    expressed over the data). Each version's objects are extracted with
    THAT version's rules and built into their own physical index —
    different key sets never share a file. Returns {version: stats}.
    """
    routed = objects.withColumn("_spec_version", version_router)
    versions = sorted(
        int(r[0])
        for r in routed.select("_spec_version").distinct().collect()
        if r[0] is not None
    )
    out = {}
    for v in versions:
        out[v] = build_from_spec(
            spark,
            os.path.join(base_dir, f"v{v}"),
            routed.where(F.col("_spec_version") == v).drop("_spec_version"),
            spec,
            key_cols,
            version=v,
            json_col=json_col,
            num_segments=num_segments,
        )
    return out


def union_version_docs(spark: SparkSession, base_dir: str) -> DataFrame:
    """Search across coexisting versions — the ES index-pattern scan over
    ``type_*`` (P9 analog applied to versions): union the per-version
    docs tables BY NAME with null-filling for keys a version does not
    define (unionByName(allowMissingColumns) — incompatible schemas
    coexist, exactly the testTypeVersions invariant). Each row carries
    its ``spec_version``; (spec_version, doc_id) is the unique key.
    """
    from functools import reduce

    vdirs = sorted(
        e.name for e in os.scandir(base_dir)
        if e.is_dir() and e.name.startswith("v") and e.name[1:].isdigit()
    )
    if not vdirs:
        raise FileNotFoundError(f"no version indexes under {base_dir}")
    frames = [
        spark.read.parquet(os.path.join(base_dir, d, "docs")).withColumn(
            "spec_version", F.lit(int(d[1:]))
        )
        for d in vdirs
    ]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


# ---------------------------------------------------------------- incremental


def add_documents(
    spark: SparkSession,
    index_dir: str,
    new_corpus: DataFrame,
    key_cols: list[str],
    text_col: str = "content",
    batch_id: str | None = None,
) -> dict:
    """Incremental add (M6 / NEW_VERSION events): index new docs as NEW
    segments appended after the committed max doc_id.

    O(new) by construction — existing postings/docs/terms files are never
    re-read or rewritten:
      docs     -> dynamic-overwrite of the NEW segment partitions only
      postings -> dynamic-overwrite of the NEW segment partitions only
      terms    -> this add's df contribution written to its own
                  terms/batch=<first_new_seg> partition (readers aggregate
                  lazily); no global term-dictionary rebuild
      stats    -> arithmetic update from (n_new, total_dl_new)

    Crash safety: every data write is an idempotent dynamic partition
    overwrite keyed off the COMMITTED stats (start_id), so re-running a
    failed add rewrites the same partitions. The completion marker
    `add-<key>` is written after the data commits and before the stats
    update; if a previous run died between marker and stats, the stats
    update is completed from the marker payload first. Pass `batch_id`
    (an idempotence token, e.g. the event batch id) for exactly-once
    semantics across retries of the same logical add.

    Note: BM25 idf/avgdl change with N, so scores shift corpus-wide by
    design (same as ES refresh semantics). The merge stage
    (operators/merge.py) consolidates small incremental segments later.
    """
    def _load_stats() -> dict:
        with open(os.path.join(index_dir, "stats.json")) as f:
            return json.load(f)

    def _commit_stats(stats: dict) -> None:
        tmp = os.path.join(index_dir, "stats.json.tmp")
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, os.path.join(index_dir, "stats.json"))

    stats = _load_stats()
    seg_size = stats["seg_size"]
    lineage = IndexBuilder(spark, index_dir)

    def _finish(marker: dict) -> dict:
        # data committed by a previous (or this) run; roll the stats forward
        if stats.get("max_doc_id", -1) < marker["max_doc_id"]:
            stats["n_docs"] += marker["n_new"]
            stats["total_dl"] = stats.get("total_dl", 0) + marker["total_dl_new"]
            stats["avgdl"] = stats["total_dl"] / stats["n_docs"]
            stats["max_doc_id"] = marker["max_doc_id"]
            _commit_stats(stats)
        return {"added": marker["n_new"],
                "first_segment": marker["first_segment"],
                "n_docs": stats["n_docs"], "avgdl": stats["avgdl"]}

    # new ids continue the dense sequence; new segments start on a fresh
    # boundary so they never straddle existing ones
    first_new_seg = math.ceil((stats.get("max_doc_id", -1) + 1) / seg_size)
    start_id = first_new_seg * seg_size
    marker_name = f"add-{batch_id or start_id}"
    prev = lineage.read_marker(marker_name)
    if prev is not None:
        out = _finish(prev)
        if batch_id is not None:
            return out  # exactly-once: this logical add already applied
        # no token: previous add at this start_id committed but its stats
        # were just rolled forward — recompute the boundary and continue
        first_new_seg = math.ceil((stats["max_doc_id"] + 1) / seg_size)
        start_id = first_new_seg * seg_size
        marker_name = f"add-{start_id}"

    with_ids, n_new, total_dl_new = assign_doc_ids(
        new_corpus, key_cols, compute_dl=text_col
    )
    if n_new == 0:
        return {"added": 0, "first_segment": first_new_seg,
                "n_docs": stats["n_docs"], "avgdl": stats.get("avgdl", 0.0)}
    docs = (
        with_ids.withColumn("doc_id", F.col("doc_id") + F.lit(start_id))
        .withColumn("sha256", F.sha2(F.col(text_col), 256))
        .withColumn("segment", (F.col("doc_id") / F.lit(seg_size)).cast("int"))
    ).persist()

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs.write.mode("overwrite").partitionBy("segment").parquet(
        os.path.join(index_dir, "docs")
    )
    postings = build_postings_from_docs(docs, text_col, pre_partitioned=True)
    postings.write.mode("overwrite").partitionBy("segment").parquet(
        os.path.join(index_dir, "postings")
    )
    new_terms = build_terms(
        spark.read.parquet(os.path.join(index_dir, "postings")).where(
            F.col("segment") >= first_new_seg
        )
    ).sortWithinPartitions("term_hash").withColumn(
        "batch", F.lit(int(first_new_seg))
    )
    new_terms.write.mode("overwrite").partitionBy("batch").parquet(
        os.path.join(index_dir, "terms")
    )
    docs.unpersist()

    marker = {
        "n_new": n_new,
        "total_dl_new": int(total_dl_new or 0),
        "first_segment": first_new_seg,
        "max_doc_id": start_id + n_new - 1,
    }
    lineage.write_marker(marker_name, marker)
    return _finish(marker)

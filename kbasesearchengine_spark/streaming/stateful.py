"""Custom stateful streaming operators (applyInPandasWithState).

The reference's event pipeline keeps per-object processing state in Mongo
(events/storage/MongoDBStatusEventStorage.java; EventQueue dedup,
EventQueue.java:86-99). The Structured Streaming disposition is a custom
stateful operator: state lives in the checkpointed state store, keyed by
group, surviving restarts — no external database.

`dedup_stream` is the flagship: exact content-hash deduplication ACROSS
micro-batches — the first arrival of each (key, content-hash) passes
through, every later duplicate is dropped, no matter which batch it
arrives in. This is the streaming analog of operators/dedup.dedup_exact
and the shape of a training-data ingest pipe (only-new-documents).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: per hash-prefix group, the set of full hashes already seen
_STATE_SCHEMA = "seen array<string>"
_OUT_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "content_hash string"
)


def _dedup_group(key, pdfs, state: GroupState):
    """One hash-prefix group: emit rows whose content_hash was never seen
    (in this batch or any previous one), then fold the new hashes into
    the state store."""
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        fresh_mask = []
        for h in pdf["content_hash"]:
            if h in seen:
                fresh_mask.append(False)
            else:
                seen.add(h)
                fresh_mask.append(True)
        kept = pdf[pd.Series(fresh_mask, index=pdf.index)]
        if len(kept):
            out.append(kept)
    state.update((sorted(seen),))
    if out:
        yield pd.concat(out, ignore_index=True)[
            ["repo", "path", "commit", "lang", "content", "content_hash"]
        ]


def dedup_stream(
    spark,
    events_dir: str,
    out_path: str,
    checkpoint_dir: str,
    schema: str,
    prefix_len: int = 2,
):
    """Streaming exact-dedup: grouped by a content-hash prefix (bounded,
    uniformly distributed key space — the salt that keeps any one state
    partition small at 100 TB), applyInPandasWithState keeps the
    seen-hash set per group in the checkpointed state store.

    Exactly-once end to end: the state store commits with the batch, so a
    replayed micro-batch re-emits deterministically and duplicates never
    pass twice.
    """
    stream = spark.readStream.schema(schema).parquet(events_dir)
    hashed = stream.withColumn("content_hash", F.sha2("content", 256)).withColumn(
        "hash_prefix", F.substring("content_hash", 1, prefix_len)
    )
    deduped = hashed.groupBy("hash_prefix").applyInPandasWithState(
        _dedup_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_batch_equivalent(df: DataFrame) -> DataFrame:
    """The batch semantics dedup_stream must reproduce across any batch
    split: first arrival per content hash survives (arrival order = row
    order here; in the stream, batch order)."""
    hashed = df.withColumn("content_hash", F.sha2("content", 256))
    return hashed.dropDuplicates(["content_hash"])

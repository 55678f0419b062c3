"""Custom stateful streaming operator (applyInPandasWithState): exact
dedup across micro-batches — state survives in the checkpoint, duplicates
arriving in LATER batches are dropped."""

from pyspark.sql import functions as F

from kbasesearchengine_spark.streaming.stateful import (
    dedup_batch_equivalent,
    dedup_stream,
)

SCHEMA = "repo string, path string, commit string, lang string, content string"

BATCH1 = [
    ("r1", "a.py", "c1", "py", "alpha beta"),
    ("r1", "b.py", "c1", "py", "gamma delta"),
    ("r2", "a.py", "c1", "py", "alpha beta"),  # dup within batch
]
BATCH2 = [
    ("r3", "x.py", "c2", "py", "alpha beta"),   # dup ACROSS batches
    ("r3", "y.py", "c2", "py", "epsilon zeta"),  # new
    ("r1", "b.py", "c9", "py", "gamma delta"),   # dup across batches
]


def test_stateful_dedup_across_batches(spark, tmp_path):
    events_dir = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(
        events_dir
    )
    q = dedup_stream(spark, events_dir, out_path, ckpt, SCHEMA)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_path)
    assert out1.count() == 2  # in-batch dup dropped
    assert out1.select("content_hash").distinct().count() == 2

    spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode("append").parquet(
        events_dir
    )
    q2 = dedup_stream(spark, events_dir, out_path, ckpt, SCHEMA)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(out_path)
    # only "epsilon zeta" is genuinely new in batch 2
    assert out2.count() == 3
    contents = sorted(r["content"] for r in out2.collect())
    assert contents == ["alpha beta", "epsilon zeta", "gamma delta"]

    # matches the batch-equivalent semantics on the concatenated input
    full = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    exp = {
        r["content_hash"] for r in dedup_batch_equivalent(full).collect()
    }
    got = {r["content_hash"] for r in out2.collect()}
    assert got == exp

    # replaying the SAME availableNow stream with the same checkpoint is a
    # no-op (exactly-once via the committed state store)
    q3 = dedup_stream(spark, events_dir, out_path, ckpt, SCHEMA)
    q3.awaitTermination(120)
    assert spark.read.parquet(out_path).count() == 3


class _FakeState:
    """Minimal GroupState stand-in for kernel-level churn assertions."""

    def __init__(self, exists=False):
        self.exists = exists
        self.updates = 0

    def update(self, t):
        self.updates += 1
        self.payload = t


def test_state_churn_is_o_batch():
    """State-store writes must be O(new keys in batch), not O(seen):
    an already-seen key writes NOTHING; a new key writes one O(1) flag."""
    import pandas as pd

    from kbasesearchengine_spark.streaming.stateful import _dedup_group

    row = pd.DataFrame(
        {c: ["x"] for c in
         ["repo", "path", "commit", "lang", "content", "content_hash"]}
    )
    seen = _FakeState(exists=True)
    assert list(_dedup_group(("h",), iter([row]), seen)) == []
    assert seen.updates == 0  # no rewrite for already-seen keys

    new = _FakeState(exists=False)
    out = list(_dedup_group(("h",), iter([row, row]), new))
    assert len(out) == 1 and len(out[0]) == 1  # first arrival only
    assert new.updates == 1 and new.payload == (True,)  # one O(1) flag

"""Event replay semantics (FIXTURES.md §5): islast visibility, per-doc
timestamp order, idempotent replay, RENAME/DELETE, and the Structured
Streaming wrapper."""

import os

import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.streaming import events as ev

BASE = [
    ("r1", "a.py", "c0", "python", "alpha beta"),
    ("r1", "b.py", "c0", "python", "gamma delta"),
    ("r2", "x.go", "c0", "go", "epsilon zeta"),
]

EVENTS = [
    # (event_id, ts, op, repo, path, commit, lang, content)
    (1, 10, "NEW_VERSION", "r1", "a.py", "c1", "python", "alpha beta v2"),
    (2, 20, "NEW_VERSION", "r1", "a.py", "c2", "python", "alpha beta v3"),
    # out-of-order arrival for same doc: ts=15 arrives after ts=20 —
    # the ts order must win (queue-ordering analog)
    (3, 15, "NEW_VERSION", "r1", "a.py", "c15", "python", "alpha beta v2.5"),
    (4, 30, "DELETE", "r1", "b.py", None, None, None),
    # RENAME: commit column carries the new path
    (5, 40, "RENAME", "r2", "x.go", "y.go", "go", "epsilon zeta"),
]


@pytest.fixture()
def state0(spark):
    corpus = spark.createDataFrame(
        BASE, "repo string, path string, commit string, lang string, content string"
    )
    return ev.initial_state(corpus)


def _events_df(spark, rows):
    return spark.createDataFrame(rows, ev.EVENT_SCHEMA)


def test_replay_islast_and_ops(spark, state0):
    state = ev.apply_events(state0, _events_df(spark, EVENTS))
    vis = {(r["repo"], r["path"]): r for r in ev.visible_docs(state).collect()}
    # latest version by ts wins (event 2, ts=20), not the later-arriving ts=15
    assert vis[("r1", "a.py")]["content"] == "alpha beta v3"
    # deleted doc disappears
    assert ("r1", "b.py") not in vis
    # renamed: old path gone, new path present with same content
    assert ("r2", "x.go") not in vis
    assert vis[("r2", "y.go")]["content"] == "epsilon zeta"
    assert len(vis) == 2


def test_replay_idempotent(spark, state0):
    once = ev.apply_events(state0, _events_df(spark, EVENTS))
    twice = ev.apply_events(once, _events_df(spark, EVENTS))
    assert once.count() == twice.count()  # replaying the batch is a no-op
    a = sorted(map(tuple, ev.visible_docs(once).collect()))
    b = sorted(map(tuple, ev.visible_docs(twice).collect()))
    assert a == b


def test_duplicate_event_ids_dropped(spark, state0):
    dup_batch = EVENTS + [EVENTS[0]]  # same event_id repeated in one batch
    state = ev.apply_events(state0, _events_df(spark, dup_batch))
    n = state.where(F.col("event_id") == 1).count()
    assert n == 1


def test_undelete_restores_last_version(spark, state0):
    """M8: DELETE then UNDELETE makes the last pre-delete version visible
    again (reference undeleteAllVersions, ElasticIndexingStorage.java:
    918-953)."""
    batch = [
        (1, 10, "NEW_VERSION", "r1", "a.py", "c1", "python", "alpha v2"),
        (2, 20, "DELETE", "r1", "a.py", None, None, None),
    ]
    state = ev.apply_events(state0, _events_df(spark, batch))
    assert ("r1", "a.py") not in {
        (r["repo"], r["path"]) for r in ev.visible_docs(state).collect()
    }
    state = ev.apply_events(
        state, _events_df(spark, [(3, 30, "UNDELETE", "r1", "a.py", None, None, None)])
    )
    vis = {(r["repo"], r["path"]): r for r in ev.visible_docs(state).collect()}
    # restored content = the latest CONTENT version, not the tombstone
    assert vis[("r1", "a.py")]["content"] == "alpha v2"
    # delete again -> hidden again
    state = ev.apply_events(
        state, _events_df(spark, [(4, 40, "DELETE", "r1", "a.py", None, None, None)])
    )
    assert ("r1", "a.py") not in {
        (r["repo"], r["path"]) for r in ev.visible_docs(state).collect()
    }


def test_group_event_expansion(spark, state0):
    """E5: NEW_ALL_VERSIONS fans out to one NEW_VERSION child per existing
    version; child ids deterministic; non-group events pass through."""
    state = ev.apply_events(
        state0,
        _events_df(
            spark,
            [(1, 10, "NEW_VERSION", "r1", "a.py", "c1", "python", "alpha v2")],
        ),
    )
    batch = _events_df(
        spark,
        [
            (9, 50, "NEW_ALL_VERSIONS", "r1", "a.py", None, None, None),
            (10, 50, "NEW_VERSION", "r2", "x.go", "c9", "go", "zeta v2"),
        ],
    )
    expanded = ev.expand_group_events(batch, state)
    rows = expanded.orderBy("event_id").collect()
    # 2 children (two versions of r1/a.py) + 1 passthrough
    kinds = [(r["op"], r["repo"], r["path"]) for r in rows]
    assert kinds.count(("NEW_VERSION", "r1", "a.py")) == 2
    assert ("NEW_VERSION", "r2", "x.go") in kinds
    assert len(rows) == 3
    child_ids = sorted(r["event_id"] for r in rows if r["path"] == "a.py")
    assert child_ids == [9 * 4096 + 1, 9 * 4096 + 2]
    contents = {r["content"] for r in rows if r["path"] == "a.py"}
    assert contents == {"alpha beta", "alpha v2"}
    # expansion replay is idempotent through the normal event_id dedup
    s1 = ev.apply_events(state, expanded)
    s2 = ev.apply_events(s1, ev.expand_group_events(batch, state))
    assert s1.count() == s2.count()


def test_structured_streaming_path(spark, state0, tmp_path):
    events_dir = str(tmp_path / "events_in")
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(events_dir)
    _events_df(spark, EVENTS[:3]).coalesce(1).write.mode("append").parquet(events_dir)

    q = ev.run_stream(spark, events_dir, state_path, ckpt, initial=state0)
    q.awaitTermination(60)

    # second batch arrives: restart the availableNow stream (micro-batch tick)
    _events_df(spark, EVENTS[3:]).coalesce(1).write.mode("append").parquet(events_dir)
    q2 = ev.run_stream(spark, events_dir, state_path, ckpt)
    q2.awaitTermination(60)

    vis = {
        (r["repo"], r["path"]): r
        for r in ev.visible_docs(spark.read.parquet(state_path)).collect()
    }
    assert vis[("r1", "a.py")]["content"] == "alpha beta v3"
    assert ("r1", "b.py") not in vis
    assert vis[("r2", "y.go")]["content"] == "epsilon zeta"


def test_windowed_stream_matches_batch(spark, tmp_path):
    """E7 windowed aggregation: the streaming path (watermark, append
    mode) must emit exactly the batch answer for every FINALIZED window,
    and drop later-than-watermark stragglers."""
    import datetime as dt

    schema = "event_id bigint, ts timestamp, event_type string"
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(6):
        for k, typ in enumerate(["a", "b"]):
            for i in range(hour + 1 + k):
                eid += 1
                rows.append((eid, base + dt.timedelta(hours=hour, minutes=i), typ))
    events = spark.createDataFrame(rows, schema)

    events_dir = str(tmp_path / "ev_in")
    out_path = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    events.coalesce(1).write.mode("append").parquet(events_dir)

    q = ev.run_windowed_stream(
        spark, events_dir, out_path, ckpt, schema,
        window="1 hour", watermark="2 hours",
    )
    q.awaitTermination(120)

    got = {
        (r["ws"], r["event_type"]): r["cnt"]
        for r in spark.read.parquet(out_path).collect()
    }
    batch = {
        (r["ws"], r["event_type"]): r["cnt"]
        for r in ev.windowed_type_counts(events).collect()
    }
    # append mode emits only windows closed by the watermark
    # (max ts = 05:06 -> watermark 03:06 -> hours 0,1,2 finalized)
    assert len(got) > 0
    cutoff = max(ts for _, ts, _ in rows) - dt.timedelta(hours=2)
    expected_closed = {k: v for k, v in batch.items() if k[0] + dt.timedelta(hours=1) <= cutoff}
    assert got == expected_closed

    # a second micro-batch with a straggler BEHIND the watermark: dropped
    late = spark.createDataFrame(
        [(9999, base + dt.timedelta(minutes=30), "a")], schema
    )
    late.coalesce(1).write.mode("append").parquet(events_dir)
    q2 = ev.run_windowed_stream(
        spark, events_dir, out_path, ckpt, schema,
        window="1 hour", watermark="2 hours",
    )
    q2.awaitTermination(120)
    got2 = {
        (r["ws"], r["event_type"]): r["cnt"]
        for r in spark.read.parquet(out_path).collect()
    }
    assert got2 == expected_closed  # straggler did not resurrect hour 0

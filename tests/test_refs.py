"""T5 guid transform + J5 ref resolution (KeywordParser.java:254-300:
guid transform, lookup.resolveRefs recursion, GUIDNotFoundException)."""

from pyspark.sql import functions as F

from kbasesearchengine_spark.functions.transforms import Rule, apply_rules
from kbasesearchengine_spark.operators.refs import ref_closure, validate_refs


def test_guid_transform_rule(spark):
    df = spark.createDataFrame(
        [("1/2/3",), (None,), ("9/9/1",)], "ref string"
    )
    out = apply_rules(
        df, [Rule(name="g", path="ref", transform="guid:WS")]
    ).collect()
    assert [r["g"] for r in out] == ["WS:1/2/3", None, "WS:9/9/1"]
    # default storage code
    out2 = apply_rules(
        df.limit(1), [Rule(name="g", path="ref", transform="guid")]
    ).collect()
    assert out2[0]["g"] == "WS:1/2/3"


def test_validate_refs_found_and_dangling(spark):
    refs = spark.createDataFrame(
        [(1, "WS:1/1/1"), (2, "WS:9/9/9"), (3, "WS:2/2/2")],
        "src bigint, ref string",
    )
    docs = spark.createDataFrame(
        [("WS:1/1/1",), ("WS:2/2/2",), ("WS:3/3/3",)], "guid string"
    )
    out = {r["src"]: r["found"] for r in validate_refs(refs, docs).collect()}
    assert out == {1: True, 2: False, 3: True}


def test_ref_closure_min_hop_and_cycles(spark):
    # 0->1->2->3->0 cycle plus 1->4, 5 isolated
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4)], "src bigint, dst bigint"
    )
    roots = spark.createDataFrame([(0,)], "id bigint")
    got = {
        r["id"]: r["hop"]
        for r in ref_closure(edges, roots, max_hops=10).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 4: 2, 3: 3}


def test_ref_closure_hop_bound(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src bigint, dst bigint"
    )
    roots = spark.createDataFrame([(0,)], "id bigint")
    got = ref_closure(edges, roots, max_hops=3).collect()
    assert {r["id"] for r in got} == {0, 1, 2, 3}
    assert max(r["hop"] for r in got) == 3


def test_ref_closure_multi_root_dedup(spark):
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 3)], "src bigint, dst bigint"
    )
    roots = spark.createDataFrame([(0,), (1,)], "id bigint")
    rows = ref_closure(edges, roots, max_hops=5).collect()
    ids = [r["id"] for r in rows]
    assert sorted(ids) == [0, 1, 2, 3]  # 2 reached once, min hop kept
    got = {r["id"]: r["hop"] for r in rows}
    assert got[2] == 1 and got[3] == 2

"""Extraction-rule system (T1-T9, G2): plan-level tests, fast."""

import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.functions.transforms import (
    Rule,
    RuleCycleError,
    apply_rules,
    indexed_columns,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "7", '{"a": {"b": 5}, "tags": ["x","y"]}',
             [["p", "10", "+", "4"]], [["u", "v"], ["w"]]),
            (2, None, '{"a": {}, "tags": []}',
             [["q", "10", "-", "4"]], [[]]),
        ],
        "id bigint, raw string, js string, locs array<array<string>>, "
        "nested array<array<string>>",
    )


def test_casts_and_default(spark, df):
    rules = [
        Rule("as_int", path="raw", transform="integer", default=0),
        Rule("as_str", path="id", transform="string"),
    ]
    rows = {r["id"]: r for r in apply_rules(df, rules).collect()}
    assert rows[1]["as_int"] == 7 and rows[2]["as_int"] == 0  # T2 + T7
    assert rows[1]["as_str"] == "1"  # T1


def test_json_path_and_size(spark, df):
    rules = [
        Rule("ab", path="$.a.b", transform="integer"),
        Rule("flat", path="nested", transform="values"),
    ]
    rows = {r["id"]: r for r in apply_rules(df, rules, json_col="js").collect()}
    assert rows[1]["ab"] == 5 and rows[2]["ab"] is None
    assert rows[1]["flat"] == ["u", "v", "w"]  # T3


def test_location_strand_arithmetic(spark, df):
    loc = F.element_at(F.col("locs"), 1)
    d2 = df.withColumn("loc", loc)
    rules = [
        Rule(f"loc_{p}", path="loc", transform=f"location.{p}")
        for p in ("contig_id", "start", "stop", "length", "strand")
    ]
    rows = {r["id"]: r for r in apply_rules(d2, rules).collect()}
    # '+' strand: start=10 len=4 -> [10, 13] (KeywordParser.java:344-359)
    assert (rows[1]["loc_start"], rows[1]["loc_stop"]) == (10, 13)
    # '-' strand: start=10 len=4 -> [7, 10]
    assert (rows[2]["loc_start"], rows[2]["loc_stop"]) == (7, 10)
    assert rows[1]["loc_contig_id"] == "p" and rows[1]["loc_length"] == 4


def test_derived_key_dag_order(spark, df):
    rules = [
        Rule("b", source_key="a", transform="integer"),  # declared first
        Rule("a", path="raw", transform="string"),
        Rule("c", source_key="b", transform="string"),
    ]
    rows = {r["id"]: r for r in apply_rules(df, rules).collect()}
    assert rows[1]["c"] == "7"


def test_derived_key_cycle_detected(df):
    rules = [
        Rule("x", source_key="y"),
        Rule("y", source_key="x"),
    ]
    with pytest.raises(RuleCycleError, match="cycle"):
        apply_rules(df, rules)


def test_not_indexed_exclusion():
    rules = [
        Rule("a", path="p"),
        Rule("b", path="p", not_indexed=True),
    ]
    assert indexed_columns(rules) == ["a"]


def test_lookup_transform_broadcast_enrichment(spark):
    """T6 lookup.<target-key> (KeywordParser.java:309-324): a rule whose
    transform is a cross-document lookup compiles to a broadcast left
    join against the registered dimension; missing targets honor the
    optional default (T7)."""
    from pyspark.sql import functions as F

    from kbasesearchengine_spark.functions.transforms import Rule, apply_rules

    facts = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz")], "id int, ref string"
    )
    dim = spark.createDataFrame(
        [("a", "alpha", 10), ("b", "beta", 20)], "k string, name string, w int"
    )
    out = apply_rules(
        facts,
        [
            Rule("ref_name", path="ref", transform="lookup:dim.name",
                 default="unknown"),
            Rule("ref_w", path="ref", transform="lookup.dim.w"),
            # T8: a derived rule can consume a looked-up key
            Rule("w2", source_key="ref_w", expr="ref_w * 2",
                 transform="integer"),
        ],
        lookups={"dim": (dim, "k")},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["ref_name"] == "alpha" and rows[1]["w2"] == 20
    assert rows[2]["ref_name"] == "beta" and rows[2]["w2"] == 40
    assert rows[3]["ref_name"] == "unknown" and rows[3]["ref_w"] is None
    # the join must be broadcast (J6): no shuffle of the fact side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # unregistered dimension fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not registered"):
        apply_rules(
            facts, [Rule("x", path="ref", transform="lookup:nope.col")]
        )


def test_lookup_transform_from_yaml_spec(spark):
    """A YAML spec can express cross-document enrichment (the reference's
    lookup transform in ObjectTypeParsingRules)."""
    from kbasesearchengine_spark.functions.transforms import apply_rules
    from kbasesearchengine_spark.functions.typespec import parse_spec

    spec = parse_spec(
        """
global-object-type: Fact
storage-type: TEST
storage-object-type: Test.Fact
versions:
  - indexing-rules:
      - key-name: ref_name
        path: ref
        transform: lookup.dim.name
      - key-name: body
        path: body
        full-text: true
"""
    )
    rules = spec.rules()
    assert rules[0].transform == "lookup.dim.name"
    facts = spark.createDataFrame(
        [(1, "a", "hello world")], "id int, ref string, body string"
    )
    dim = spark.createDataFrame([("a", "alpha")], "k string, name string")
    out = apply_rules(facts, rules, lookups={"dim": (dim, "k")})
    assert out.collect()[0]["ref_name"] == "alpha"

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

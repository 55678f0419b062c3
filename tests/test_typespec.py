"""Versioned YAML type-spec system (S7) — the analog of the reference's
ObjectTypeParsingRulesFileParser + TypeMapping tests (testTypeVersions,
ElasticIndexingStorageTest.java:961-1014): version coexistence, routing,
default-version fallback, T8 expression keys, T9 exclusion."""

import os

import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.functions.transforms import apply_rules
from kbasesearchengine_spark.functions.typespec import (
    TypeSpecError,
    parse_spec,
    parse_spec_file,
    parse_type_mapping,
    resolve_rules,
)

TWO_VERSIONS = """
global-object-type: TwoVers
storage-type: WS
storage-object-type: TwoVersions.Type
versions:
    -
        indexing-rules:
            -
                path: whee
                keyword-type: string
    -
        indexing-rules:
            -
                path: whee
                keyword-type: string
            -
                path: whoo
                keyword-type: string
"""

MAPPING = """
storage-type: WS
types:
    TwoVersions.Type:
        versions:
            1:
                -
                    type: TwoVers
                    version: 1
            2:
                -
                    type: TwoVers
                    version: 2
"""

EVENTS_SPEC = os.path.join(
    os.path.dirname(__file__), "..", "kbasesearchengine_spark", "specs",
    "events.yaml",
)


def test_two_versions_parse():
    spec = parse_spec(TWO_VERSIONS)
    assert spec.name == "TwoVers"
    assert spec.latest_version == 2
    assert [r.name for r in spec.rules(1)] == ["whee"]
    assert [r.name for r in spec.rules(2)] == ["whee", "whoo"]
    # default (None) = latest — the reference's no-mapping fallback
    assert [r.name for r in spec.rules()] == ["whee", "whoo"]
    with pytest.raises(TypeSpecError):
        spec.rules(3)


def test_key_name_defaults_to_first_path_section():
    spec = parse_spec(
        """
global-object-type: T
storage-type: WS
storage-object-type: X.Y
versions:
    -
        indexing-rules:
            -
                path: features/{size}
                keyword-type: integer
            -
                path: taxonomy
                full-text: true
"""
    )
    r_size, r_ft = spec.rules(1)
    assert r_size.name == "features" and r_size.transform == "size"
    assert r_ft.name == "taxonomy" and r_ft.full_text


def test_type_mapping_routes_versions():
    specs = {"TwoVers": parse_spec(TWO_VERSIONS)}
    mapping = parse_type_mapping(MAPPING)
    assert mapping.route("TwoVersions.Type", 1) == [("TwoVers", 1)]
    assert mapping.route("TwoVersions.Type", 2) == [("TwoVers", 2)]

    out1 = resolve_rules(specs, mapping, "TwoVersions.Type", 1)
    assert out1 == [("TwoVers", 1, specs["TwoVers"].rules(1))]
    out2 = resolve_rules(specs, mapping, "TwoVersions.Type", 2)
    assert out2[0][1] == 2 and len(out2[0][2]) == 2
    # unmapped storage version -> no mapping rows -> latest-version fallback
    out9 = resolve_rules(specs, mapping, "TwoVersions.Type", 9)
    assert out9[0][1] == 2


def test_version_coexistence_extraction(spark):
    """Two spec versions applied to the same objects produce their own
    document shapes (the testTypeVersions analog)."""
    spec = parse_spec(TWO_VERSIONS)
    df = spark.createDataFrame(
        [("a", "b")], "whee string, whoo string"
    )
    v1 = apply_rules(df.select("whee", "whoo"), spec.rules(1))
    v2 = apply_rules(df.select("whee", "whoo"), spec.rules(2))
    assert set(r.name for r in spec.rules(1)) <= set(v1.columns)
    assert "whoo" in v2.columns
    assert v2.select("whee", "whoo").first() == ("a", "b")


def test_events_spec_full_pipeline(spark):
    spec = parse_spec_file(EVENTS_SPEC)
    assert spec.latest_version == 2
    assert "raw_k" not in spec.indexed_keys()  # T9
    assert "raw_k" in [r.name for r in spec.rules()]  # stored
    df = spark.createDataFrame(
        [(1, "A", '{"k": 3}'), (2, "B", "{}")],
        "event_id bigint, event_type string, props string",
    )
    out = apply_rules(df, spec.rules()).orderBy("event_id").collect()
    assert out[0]["k_val"] == 3 and out[0]["derived"] == 6  # T8 expr
    assert out[0]["with_default"] == 7 and out[1]["with_default"] == 7  # T7
    assert out[1]["k_val"] is None and out[1]["derived"] is None
    # v1 extracts fewer keys from the SAME rows
    v1_cols = {r.name for r in spec.rules(1)}
    assert v1_cols == {"etype", "k_val"}


def test_spec_errors():
    with pytest.raises(TypeSpecError):
        parse_spec("global-object-type: X\nstorage-type: WS\n")  # missing fields
    with pytest.raises(TypeSpecError):
        parse_spec(
            "global-object-type: X\nstorage-type: WS\n"
            "storage-object-type: A.B\nversions: []\n"
        )
    with pytest.raises(TypeSpecError):
        parse_spec(
            """
global-object-type: X
storage-type: WS
storage-object-type: A.B
versions:
    -
        indexing-rules:
            -
                path: p
                keyword-type: nosuchtype
"""
        )


def test_build_from_spec_t9_and_field_indexes(spark, tmp_path):
    """Spec-driven build: primary + field postings from the spec's
    full-text keys; a not-indexed full-text key is stored on docs but
    gets NO postings anywhere (T9)."""
    from kbasesearchengine_spark.operators.indexer import build_from_spec
    from kbasesearchengine_spark.operators.topk import InvertedIndex, topk

    spec = parse_spec(
        """
global-object-type: CodeDoc
storage-type: TEST
storage-object-type: Code.File
versions:
    -
        indexing-rules:
            -
                path: body
                full-text: true
                key-name: content
            -
                path: fname
                full-text: true
                key-name: name
            -
                path: secret
                full-text: true
                key-name: secret
                not-indexed: true
            -
                path: lang
                keyword-type: keyword
"""
    )
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "main.py", "hunter2", "py"),
            (2, "alpha delta", "util.py", "hunter3", "py"),
            (3, "omega beta", "main.go", "hunter4", "go"),
        ],
        "oid bigint, body string, fname string, secret string, lang string",
    )
    idx_dir = str(tmp_path / "specidx")
    stats = build_from_spec(
        spark, idx_dir, df, spec, key_cols=["oid"], num_segments=2
    )
    assert stats["indexed_fields"] == ["content", "name"]
    assert stats["stored_only"] == ["secret"]

    index = InvertedIndex(spark, idx_dir)
    # primary full-text over `content`
    got = topk(index, "alpha", 10, "and", hydrate=False).collect()
    assert len(got) == 2
    # field-scoped over `name` with its own stats
    fidx = index.field_index("name")
    got_f = [r["doc_id"] for r in topk(fidx, "main", 10, "and", hydrate=False).collect()]
    assert len(got_f) == 2
    # T9: secret stored on docs, but indexed NOWHERE
    assert "secret" in index.docs.columns
    from kbasesearchengine_spark.functions.hashing import term_hash

    assert (
        index.terms.where(F.col("term_hash") == term_hash("hunter2")).count()
        == 0
    )
    assert not os.path.isdir(os.path.join(idx_dir, "fields", "secret"))
    # keyword rule stored too
    assert "lang" in index.docs.columns


def test_version_physical_coexistence(spark, tmp_path):
    """testTypeVersions analog (ElasticIndexingStorageTest.java:961-1014):
    two spec versions materialize as two PHYSICAL indexes under v<N>/,
    incompatible keys coexist in the union view (null-filled), and each
    version's index answers full-text queries with its own stats."""
    import os

    from kbasesearchengine_spark.functions.typespec import parse_spec_file
    from kbasesearchengine_spark.operators.indexer import (
        build_versioned_from_spec,
        union_version_docs,
    )
    from kbasesearchengine_spark.operators.topk import InvertedIndex, topk

    spec = parse_spec_file(
        os.path.join(
            os.path.dirname(__file__), "..", "kbasesearchengine_spark",
            "specs", "events_versioned.yaml",
        )
    )
    rows = [
        (i, "t%d" % (i % 3), '{"k": %d}' % (i * 10)) for i in range(20)
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, event_type string, props string"
    )
    base = str(tmp_path / "verspec")
    stats = build_versioned_from_spec(
        spark, base, ev, spec, key_cols=["event_id"],
        version_router=(F.col("event_id") % 2 + 1).cast("int"),
        num_segments=1,
    )
    assert sorted(stats) == [1, 2]
    assert os.path.exists(os.path.join(base, "v1", "stats.json"))
    assert os.path.exists(os.path.join(base, "v2", "stats.json"))

    u = union_version_docs(spark, base)
    assert "with_default" in u.columns and "k_doubled" in u.columns
    v1 = u.where(F.col("spec_version") == 1)
    v2 = u.where(F.col("spec_version") == 2)
    assert v1.count() == 10 and v2.count() == 10
    # incompatible keys: null-filled for v1, populated for v2
    assert v1.where(F.col("with_default").isNotNull()).count() == 0
    assert v2.where(F.col("with_default") == 7).count() == 10
    assert v2.where(F.col("k_doubled") == F.col("k_val") * 2).count() == 10

    # each physical index independently queryable with its own stats
    i1 = InvertedIndex(spark, os.path.join(base, "v1"))
    assert i1.stats["n_docs"] == 10
    assert topk(i1, "k", 5, "and", hydrate=False).count() == 5


def test_sub_object_child_index(spark, tmp_path):
    """sub-object-path in a spec builds a PHYSICAL `*_sub` child index
    (GenomeFeature.yaml analog; `_sub` naming ElasticIndexingStorage.
    java:297-302): child docs searchable through their OWN postings and
    BM25 stats; the default path never sees them (`-*_sub` exclusion)."""
    from pyspark.sql import functions as F

    from kbasesearchengine_spark.operators.indexer import build_from_spec
    from kbasesearchengine_spark.operators.topk import InvertedIndex, topk
    from kbasesearchengine_spark.plans.search import (
        MatchFilter,
        Pagination,
        search_objects,
    )

    spec = parse_spec(
        """
global-object-type: Doc
storage-type: TEST
storage-object-type: Test.Doc
sub-object-path: toks
sub-object-type: token
versions:
  - indexing-rules:
      - key-name: body
        path: body
        full-text: true
"""
    )
    assert spec.sub_object_path == "toks" and spec.sub_object_type == "token"
    objects = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta"), (3, "epsilon")],
        "gid bigint, body string",
    ).withColumn(
        "toks", F.expr("regexp_extract_all(lower(body), '[a-z0-9_]+', 0)")
    )
    idx_dir = str(tmp_path / "subidx")
    stats = build_from_spec(
        spark, idx_dir, objects, spec, key_cols=["gid"], num_segments=2
    )
    assert stats["sub_index"]["n_children"] == 6
    assert stats["sub_index"]["sub_object_type"] == "token"

    index = InvertedIndex(spark, idx_dir)
    assert index.has_sub_index()
    # default path: PARENT docs only (2 parents contain 'beta')
    parents = topk(index, "beta", k=None, mode="and", hydrate=False)
    assert parents.count() == 2
    assert "sub_id" not in index.docs.columns

    # child search: 2 child docs ARE 'beta', each with composite GUID and
    # child-scoped BM25 (dl=1 for every child here; relevance sort
    # requested — the default non-relevance page is intersection-only
    # and carries no score)
    from kbasesearchengine_spark.plans.search import SortingRule

    hits = search_objects(
        index, MatchFilter(full_text="beta"), include_subobjects=True,
        sorting=[SortingRule("relevance")],
        pagination=Pagination(0, 100),
    ).collect()
    assert {r["sub_id"] for r in hits} == {"1:1", "2:0"}
    n, df = 6, 2
    import math

    expected = round(math.log(1 + (n - df + 0.5) / (df + 0.5)) / 2.2, 9)
    for r in hits:
        assert round(r["score"], 9) == expected

    # J3: dedicated parent-GUID -> child doc-id lookup over the `*_sub`
    # index (lookupParentDocIds, ElasticIndexingStorage.java:432-460)
    from kbasesearchengine_spark.plans.search import lookup_parent_doc_ids

    got = lookup_parent_doc_ids(index, ["1", "3"]).collect()
    by_parent = {}
    for r in got:
        by_parent.setdefault(r["parent_key"], set()).add(r["sub_id"])
    assert by_parent == {
        "1": {"1:0", "1:1", "1:2"},
        "3": {"3:0"},
    }
    # child doc_ids are the SUB index's ids (usable with its get_objects)
    sub_ids = {r["doc_id"] for r in got}
    assert len(sub_ids) == 4

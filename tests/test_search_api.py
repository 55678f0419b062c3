"""search_objects/search_types/get_objects facade semantics
(reference: SearchMethods.java:242-308, queryHits defaults)."""

import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.corpus import generate_corpus
from kbasesearchengine_spark.operators.indexer import IndexBuilder
from kbasesearchengine_spark.operators.topk import InvertedIndex
from kbasesearchengine_spark.plans.search import (
    MatchFilter,
    Pagination,
    PostProcessing,
    SortingRule,
    get_objects,
    search_objects,
    search_types,
)


@pytest.fixture(scope="module")
def index(spark, shared_index_dir):
    return InvertedIndex(spark, shared_index_dir)


def test_default_sort_is_not_relevance(index):
    """No sort given => deterministic id order, not score (O2 analog:
    ElasticIndexingStorage.java:1498-1501)."""
    res = search_objects(index, MatchFilter(full_text="license")).collect()
    ids = [r["doc_id"] for r in res]
    assert ids == sorted(ids)
    assert len(res) == 50  # default page size (1495-1497)


def test_relevance_sort_and_pagination(index):
    p1 = search_objects(
        index,
        MatchFilter(full_text="license import"),
        sorting=[SortingRule("relevance")],
        pagination=Pagination(0, 5),
    ).collect()
    p2 = search_objects(
        index,
        MatchFilter(full_text="license import"),
        sorting=[SortingRule("relevance")],
        pagination=Pagination(5, 5),
    ).collect()
    s1 = [r["score"] for r in p1]
    s2 = [r["score"] for r in p2]
    assert s1 == sorted(s1, reverse=True)
    assert len(set(r["doc_id"] for r in p1) & set(r["doc_id"] for r in p2)) == 0
    assert min(s1) >= max(s2)


def test_filters_compose_and(index):
    mf = MatchFilter(
        full_text="license",
        term_in={"lang": ["python", "go"]},
        ranges={"dl": (100, 800)},
    )
    res = search_objects(index, mf, pagination=Pagination(0, 100)).collect()
    assert res
    for r in res:
        assert r["lang"] in ("python", "go")
        assert 100 <= r["dl"] <= 800


def test_conflicting_range_returns_zero(index):
    """Conflicting ranges intersect to empty (testLookupInKey analog,
    ElasticIndexingStorageTest.java:1469-1475)."""
    mf = MatchFilter(full_text="license", ranges={"dl": (500, 100)})
    assert search_objects(index, mf).count() == 0


def test_ids_only_projection(index):
    res = search_objects(
        index, MatchFilter(full_text="license"),
        post=PostProcessing(ids_only=True),
    )
    assert res.columns == ["doc_id"]


def test_highlight(index):
    res = search_objects(
        index,
        MatchFilter(full_text="rfah"),
        sorting=[SortingRule("relevance")],
        pagination=Pagination(0, 5),
        post=PostProcessing(highlight=True),
    ).collect()
    assert res
    assert all("<em>rfah</em>" in r["highlight"] for r in res)


def test_highlight_token_boundary(spark, tmp_path):
    """ES highlights ANALYZED-TOKEN matches, not raw substrings
    (ElasticIndexingStorageTest.java:1488-1535): querying `dup` must wrap
    the standalone token but NOT the `dup` inside `dedup`; a capitalized
    occurrence still highlights (case-insensitive analyzer)."""
    corpus = spark.createDataFrame(
        [(0, "dedup dup Dup xdup dup_x"), (1, "no match here")],
        "doc_id bigint, content string",
    )
    d = str(tmp_path / "hl_idx")
    IndexBuilder(spark, d, num_segments=1, segments_per_commit=1).build(
        corpus, key_cols=["doc_id"], doc_id_col="doc_id"
    )
    res = search_objects(
        InvertedIndex(spark, d),
        MatchFilter(full_text="dup"),
        post=PostProcessing(highlight=True),
    ).collect()
    assert len(res) == 1
    assert res[0]["highlight"] == "dedup <em>dup</em> <em>Dup</em> xdup dup_x"


def test_search_types_counts(index):
    res = {r["type"]: r["count"] for r in
           search_types(index, MatchFilter(full_text="license")).collect()}
    # compare against direct computation
    docs = index.docs
    from kbasesearchengine_spark.operators.topk import topk

    matched = topk(index, "license", k=None, hydrate=False).select("doc_id")
    exp = {
        r["lang"]: r["cnt"]
        for r in docs.join(matched, "doc_id", "left_semi")
        .groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert res == exp


def test_get_objects(index):
    res = get_objects(index, [1, 5, 9]).collect()
    assert sorted(r["doc_id"] for r in res) == [1, 5, 9]


def test_empty_query_match_all(index):
    """No filters at all => match_all (P6)."""
    n = search_objects(index, MatchFilter(), pagination=Pagination(0, 1000)).count()
    assert n == 800


def test_bool_should_composition(index):
    """P7 should: OR of AND-clauses, composed with the other filters in
    filter context."""
    mf = MatchFilter(should=[{"lang": "python"}, {"lang": "go"}])
    res = search_objects(index, mf, pagination=Pagination(0, 1000)).collect()
    langs = {r["lang"] for r in res}
    assert langs <= {"python", "go"} and len(langs) == 2
    # clause-internal AND: python AND repo of first doc
    one = res[0]
    mf2 = MatchFilter(should=[{"lang": one["lang"], "repo": one["repo"]}])
    res2 = search_objects(index, mf2, pagination=Pagination(0, 1000)).collect()
    assert res2 and all(
        r["lang"] == one["lang"] and r["repo"] == one["repo"] for r in res2
    )
    # should composes with must_not by AND
    mf3 = MatchFilter(
        should=[{"lang": "python"}, {"lang": "go"}],
        term_not_in={"lang": ["go"]},
    )
    res3 = search_objects(index, mf3, pagination=Pagination(0, 1000)).collect()
    assert {r["lang"] for r in res3} == {"python"}


def test_access_filter_blocks(spark, tmp_path):
    """A1/A2/A4/A5: public block, group block, admin bypass, empty-access
    short-circuit — over flags written by the mutation operators."""
    from kbasesearchengine_spark.operators.mutate import (
        publish_objects,
        set_access_group,
    )
    from kbasesearchengine_spark.plans.search import AccessFilter

    idx_dir = str(tmp_path / "aclidx")
    corpus = generate_corpus(spark, 200, parallelism=4)
    IndexBuilder(spark, idx_dir, num_segments=4, segments_per_commit=4).build(
        corpus, key_cols=["repo", "path", "commit"]
    )
    publish_objects(spark, idx_dir, F.col("lang") == "python")
    set_access_group(spark, idx_dir, F.col("lang") == "go", group=7)
    idx = InvertedIndex(spark, idx_dir)
    n_py = idx.docs.where(F.col("lang") == "python").count()
    n_go = idx.docs.where(F.col("lang") == "go").count()

    # A1 public block
    res = search_objects(idx, MatchFilter(), pagination=Pagination(0, 1000),
                         access=AccessFilter(with_public=True))
    assert res.count() == n_py
    # A2 group block (ORs with public)
    res = search_objects(idx, MatchFilter(), pagination=Pagination(0, 1000),
                         access=AccessFilter(user_groups=[7], with_public=True))
    assert res.count() == n_py + n_go
    # A4 admin: unconstrained
    res = search_objects(idx, MatchFilter(), pagination=Pagination(0, 1000),
                         access=AccessFilter(admin=True))
    assert res.count() == 200
    # A5 empty access: zero rows, no index touch
    res = search_objects(idx, MatchFilter(), access=AccessFilter())
    assert res.count() == 0
    assert search_types(idx, MatchFilter(), access=AccessFilter()).count() == 0


def test_skip_keys_and_data(index):
    """PostProcessing skip family (KBaseSearchEngine.spec:133-154;
    SearchMethods.java:179-194): skip_keys drops extracted keyword
    columns but keeps identity/system columns; skip_data drops the
    payload; select_keys whitelists."""
    mf = MatchFilter(full_text="license")
    full = search_objects(index, mf)
    assert "lang" in full.columns and "content" in full.columns

    nk = search_objects(index, mf, post=PostProcessing(skip_keys=True))
    assert "lang" not in nk.columns
    assert "doc_id" in nk.columns and "content" in nk.columns
    assert nk.count() == full.count()

    nd = search_objects(index, mf, post=PostProcessing(skip_data=True))
    assert "content" not in nd.columns and "lang" in nd.columns

    only = search_objects(
        index, mf,
        post=PostProcessing(select_keys=["lang"], skip_data=True),
    )
    assert "lang" in only.columns
    assert "repo" not in only.columns and "content" not in only.columns

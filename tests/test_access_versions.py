"""Version-conditioned access grants: lastin[]/groups[]/extpub[]
(ElasticIndexingStorage.java:666-763 UPDATE_ACC_GRP_VERS_TEMPLATE;
semantics pinned by ElasticIndexingStorageTest.java testSharing:726-773
— this module ports that test's scenario 1:1)."""

import pytest
from pyspark.sql import functions as F

from kbasesearchengine_spark.operators.indexer import IndexBuilder
from kbasesearchengine_spark.operators.mutate import (
    promote_last_version,
    publish_externally,
    share_object_version,
    unshare_object_version,
)
from kbasesearchengine_spark.operators.topk import InvertedIndex
from kbasesearchengine_spark.plans.search import (
    AccessFilter,
    MatchFilter,
    Pagination,
    search_objects,
)

HOME = 10


@pytest.fixture(scope="module")
def vidx(spark, tmp_path_factory):
    """One object (obj 1) with versions 1..3 — prop values 123/124/125
    become searchable tokens v123/v124/v125 — plus a second object
    (obj 2) to prove predicates stay object-scoped. Home-group
    maintenance mirrors indexing: groups=[HOME] on every version,
    lastin=[HOME] moved to each new last version as it lands."""
    idx_dir = str(tmp_path_factory.mktemp("veridx"))
    rows = [
        (1, 1, "v123 alpha"), (1, 2, "v124 alpha"), (1, 3, "v125 alpha"),
        (2, 1, "w200 beta"), (2, 2, "w201 beta"),
    ]
    corpus = spark.createDataFrame(
        rows, "obj_id int, version int, text string"
    )
    IndexBuilder(spark, idx_dir, num_segments=2, segments_per_commit=2).build(
        corpus, key_cols=["obj_id", "version"], text_col="text"
    )
    from kbasesearchengine_spark.operators.mutate import update_docs_fields

    # index-time access docs: groups=[HOME] everywhere (loadObject writes
    # groups=accessGroupIds on every version's access doc)
    update_docs_fields(
        spark, idx_dir, F.lit(True),
        {"access_groups": F.array(F.lit(HOME)),
         "access_lastin": F.expr("CAST(array() AS array<int>)"),
         "extpub": F.expr("CAST(array() AS array<int>)")},
    )
    # versions landing one after another move the home lastin pointer
    for v in (1, 2, 3):
        promote_last_version(
            spark, idx_dir, F.col("obj_id") == 1, v, home_group=HOME
        )
    for v in (1, 2):
        promote_last_version(
            spark, idx_dir, F.col("obj_id") == 2, v, home_group=HOME
        )
    return spark, idx_dir


def _ids(spark, idx_dir, token, groups, all_history=False, public=False):
    index = InvertedIndex(spark, idx_dir)
    out = search_objects(
        index,
        MatchFilter(full_text=token),
        access=AccessFilter(
            user_groups=groups, with_all_history=all_history,
            with_public=public,
        ),
        pagination=Pagination(0, 100),
    )
    return sorted(r["doc_id"] for r in out.select("doc_id").collect())


def _doc(spark, idx_dir, obj, ver):
    index = InvertedIndex(spark, idx_dir)
    return [
        r["doc_id"]
        for r in index.docs.where(
            (F.col("obj_id") == obj) & (F.col("version") == ver)
        ).select("doc_id").collect()
    ][0]


def test_home_group_sees_only_last_version(vidx):
    spark, idx = vidx
    # testSharing: af10 finds prop2=125 (v3) but NOT 123 (v1)
    assert _ids(spark, idx, "v125", [HOME]) == [_doc(spark, idx, 1, 3)]
    assert _ids(spark, idx, "v123", [HOME]) == []
    assert _ids(spark, idx, "v124", [HOME]) == []


def test_all_history_sees_every_version(vidx):
    spark, idx = vidx
    # testIdsWithHistory analog: withAllHistory(true) sees all 3 versions
    for tok, ver in (("v123", 1), ("v124", 2), ("v125", 3)):
        assert _ids(spark, idx, tok, [HOME], all_history=True) == [
            _doc(spark, idx, 1, ver)
        ]


def test_share_is_version_pinned_and_reshare_moves_pointer(
    vidx, tmp_path
):
    spark, idx = vidx
    obj1 = F.col("obj_id") == 1
    # shareObjects(id1@v1, 11): group 11 sees v1 only (NOT the last!)
    share_object_version(spark, idx, obj1, version=1, group=11)
    assert _ids(spark, idx, "v123", [11]) == [_doc(spark, idx, 1, 1)]
    assert _ids(spark, idx, "v124", [11]) == []
    assert _ids(spark, idx, "v125", [11]) == []
    # shareObjects(id2@v2, 11): the pointer MOVES — v1 disappears for 11
    share_object_version(spark, idx, obj1, version=2, group=11)
    assert _ids(spark, idx, "v123", [11]) == []
    assert _ids(spark, idx, "v124", [11]) == [_doc(spark, idx, 1, 2)]
    # groups[] accumulated both shares: all_history sees v1 AND v2
    assert _ids(spark, idx, "v123", [11], all_history=True) == [
        _doc(spark, idx, 1, 1)
    ]
    assert _ids(spark, idx, "v124", [11], all_history=True) == [
        _doc(spark, idx, 1, 2)
    ]
    # unshare removes the pointer AND (external group) the groups grant
    # on the pointed version; v1's groups entry survives (the reference
    # script never touches other versions' groups on unshare)
    unshare_object_version(spark, idx, obj1, group=11, home_group=HOME)
    assert _ids(spark, idx, "v124", [11]) == []
    assert _ids(spark, idx, "v124", [11], all_history=True) == []
    assert _ids(spark, idx, "v123", [11], all_history=True) == [
        _doc(spark, idx, 1, 1)
    ]
    # other object untouched throughout
    assert _ids(spark, idx, "w201", [HOME]) == [_doc(spark, idx, 2, 2)]


def test_new_version_moves_home_pointer_not_external(spark, tmp_path):
    """The VERDICT-r4 scenario: group 7 is shared the CURRENT last
    version; a new version lands (promote_last_version with the home
    group only); group 7 keeps seeing the version it was shared — and
    the home group's visibility moves to the new last (testSharing's
    af11-still-sees-v1 behavior)."""
    idx_dir = str(tmp_path / "vidx2")
    corpus = spark.createDataFrame(
        [(1, 1, "p100 x"), (1, 2, "p101 x")],
        "obj_id int, version int, text string",
    )
    IndexBuilder(spark, idx_dir, num_segments=1, segments_per_commit=1).build(
        corpus, key_cols=["obj_id", "version"], text_col="text"
    )
    from kbasesearchengine_spark.operators.mutate import update_docs_fields

    update_docs_fields(
        spark, idx_dir, F.lit(True),
        {"access_groups": F.array(F.lit(HOME)),
         "access_lastin": F.when(F.col("version") == 1,
                                 F.array(F.lit(HOME)))
         .otherwise(F.expr("CAST(array() AS array<int>)"))},
    )
    obj1 = F.col("obj_id") == 1
    share_object_version(spark, idx_dir, obj1, version=1, group=7)
    assert _ids(spark, idx_dir, "p100", [7]) != []
    # v2 lands: home pointer moves, group 7 stays pinned at v1
    promote_last_version(spark, idx_dir, obj1, 2, home_group=HOME)
    assert _ids(spark, idx_dir, "p100", [7]) != []   # still pinned
    assert _ids(spark, idx_dir, "p101", [7]) == []   # not auto-granted
    assert _ids(spark, idx_dir, "p100", [HOME]) == []  # home moved on
    assert _ids(spark, idx_dir, "p101", [HOME]) != []


def test_extpub_exists_clause_under_with_public(vidx):
    spark, idx = vidx
    # publishObjectsExternally marks v3 of obj 1; a public-only caller
    # (no groups) sees exactly that version through the exists clause
    publish_externally(
        spark, idx, F.col("obj_id") == 1, version=3, group=12
    )
    assert _ids(spark, idx, "v125", [], public=True) == [
        _doc(spark, idx, 1, 3)
    ]
    assert _ids(spark, idx, "v124", [], public=True) == []
    # unshare of the external-publication group clears extpub too
    unshare_object_version(
        spark, idx, F.col("obj_id") == 1, group=12, home_group=HOME
    )
    assert _ids(spark, idx, "v125", [], public=True) == []


def test_public_pseudo_group_lastin_visible_under_with_public(spark, tmp_path):
    """ADVICE r5 (medium): promote_last_version(public=True) writes the
    PUBLIC pseudo-group (-1) into lastin[] — the reference's
    createAccessMustBlock adds PUBLIC_ACCESS_GROUP to the group ids
    matched against lastin (groups under withAllHistory), so a
    with_public caller must see the promoted last version (and, with
    all-history, every -1-granted version)."""
    idx_dir = str(tmp_path / "vidx3")
    corpus = spark.createDataFrame(
        [(1, 1, "q300 x"), (1, 2, "q301 x")],
        "obj_id int, version int, text string",
    )
    IndexBuilder(spark, idx_dir, num_segments=1, segments_per_commit=1).build(
        corpus, key_cols=["obj_id", "version"], text_col="text"
    )
    from kbasesearchengine_spark.operators.mutate import update_docs_fields

    update_docs_fields(
        spark, idx_dir, F.lit(True),
        {"access_groups": F.array(F.lit(HOME)),
         "access_lastin": F.expr("CAST(array() AS array<int>)"),
         "extpub": F.expr("CAST(array() AS array<int>)")},
    )
    obj1 = F.col("obj_id") == 1
    promote_last_version(spark, idx_dir, obj1, 1, home_group=HOME,
                         public=True)
    # v1 publicly visible through the -1 lastin grant
    assert _ids(spark, idx_dir, "q300", [], public=True) != []
    # new version lands: the public pointer moves with the home pointer
    promote_last_version(spark, idx_dir, obj1, 2, home_group=HOME,
                         public=True)
    assert _ids(spark, idx_dir, "q300", [], public=True) == []
    assert _ids(spark, idx_dir, "q301", [], public=True) != []
    # with_all_history: groups[] accumulated the -1 grant on both versions
    assert len(_ids(spark, idx_dir, "x", [], public=True,
                    all_history=True)) == 2
    # a caller with neither groups nor public sees nothing (A5)
    assert _ids(spark, idx_dir, "q301", []) == []

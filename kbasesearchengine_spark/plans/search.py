"""search_objects / search_types / get_objects facade.

Mirrors the reference's API semantics (KBaseSearchEngine.spec:167-174 and
main/SearchMethods.java:242-308) re-shaped for the code corpus:

  MatchFilter   full_text_in_all (P4), lookup_in_keys term/terms/range
                (P1-P3), exclude (must_not, P11)
  AccessFilter  collapses to plain metadata predicates for the code corpus
                (SURVEY §2.3) — non-scoring filter context
  SortingRule   multi-key sort, asc default (O1; SortingRule.java:15-63)
  Pagination    start/count, defaults 0/50 (O3; ElasticIndexingStorage.
                java:1495-1497)
  PostProcessing ids_only / include content / highlight (T13; _source
                pruning P10)

Defaults pinned by the reference: no sort given => timestamp-analog
ascending (doc_id asc here — NOT relevance; ElasticIndexingStorage.
java:1498-1501); relevance order only when requested via
SortingRule(key='relevance').
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.topk import InvertedIndex, topk


@dataclass
class MatchFilter:
    full_text: str | None = None
    full_text_mode: str = "and"  # reference uses operator:"and"
    # P5 field-scoped match: score against one indexed field's own
    # postings/stats (the reference's oname-vs-_all distinction,
    # ElasticIndexingStorage.java:1381-1383); None = the _all analog
    field: str | None = None
    term_eq: dict[str, object] = dc_field(default_factory=dict)  # P1
    term_in: dict[str, list] = dc_field(default_factory=dict)  # P2
    term_not_in: dict[str, list] = dc_field(default_factory=dict)  # P11
    ranges: dict[str, tuple] = dc_field(default_factory=dict)  # P3 (lo, hi), either None
    # P7 bool.should: a list of clauses OR'd together, each clause an AND
    # of {column: value} terms (ElasticIndexingStorage.java:1304-1326 —
    # should inside the bool composition); combined with the other
    # filters by AND, matching ES filter-context semantics
    should: list = dc_field(default_factory=list)


@dataclass
class AccessFilter:
    """A1-A5 access blocks collapsed to metadata predicates (SURVEY §2.3;
    flags written by operators/mutate.py share/publish mutations):

      admin          -> no access constraint at all (A4,
                        ElasticIndexingStorage.java:1423-1440)
      with_public    -> is_public=true qualifies (A1)
      user_groups    -> doc shared into ANY of the caller's groups
                        qualifies (A2/A3). The reference stores per-doc
                        group ARRAYS (lastin[]/groups[],
                        ElasticIndexingStorage.java:666-763) so one doc
                        can be shared into several groups — matched here
                        with arrays_overlap on `access_groups`
                        (array<int>); the legacy single-int
                        `access_group` column is honored too.
      no groups + no public + not admin -> ZERO hits without touching the
                        index (A5 short-circuit, :1506-1511)

    with_all_history: version-conditioned visibility on a VERSIONED index
    (one whose docs carry the `access_lastin` array written by
    operators/mutate.share_object_version). The reference keeps TWO grant
    arrays per version (ElasticIndexingStorage.java:1442-1484
    createAccessMustBlock — `groups` when withAllHistory else `lastin`):
    `lastin` is the version-pinned share pointer (at most one version per
    (object, group); re-share moves it; new-version indexing moves the
    home/public pointers), `groups` accumulates every version ever
    shared. Default = lastin (you see the version that was shared to
    you); with_all_history = groups (every version ever shared). The
    `extpub` exists-clause is ORed in under with_public (:1461-1476).
    On a non-versioned index (no access_lastin column) both modes
    collapse to the single access_groups array — unchanged behavior.
    """
    user_groups: list = dc_field(default_factory=list)
    with_public: bool = False
    admin: bool = False
    with_all_history: bool = False

    def is_empty(self) -> bool:
        """A5: nothing could possibly match — skip the query entirely."""
        return not (self.admin or self.user_groups or self.with_public)

    def predicate(self, columns: list | None = None) -> Column | None:
        """columns: the docs table's columns — selects which access
        metadata exists (version-pinned arrays vs plain array vs legacy
        scalar grants). None = assume the legacy scalar layout
        (back-compat)."""
        if self.admin:
            return None  # unconstrained
        preds = []
        have_cols = set(columns) if columns is not None else None
        if self.with_public:
            if have_cols is None or "is_public" in have_cols:
                preds.append(F.col("is_public") == True)  # noqa: E712
            if have_cols is not None and "extpub" in have_cols:
                # external-publication exists clause (:1461-1476)
                preds.append(
                    F.coalesce(F.size("extpub") > 0, F.lit(False))
                )
            if have_cols is not None and "access_lastin" in have_cols:
                # the PUBLIC pseudo-group (-1): the reference's
                # createAccessMustBlock adds PUBLIC_ACCESS_GROUP to the
                # group ids matched against lastin[] (groups[] under
                # with_all_history) — promote_last_version(public=True)
                # and share_object_version(..., -1) write these grants
                # (ADVICE r5: previously no read path honored them)
                from ..operators.mutate import PUBLIC_ACCESS_GROUP

                prop = (
                    "access_groups" if self.with_all_history
                    else "access_lastin"
                )
                preds.append(
                    F.coalesce(
                        F.array_contains(
                            F.col(prop), F.lit(PUBLIC_ACCESS_GROUP)
                        ),
                        F.lit(False),
                    )
                )
        if self.user_groups:
            groups = [int(g) for g in self.user_groups]
            have = have_cols if have_cols is not None else {"access_group"}
            if "access_lastin" in have:
                # versioned index: lastin (default) vs groups (history)
                prop = (
                    "access_groups" if self.with_all_history
                    else "access_lastin"
                )
                garr = F.array(*[F.lit(g) for g in groups])
                preds.append(
                    F.coalesce(
                        F.arrays_overlap(F.col(prop), garr), F.lit(False)
                    )
                )
            elif "access_groups" in have:
                garr = F.array(*[F.lit(g) for g in groups])
                overlap = F.arrays_overlap(F.col("access_groups"), garr)
                if "access_group" in have:
                    # ROW-LEVEL precedence: the array is authoritative
                    # wherever it exists — share/unshare edit only the
                    # array, so OR-ing the legacy scalar in would let a
                    # grant revoked via unshare_group resurface through a
                    # stale set_access_group value. Rows the array APIs
                    # never touched (null array) fall back to the legacy
                    # scalar grant (mutate._groups_col migrates the
                    # scalar into the array on first share/unshare).
                    preds.append(
                        F.when(F.col("access_groups").isNotNull(), overlap)
                        .otherwise(F.col("access_group").isin(groups))
                    )
                else:
                    # null array (never shared) must read as no-overlap
                    preds.append(F.coalesce(overlap, F.lit(False)))
            elif "access_group" in have:
                preds.append(F.col("access_group").isin(groups))
        if not preds:
            return F.lit(False)  # A5: provably empty
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out


@dataclass
class SortingRule:
    key: str  # column name or 'relevance'
    ascending: bool = True  # asc default (SortingRule.java:21)


@dataclass
class Pagination:
    start: int = 0
    count: int = 50


# columns every page keeps regardless of key skipping: identity + system
# invariants (the reference's ObjectData guid/timestamp analog)
_SYSTEM_COLS = ("doc_id", "score", "highlight", "sha256", "segment")
_DATA_COLS = ("text", "content")


@dataclass
class PostProcessing:
    """P10/T13 + the spec's skip family (KBaseSearchEngine.spec:133-154
    PostProcessing.{ids_only,skip_info,skip_keys,skip_data};
    SearchMethods.java:179-194 applies them per hit):

      ids_only      -> doc_id column only (P10 _source:[guid])
      skip_keys     -> drop the extracted per-type keyword columns, keep
                       identity/system columns (+ content unless skipped)
      skip_data     -> drop the raw document payload (text/content) —
                       same effect as include_content=False
      select_keys   -> keep ONLY these keyword columns (spec's
                       object_props whitelist; applied after skip flags)
      highlight_fields -> per-FIELD highlight map (the reference returns
                       {field: [fragments]} with require_field_match
                       false — every requested field is scanned for the
                       query terms; ElasticIndexingStorage.java:
                       1096-1100, 1196-1217): each listed doc column f
                       gains a `highlight_<f>` column holding the
                       <em>-marked value when the field matches a query
                       token, NULL when it doesn't (the reference omits
                       non-matching fields from the map). None = the
                       legacy single-payload `highlight` column.
    """

    ids_only: bool = False
    include_content: bool = True
    highlight: bool = False
    skip_keys: bool = False
    skip_data: bool = False
    select_keys: list | None = None
    highlight_fields: list | None = None


def _predicate(mf: MatchFilter) -> Column | None:
    preds: list[Column] = []
    for k, v in mf.term_eq.items():
        preds.append(F.col(k) == F.lit(v))
    for k, vs in mf.term_in.items():
        preds.append(F.col(k).isin(vs))
    for k, vs in mf.term_not_in.items():
        preds.append(~F.col(k).isin(vs))
    for k, (lo, hi) in mf.ranges.items():
        if lo is not None and hi is not None:
            preds.append(F.col(k).between(lo, hi))  # ends inclusive (P3)
        elif lo is not None:
            preds.append(F.col(k) >= lo)
        elif hi is not None:
            preds.append(F.col(k) <= hi)
    if mf.should:
        clauses = []
        for clause in mf.should:
            cp = None
            for k, v in clause.items():
                if isinstance(v, tuple) and len(v) == 2:
                    lo, hi = v  # range clause (either end None)
                    if lo is not None and hi is not None:
                        term = F.col(k).between(lo, hi)
                    elif lo is not None:
                        term = F.col(k) >= lo
                    else:
                        term = F.col(k) <= hi
                elif isinstance(v, list):
                    term = F.col(k).isin(v)
                else:
                    term = F.col(k) == F.lit(v)
                cp = term if cp is None else (cp & term)
            if cp is not None:
                clauses.append(cp)
        if clauses:
            disj = clauses[0]
            for c in clauses[1:]:
                disj = disj | c
            preds.append(disj)
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _combined_predicate(
    index: InvertedIndex, match: MatchFilter, access: AccessFilter | None
) -> Column | None:
    pred = _predicate(match)
    if access is not None:
        ap = access.predicate(columns=index.docs.columns)
        if ap is not None:
            pred = ap if pred is None else (pred & ap)
    return pred


def match_frame(
    index: InvertedIndex,
    match: MatchFilter,
    access: AccessFilter | None = None,
    scores: bool = False,
    k: int | None = None,
) -> DataFrame:
    """The FULL filtered match frame (docs columns, + `score` when
    requested) with no ordering/pagination applied — the one computation
    behind pages, hits.total and type aggregations. The RPC layer
    persists this to produce a page and its total from a single pass
    (the reference gets both from one ES response,
    ElasticIndexingStorage.java:1557).

    scores=False skips ALL BM25 work (no idf math, tf/dl streams never
    decoded) — the reference's default page order is NOT relevance
    (:1498-1501), so the default path is intersection-only. k bounds the
    per-segment candidates (relevance paging only — k implies scores)."""
    if access is not None and access.is_empty():
        # A5 short-circuit: the empty shape without touching the index
        empty = index.docs.limit(0)
        return empty.withColumn("score", F.lit(0.0)) if scores else empty
    pred = _combined_predicate(index, match, access)
    if match.full_text:
        scoring = index.field_index(match.field) if match.field else index
        scored = topk(
            scoring,
            match.full_text,
            k=k if scores else None,
            mode=match.full_text_mode,
            doc_filter=pred,
            hydrate=False,
            scores=scores,
        )
        return index.docs.join(scored, "doc_id")
    docs = index.docs
    if pred is not None:
        docs = docs.where(pred)
    return docs.withColumn("score", F.lit(0.0)) if scores else docs


def _order_exprs(
    sorting: list[SortingRule] | None, relevance: bool
) -> list[Column]:
    if relevance:
        order = [F.desc("score"), F.asc("doc_id")]
        order += [
            (F.asc(s.key) if s.ascending else F.desc(s.key)) for s in sorting[1:]
        ]
    elif sorting:
        order = [(F.asc(s.key) if s.ascending else F.desc(s.key)) for s in sorting]
        order.append(F.asc("doc_id"))  # deterministic ties (O5)
    else:
        order = [F.asc("doc_id")]  # default: NOT relevance (O2 analog)
    return order


def search_objects(
    index: InvertedIndex,
    match: MatchFilter,
    sorting: list[SortingRule] | None = None,
    pagination: Pagination | None = None,
    post: PostProcessing | None = None,
    access: AccessFilter | None = None,
    include_subobjects: bool = False,
) -> DataFrame:
    """The main read path (SearchMethods.searchObjects → queryHits).

    include_subobjects: search the spec-built `*_sub` CHILD index (its
    own postings/stats/docs — hits are child documents keyed by sub_id)
    instead of the parent index. The default path never touches child
    postings — the reference's `-*_sub` index-pattern exclusion
    (ElasticIndexingStorage.java:62,1544-1546) is structural here.

    A `score` column appears ONLY under a relevance sort: the default
    order is doc_id (the reference's timestamp analog, :1498-1501), and
    a non-relevance full-text page is pure intersection — no BM25 math,
    no tf/dl decode (asserted in tests/test_plan_quality.py)."""
    if include_subobjects:
        index = index.sub_index()
    pagination = pagination or Pagination()
    post = post or PostProcessing()
    relevance = bool(sorting) and sorting[0].key == "relevance"
    frame = match_frame(
        index, match, access=access, scores=relevance,
        k=pagination.start + pagination.count if relevance else None,
    )
    page = (
        frame.orderBy(*_order_exprs(sorting, relevance))
        .offset(pagination.start)
        .limit(pagination.count)
    )
    return _apply_post(page, match, post)


def _apply_post(
    page: DataFrame, match: MatchFilter, post: PostProcessing
) -> DataFrame:
    """P10/T13 post-processing over an ordered page."""
    if post.ids_only:
        return page.select("doc_id")  # _source: [guid] analog (P10)
    if post.highlight and match.full_text:
        # ONE highlight semantics engine-wide (pinned by the driver oracle
        # and the reference's ES highlighter, which marks ANALYZED-TOKEN
        # matches, not raw substrings — `dup` must not light up inside
        # `dedup`; ElasticIndexingStorageTest.java:1488-1535): one
        # case-insensitive whole-token pass. \b is the [A-Za-z0-9_]
        # boundary in BOTH Java regex and DuckDB's RE2 — exactly the
        # analyzer's token alphabet — and a single alternation pass can't
        # re-match inside the <em> tags it inserts (a per-term chain
        # could, e.g. for the query term "em").
        from ..functions.tokenize import tokenize_py

        terms = sorted(set(tokenize_py(match.full_text)))
        if terms:  # a term-less pattern '\b()\b' would mark EVERY boundary
            payload = next(
                (c for c in ("text", "content", "sub_value")
                 if c in page.columns), None
            )
            if payload is None:
                # e.g. a store_text=False index — fail with the cause
                # instead of an unresolvable-column AnalysisException
                # deep inside plan analysis (ADVICE r4)
                raise ValueError(
                    "highlight requested but the index stores no text "
                    "payload column (looked for text/content/sub_value "
                    f"in {page.columns})"
                )
            hl = F.col(payload)
            pat = r"(?i)\b(" + "|".join(terms) + r")\b"
            page = page.withColumn(
                "highlight", F.regexp_replace(hl, pat, "<em>$1</em>")
            )
    if post.highlight_fields and match.full_text:
        # per-field highlight map (T13 extended): one alternation pass
        # per requested field; NULL where the field has no token match —
        # the RPC layer folds highlight_<f> columns into the reference's
        # {field: [fragments]} shape (require_field_match: false)
        from ..functions.tokenize import tokenize_py

        terms = sorted(set(tokenize_py(match.full_text)))
        if terms:
            pat = r"(?i)\b(" + "|".join(terms) + r")\b"
            for f_name in post.highlight_fields:
                if f_name not in page.columns:
                    raise ValueError(
                        f"highlight field {f_name!r} is not a column of "
                        f"this index ({page.columns})"
                    )
                src = F.col(f_name).cast("string")
                page = page.withColumn(
                    f"highlight_{f_name}",
                    F.when(
                        src.rlike(pat),
                        F.regexp_replace(src, pat, "<em>$1</em>"),
                    ),
                )
    if post.skip_keys or post.select_keys is not None:
        keep_keys = set(post.select_keys or ())
        drop = [
            c for c in page.columns
            if c not in _SYSTEM_COLS
            and c not in _DATA_COLS
            and c not in keep_keys
            and not c.startswith("highlight_")  # per-field fragments stay
        ]
        page = page.drop(*drop)
    if not post.include_content or post.skip_data:
        drop = [c for c in _DATA_COLS if c in page.columns]
        page = page.drop(*drop)
    return page


def count_objects(
    index: InvertedIndex,
    match: MatchFilter,
    access: AccessFilter | None = None,
) -> int:
    """hits.total (G3): the size of the FULL match set, independent of
    pagination — the reference returns it with every page
    (ElasticIndexingStorage.java:1557 total from ES hits.total). A pure
    count: scores=False, so no BM25 math or tf/dl decode anywhere."""
    if access is not None and access.is_empty():
        return 0
    return match_frame(index, match, access=access, scores=False).count()


def search_types(
    index: InvertedIndex,
    match: MatchFilter,
    type_col: str = "lang",
    access: AccessFilter | None = None,
) -> DataFrame:
    """Count matching docs per type, size 0 (G1) — intersection-only
    (scores=False: the aggregation never reads a score)."""
    return match_frame(
        index, match, access=access, scores=False
    ).groupBy(F.col(type_col).alias("type")).agg(
        F.count("*").alias("count")
    )


def get_objects(index: InvertedIndex, doc_ids: list[int]) -> DataFrame:
    """GUID-list lookup (J2)."""
    return index.docs.where(F.col("doc_id").isin([int(i) for i in doc_ids]))


# child-doc system columns — everything else on a sub index's docs table
# is a parent identity column (explode_subobjects carries them through)
_SUB_SYSTEM_COLS = {
    "sub_value", "sub_id", "is_sub", "dl", "doc_id", "sha256", "segment",
}


def lookup_parent_doc_ids(
    index: InvertedIndex, parent_keys: list[str]
) -> DataFrame:
    """J3: dedicated parent-GUID → child-document lookup over the
    physical `*_sub` index (the reference's lookupParentDocIds,
    ElasticIndexingStorage.java:432-460 — a terms filter on `pguid`
    returning the matching child ids). The parent key is the same
    '/'-joined composition explode_subobjects used to mint the child
    GUIDs (`<parent-key>:<ordinal>`), so callers pass the keys they
    indexed with. Returns (parent_key, sub_id, doc_id) — a pruned
    metadata scan, no postings touched."""
    sub = index.sub_index()
    parent_cols = [
        c for c in sub.docs.columns if c not in _SUB_SYSTEM_COLS
    ]
    if not parent_cols:
        raise ValueError("sub index carries no parent identity columns")
    parent_key = F.concat_ws("/", *[F.col(c) for c in parent_cols])
    return (
        sub.docs.withColumn("parent_key", parent_key)
        .where(F.col("parent_key").isin([str(k) for k in parent_keys]))
        .select("parent_key", "sub_id", "doc_id")
    )

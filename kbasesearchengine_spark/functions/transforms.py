"""Declarative extraction rules: the type-spec system re-expressed.

The reference drives indexing from versioned YAML specs of IndexingRules
(system/ObjectTypeParsingRulesFileParser.java:39-123; transform dispatch
parse/KeywordParser.java:215-329). Here a rule list compiles to a
withColumn chain — Catalyst expressions only, no UDFs:

  T1 string cast        KeywordParser.java:250-251
  T2 integer cast       KeywordParser.java:252-253
  T3 values flatten     KeywordParser.java:227-249
  T4 location destructure (contig/start/stop/length/strand arithmetic)
                        KeywordParser.java:331-371
  T6 lookup.<target-key> (cross-document enrichment through a reference
                        value) KeywordParser.java:309-324 — dispatched
                        from the rule system to a broadcast join (J6)
  T7 optional default   KeywordParser.java:181-187
  T8 derived keys (source-key DAG, cycle detection)
                        KeywordParser.java:83-166 (cycle error :140-143)
  T9 not-indexed        IndexingRules.java:77-82
  G2 {size} path element SubObjectExtractor.java:86-100

Rules reference source columns or JSON paths into a payload column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str                      # output column (the "key")
    path: str | None = None        # source column, "$.json.path" into
                                   # json_col, or "col/json/path" into col
    source_key: str | None = None  # T8: consume another rule's output
    transform: str = "string"      # string|integer|double|boolean|values|size|json_size|location.<part>
    default: object = None         # T7 optional-default-value
    not_indexed: bool = False      # T9: kept on docs, excluded from postings
    expr: str | None = None        # T8 derived computation: a Spark SQL
                                   # expression over prior rule outputs
                                   # (e.g. "k_val * 2"); evaluated before
                                   # the transform cast
    full_text: bool = False        # spec full-text flag: field gets its own
                                   # BM25 postings (P5) instead of keyword
                                   # semantics


class RuleCycleError(ValueError):
    pass


def _toposort(rules: list[Rule]) -> list[Rule]:
    """Derived-key evaluation order with cycle detection (T8; the
    reference uses a stack-based walk erroring on cycles)."""
    by_name = {r.name: r for r in rules}
    order: list[Rule] = []
    state: dict[str, int] = {}  # 0=unseen 1=in-progress 2=done

    def visit(r: Rule, chain: tuple[str, ...]) -> None:
        st = state.get(r.name, 0)
        if st == 2:
            return
        if st == 1:
            raise RuleCycleError(
                f"derived-key cycle: {' -> '.join(chain + (r.name,))}"
            )
        state[r.name] = 1
        if r.source_key is not None:
            dep = by_name.get(r.source_key)
            if dep is not None:
                visit(dep, chain + (r.name,))
        state[r.name] = 2
        order.append(r)

    for r in rules:
        visit(r, ())
    return order


def _source_expr(r: Rule, json_col: str | None) -> Column:
    if r.expr is not None:
        return F.expr(r.expr)
    if r.source_key is not None:
        return F.col(r.source_key)
    assert r.path is not None, f"rule {r.name}: needs path or source_key"
    if r.path.startswith("$.") or r.path.startswith("$["):
        assert json_col, f"rule {r.name}: JSON path needs json_col"
        return F.get_json_object(F.col(json_col), r.path)
    if "/" in r.path:
        # spec-style path (typespec): first segment is a column, the rest
        # digs into its JSON payload (reference path semantics,
        # ObjectTypeParsingRulesFileParser / ObjectJsonPath)
        seg0, *rest = r.path.split("/")
        return F.get_json_object(F.col(seg0), "$." + ".".join(rest))
    return F.col(r.path)


def _apply_transform(col: Column, r: Rule) -> Column:
    t = r.transform
    if t == "string":
        return col.cast("string")
    if t == "integer":
        return col.cast("bigint")
    if t == "double":
        return col.cast("double")
    if t == "boolean":
        return col.cast("boolean")
    if t == "values":  # flatten nested arrays / map values to scalars
        return F.flatten(col)
    if t == "size":  # G2 {size}: cardinality instead of contents
        return F.size(col).cast("bigint")
    if t == "json_size":  # G2 {size} over a JSON-path source (array length)
        return F.json_array_length(col).cast("bigint")
    if t == "guid" or t.startswith("guid:"):
        # T5 guid transform (KeywordParser.java:254-272): a reference
        # value ("1/2/3", an object ref) becomes a GUID string prefixed
        # with the target type's storage code ("WS:1/2/3"). Existence
        # validation / recursive resolution of the produced GUIDs is the
        # separate J5 operator (operators/refs.py — the lookup.resolveRefs
        # + GUIDNotFoundException analog), kept off the extraction path so
        # extraction stays a pure projection.
        code = t.split(":", 1)[1] if ":" in t else "WS"
        return F.when(
            col.isNotNull(),
            F.concat(F.lit(code + ":"), col.cast("string")),
        )
    if t.startswith("location."):
        # tuple [contig_id, start, strand, length]; strand-dependent
        # arithmetic per KeywordParser.java:344-359
        part = t.split(".", 1)[1]
        contig = F.element_at(col, 1)
        start = F.element_at(col, 2).cast("bigint")
        strand = F.element_at(col, 3).cast("string")
        length = F.element_at(col, 4).cast("bigint")
        fwd = strand == "+"
        if part == "contig_id":
            return contig.cast("string")
        if part == "start":
            return F.when(fwd, start).otherwise(start - length + 1)
        if part == "stop":
            return F.when(fwd, start + length - 1).otherwise(start)
        if part == "length":
            return length
        if part == "strand":
            return strand
        raise ValueError(f"unknown location part {part!r}")
    raise ValueError(f"unknown transform {t!r}")


def _parse_lookup(t: str) -> tuple[str, str] | None:
    """'lookup:<dim>.<col>' / 'lookup.<dim>.<col>' -> (dim, col)."""
    if t.startswith("lookup:"):
        body = t.split(":", 1)[1]
    elif t.startswith("lookup."):
        body = t.split(".", 1)[1]
    else:
        return None
    if "." not in body:
        raise ValueError(
            f"lookup transform needs <dimension>.<target-key>, got {t!r}"
        )
    dim, col = body.split(".", 1)
    return dim, col


def apply_rules(
    df: DataFrame,
    rules: list[Rule],
    json_col: str | None = None,
    lookups: dict | None = None,
) -> DataFrame:
    """Compile a rule list into a withColumn chain (topo order).

    lookups: {dim_name: (dim_df, key_col)} registry backing T6
    `lookup.<target-key>` rules (KeywordParser.java:309-324 — the
    reference resolves a reference-valued key against another indexed
    document and pulls one of ITS keys). Spark disposition: a broadcast
    left join per looked-up dimension (J6) — the dimension is the small
    side by construction (it is a keyed metadata table), so the fact
    scan never shuffles.
    """
    out = df
    lookups = lookups or {}
    for r in _toposort(rules):
        lk = _parse_lookup(r.transform)
        if lk is not None:
            dim_name, target_col = lk
            if dim_name not in lookups:
                raise ValueError(
                    f"rule {r.name}: lookup dimension {dim_name!r} not "
                    f"registered (have {sorted(lookups)})"
                )
            dim_df, dim_key = lookups[dim_name]
            tmp = f"__lk_{r.name}"
            side = dim_df.select(
                F.col(dim_key).alias(tmp), F.col(target_col).alias(r.name)
            )
            # the reference's lookup resolves to ONE document
            # (KeywordParser.java:309-324) — a duplicated dim key would
            # otherwise fan out fact rows and silently duplicate
            # documents in a spec-driven build (ADVICE r4). Deterministic
            # collapse: min target value per key (stable across runs,
            # unlike dropDuplicates' arbitrary pick).
            side = side.groupBy(tmp).agg(F.min(r.name).alias(r.name))
            out = out.join(
                F.broadcast(side), _source_expr(r, json_col) == F.col(tmp),
                "left",
            ).drop(tmp)
            if r.default is not None:
                out = out.withColumn(
                    r.name, F.coalesce(F.col(r.name), F.lit(r.default))
                )
            continue
        col = _apply_transform(_source_expr(r, json_col), r)
        if r.default is not None:
            col = F.coalesce(col, F.lit(r.default))
        out = out.withColumn(r.name, col)
    return out


def indexed_columns(rules: list[Rule]) -> list[str]:
    """Columns that participate in posting build (T9 exclusion)."""
    return [r.name for r in rules if not r.not_indexed]


def explode_subobjects(
    df: DataFrame,
    parent_id_cols: list[str],
    array_col: str,
    child_id: str = "sub_id",
    child_val: str = "sub_value",
) -> DataFrame:
    """Sub-object extraction (reference: parse/SubObjectExtractor.java +
    GUID composition KeywordParser.java:273-293): each element of a
    repeated inner field becomes its own child document, carrying the
    parent key plus a composite child id `<parent>:<type>/<ordinal>`.

    Spark-first: posexplode + concat_ws — a UDTF-shaped operator with no
    Python."""
    parent_key = F.concat_ws("/", *[F.col(c) for c in parent_id_cols])
    return df.select(
        *parent_id_cols,
        F.posexplode(F.col(array_col)).alias("_pos", child_val),
    ).select(
        *parent_id_cols,
        F.col(child_val),
        F.concat_ws(":", parent_key, F.col("_pos").cast("string")).alias(child_id),
        # U2: child documents carry the sub-index flag (the reference's
        # `*_sub` index-name convention, ElasticIndexingStorage.java:62);
        # the default search path excludes is_sub rows
        F.lit(True).alias("is_sub"),
    )

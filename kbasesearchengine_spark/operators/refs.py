"""J5: GUID reference resolution — validation joins + recursive closure.

Reference: guid-transformed keys are resolved and validated through
``lookup.resolveRefs(objectRefPath, unresolvedGUIDs)`` and
``getTypesForGuids`` (parse/KeywordParser.java:254-300), which walk
workspace reference paths recursively and throw ``GUIDNotFoundException``
for dangling refs. That interface hides a Mongo/workspace round trip per
object; here both halves are set-oriented Spark jobs:

  validate_refs  one broadcast-able join marking each extracted ref
                 found/dangling against the docs catalog (the
                 GUIDNotFoundException analog as data, not control flow)
  ref_closure    breadth-first transitive closure over a (src, dst) ref
                 edge table — hop-bounded, min-hop per node, ONE join per
                 hop (not per object)

100-TB notes: each BFS hop is a single equi-join on the edge key —
co-partition (bucket) the edge table by ``src`` so every hop reuses the
same partitioning without a fresh shuffle of the big side; the frontier
(small) broadcasts. ``localCheckpoint`` every few hops truncates the
growing lineage (a classic iterative-algorithm failure mode at scale).
The loop's driver-side part handles only counts, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_refs(
    refs: DataFrame,
    docs: DataFrame,
    ref_col: str = "ref",
    key_col: str = "guid",
) -> DataFrame:
    """Mark each ref row found/dangling against the catalog (the
    GUIDNotFoundException check, KeywordParser.java:294-300, as a left
    join). Keeps every input column, adds boolean ``found``."""
    targets = docs.select(F.col(key_col).alias("__target")).distinct()
    return (
        refs.join(
            targets, refs[ref_col] == targets["__target"], "left"
        )
        .withColumn("found", F.col("__target").isNotNull())
        .drop("__target")
    )


def ref_closure(
    edges: DataFrame,
    roots: DataFrame,
    max_hops: int = 10,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Min-hop transitive closure: every node reachable from ``roots``
    following ``edges``, with its minimum hop count (<= max_hops).

    The recursive half of lookup.resolveRefs — an object's refs pull in
    objects whose own refs pull in more (workspace ref paths). BFS with
    frontier/visited sets: per hop ONE join edge⋈frontier, an anti-join
    against visited (cycle-safe), and a distinct on the (small) frontier
    only. Terminates at fixpoint or max_hops.
    """
    from functools import reduce

    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    )
    # visited = the UNION of per-hop frontier frames, each persisted once.
    # Storage stays O(closure) (every node lives in exactly one frontier),
    # and — unlike the r5 shape, which persisted + fully counted a new
    # union frame every hop — each hop now runs ONE action (the emptiness
    # probe); the anti-join reads the cached pieces directly (guide §1.2:
    # half the per-hop driver round trips in an overhead-bound loop).
    base = (
        roots.select(F.col(id_col).alias(id_col))
        .distinct()
        .withColumn("hop", F.lit(0))
        .persist()
    )
    parts = [base]
    frontier = base.select(id_col)
    hop = 0
    while hop < max_hops:
        hop += 1
        visited_ids = reduce(
            DataFrame.union, [p.select(id_col) for p in parts]
        )
        # join strategy stays with Catalyst/AQE: a small frontier becomes
        # a broadcast join at runtime, a blown-up one falls back to a
        # shuffle join instead of OOMing the driver (forcing broadcast()
        # here would be wrong exactly when closures get big)
        nxt = (
            e.join(frontier.withColumnRenamed(id_col, "__src"), "__src")
            .select(F.col("__dst").alias(id_col))
            .distinct()
            .join(visited_ids, id_col, "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        if checkpoint_every and hop % checkpoint_every == 0:
            # truncate the join lineage so cache eviction at scale cannot
            # trigger a multi-hop recompute cascade
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
        if nxt.limit(1).count() == 0:
            break
        parts.append(nxt)
        frontier = nxt.select(id_col)
    return reduce(DataFrame.union, parts)

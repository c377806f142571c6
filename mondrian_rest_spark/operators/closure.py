"""Parent-child hierarchy support via transitive-closure tables.

Analog of the reference's employee/supervisor hierarchy
(foodmart.xml:529-547: `<ParentExpression>` + `<Closure>` over
employee_closure).  Mondrian expects a *precomputed* closure table;
here we can both consume one and build one distributedly.

Scale notes: closure construction is iterative self-join doubling
(log2(depth) joins, each a shuffle on the frontier's ancestor key) —
an org chart of depth 20 needs 5 iterations.  The subtree rollup is
then a single fact ⋈ closure join + groupBy(ancestor): each fact row
fans out to its ancestor count (bounded by hierarchy depth), which is
the same cost Mondrian's SQL pays.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def build_closure(edges: DataFrame, id_col: str, parent_col: str,
                  max_depth: int = 64,
                  known_depth: int | None = None) -> DataFrame:
    """(id, parent) self-reference -> closure (ancestor_id,
    descendant_id, depth), including self-rows at depth 0.

    Frontier-extension loop: each pass joins the current frontier with
    the direct edges, so pass k adds all depth-(k+1) pairs.  The
    frontier is persisted per pass (it is re-read by the join, the
    convergence check, and the union) and unpersisted as soon as the
    next frontier materializes — lineage stays one pass deep instead of
    compounding, which is what makes the loop viable on a cluster.

    ``known_depth`` (e.g. 2 for a region->nation->customer tree) skips
    the convergence ``isEmpty`` action entirely; otherwise the loop
    stops when a pass adds no new pairs (``max_depth`` is a runaway
    guard against cycles in dirty data).
    """
    self_rows = edges.select(
        F.col(id_col).alias("ancestor_id"),
        F.col(id_col).alias("descendant_id"),
        F.lit(0).alias("depth"))
    direct = (edges.filter(F.col(parent_col).isNotNull())
              .select(F.col(parent_col).alias("ancestor_id"),
                      F.col(id_col).alias("descendant_id"),
                      F.lit(1).alias("depth")))
    parts = [self_rows, direct]
    hops = direct
    depth = 1
    limit = known_depth if known_depth is not None else max_depth
    while depth < limit:
        # extend the frontier by joining it with the direct edges; a
        # node has one parent, so extension cannot create duplicate
        # (ancestor, descendant) pairs and no anti-join dedup is needed
        nxt = (hops.alias("h")
               .join(direct.alias("d"),
                     F.col("h.ancestor_id") == F.col("d.descendant_id"))
               .select(F.col("d.ancestor_id").alias("ancestor_id"),
                       F.col("h.descendant_id").alias("descendant_id"),
                       (F.col("h.depth") + 1).alias("depth")))
        if known_depth is None:
            # persist: the frontier feeds both the convergence check
            # and the final union — without it each isEmpty() replays
            # every prior pass and lineage compounds quadratically
            nxt = nxt.persist()
            if nxt.isEmpty():
                break
        parts.append(nxt)
        hops = nxt
        depth += 1
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def subtree_rollup(fact: DataFrame, closure: DataFrame, members: DataFrame,
                   fact_key: str, member_key: str, agg_exprs: list,
                   include_self: bool = True) -> DataFrame:
    """Aggregate a fact at every member *including its whole subtree*
    (the Mondrian parent-child semantics: a supervisor's cell contains
    their own facts plus all transitive reports').

    fact ⋈ closure(descendant) -> groupBy(ancestor) ⋈ members.
    """
    cl = closure if include_self else closure.filter(F.col("depth") > 0)
    joined = fact.join(cl, F.col(fact_key) == F.col("descendant_id"), "inner")
    agg = joined.groupBy(F.col("ancestor_id")).agg(*agg_exprs)
    return (agg.join(members,
                     agg["ancestor_id"] == members[member_key], "inner")
               .drop("ancestor_id"))

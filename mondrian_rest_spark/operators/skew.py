"""Skew-resilient aggregation and join: salting operators.

The reference never faces skew (Mondrian delegates to a single-node
database; reference: lib/mondrian_rest/api_helpers.rb:42-54 executes
one SQL statement).  At 100 TB a handful of hot keys — one mega-customer,
one default date — can pin an entire stage on one executor while 999
idle.  Two mitigations, in preference order:

1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
   on by default in build_session) — free, runtime, handles JOIN skew
   by splitting oversized partitions.  Use it first.
2. Explicit salting (this module) — for GROUP BY skew (which AQE's
   skew-join does not touch) and for joins where the skewed side is
   known ahead of time.  Costs one extra partial-aggregation pass /
   a small-side fan-out of factor `salt`.

Both salted operators are pure DataFrame compositions — Catalyst still
plans partial+final hash aggregation and whole-stage codegen around
them; no Python executes per row.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "__salt"


# phase-1 aggregate -> phase-2 combiner.  sum and count both re-combine
# by summing the partials; min/max by min/max.  Exact count-distinct is
# deliberately absent: the same value lands in several salt buckets, so
# partial distinct counts overcount on re-combine (SURVEY §7.5 #3) —
# distinct counts must aggregate from base facts un-salted (or use
# approx_count_distinct directly, whose HLL sketches Spark merges
# internally without this helper).
SALTABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, tuple[str, Column | str]],
               salt: int = 16) -> DataFrame:
    """Two-phase groupBy for skewed grouping keys.

    Phase 1 groups by (keys + random salt in [0, salt)), spreading a
    hot key over `salt` reducers; phase 2 re-aggregates the `salt`
    partial rows per key.

    `aggs` maps output column name -> (fn, column) with fn one of
    SALTABLE ("sum" | "count" | "min" | "max").  The function is named
    explicitly rather than sniffed from a Column because only these
    four re-combine losslessly — see SALTABLE.
    """
    phase1_cols, phase2_cols = [], []
    for name, (fn, col) in aggs.items():
        if fn not in SALTABLE:
            raise ValueError(
                f"aggregate {fn!r} is not salting-re-aggregable; "
                f"use one of {sorted(SALTABLE)}")
        p1, p2 = SALTABLE[fn]
        phase1_cols.append(p1(col).alias(name))
        phase2_cols.append(p2(F.col(name)).alias(name))

    salted = df.withColumn(SALT_COL, (F.rand(seed=42) * salt).cast("int"))
    return (salted.groupBy(*keys, SALT_COL).agg(*phase1_cols)
                  .groupBy(*keys).agg(*phase2_cols))


def salted_join(skewed: DataFrame, small: DataFrame,
                skewed_key: str, small_key: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where `skewed` has hot keys and `small` is modest
    (dim-sized or a filtered bridge) but too big / too dynamic to
    broadcast outright.

    The skewed side gets a random salt in [0, salt); the small side is
    exploded `salt`-fold so every (key, salt) combination exists.  The
    join key becomes (key, salt), splitting each hot key's rows across
    `salt` tasks.  Row-multiplication is on the SMALL side only —
    `salt × |small|` rows, the knob to keep bounded.
    """
    lhs = skewed.withColumn(SALT_COL, (F.rand(seed=42) * salt).cast("int"))
    rhs = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    cond = (lhs[skewed_key] == rhs[small_key]) & \
           (lhs[SALT_COL] == rhs[SALT_COL])
    return lhs.join(rhs, cond, how).drop(lhs[SALT_COL]).drop(rhs[SALT_COL])

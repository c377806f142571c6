"""Aggregate-table routing: the Spark analog of Mondrian AggName
(reference foodmart.xml:128-160 — pre-aggregated rollup tables with
column mappings, routed to when a query's grain is covered).

Engine-level (pure Python) routing per SURVEY §4: no Catalyst rule
needed.  A rollup is a materialized (cached or parquet-written)
aggregate at a declared grain; a query routes to it when

  1. its group-by keys ⊆ the rollup grain,
  2. every requested measure is re-aggregable from the rollup
     (sum-of-sums, sum-of-counts, min-of-mins, max-of-maxs —
     NEVER distinct-count, which is non-additive: SURVEY §7.5.3),
  3. its cuts only reference levels present in the grain.

At 100 TB this is the difference between scanning the fact and
scanning a table 4-6 orders of magnitude smaller; rollups would be
written as partitioned/bucketed parquet (`persist_path`), refreshed by
an incremental job.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog, Cube, Measure
from ..parser import parse_cut, parse_drilldown
from ..planner import _resolve_cut, _resolve_drill, _split_measures, aggregate
from ..query import QueryModel

_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


@dataclass
class Rollup:
    name: str
    grain: tuple[str, ...]            # drilldown specs, e.g. ("Customer.Nation", "Time.Year")
    frame: DataFrame = None
    key_cols: list[str] = field(default_factory=list)
    measures: list[Measure] = field(default_factory=list)
    rows: int = 0                     # materialized cardinality (cost key)
    persist_path: str | None = None
    partition_col: str | None = None  # grain alias the layout partitions on


class RollupManager:
    """Materializes rollups for a cube and transparently routes
    queries to the smallest covering rollup, falling back to the base
    fact otherwise."""

    def __init__(self, spark: SparkSession, sf_dir: str, cat: Catalog,
                 cube_name: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cat = cat
        self.cube: Cube = cat.cube(cube_name)
        self.rollups: list[Rollup] = []

    def register(self, name: str, grain: tuple[str, ...],
                 persist_path: str | None = None,
                 partition_col: str | None = None) -> Rollup:
        """Materialize a rollup at the given grain holding every
        re-aggregable measure of the cube (AggName's measure column
        mappings, foodmart.xml:142-159).

        ``partition_col`` (requires ``persist_path``) lays the rollup
        out partitioned by that grain alias — typically the time key —
        which is what makes :meth:`append` an O(affected-partitions)
        dynamic overwrite instead of a rebuild."""
        measures = [m for m in self.cube.measures if m.agg in _REAGG]
        qm = QueryModel(cube=self.cube.name,
                        measures=[m.name for m in measures],
                        drilldown=list(grain), nonempty=True)
        frame = aggregate(self.spark, self.sf_dir, self.cat, qm)
        key_cols = [c for c in frame.columns
                    if c not in {m.alias for m in measures}]
        if partition_col and not persist_path:
            raise ValueError("partition_col requires persist_path")
        if partition_col and partition_col not in key_cols:
            raise ValueError(
                f"partition_col {partition_col!r} is not a grain key "
                f"(have {key_cols})")
        if persist_path:
            w = frame.write.mode("overwrite")
            if partition_col:
                w = w.partitionBy(partition_col)
            w.parquet(persist_path)
            frame = self.spark.read.parquet(persist_path)
        else:
            frame = frame.persist()
        # row count doubles as the materialization action (the persist
        # fills here) and the routing cost key — Mondrian AggName picks
        # the smallest covering aggregate the same way
        r = Rollup(name, grain, frame, key_cols, measures,
                   rows=frame.count(), persist_path=persist_path,
                   partition_col=partition_col)
        self.rollups.append(r)
        return r

    # -- incremental maintenance ------------------------------------------

    def append(self, new_facts: DataFrame) -> dict[str, int]:
        """Fold a batch of APPENDED fact rows into every registered
        rollup without rescanning the base fact (VERDICT r5 item 8:
        an appended fact partition must not silently stale rollups).

        Because every rollup measure is re-aggregable by construction
        (sum/count/min/max are all append-monotone — _REAGG), the delta
        is just the batch aggregated at the rollup's grain (one pass
        over the batch, dims joined as usual), merged by re-combining
        with the existing rollup rows.  Partitioned layouts overwrite
        ONLY the partitions the batch touches (dynamic partition
        overwrite via a staging pin — never a full rebuild, and never a
        read-and-overwrite of the same files in one job); cached
        rollups re-persist the merged frame.  At 100 TB: the cost is
        O(batch + affected rollup partitions), independent of base
        fact size.  Returns {rollup name: delta row count}.
        """
        out: dict[str, int] = {}
        for r in self.rollups:
            qm = QueryModel(cube=self.cube.name,
                            measures=[m.name for m in r.measures],
                            drilldown=list(r.grain), nonempty=True)
            delta = aggregate(self.spark, self.sf_dir, self.cat, qm,
                              fact_df=new_facts)
            if r.persist_path and r.partition_col:
                vals = [row[0] for row in
                        delta.select(r.partition_col).distinct().collect()]
                old_slice = r.frame.filter(F.col(r.partition_col).isin(vals))
                merged = self._recombine(
                    r, old_slice.unionByName(delta.select(*old_slice.columns)))
                # stage + re-read: Spark refuses (rightly) to overwrite
                # a path while reading it; the staging write also pins
                # the merged slice so the dynamic overwrite below can't
                # re-evaluate against half-replaced files
                staging = r.persist_path.rstrip("/") + "__staging"
                merged.write.mode("overwrite").parquet(staging)
                (self.spark.read.parquet(staging).write
                     .mode("overwrite")
                     .option("partitionOverwriteMode", "dynamic")
                     .partitionBy(r.partition_col)
                     .parquet(r.persist_path))
                r.frame = self.spark.read.parquet(r.persist_path)
            elif r.persist_path:
                merged = self._recombine(
                    r, r.frame.unionByName(delta.select(*r.frame.columns)))
                staging = r.persist_path.rstrip("/") + "__staging"
                merged.write.mode("overwrite").parquet(staging)
                (self.spark.read.parquet(staging).write
                     .mode("overwrite").parquet(r.persist_path))
                r.frame = self.spark.read.parquet(r.persist_path)
            else:
                old = r.frame
                merged = self._recombine(
                    r, old.unionByName(delta.select(*old.columns))).persist()
                merged.count()
                old.unpersist()
                r.frame = merged
            out[r.name] = delta.count()
            r.rows = r.frame.count()
        return out

    def _recombine(self, r: Rollup, df: DataFrame) -> DataFrame:
        """Re-aggregate partial rollup rows (old ∪ delta) at the
        rollup's own grain: sum-of-sums / sum-of-counts / min-of-mins /
        max-of-maxs, decimals kept order-independent."""
        aggs = []
        for m in r.measures:
            col = _REAGG[m.agg](F.col(m.alias))
            if m.agg == "sum" and m.result_cast:
                col = (F.sum(F.col(m.alias).cast("decimal(25,6)"))
                       .cast(m.result_cast))
            aggs.append(col.alias(m.alias))
        return df.groupBy(*r.key_cols).agg(*aggs)

    # -- routing ----------------------------------------------------------

    def route(self, qm: QueryModel) -> tuple[DataFrame, str]:
        """Return (result, source) where source is the rollup name used
        or 'base'."""
        chosen = self._choose(qm)
        if chosen is None:
            return aggregate(self.spark, self.sf_dir, self.cat, qm), "base"
        return self._reaggregate(chosen, qm), chosen.name

    def _choose(self, qm: QueryModel) -> Rollup | None:
        if qm.parents or qm.properties or qm.caption or not qm.nonempty:
            return None
        # axis idioms resolved inside _aggregate_cube add drills/cuts
        # the grain check below cannot see; query-scoped WITH forms
        # rewrite the cube — all route to base
        if (qm.children_of or qm.parent_of or qm.lastperiods
                or qm.member_lags or qm.with_members or qm.with_sets):
            return None
        base_measures, calcs, _ = _split_measures(self.cube, list(qm.measures))
        if calcs or any(m.agg not in _REAGG for m in base_measures):
            return None  # distinct-count / avg / calc members -> base facts
        try:
            need = set()
            for d in qm.drilldown:
                rd = _resolve_drill(self.cube, parse_drilldown(d), False)
                for lv in rd.group_levels:
                    for _, a in lv.out_cols():
                        need.add(a)
            for c in qm.cut:
                rc = _resolve_cut(self.cube, parse_cut(c))
                if rc.cut.kind == "named_set":
                    return None
                need.add(rc.level.key_alias)
        except Exception:
            return None
        # among all covering rollups, route to the SMALLEST one (fewest
        # materialized rows): at 100 TB the delta between a per-day and
        # a per-year rollup is orders of magnitude of scan
        covering = [r for r in self.rollups if need <= set(r.key_cols)]
        if not covering:
            return None
        return min(covering, key=lambda r: (r.rows, len(r.key_cols)))

    def _reaggregate(self, r: Rollup, qm: QueryModel) -> DataFrame:
        base_measures, _, aliases = _split_measures(self.cube, list(qm.measures))
        df = r.frame
        for c in qm.cut:
            rc = _resolve_cut(self.cube, parse_cut(c))
            from ..planner import _cut_predicate
            df = df.filter(_cut_predicate(rc))
        group_cols = []
        for d in qm.drilldown:
            rd = _resolve_drill(self.cube, parse_drilldown(d), False)
            for lv in rd.group_levels:
                for _, a in lv.out_cols():
                    group_cols.append(a)
        aggs = []
        for m in base_measures:
            col = _REAGG[m.agg](F.col(m.alias))
            if m.agg == "sum" and m.result_cast:
                # re-sum through decimal to stay order-independent
                col = F.sum(F.col(m.alias).cast("decimal(25,6)")).cast(m.result_cast)
            aggs.append(col.alias(m.alias))
        out = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
        return out.select(*group_cols, *aliases)

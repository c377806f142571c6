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
                 persist_path: str | None = None) -> Rollup:
        """Materialize a rollup at the given grain holding every
        re-aggregable measure of the cube (AggName's measure column
        mappings, foodmart.xml:142-159)."""
        measures = [m for m in self.cube.measures if m.agg in _REAGG]
        qm = QueryModel(cube=self.cube.name,
                        measures=[m.name for m in measures],
                        drilldown=list(grain), nonempty=True)
        frame = aggregate(self.spark, self.sf_dir, self.cat, qm)
        if persist_path:
            frame.write.mode("overwrite").parquet(persist_path)
            frame = self.spark.read.parquet(persist_path)
        else:
            frame = frame.persist()
        key_cols = [c for c in frame.columns
                    if c not in {m.alias for m in measures}]
        # row count doubles as the materialization action (the persist
        # fills here) and the routing cost key — Mondrian AggName picks
        # the smallest covering aggregate the same way
        r = Rollup(name, grain, frame, key_cols, measures,
                   rows=frame.count())
        self.rollups.append(r)
        return r

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

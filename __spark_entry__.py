"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one or more operators from
SURVEY.md §2 through the mondrian_rest_spark engine; ``oracle_sql()``
holds the equivalent DuckDB SQL over the same parquet tables.  Column
aliases match exactly on both sides (the driver hash-compares after
sorting columns by name).

Determinism conventions (so Spark and DuckDB hash-match):
- money-style sums go through DECIMAL(25,6) (exact, order-independent)
  and cast back to double — ``DEC()`` below mirrors the engine's
  Measure.result_cast convention;
- float ratios are rounded to 6 decimals on both sides;
- every ordered/limited query has a deterministic tie-break on keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from mondrian_rest_spark import members as MB
from mondrian_rest_spark import tpch
from mondrian_rest_spark.operators import (closure, dedup, multimodal,
                                           pipeline, similarity, textstats,
                                           windows)
from mondrian_rest_spark.planner import aggregate
from mondrian_rest_spark.query import QueryModel
from mondrian_rest_spark.sources.registry import load_table

CAT = tpch.CATALOG


def _lt(s: SparkSession, d: str, name: str) -> DataFrame:
    """Rebalanced load for the jaccard-prefix dedup family ONLY
    (guide §2.5 "input skew: one huge unsplittable file"): spreads
    the shingle explode + candidate-join work across cores when the
    parquet layout has fewer row groups than the session has cores
    AND the input is small enough that the one-pass shuffle is cheap
    — a no-op on production-scale layouts (see
    sources.registry.maybe_rebalance).  Scoped to d09/d10/d11 by
    measurement, not taste: an entry-wide rollout was interleave-A/B'd
    in the r14 optimization round and LOST everywhere else (OLAP set
    14.0 s rebalanced vs 11.2 s plain; d03 1.29 vs 0.86, d04 1.80 vs
    1.56, t12 1.39 vs 0.87; d10 the decisive winner at 10.4 vs
    17.5 s) — the extra full-input exchange outweighs the map-side
    parallelism for every aggregation-shaped operator, because those
    already shuffle at their first groupBy anyway."""
    from mondrian_rest_spark.sources.registry import maybe_rebalance
    return maybe_rebalance(s, d, name, load_table(s, d, name))


# --- ragged-hierarchy catalog over the TPC-H tables (r11, VERDICT r10
# #2; reference foodmart.xml:565-603 Sales Ragged): a customer-geo
# hierarchy where every 5th nation presents a BLANK caption
# (hideMemberIf=IfBlankName) and every 7th customer echoes its
# nation's caption (hideMemberIf=IfParentsName) — both hidden members
# must leave the drilled axis, matching the DuckDB oracle that encodes
# the same visibility rules as WHERE predicates. ---
_RAGGED_NATION = "CASE WHEN n_nationkey % 5 = 0 THEN '' ELSE n_name END"
_RAGGED_CUST = (f"CASE WHEN c_custkey % 7 = 0 THEN ({_RAGGED_NATION}) "
                "ELSE c_name END")
RAGGED_CAT = tpch.Catalog("ragged_tpch", cubes=(tpch.Cube(
    name="Ragged Orders", fact="orders",
    dimensions=(tpch.Dimension(
        name="Geo",
        tables=(("customer", None, None),
                ("nation", "c_nationkey", "n_nationkey"),
                ("region", "n_regionkey", "r_regionkey")),
        fact_fk="o_custkey", dim_pk="c_custkey",
        hierarchies=(tpch.Hierarchy(name="Geo", levels=(
            tpch.Level("Region", key="r_name", key_alias="geo_region"),
            tpch.Level("Nation", key=_RAGGED_NATION,
                       key_alias="geo_nation",
                       hide_member_if="if_blank_name"),
            tpch.Level("Customer", key="c_custkey",
                       key_alias="c_custkey",
                       caption=_RAGGED_CUST,
                       caption_alias="geo_cust_name",
                       hide_member_if="if_parents_name"),
        )),),
    ),),
    measures=(tpch.Measure(
        "Total Price", "total_price", "sum",
        "CAST(o_totalprice AS DECIMAL(25,6))", result_cast="double"),),
),))


def _agg(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    return aggregate(spark, sf_dir, CAT, QueryModel(**kw))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-dim crossjoin rollup
    (region x return flag x year) with an expression measure."""
    return _agg(spark, "/root/testdata/sf0.001", cube="Sales",
                measures=["Revenue", "Line Count"],
                drilldown=["Customer.Region", "Return Flag", "Time.Year"])


# --------------------------------------------------------------------------
# oracle SQL helpers
# --------------------------------------------------------------------------

def DEC(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


REVENUE = DEC("l_extendedprice * (1 - l_discount)")
J_CUST = ("lineitem JOIN orders ON l_orderkey = o_orderkey "
          "JOIN customer ON o_custkey = c_custkey "
          "JOIN nation ON c_nationkey = n_nationkey "
          "JOIN region ON n_regionkey = r_regionkey")
J_SUPP = ("lineitem JOIN supplier ON l_suppkey = s_suppkey "
          "JOIN nation ON s_nationkey = n_nationkey "
          "JOIN region ON n_regionkey = r_regionkey")
J_PART = "lineitem JOIN part ON l_partkey = p_partkey"
J_ORD_CUST = ("orders JOIN customer ON o_custkey = c_custkey "
              "JOIN nation ON c_nationkey = n_nationkey "
              "JOIN region ON n_regionkey = r_regionkey")
TOKENS = "string_split_regex(trim(text), '\\s+')"


def _geo_closure_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child hierarchy rollup (SURVEY J4; reference
    foodmart.xml:529-547): a region -> nation -> customer parent-child
    graph built from the dim tables, its transitive closure built
    distributedly, then orders aggregated at every node *including its
    whole subtree* (a region's cell = all its nations' customers)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    node = lambda tag, key: F.concat(F.lit(tag), F.col(key).cast("string"))
    edges = (
        region.select(node("R", "r_regionkey").alias("node_id"),
                      F.lit(None).cast("string").alias("parent_id"),
                      F.col("r_name").alias("node_name"))
        .unionByName(nation.select(
            node("N", "n_nationkey").alias("node_id"),
            node("R", "n_regionkey").alias("parent_id"),
            F.col("n_name").alias("node_name")))
        .unionByName(customer.select(
            node("C", "c_custkey").alias("node_id"),
            node("N", "c_nationkey").alias("parent_id"),
            F.col("c_name").alias("node_name"))))
    cl = closure.build_closure(edges, "node_id", "parent_id", known_depth=2)
    fact = orders.select(node("C", "o_custkey").alias("cust_node"),
                         "o_totalprice", "o_orderkey")
    out = closure.subtree_rollup(
        fact, cl, edges.select("node_id", "node_name"),
        "cust_node", "node_id",
        [F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double")
           .alias("total_price"),
         F.count("o_orderkey").alias("order_count")])
    return out.select("node_id", "node_name", "total_price", "order_count")


_ROLLUP_MGRS: dict = {}
_IVF_LAYOUTS: dict = {}
_LAYOUT_CACHE: dict = {}


def _routed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-table routing (SURVEY A9; reference foodmart.xml:128-160
    AggName): materialize a nation x year rollup, then answer a
    nation-grain query with a year cut FROM the rollup — the query never
    touches the base fact (asserted; see also
    tests/test_closure_rollup.py plan checks).

    The manager (and its persisted rollup) is memoized per session+dir:
    in production the rollup is built by a periodic job, not per query,
    so repeated calls measure the routed READ (bench.py warms it)."""
    from mondrian_rest_spark.plans.rollup import RollupManager

    key = (id(spark), sf_dir)
    mgr = _ROLLUP_MGRS.get(key)
    if mgr is None:
        mgr = RollupManager(spark, sf_dir, CAT, "Sales")
        mgr.register("nation_year", ("Customer.Nation", "Time.Year"))
        _ROLLUP_MGRS[key] = mgr
    qm = QueryModel(cube="Sales", measures=["Revenue", "Line Count"],
                    drilldown=["Customer.Nation"],
                    cut=["([Time].[Year].[1996]:[Time].[Year].[1998])"])
    out, source = mgr.route(qm)
    assert source == "nation_year", f"expected rollup routing, got {source}"
    return out


def _grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS extension (beyond reference parity — SURVEY §2.4
    'Absent': the reference computes one granularity per query).  One
    scan produces every prefix granularity of region x status via
    Spark's native rollup (Expand operator: partial aggregation still
    applies, no N-pass re-scan)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (orders
         .join(customer, orders.o_custkey == customer.c_custkey)
         .join(nation, customer.c_nationkey == nation.n_nationkey)
         .join(region, nation.n_regionkey == region.r_regionkey))
    return (j.rollup(F.col("r_name").alias("cust_region"),
                     F.col("o_orderstatus"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                    .cast("double").alias("total_price"),
                  F.count("o_orderkey").alias("order_count"),
                  F.grouping_id().alias("gid")))


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents' text re-encoded as an
    opaque binary payload column, then Arrow-batched mapInPandas feature
    extraction (operators/multimodal.py).  Width/height come from the
    stubbed decoder so only the decode-independent features are compared
    against the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"))
    return (multimodal.extract_features(media)
            .select("media_id", "kind", "n_bytes", "checksum"))


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- core OLAP surface (SURVEY §2.2-§2.7) ----
    # avg computed from the exact decimal sum so both engines divide the
    # *same* operands (a float avg is partition-order dependent)
    q["q01_totals"] = lambda s, d: _agg(
        s, d, cube="Sales",
        measures=["Quantity", "Extended Price", "Line Count", "Customer Count",
                  "Revenue", "Max Quantity", "Discount Sum"],
    ).withColumn("avg_disc", F.round(F.col("sum_disc") / F.col("line_count"), 6)
    ).drop("sum_disc")

    q["q02_region_revenue"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"], drilldown=["Customer.Region"])

    q["q03_crossjoin_3d"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue", "Line Count"],
        drilldown=["Customer.Region", "Return Flag", "Time.Year"])

    q["q04_cut_member"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Quantity", "Line Count", "Customer Count"],
        drilldown=["Customer.Nation"], cut=["[Customer].[Region].[&2]"])

    q["q05_cut_set"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"], drilldown=["Time.Year"],
        cut=["{[Customer].[Region].[AMERICA],[Customer].[Region].[EUROPE]}"])

    q["q06_cut_range"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"], drilldown=["Time.Month"],
        cut=["([Time].[Year].[1996]:[Time].[Year].[1998])"], parents=True)

    q["q07_tuple_slicer"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"], drilldown=["Part.Brand"],
        cut=["[Customer].[Region].[ASIA]", "[Return Flag].[R]"])

    q["q08_descendants_union"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"], drilldown=["Customer.Customer"],
        cut=["{[Customer].[Region].[&2],[Customer].[Region].[&3]}"])

    q["q09_having"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue", "Line Count"],
        drilldown=["Customer.Nation"], filter=["Revenue > 20000000"])

    q["q10_order_limit"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"], drilldown=["Part.Brand"],
        order="Revenue", order_desc=True, offset=2, limit=5)

    q["q11_order_property"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Quantity"], drilldown=["Supplier.Supplier"],
        properties=["Supplier.Supplier.Account Balance"],
        order="Supplier.Supplier.Account Balance", order_desc=True, limit=5)

    q["q12_distinct_count"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Customer Count", "Line Count"],
        drilldown=["Supplier.Nation"])

    q["q13_year_revenue"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"], drilldown=["Time.Year"])

    q["q14_calc_member"] = lambda s, d: _agg(
        s, d, cube="Sales",
        measures=["Extended Price", "Line Count", "Avg Price"],
        drilldown=["Part.Brand"])

    q["q15_lag_prev_period"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue", "Revenue Prev Period"],
        drilldown=["Customer.Region", "Time.Year"])

    q["q16_named_set_topcount"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue", "Quantity"],
        drilldown=["Customer.Customer"], cut=["[Top5 Customers]"])

    q["q17_dense_axes"] = lambda s, d: _agg(
        s, d, cube="Orders", measures=["Total Price", "Order Count"],
        drilldown=["Customer.Region", "Order Status"], nonempty=False)

    q["q18_virtual_cube"] = lambda s, d: _agg(
        s, d, cube="Orders and Sales",
        measures=["Revenue", "Total Price", "Order Count"],
        drilldown=["Customer.Nation"])

    q["q19_weekly_hierarchy"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"],
        drilldown=["Time.Weekly.Week"], parents=True)

    q["q20_properties"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Revenue"], drilldown=["Customer.Customer"],
        properties=["Customer.Customer.Market Segment",
                    "Customer.Customer.Account Balance"],
        cut=["[Customer].[Region].[&2]"])

    q["q21_caption_substitution"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Quantity"], drilldown=["Part.Part"],
        caption=["Part.Part.Type"])

    q["q22_level_members"] = lambda s, d: MB.level_members(
        s, d, CAT, "Sales", "Customer", "Nation")

    q["q23_member_children"] = lambda s, d: MB.member_children(
        s, d, CAT, "Sales", "Customer", "Region", 2)

    q["q24_orders_totals"] = lambda s, d: _agg(
        s, d, cube="Orders",
        measures=["Total Price", "Order Count", "Ordering Customers",
                  "Avg Order Value"])

    q["q25_sparse_skip"] = lambda s, d: _agg(
        s, d, cube="Orders", measures=["Total Price", "Order Count"],
        drilldown=["Customer.Region", "Order Status"], nonempty=False,
        sparse=True)

    q["q26_mdx_passthrough"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY CROSSJOIN([Customer].[Region].Members, "
        "[Line Status].[Line Status].Members) ON ROWS FROM [Sales]")

    # <member>.Children + HIERARCHIZE axis idioms in posted MDX
    # (Mondrian accepts both via reference api.rb:21-50; children of
    # region &2 = its nations, hierarchize = default member order)
    q["q37_mdx_children_hierarchize"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Line Count]} ON COLUMNS, "
        "NON EMPTY HIERARCHIZE([Customer].[Region].[&2].Children) "
        "ON ROWS FROM [Sales]")

    # WITH MEMBER inline calculated member in posted MDX (reference
    # api.rb:21-50 accepts it via Mondrian; planner._inline_calcs)
    q["q32_mdx_with_member"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Discount Rate] AS "
        "[Measures].[Discount Sum] / [Measures].[Extended Price] "
        "SELECT {[Measures].[Revenue], [Measures].[Discount Rate]} ON COLUMNS, "
        "[Customer].[Region].Members ON ROWS FROM [Sales]")

    # PARALLELPERIOD tuple in posted MDX -> lag calc member
    q["q33_mdx_parallelperiod"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Prev Year Revenue] AS "
        "([Measures].[Revenue], PARALLELPERIOD([Time].[Year], 1)) "
        "SELECT {[Measures].[Revenue], [Measures].[Prev Year Revenue]} "
        "ON COLUMNS, [Time].[Year].Members ON ROWS FROM [Sales]")

    # WITH SET inline named set (TOPCOUNT) in posted MDX
    q["q34_mdx_with_set"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH SET [Top3 Nations] AS "
        "TOPCOUNT([Customer].[Nation].Members, 3, [Measures].[Revenue]) "
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Top3 Nations] ON ROWS FROM [Sales]")

    # WITH MEMBER over a virtual cube: cross-cube ratio computed
    # post-drill-across (planner._aggregate_virtual inline path)
    q["q35_mdx_virtual_with_member"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Rev To Orders] AS "
        "[Measures].[Revenue] / [Measures].[Total Price] "
        "SELECT {[Measures].[Revenue], [Measures].[Rev To Orders]} "
        "ON COLUMNS, [Customer].[Region].Members ON ROWS "
        "FROM [Orders and Sales]")

    # TOPCOUNT as an infix-crossjoin operand (reference
    # api_spec.rb:284-296 `TOPCOUNT(...) * set`): compiled to an
    # inline named set, so the top-n restricts only its own axis set
    q["q36_mdx_topcount_crossjoin"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY TOPCOUNT([Customer].[Nation].Members, 3, "
        "[Measures].[Revenue]) * [Line Status].[Line Status].Members "
        "ON ROWS FROM [Sales]")

    # LASTPERIODS(n, member): the n periods ending at the member,
    # compiled to an IN-literal cut pushed to the scan (mdx.py)
    q["q39_mdx_lastperiods"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY LASTPERIODS(3, [Time].[Year].[1997]) ON ROWS "
        "FROM [Sales]")

    # <member>.Parent axis set: drill the parent level sliced to the
    # member's parent (dim-side key lookup, mdx.py/planner.py)
    q["q38_mdx_member_parent"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Customer].[Nation].[NATION_5].Parent ON ROWS "
        "FROM [Sales]")

    # <member>.Lag(n) axis set: the member n positions earlier along
    # the level's key order (mdx.py/planner.py member_lags)
    q["q41_mdx_member_lag"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Time].[Year].[1997].Lag(2) ON ROWS FROM [Sales]")

    # FILTER over measure ARITHMETIC (raw-MDX tail, VERDICT r7 #1):
    # [Measures].[A] > k * [Measures].[B] compiles to an expression
    # template resolved to post-agg aliases — one Catalyst filter at
    # the HAVING stage, nothing leaves the JVM (planner
    # _apply_filter_exprs; reference api_helpers.rb:42-54 runs it via
    # Mondrian)
    q["q48_mdx_filter_expr"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Quantity]} ON COLUMNS, "
        "NON EMPTY FILTER([Customer].[Nation].Members, "
        "[Measures].[Revenue] > 2010 * [Measures].[Quantity]) "
        "ON ROWS FROM [Sales]")

    # set-aggregate WITH MEMBER (raw-MDX tail, VERDICT r7 #1):
    # AGGREGATE({<members>}, m) = the measure aggregated over fact
    # rows in the member set — a CONDITIONAL aggregate in the same
    # groupBy as the other measures (one shuffle, no second pass;
    # planner _set_agg_col)
    q["q49_mdx_set_aggregate"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Rev 95 96] AS "
        "AGGREGATE({[Time].[Year].[1995],[Time].[Year].[1996]}, "
        "[Measures].[Revenue]) "
        "SELECT {[Measures].[Revenue], [Measures].[Rev 95 96]} "
        "ON COLUMNS, NON EMPTY [Customer].[Region].Members ON ROWS "
        "FROM [Sales]")

    # member-VALUE set aggregates (r8, Mondrian semantics): AVG(set,
    # m) averages the members' CELL values (per axis row, the mean of
    # its three yearly Revenue totals), not the fact rows — one extra
    # axis-grained aggregate left-joined back (planner ml_set_aggs)
    q["q62_mdx_set_avg"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Avg Yearly Rev] AS "
        "AVG(([Time].[Year].[1995]:[Time].[Year].[1997]), "
        "[Measures].[Revenue]) "
        "SELECT {[Measures].[Revenue], [Measures].[Avg Yearly Rev]} "
        "ON COLUMNS, NON EMPTY [Customer].[Region].Members ON ROWS "
        "FROM [Sales]")

    # MEDIAN/STDEV member-value set aggregates (r8): order statistics
    # over the member cell values per axis row (sample stdev,
    # Mondrian's Stdev)
    q["q63_mdx_set_median_stdev"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Med Yearly Rev] AS "
        "MEDIAN(([Time].[Year].[1995]:[Time].[Year].[1997]), "
        "[Measures].[Revenue]) "
        "MEMBER [Measures].[Sd Yearly Rev] AS "
        "STDEV(([Time].[Year].[1995]:[Time].[Year].[1997]), "
        "[Measures].[Revenue]) "
        "SELECT {[Measures].[Med Yearly Rev], [Measures].[Sd Yearly Rev]} "
        "ON COLUMNS, NON EMPTY [Customer].[Nation].Members ON ROWS "
        "FROM [Sales]")

    # DIMENSION PROPERTIES + CELL PROPERTIES clauses (r8): member
    # properties requested in raw MDX ride the same dim-side column
    # plumbing as the REST properties[] param (q20); cell properties
    # are satisfied by the payload contract
    q["q64_mdx_dimension_properties"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Customer].[Customer].Members "
        "DIMENSION PROPERTIES [Customer].[Customer].[Market Segment], "
        "MEMBER_CAPTION ON ROWS "
        "FROM [Sales] WHERE ([Customer].[Region].[&2]) "
        "CELL PROPERTIES VALUE, FORMATTED_VALUE")

    # RANK WITH MEMBER on a VIRTUAL cube (r8): the window runs over
    # the joined drill-across frame — rank conformed-dim members by a
    # measure from either base cube (planner rank_inline)
    q["q66_mdx_virtual_rank"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Rev Rank] AS "
        "RANK([Customer].[Region].CurrentMember, "
        "ORDER([Customer].[Region].Members, [Measures].[Revenue], BDESC)) "
        "SELECT {[Measures].[Revenue], [Measures].[Total Price], "
        "[Measures].[Rev Rank]} ON COLUMNS, "
        "NON EMPTY [Customer].[Region].Members ON ROWS "
        "FROM [Orders and Sales]")

    # set-aggregate / measure-tuple WITH MEMBER on a VIRTUAL cube
    # (r8): the calc is FORWARDED to the base cube owning the measure
    # (its sub-aggregate computes the conditional column fact-side;
    # the drill-across join carries it) — each cube's Time restriction
    # uses its own fact date, the correct drill-across semantics
    q["q67_mdx_virtual_set_aggregate"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Rev 95 96] AS "
        "AGGREGATE({[Time].[Year].[1995],[Time].[Year].[1996]}, "
        "[Measures].[Revenue]) "
        "MEMBER [Measures].[Orders 95] AS "
        "([Measures].[Total Price], [Time].[Year].[1995]) "
        "SELECT {[Measures].[Revenue], [Measures].[Rev 95 96], "
        "[Measures].[Orders 95]} ON COLUMNS, "
        "NON EMPTY [Customer].[Region].Members ON ROWS "
        "FROM [Orders and Sales]")

    # 2-arg NONEMPTY(set, m) (r8): drop axis tuples where the NAMED
    # measure is empty — here the Part cut constrains facts only (the
    # dense axes stay full by contract), so the measure filter is what
    # prunes the (region, year) combos with no matching facts
    # VISUALTOTALS (r9): the parent's total reflects only the LISTED
    # children — the children cut restricts the fact rows, so the
    # grouping-sets parent subtotal IS the visible total (no 2nd pass)
    q["q77_mdx_visualtotals"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY VISUALTOTALS({[Customer].[Region].[&1], "
        "[Customer].[Nation].[&1], [Customer].[Nation].[&6]}) "
        "ON ROWS FROM [Sales]")

    # TWO grouping-sets axes (r10, VERDICT r9 #4): DRILLDOWNLEVEL on
    # two different dimensions -> 2^2 = 4 grouping sets in ONE Expand
    # pass (one scan, one shuffle, partial agg intact)
    q["q80_mdx_drilldownlevel_2d"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY CROSSJOIN(DRILLDOWNLEVEL([Customer].[Region].Members), "
        "DRILLDOWNLEVEL([Time].[Year].Members)) ON ROWS FROM [Sales]")

    # DENSE axes on a VIRTUAL cube (r10): the reference default —
    # every member of the axis appears, cells null where either base
    # cube has no facts; previously nonempty=false silently behaved
    # as NON EMPTY on the drill-across path
    q["q86_mdx_virtual_dense"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, [Customer].[Nation].Members ON ROWS "
        "FROM [Orders and Sales] WHERE ([Customer].[Region].[&1])")

    # DRILLDOWNLEVELTOP (r10): parents plus their best-n children by
    # a measure — grouping-sets Expand + ONE axis-sized rank window
    # (subtotal rows ride a separate partition, never a child's slot)
    q["q85_mdx_drilldownleveltop"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, "
        "[Measures].[Revenue]) ON ROWS FROM [Sales]")

    # Dense (nonempty=false) grouping-sets axis (r12, VERDICT r11 #1):
    # Mondrian's dense DEFAULT (api.rb:137) applied to DRILLDOWNLEVEL —
    # the union of per-grouping-set dense frames (parent frame + true
    # (parent, child) pairs) left-joined to the marker slices of the
    # ONE Expand aggregate; the single-day slicer leaves most cells
    # null, which is exactly what the dense fill must surface
    q["q100_mdx_dense_drilldownlevel"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "DRILLDOWNLEVEL([Customer].[Region].Members) ON ROWS "
        "FROM [Sales] WHERE ([Time].[Day].[&1996-02-10])")

    # DDLTOP beside a ranked second axis (r12, VERDICT r11 #3):
    # Mondrian evaluates BOTH sets pre-crossjoin, so the TOPCOUNT
    # year selection must NOT restrict DDLTOP's rank basis — the rank
    # aggregates (parent, child) over the SLICER-context base (all
    # years), while cell values stay restricted to the selected years
    q["q101_mdx_ddltop_x_topcount"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, "
        "[Measures].[Quantity]) * TOPCOUNT([Time].[Year].Members, 2, "
        "[Measures].[Revenue]) ON ROWS FROM [Sales]")

    # GENERATE beside a TOPCOUNT-as-set axis (r12, the q101 argument
    # applied to GENERATE): both sets evaluate pre-crossjoin, so the
    # per-region top-2 nations rank over the SLICER context (all
    # years) while cell values stay restricted to the top-2 years
    q["q103_mdx_generate_x_topcount"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, "
        "[Measures].[Revenue])) * TOPCOUNT([Time].[Year].Members, 2, "
        "[Measures].[Revenue]) ON ROWS FROM [Sales]")

    # GENERATE x TOPCOUNT on a VIRTUAL cube (r12): the drill-across
    # path rewrites the TOPCOUNT axis into a member-set cut; the
    # GENERATE rank basis must EXCLUDE it (Mondrian evaluates sets in
    # the slicer context) — a (region, nation)-grain sub-aggregate of
    # the ranking measure's owning cube (Orders), while cell values
    # keep the year restriction on both cubes
    q["q104_mdx_virtual_generate_x_topcount"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY GENERATE([Customer].[Region].Members, "
        "TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, "
        "[Measures].[Total Price])) * TOPCOUNT([Time].[Year].Members, "
        "2, [Measures].[Revenue]) ON ROWS FROM [Orders and Sales]")

    # Set functions as crossjoin operands (r12): TOPPERCENT in infix
    # position compiles to an inline COMPUTED named set (evaluated
    # once in the slicer context, kind-dispatched named_set_frame) —
    # previously a documented 400
    q["q105_mdx_toppercent_x_years"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY TOPPERCENT([Customer].[Nation].Members, 30, "
        "[Measures].[Revenue]) * [Time].[Year].Members ON ROWS "
        "FROM [Sales]")

    # ... and on a VIRTUAL cube: the percent set ranks on the
    # measure's OWNING cube (Orders) and rides the drill-across join
    # as a member-set cut pushed to both fact scans
    q["q106_mdx_virtual_toppercent_x_years"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY TOPPERCENT([Customer].[Nation].Members, "
        "40, [Measures].[Total Price]) * [Time].[Year].Members "
        "ON ROWS FROM [Orders and Sales]")

    # Dim-side FILTER as a crossjoin operand (r12): member-property
    # conditions restrict only their OWN dimension's member set, so
    # they compose freely across * — the predicate still pushes into
    # the dim scan pre-aggregation (measure-condition FILTER stays the
    # documented 400 in infix position: it filters tuple CELLS)
    q["q107_mdx_prop_filter_x_years"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY FILTER([Customer].[Customer].Members, "
        "[Customer].[Customer].CurrentMember.Properties"
        "(\"Market Segment\") = \"BUILDING\") * [Time].[Year].Members "
        "ON ROWS FROM [Sales]")

    # SUBSET as a crossjoin operand (r12): the hierarchy-order slice
    # of the level's member set — dim-side, fact-independent, rides as
    # drilldown + member-set cut like the other computed-set kinds
    q["q108_mdx_subset_x_years"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY SUBSET([Customer].[Nation].Members, 5, 3) * "
        "[Time].[Year].Members ON ROWS FROM [Sales]")

    # Dense DRILLDOWNLEVELTOP (r13, VERDICT r12 #4): Mondrian's
    # TopCount treats missing cells as rankable, so without NON EMPTY
    # the per-parent top-N ranks the DENSE child axis — nonempty cells
    # first (nulls last), then empty children by key (the
    # deterministic tie-break Mondrian doesn't define); every parent
    # keeps its subtotal row, null-filled when the slicer leaves it
    # empty.  Same semantics the dense GENERATE path has always had.
    q["q109_mdx_dense_ddltop"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, "
        "[Measures].[Revenue]) ON ROWS FROM [Sales] "
        "WHERE ([Time].[Day].[&1996-02-10])")

    # Nested GENERATE (r12, VERDICT r11 #6): GENERATE(L1.Members,
    # GENERATE(L1.CurrentMember.Children, inner)) collapses EXACTLY to
    # GENERATE(Lmid.Members, inner) — the outer iterates the FULL L1
    # level, so the union over every region of its nations is the full
    # nation member set; per-nation top-3 customers by revenue
    q["q102_mdx_nested_generate"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "GENERATE([Customer].[Region].CurrentMember.Children, "
        "TOPCOUNT([Customer].[Nation].CurrentMember.Children, 3, "
        "[Measures].[Revenue]))) ON ROWS FROM [Sales]")

    # Ragged hierarchy drilldown (r11, VERDICT r10 #2): hidden members
    # (blank nation captions; customers echoing their nation's name)
    # leave the aggregation axis — the visibility predicates filter the
    # base frame pre-aggregation and push into the dim scan
    q["r01_ragged_drilldown"] = lambda s, d: aggregate(
        s, d, RAGGED_CAT, QueryModel(
            cube="Ragged Orders", measures=["Total Price"],
            drilldown=["Geo.Nation", "Geo.Customer"], nonempty=True))

    # DRILLDOWNLEVELTOP composed with a plain .Members axis (r11,
    # VERDICT r10 #5): exact vs Mondrian's pre-crossjoin evaluation
    # because the rank orders by the MARGINAL measure (sum of the
    # child's cells over the other axis); subtotal rows stay put
    q["q90_mdx_ddltop_x_members"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, "
        "[Measures].[Revenue]) * [Time].[Year].Members "
        "ON ROWS FROM [Sales]")

    # DRILLDOWNLEVELTOP on a VIRTUAL cube (r11): the per-cube Expand
    # passes keep their F.grouping() markers through the null-safe
    # drill-across join, so the post-join per-parent rank identifies
    # subtotal rows by MARKER (never by NULL member keys)
    q["q94_mdx_virtual_ddltop"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, "
        "NON EMPTY DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, "
        "[Measures].[Revenue]) ON ROWS FROM [Orders and Sales]")

    # TAIL on a VIRTUAL cube (r11): last-n of the joined axis' total
    # order (invert, limit, re-sort) — same stage as the base path
    q["q97_mdx_virtual_tail"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY TAIL([Customer].[Nation].Members, 4) "
        "ON ROWS FROM [Orders and Sales]")

    # member-navigation FILTER on a VIRTUAL cube (r11): .Parent IS
    # compiles to a catalog-validated ancestor cut forwarded to every
    # base cube's sub-aggregate (conformed dims share tables)
    q["q98_mdx_virtual_nav_filter"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY FILTER([Customer].[Nation].Members, "
        "[Customer].[Nation].CurrentMember.Parent IS "
        "[Customer].[Region].[&2]) ON ROWS FROM [Orders and Sales]")

    # PARALLELPERIOD WITH MEMBER on a VIRTUAL cube (r11): the lag
    # window runs over the joined drill-across frame's time axis (the
    # UNION of the base cubes' member sets) — the reference's own
    # virtual cube time-navigates exactly like this
    # (foodmart.xml:749-755 Profit Growth over PREVMEMBER)
    q["q95_mdx_virtual_parallelperiod"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Prev TP] AS "
        "([Measures].[Total Price], PARALLELPERIOD([Time].[Year], 1)) "
        "SELECT {[Measures].[Total Price], [Measures].[Prev TP], "
        "[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Time].[Year].Members ON ROWS "
        "FROM [Orders and Sales]")

    # SUM(YTD(), m) WITH MEMBER on a VIRTUAL cube (r11): cumulative
    # window anchored at Year over the joined frame's time axis
    q["q96_mdx_virtual_ytd"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[YTD TP] AS "
        "SUM(YTD(), [Measures].[Total Price]) "
        "SELECT {[Measures].[Total Price], [Measures].[YTD TP]} "
        "ON COLUMNS, NON EMPTY [Time].[Year].Members * "
        "[Time].[Quarter].Members ON ROWS FROM [Orders and Sales]")

    # Property FILTER wrapping GENERATE on the SAME dimension (r11,
    # VERDICT r10 #8 — was a documented 400): Mondrian ranks the
    # UNFILTERED set (the grammar only admits FILTER wrapping the
    # windowed set), so the property predicate defers to AFTER the
    # per-parent window
    q["q91_mdx_filter_over_generate"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY FILTER(GENERATE([Customer].[Nation].Members, "
        "TOPCOUNT([Customer].[Nation].CurrentMember.Children, 3, "
        "[Measures].[Revenue])), "
        "[Customer].[Customer].CurrentMember.Properties"
        "('Market Segment') = 'BUILDING') ON ROWS FROM [Sales]")

    # TWO GENERATEs on different dimensions (r11, VERDICT r10 #3 —
    # lifts the one-per-query cap like r10 did for grouping sets):
    # independent per-parent windows ranking by the MARGINAL measure
    # (Mondrian's pre-crossjoin evaluation for additive measures)
    q["q89_mdx_generate_2d"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, "
        "[Measures].[Revenue])) * "
        "GENERATE([Time].[Year].Members, "
        "TOPCOUNT([Time].[Year].CurrentMember.Children, 2, "
        "[Measures].[Revenue])) ON ROWS FROM [Sales]")

    # LASTPERIODS on a VIRTUAL cube (r11, VERDICT r10 #1): the member
    # window resolves over the UNION of the base cubes' member sets
    # (Mondrian virtual-cube hierarchy), then rides the drill-across
    # join as an IN-literal cut pushed to both fact scans
    q["q87_mdx_virtual_lastperiods"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY LASTPERIODS(3, [Time].[Year].[&1997]) "
        "ON ROWS FROM [Orders and Sales]")

    # WITH SET TOPCOUNT on a VIRTUAL cube (r11): ranks on the measure's
    # OWNING base cube (a virtual cell for a single-cube measure IS
    # that cube's cell), memoized IN-literal cut on the drill-across
    q["q88_mdx_virtual_with_set"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH SET [TopN] AS TOPCOUNT([Customer].[Nation].Members, 5, "
        "[Measures].[Revenue]) "
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY [TopN] ON ROWS "
        "FROM [Orders and Sales]")

    # GENERATE per-parent TOPCOUNT on a VIRTUAL cube (r11): the
    # (parent, child) pair is drilled on every base cube; the
    # row_number window runs once on the JOINED drill-across frame
    q["q92_mdx_virtual_generate"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY GENERATE([Customer].[Region].Members, "
        "TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, "
        "[Measures].[Revenue])) ON ROWS FROM [Orders and Sales]")

    # TOPPERCENT on a VIRTUAL cube (r11): the cumulative-prefix window
    # runs over the axis-sized joined frame, same as the base path
    q["q93_mdx_virtual_toppercent"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Total Price]} ON COLUMNS, "
        "TOPPERCENT([Customer].[Nation].Members, 30, "
        "[Measures].[Total Price]) ON ROWS FROM [Orders and Sales]")

    # DRILLDOWNLEVEL on a VIRTUAL cube (r10): per-base-cube Expand
    # passes, drill-across full-outer join aligned NULL-SAFELY so the
    # two cubes' subtotal rows (NULL child keys) land on one row
    q["q84_mdx_virtual_drilldownlevel"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY DRILLDOWNLEVEL("
        "[Customer].[Region].Members) ON ROWS "
        "FROM [Orders and Sales]")

    # VISUALTOTALS composed with DRILLDOWNLEVEL on another dimension
    # (r10): two grouping-sets axes + the visible-total cuts, still
    # ONE Expand pass
    q["q83_mdx_visualtotals_x_ddl"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY VISUALTOTALS({[Customer].[Region].[&1], "
        "[Customer].[Nation].[&1], [Customer].[Nation].[&6]}) * "
        "DRILLDOWNLEVEL([Time].[Year].Members) ON ROWS FROM [Sales]")

    # Function-form CROSSJOIN (r10, VERDICT r9 #7): the explicit form
    # of the infix `*`, nestable for N-ary axes; same one-shuffle
    # multi-key groupBy plan as the infix compile
    q["q81_mdx_crossjoin_fn"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY CROSSJOIN([Customer].[Region].Members, "
        "[Return Flag].[Return Flag].Members) ON ROWS FROM [Sales]")

    # StrToMember/StrToSet (r10, VERDICT r9 #7): parse-time string
    # unwraps of literal arguments — Mondrian evaluates then parses
    # the string, which for a literal IS a token splice
    q["q82_mdx_strtomember"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY StrToSet(\"{[Customer].[Nation].[&1],"
        "[Customer].[Nation].[&6]}\") ON ROWS FROM [Sales] "
        "WHERE (StrToMember(\"[Customer].[Region].[&1]\"))")

    # EXISTING under DENSE axes (r10, VERDICT r9 #3): Mondrian's
    # EXISTING drops out-of-context members; without the fix a dense
    # fill surfaced all 25 nations (20 null-filled) where Mondrian
    # returns only region &1's five
    q["q79_mdx_existing_dense"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "EXISTING [Customer].[Nation].Members ON ROWS "
        "FROM [Sales] WHERE ([Customer].[Region].[&1])")

    # Parent-child hierarchy as a REST-drillable catalog dimension
    # (r10, VERDICT r9 #1; reference HR cube foodmart.xml:529-547):
    # drilldown[]=Geo Tree enumerates the region->nation->customer
    # tree's nodes, each cell aggregating its WHOLE subtree via the
    # closure fan-out join; the cut restricts FACTS to nation N1's
    # subtree (closure semi-join), so the axis keeps N1, its ancestor
    # region and its customers with subtree-restricted totals —
    # Mondrian's slicer cell-context semantics
    q["q78_pc_rest_drilldown"] = lambda s, d: _agg(
        s, d, cube="Orders", measures=["Total Price", "Order Count"],
        drilldown=["Geo Tree"], cut=["[Geo Tree].[Node].[&N1]"])

    # HIERARCHIZE over a RANKED set (r9): TOPCOUNT picks the tuples,
    # display order reverts to hierarchical — Mondrian's
    # pick-then-display idiom; one axis-sized re-sort after the limit
    q["q76_mdx_hierarchize_topcount"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY HIERARCHIZE(TOPCOUNT([Customer].[Nation].Members, "
        "5, [Measures].[Revenue])) ON ROWS FROM [Sales]")

    # DRILLDOWNLEVEL (r9): Mondrian's mixed-depth axis — parents PLUS
    # their children, hierarchized — as ONE grouping-sets aggregate
    # {(parent), (parent, child)} (single Expand pass, no second
    # scan); parent subtotal rows carry NULL child columns
    q["q74_mdx_drilldownlevel"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY DRILLDOWNLEVEL([Customer].[Region].Members) "
        "ON ROWS FROM [Sales]")

    # DRILLDOWNMEMBER (r9): drill only the LISTED parents — same
    # grouping-sets pass plus a post-agg child-row filter
    q["q75_mdx_drilldownmember"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY DRILLDOWNMEMBER([Customer].[Region].Members, "
        "{[Customer].[Region].[&1],[Customer].[Region].[&3]}) "
        "ON ROWS FROM [Sales]")

    # general GENERATE (r9): DESCENDANTS inner navigation to a level
    # DEEPER than the immediate child + BOTTOMCOUNT — still ONE
    # per-parent row_number window over the (parent, target) aggregate
    q["q72_mdx_generate_descendants"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "BOTTOMCOUNT(DESCENDANTS([Customer].[Region].CurrentMember, "
        "[Customer].[Customer]), 2, [Measures].[Revenue])) ON ROWS "
        "FROM [Sales]")

    # general GENERATE (r9): HEAD inner set — the first n children per
    # parent in hierarchy (key) order, no ranking measure
    q["q73_mdx_generate_head"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "HEAD([Customer].[Region].CurrentMember.Children, 2)) ON ROWS "
        "FROM [Sales]")

    # member-navigation FILTER (r9): FILTER(set, lvl.CurrentMember
    # .Parent IS <member>) — validated against the catalog (parent =
    # exactly one level up) then compiled to an ancestor cut pushed to
    # the scans; mixable with measure conditions like any conjunct
    q["q70_mdx_filter_navigation"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY FILTER([Customer].[Nation].Members, "
        "[Customer].[Nation].CurrentMember.Parent IS "
        "[Customer].[Region].[&2] "
        "AND [Measures].[Revenue] > 0) ON ROWS FROM [Sales]")

    # EXISTS(set1, set2) (r9): hierarchy-relation existence — set2 on
    # the same dimension compiles to an ancestor cut (every member has
    # one ancestor path, so the fact slice keeps exactly the related
    # members); unrelated dims are the spec's no-op
    q["q71_mdx_exists"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY EXISTS([Customer].[Nation].Members, "
        "{[Customer].[Region].[&0],[Customer].[Region].[&3]}) "
        "ON ROWS FROM [Sales]")

    # IIF + CASE conditionals in WITH MEMBER formulas (r9): Mondrian's
    # most common hand-written calc-member idiom (reference executes
    # them via api_helpers.rb:42-54) — both compile to Spark SQL
    # conditional expressions over the post-agg measure columns
    q["q69_mdx_iif_case"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[High Flag] AS "
        "IIF([Measures].[Revenue] / [Measures].[Line Count] > 50250, 1, 0) "
        "MEMBER [Measures].[Band] AS "
        "CASE WHEN [Measures].[Revenue] > 15000000 THEN 2 "
        "WHEN [Measures].[Revenue] > 8000000 THEN 1 ELSE 0 END "
        "SELECT {[Measures].[Revenue], [Measures].[High Flag], "
        "[Measures].[Band]} ON COLUMNS, "
        "[Customer].[Nation].Members ON ROWS FROM [Sales]")

    q["q68_mdx_nonempty_measure"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NONEMPTY(CROSSJOIN([Customer].[Region].Members, "
        "[Time].[Year].Members), [Measures].[Revenue]) ON ROWS "
        "FROM [Sales] "
        "WHERE ({[Part].[Brand].[&Brand#3],[Part].[Brand].[&Brand#5]})")

    # member-property FILTER (r8): FILTER(set, <level>.CurrentMember
    # .Properties("P") <op> literal) — an axis-set restriction
    # compiled to a dim-side predicate pushed to the property's scan
    # (planner prop_filter_preds), mixable with measure conditions
    q["q65_mdx_property_filter"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY FILTER([Customer].[Customer].Members, "
        "[Customer].[Customer].CurrentMember"
        '.Properties("Market Segment") = "BUILDING" '
        "AND [Customer].[Customer].CurrentMember"
        '.Properties("Account Balance") > 0) ON ROWS '
        "FROM [Sales] WHERE ([Customer].[Region].[&2])")

    # OPENINGPERIOD/CLOSINGPERIOD (r8): first/last descendant of a
    # member at ANY deeper level in hierarchy order — one lexicographic
    # dim-side orderBy-limit-1 over the level-key chain (planner
    # edge_child_of 3-tuples); generalizes .FirstChild/.LastChild
    q["q50_mdx_openingperiod"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "OPENINGPERIOD([Customer].[Customer], [Customer].[Region].[&2]) "
        "ON ROWS FROM [Sales]")

    # <member>.Siblings (r8): children of the member's parent — drill
    # the member's own level + parent cut resolved dim-side (planner
    # siblings_of; top-level members -> all members of the level)
    q["q51_mdx_siblings"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Customer].[Nation].[&3].Siblings ON ROWS "
        "FROM [Sales]")

    # ANCESTOR(member, level) (r8): the member's ancestor at ANY
    # height — .Parent generalized; one bounded dim-side lookup
    # (planner ancestor_of), then a drill+cut at the ancestor level
    q["q52_mdx_ancestor"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "ANCESTOR([Customer].[Customer].[&7], [Customer].[Region]) "
        "ON ROWS FROM [Sales]")

    # .LastSibling (r8): the last child of the member's parent — two
    # bounded dim-side lookups (parent key, then max sibling key;
    # planner edge_sibling_of)
    q["q53_mdx_edge_sibling"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Customer].[Nation].[&7].LastSibling ON ROWS "
        "FROM [Sales]")

    # PERIODSTODATE(level, member) (r8): the member's level from the
    # period opening through the member — ancestor-chain cuts + a
    # key-range cut, all pushed to the parquet scan (planner
    # periods_to_date; YTD(m) == PERIODSTODATE(Year, m))
    q["q54_mdx_periodstodate"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY PERIODSTODATE([Time].[Year], "
        "[Time].[Day].[&1996-02-10]) ON ROWS FROM [Sales]"
        ).withColumn("ship_date",
                     F.col("ship_date").cast("timestamp"))

    # TOPSUM (r8): minimal best-first prefix reaching an ABSOLUTE
    # cumulative value — same two-window axis-sized stage as
    # TOPPERCENT with a fixed threshold
    q["q55_mdx_topsum"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY TOPSUM([Customer].[Nation].Members, 100000000, "
        "[Measures].[Revenue]) ON ROWS FROM [Sales]")

    # SUM(MTD(), m) (r8): month-to-date running total — cumulative
    # window partitioned at the Month anchor, ordered by the finer
    # drilled Day level (axis-sized window, never the fact)
    q["q56_mdx_mtd"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[MTD Rev] AS "
        "SUM(MTD(), [Measures].[Revenue]) "
        "SELECT {[Measures].[Revenue], [Measures].[MTD Rev]} ON COLUMNS, "
        "NON EMPTY CROSSJOIN([Time].[Year].Members, "
        "CROSSJOIN([Time].[Quarter].Members, "
        "CROSSJOIN([Time].[Month].Members, [Time].[Day].Members))) "
        "ON ROWS FROM [Sales] WHERE ([Time].[Year].[1996])"
        ).withColumn("ship_date",
                     F.col("ship_date").cast("timestamp"))

    # measure-member tuple calc (r8): ([Measures].[M], <member>) — the
    # measure in a fixed member context, compiled to the single-member
    # conditional aggregate in the SHARED groupBy (mdx
    # _measure_member_tuple -> {setagg:aggregate:...}; no extra pass)
    q["q57_mdx_measure_tuple"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Rev 1995] AS "
        "([Measures].[Revenue], [Time].[Year].[1995]) "
        "SELECT {[Measures].[Revenue], [Measures].[Rev 1995]} ON COLUMNS, "
        "NON EMPTY [Customer].[Nation].Members ON ROWS FROM [Sales]")

    # EXCEPT over the FULL level (r8): "all but X" compiles to ONE
    # exclusion cut (!{...} -> NOT IN) pushed to the scans; the
    # parse-time two-register set algebra is closed under UNION/
    # EXCEPT/INTERSECT with .Members operands (mdx _member_set_operand)
    q["q58_mdx_except_members"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY EXCEPT([Customer].[Nation].Members, "
        "{[Customer].[Nation].[&3], [Customer].[Nation].[&7]}) ON ROWS "
        "FROM [Sales] "
        "WHERE (EXCEPT([Time].[Year].Members, {[Time].[Year].[1995]}))")

    # WITH SET member-literal macro (r8): a query-scoped named set
    # whose body is a member set (or set algebra) — macro-expanded at
    # each reference during PARSING, so the planner sees only the
    # compiled drilldown+cut (mdx set_macros; the TOPCOUNT ranked
    # form keeps the named-set machinery)
    q["q59_mdx_with_set_literal"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH SET [Focus Nations] AS {[Customer].[Nation].[&3], "
        "[Customer].[Nation].[&7], [Customer].[Nation].[&21]} "
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Focus Nations] ON ROWS FROM [Sales] "
        "WHERE ([Time].[Year].[1996])")

    # RANK WITH MEMBER (r8): the member's 1-based rank in its level
    # ordered by a measure — ties share a rank (SQL RANK semantics),
    # computed as an axis-sized rank() window (planner
    # CalculatedMember.rank_of; never the fact)
    q["q60_mdx_rank"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Rev Rank] AS "
        "RANK([Customer].[Nation].CurrentMember, "
        "ORDER([Customer].[Nation].Members, [Measures].[Revenue], BDESC)) "
        "SELECT {[Measures].[Revenue], [Measures].[Rev Rank]} ON COLUMNS, "
        "NON EMPTY [Customer].[Nation].Members ON ROWS FROM [Sales]")

    # GENERATE per-parent top-N (r8): Mondrian's canonical
    # GENERATE(set, TOPCOUNT(CurrentMember.Children, n, m)) idiom —
    # a (parent, child) drilldown + ONE row_number window partitioned
    # per parent on the axis-sized aggregate (planner generate_top)
    q["q61_mdx_generate_top"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, "
        "[Measures].[Revenue])) ON ROWS FROM [Sales]")

    # TOPPERCENT: the minimal best-first member prefix reaching pct%
    # of the axis total (two windows over the axis-sized aggregate)
    q["q47_mdx_toppercent"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY TOPPERCENT([Customer].[Nation].Members, 50, "
        "[Measures].[Revenue]) ON ROWS FROM [Sales]")

    # SUM(YTD(), m): Mondrian's year-to-date running total — a
    # cumulative window within the outermost drilled time level
    # (planner CalculatedMember.run_of; axis-sized window, never fact)
    q["q46_mdx_ytd"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[YTD Revenue] AS "
        "SUM(YTD(), [Measures].[Revenue]) "
        "SELECT {[Measures].[Revenue], [Measures].[YTD Revenue]} "
        "ON COLUMNS, NON EMPTY [Time].[Year].Members * "
        "[Time].[Month].Members ON ROWS FROM [Sales]")

    # member-anchored idioms on a VIRTUAL cube: .Children resolves
    # against the conformed dim once, then drill-across applies the
    # rewritten drill+cut per base cube (planner._virtualize_idioms)
    q["q45_mdx_virtual_children"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY [Customer].[Region].[&2].Children "
        "ON ROWS FROM [Orders and Sales]")

    # axis member range a:b + UNION of member sets (Mondrian idioms;
    # both compile to level drill + pushed cut — mdx.py round 7)
    q["q42_mdx_range_union"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Time].[Year].[1996]:[Time].[Year].[1998] * "
        "UNION({[Customer].[Nation].[&3], [Customer].[Nation].[&7]}, "
        "{[Customer].[Nation].[&21]}) ON ROWS FROM [Sales]")

    # TAIL(set, n): last n tuples of the axis total order (HEAD is the
    # SUBSET fast path; TAIL = reverse-order limit + forward re-sort)
    q["q43_mdx_tail"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY TAIL([Customer].[Nation].Members, 5) ON ROWS "
        "FROM [Sales]")

    # <member>.LastChild: the member's edge child in key order (child
    # level + dim-side min/max lookup), crossjoined with a degenerate
    q["q44_mdx_last_child"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Customer].[Region].[&1].LastChild * "
        "[Line Status].[Line Status].Members ON ROWS FROM [Sales]")

    # IIF conditional inside a WITH MEMBER formula (Mondrian scalar fn;
    # compiles to SQL if(cond, a, b) — mdx.py _calc_tokens)
    q["q40_mdx_iif_member"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "WITH MEMBER [Measures].[Yield Over Floor] AS "
        "IIF([Measures].[Revenue] / [Measures].[Line Count] > 50250, "
        "[Measures].[Revenue] / [Measures].[Line Count], 0) "
        "SELECT {[Measures].[Revenue], [Measures].[Yield Over Floor]} "
        "ON COLUMNS, NON EMPTY [Customer].[Nation].Members ON ROWS "
        "FROM [Sales]")

    q["q27_parent_child_closure"] = lambda s, d: _geo_closure_rollup(s, d)

    q["q28_rollup_routed"] = lambda s, d: _routed_rollup(s, d)

    # virtual-cube rollup routing (r11): the drill-across query's
    # Sales sub-aggregate routes through the memoized nation_year
    # rollup (source asserts it) while the Orders side stays base —
    # Mondrian routes each base cube's cells through its own AggName
    # tables the same way; values identical to the direct path
    def _q99(s, d):
        from mondrian_rest_spark.plans.rollup import RollupManager
        key = (id(s), d)
        mgr = _ROLLUP_MGRS.get(key)
        if mgr is None:
            mgr = RollupManager(s, d, CAT, "Sales")
            mgr.register("nation_year", ("Customer.Nation", "Time.Year"))
            _ROLLUP_MGRS[key] = mgr
        qm = QueryModel(cube="Orders and Sales",
                        measures=["Revenue", "Total Price"],
                        drilldown=["Customer.Nation"], nonempty=True)
        out, source = mgr.route(qm)
        assert source == "virtual:Sales=nation_year", source
        return out
    q["q99_virtual_rollup_routed"] = _q99

    # DENSE rollup routing (r13, VERDICT r12 #1): dense is Mondrian's
    # REST default (api.rb:137) — a dense query with a covering rollup
    # must route too.  The dense fill left-joins the dim member frame
    # to the ROUTED nonempty aggregate; the fact is never scanned
    # (source asserted; plan asserted in test_closure_rollup).
    def _q110(s, d):
        from mondrian_rest_spark.plans.rollup import RollupManager
        key = (id(s), d)
        mgr = _ROLLUP_MGRS.get(key)
        if mgr is None:
            mgr = RollupManager(s, d, CAT, "Sales")
            mgr.register("nation_year", ("Customer.Nation", "Time.Year"))
            _ROLLUP_MGRS[key] = mgr
        qm = QueryModel(cube="Sales", measures=["Revenue"],
                        drilldown=["Customer.Nation"],
                        cut=["[Time].[Year].[&1996]"], nonempty=False)
        out, source = mgr.route(qm)
        assert source == "nation_year", source
        return out
    q["q110_rollup_routed_dense"] = _q110

    # GROUPING-SETS routing (r14): a dense DRILLDOWNLEVEL query with a
    # covering rollup re-aggregates the 2^k-set Expand from ROLLUP
    # rows (sum-of-sums is exact at every grouping set) and densifies
    # over it — the fact is never scanned (source asserted; plan
    # asserted in test_grouping_sets_axes_route_through_rollup).
    def _q116(s, d):
        from mondrian_rest_spark.plans.rollup import RollupManager
        key = (id(s), d, "gs")
        mgr = _ROLLUP_MGRS.get(key)
        if mgr is None:
            mgr = RollupManager(s, d, CAT, "Sales")
            mgr.register("region_nation_year",
                         ("Customer.Region", "Customer.Nation",
                          "Time.Year"))
            _ROLLUP_MGRS[key] = mgr
        qm = QueryModel(cube="Sales", measures=["Revenue"],
                        gs_axes=[("Customer.Region", None)],
                        cut=["[Time].[Year].[&1996]"], nonempty=False)
        out, source = mgr.route(qm)
        assert source == "region_nation_year", source
        return out
    q["q116_rollup_routed_gs_dense"] = _q116

    # Dense GENERATE routing (r14): the nonempty (parent, child)
    # aggregate comes from the rollup, the dense fill enumerates the
    # TRUE pair frame over it, and the per-parent rank orders the
    # densified children nulls-last with the child-key tie-break —
    # base-identical rows without a fact scan.
    def _q117(s, d):
        from mondrian_rest_spark.plans.rollup import RollupManager
        key = (id(s), d, "gs")
        mgr = _ROLLUP_MGRS.get(key)
        if mgr is None:
            mgr = RollupManager(s, d, CAT, "Sales")
            mgr.register("region_nation_year",
                         ("Customer.Region", "Customer.Nation",
                          "Time.Year"))
            _ROLLUP_MGRS[key] = mgr
        qm = QueryModel(cube="Sales", measures=["Revenue"],
                        cut=["[Time].[Year].[&1996]"], nonempty=False,
                        generate_top=("Customer.Region", 2, "Revenue",
                                      False))
        out, source = mgr.route(qm)
        assert source == "region_nation_year", source
        return out
    q["q117_rollup_routed_dense_generate"] = _q117

    # PERIODSTODATE routing (r14): the shared resolve_ptd rewrite
    # (member's level drilled + ancestor cuts + to-date range) runs
    # before grain selection, so the YTD-style dashboard query reads
    # the rollup instead of the fact — bit-identical to base q54.
    def _q118(s, d):
        from mondrian_rest_spark.plans.rollup import RollupManager
        key = (id(s), d, "ptd")
        mgr = _ROLLUP_MGRS.get(key)
        if mgr is None:
            mgr = RollupManager(s, d, CAT, "Sales")
            mgr.register("year_day", ("Time.Year", "Time.Day"))
            _ROLLUP_MGRS[key] = mgr
        qm = QueryModel(cube="Sales", measures=["Revenue"],
                        nonempty=True,
                        periods_to_date=[("Year",
                                          "[Time].[Day].[&1996-02-10]")])
        out, source = mgr.route(qm)
        assert source == "year_day", source
        return out.withColumn("ship_date",
                              F.col("ship_date").cast("timestamp"))
    q["q118_rollup_routed_ptd"] = _q118

    # Dense DRILLDOWNLEVEL on a VIRTUAL cube (r14, VERDICT r13 #1):
    # the per-cube subs keep their F.grouping() markers through the
    # null-safe drill-across join and _densify_gs fills the JOINED
    # frame — parents and true (parent, child) pairs from the
    # conformed dim, cells null where either base cube has no facts
    q["q111_mdx_virtual_dense_ddl"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, DRILLDOWNLEVEL([Customer].[Region].Members) "
        "ON ROWS FROM [Orders and Sales] WHERE ([Time].[Year].[&1996])")

    # Dense GENERATE on a VIRTUAL cube (r14, VERDICT r13 #1): the
    # dense fill builds ONE (parent, child) member-pair frame (never a
    # crossjoin of the levels' separate frames); the post-join
    # per-parent window ranks the DENSE children by the Sales-owned
    # measure nulls-last with the child-key tie-break
    q["q112_mdx_virtual_dense_generate"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, GENERATE([Customer].[Region].Members, "
        "TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, "
        "[Measures].[Revenue])) ON ROWS FROM [Orders and Sales] "
        "WHERE ([Time].[Day].[&1996-02-10])")

    # Dense DRILLDOWNLEVELTOP on a VIRTUAL cube (r14): densify the
    # joined drill-across frame FIRST, then the per-parent window
    # ranks the dense children by the Orders-owned measure — subtotal
    # rows ride their own marker partition and always stay
    q["q113_mdx_virtual_dense_ddltop"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, "
        "[Measures].[Total Price]) ON ROWS FROM [Orders and Sales] "
        "WHERE ([Time].[Day].[&1996-02-10])")

    # Alias-conformed Day on a VIRTUAL cube (r14, VERDICT r13 #6):
    # Day's member-key alias differs per fact (ship_date vs
    # order_date) but the level conforms by RENAME — each cube
    # aggregates at its own column, renamed to the first cube's alias
    # before the drill-across join (Mondrian's shared-dimension
    # semantics: foodmart time_by_day joined via each fact's own FK).
    # Previously the documented non-conformed 400.
    q["q114_mdx_virtual_day_alias_conformed"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, NON EMPTY [Time].[Day].Members ON ROWS "
        "FROM [Orders and Sales] WHERE ([Customer].[Region].[&2])"
        ).withColumn("ship_date",
                     F.col("ship_date").cast("timestamp"))

    # DENSE Day axis on a VIRTUAL cube (r14): the dense member frame
    # is the UNION of the owner cubes' fact-projected member sets
    # (Mondrian virtual hierarchy) under the canonical alias — an
    # order-only day appears with null revenue, a ship-only day with
    # null total_price, and the WHERE cut constrains facts while the
    # axis stays full
    q["q115_mdx_virtual_dense_day_union"] = lambda s, d: __import__(
        "mondrian_rest_spark.mdx", fromlist=["execute_mdx"]).execute_mdx(
        s, d, CAT,
        "SELECT {[Measures].[Revenue], [Measures].[Total Price]} "
        "ON COLUMNS, [Time].[Day].Members ON ROWS "
        "FROM [Orders and Sales] WHERE ([Customer].[Region].[&2])"
        ).withColumn("ship_date",
                     F.col("ship_date").cast("timestamp"))

    q["q29_grouping_rollup"] = lambda s, d: _grouping_rollup(s, d)

    # skew path: salted two-phase groupBy must be value-identical to a
    # plain GROUP BY (operators/skew.py; decimal sums, count via re-sum)
    def _salted(s, d):
        from mondrian_rest_spark.operators import skew
        li = load_table(s, d, "lineitem")
        return skew.salted_agg(li, ["l_returnflag"], {
            "sum_qty": ("sum", F.col("l_quantity").cast("decimal(25,6)")),
            "line_count": ("count", F.lit(1)),
        }, salt=16).withColumn("sum_qty",
                               F.col("sum_qty").cast("double"))
    q["q31_salted_skew_agg"] = _salted

    # median: exact non-additive percentile measure (never rollup-routed,
    # like distinct-count; approx_percentile is the sketch path at scale)
    q["q30_median_price"] = lambda s, d: _agg(
        s, d, cube="Sales", measures=["Median Price", "Max Quantity"],
        drilldown=["Return Flag"])

    # ---- event-time windows (extension; SURVEY §2.11/§7.3 step 10) ----
    q["w01_tumbling_day"] = lambda s, d: windows.tumbling(
        load_table(s, d, "events"), "1 day")
    q["w02_sliding_2d_1d"] = lambda s, d: windows.sliding(
        load_table(s, d, "events"), "2 days", "1 day")
    # weekly retention cohorts (classic event-analytics rollup)
    q["w04_retention_cohorts"] = lambda s, d: windows.retention_cohorts(
        load_table(s, d, "events"))

    # ordered-sequence conversion funnel (first-touch anchored;
    # user-keyed joins + one single-row count aggregate)
    q["w05_funnel"] = lambda s, d: windows.funnel(
        load_table(s, d, "events"))

    # any-touch funnel (VERDICT r7 #7): EVERY step-1 occurrence
    # anchors a candidate sequence; a user counts at step k when ANY
    # anchor's greedy earliest-next-event walk reaches it (exact
    # exists-any-sequence — ClickHouse windowFunnel strict-order).
    # Frames are (user, anchor)-grain but stay user-keyed, so the
    # join chain still co-partitions on user_id.
    q["w06_funnel_any_touch"] = lambda s, d: windows.funnel(
        load_table(s, d, "events"), mode="any_touch")

    # per-doc corpus-boilerplate exposure (cross-document analog of t10)
    q["t12_boilerplate_fraction"] = lambda s, d: \
        textstats.with_boilerplate_fraction(load_table(s, d, "documents"))

    # hashed bag-of-bigram classifier features (fastText-style md5
    # bucket counts); registered EXPLODED so every (doc, bucket) count
    # is value-checked scalar-by-scalar, zeros included
    q["t13_hashed_features"] = lambda s, d: (
        textstats.hashed_ngram_features(load_table(s, d, "documents"),
                                        dim=32)
        .select("doc_id", F.posexplode("features")
                .alias("feature_idx", "count")))

    # corpus duplication report: the ExactSubstr paper's headline
    # statistic per source (what fraction of tokens sit inside
    # duplicated passages) — the frame a curation run reads before
    # setting per-source trim/drop policy
    q["t15_duplication_profile"] = lambda s, d: dedup.duplication_profile(
        load_table(s, d, "documents"), n=5, min_docs=2)

    # rare-bigram novelty: the integer-exact stand-in for an
    # LM-perplexity quality filter (high = gibberish/OCR noise,
    # low = boilerplate)
    q["t14_bigram_novelty"] = lambda s, d: textstats.bigram_novelty(
        load_table(s, d, "documents"), rare_max=1)

    # tokenizer fertility by language (subword pieces per whitespace
    # word — the per-language token-budget correction table)
    q["t16_fertility_by_language"] = lambda s, d: (
        textstats.fertility_by_language(load_table(s, d, "documents")))

    # CCNet-style perplexity scoring with the unigram LM trained on
    # the corpus itself (arXiv:1911.00359 §4.3)
    q["t17_self_perplexity"] = lambda s, d: textstats.self_perplexity(
        load_table(s, d, "documents"))

    # tokenizer vocab-budget table: corpus-token coverage of the
    # top-k vocabulary (Zipf reality check; deterministic rank order)
    q["t19_vocab_coverage"] = lambda s, d: textstats.vocab_coverage(
        load_table(s, d, "documents"), ks=(100, 1000, 10000))

    # true CCNet shape: LM frozen on the English slice, scoring the
    # WHOLE corpus (OOV tokens take the add-one floor and are counted)
    q["t18_ccnet_lm_score"] = lambda s, d: textstats.score_against_lm(
        load_table(s, d, "documents"),
        textstats.unigram_lm(
            load_table(s, d, "documents").filter(F.col("lang") == "en")))

    q["w03_session_30m"] = lambda s, d: windows.sessionized(
        load_table(s, d, "events"), "30 minutes")

    # rolling 7-day active users (DAU/WAU family), exact form; the
    # sketch variant (mergeable per-day HLL state, the 100 TB path)
    # is tolerance-tested against this in pytest
    q["w07_rolling_active_users"] = lambda s, d: windows.rolling_active_users(
        load_table(s, d, "events"), window_days=7)

    # first-order event-type transition matrix (the Markov view next
    # to the funnels: counts + row-normalized probabilities)
    q["w08_event_transitions"] = lambda s, d: windows.event_transitions(
        load_table(s, d, "events"))

    # time-to-convert between funnel steps (same first-touch walk as
    # w05; mean + exact interpolated median, computed in integer µs)
    q["w09_funnel_timing"] = lambda s, d: windows.funnel_timing(
        load_table(s, d, "events"), ("view", "click", "purchase"),
        within="7 days")

    # schema-on-read over the JSON props payload: numeric field
    # extracted JVM-side and aggregated per event type
    q["w10_props_stats"] = lambda s, d: windows.props_value_stats(
        load_table(s, d, "events"))

    # session distribution summary (count/events/duration/bounce) on
    # the same user-keyed session_window shuffle as w03
    q["w11_session_stats"] = lambda s, d: windows.session_stats(
        load_table(s, d, "events"), "30 minutes")

    # volume-anomaly flags: per-type daily counts z-scored against
    # the trailing week (integer-exact rolling variance)
    q["w12_daily_anomalies"] = lambda s, d: windows.daily_count_anomalies(
        load_table(s, d, "events"), window_days=7)

    # ---- dedup suite ----
    q["d01_exact_dups"] = lambda s, d: dedup.exact_duplicate_groups(
        load_table(s, d, "documents"))
    q["d02_neardup_brute"] = lambda s, d: dedup.neardup_bruteforce(
        load_table(s, d, "documents"), threshold=0.5)
    q["d03_neardup_minhash_lsh"] = lambda s, d: dedup.neardup_minhash_lsh(
        load_table(s, d, "documents"), threshold=0.5)
    # exact n-gram Jaccard via prefix filtering (PPJoin family): the
    # scale path for EXACT near-dup — same output as d02, no cross
    # join (rarest-first prefixes + length filter bound the candidate
    # equi-join; exact verify on candidates only).  The jaccard-prefix
    # family (d09/d10/d11) is the ONE operator family that the r14
    # layout-adaptive rebalance helps (interleaved A/B: d10 10.4 s
    # rebalanced vs 17.5 s plain at sf0.1) — its shingle explode +
    # 3-way candidate joins are pure per-row compute that a
    # single-row-group scan serializes on one core; everything else
    # measured neutral-to-worse and stays on the plain scan.
    q["d09_neardup_jaccard_prefix"] = lambda s, d: dedup.neardup_jaccard_prefix(
        _lt(s, d, "documents"), threshold=0.5)

    # degraded-mode spill (r11, VERDICT r10 #4): with an artificially
    # low prefix-bucket cap, docs carrying hot prefix shingles route
    # through the MinHash-LSH pre-filter (approximate=true; values
    # still exact-verified) while every other pair keeps the exact
    # PPJoin path — the oracle replays the prefix frame, the hot-doc
    # set, and the brute-force true pairs (exact verify means no false
    # positives; LSH recall on this corpus is total, as d03 pins)
    q["d11_neardup_jaccard_spill"] = lambda s, d: \
        dedup.neardup_jaccard_spill_minhash(
            _lt(s, d, "documents"), threshold=0.5,
            max_candidates_per_prefix=2)

    # ingest-time EXACT dedup: new batch (doc_id % 10 == 0) vs a
    # frozen prefix index of the rest of the corpus — the exact analog
    # of the MinHash ingest index (d08's machinery); prefix order is
    # frozen at build, which affects pruning power, never recall
    def _d10(s, d):
        docs = _lt(s, d, "documents")
        corpus = docs.filter("doc_id % 10 != 0")
        new = docs.filter("doc_id % 10 = 0")
        pre, sh, freq = dedup.build_jaccard_index(corpus, threshold=0.5)
        # measured, not persisted (r14 optimization round): pinning
        # the three index frames here was tried and is a net LOSS at
        # sf0.1 (interleaved A/B 3x: 17-24 s unpinned vs 23-27 s
        # pinned) — caching the wide shingle arrays costs more than
        # the recompute it saves; in a deployment these frames are
        # parquet tables (the docstring contract), which is the real
        # fix at scale.
        return dedup.neardup_pairs_against_jaccard_index(
            new, pre, sh, freq, threshold=0.5, index_threshold=0.5)
    q["d10_neardup_jaccard_index"] = _d10
    q["d04_neardup_simhash"] = lambda s, d: dedup.neardup_simhash(
        load_table(s, d, "documents"), max_hamming=3)
    q["d05_embedding_neardup"] = lambda s, d: similarity.embedding_neardup(
        load_table(s, d, "embeddings"), threshold=0.4)
    q["d06_embedding_neardup_lsh"] = lambda s, d: similarity.embedding_neardup_lsh(
        load_table(s, d, "embeddings"), threshold=0.4)
    q["d07_neardup_clusters"] = lambda s, d: (lambda docs: dedup.neardup_clusters(
        docs, dedup.neardup_minhash_lsh(docs, threshold=0.5)))(
        load_table(s, d, "documents"))

    # benchmark decontamination: training docs (source != src0) that
    # near-dup the held-out eval set (source == src0)
    def _decontam(s, d):
        docs = load_table(s, d, "documents")
        return dedup.contamination_pairs(
            docs.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"), threshold=0.5)
    q["d08_decontamination"] = _decontam

    # SemDeDup: embedding dedup restricted to IVF cluster cells — the
    # paper's recall/cost trade (cross-cell pairs missed by design;
    # recall vs the exact d05 pair set asserted in tests).  8 cells at
    # this corpus keeps every cell pair-join-sized; production sizes
    # n_cells ∝ corpus (max_cell_rows makes degenerate clusterings
    # fail loud instead of going quadratic)
    q["d12_semantic_dedup"] = lambda s, d: similarity.semantic_dedup_pairs(
        load_table(s, d, "embeddings"), threshold=0.4, n_cells=8)

    # semantic decontamination: eval vectors (vec_id % 10 = 0, the
    # held-out convention) vs training vectors in embedding space —
    # catches paraphrased eval items no exact-overlap method sees
    def _sem_contam(s, d):
        emb = load_table(s, d, "embeddings")
        return similarity.semantic_contamination_pairs(
            emb.filter("vec_id % 10 != 0"),
            emb.filter("vec_id % 10 = 0"), threshold=0.4, n_cells=8)
    q["d15_semantic_contamination"] = _sem_contam

    # which benchmark leaked: d14's span scan attributed per eval
    # source (src0/src1 as two benchmarks vs the rest as train)
    q["d17_contamination_by_benchmark"] = lambda s, d: (
        dedup.contamination_by_benchmark(
            load_table(s, d, "documents").filter(
                ~F.col("source").isin("src0", "src1")),
            load_table(s, d, "documents").filter(
                F.col("source").isin("src0", "src1")),
            n=5))

    # provenance: NEAR-dup pair counts between every source pair
    # (LSH pairs -> two source lookups -> |sources|²-bounded agg);
    # the exact-hash variant (cross_source_matrix) is pytest-covered —
    # the synthetic corpus has no byte-identical dups to count
    q["d16_cross_source_matrix"] = lambda s, d: (
        dedup.cross_source_neardup_matrix(
            load_table(s, d, "documents"), threshold=0.5))

    # duplicated n-gram SPANS (Lee et al. ExactSubstr at 5-gram
    # granularity): which exact passages repeat across the corpus —
    # every stage linear (gram explode -> hash agg -> join-back ->
    # per-doc island merge), no pairwise candidate stage anywhere
    q["d13_duplicate_spans"] = lambda s, d: dedup.duplicate_spans(
        load_table(s, d, "documents"), n=5, min_docs=2)

    # SPAN-level decontamination: eval passages (source = src0, the
    # d08 held-out convention) quoted verbatim inside training docs —
    # catches a benchmark question embedded in an otherwise-clean
    # page, which whole-doc near-dup (d08) misses
    def _contam_spans(s, d):
        docs = load_table(s, d, "documents")
        return dedup.contaminated_spans(
            docs.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"), n=5)
    q["d14_contaminated_spans"] = _contam_spans

    # ---- similarity search ----
    q["s01_cosine_topk"] = lambda s, d: similarity.cosine_topk(
        load_table(s, d, "embeddings"), query_vec_id=7, k=10)
    # 6 planes -> 64 buckets: ~n/64 candidates per probe at any corpus
    # size with this synthetic distribution (8 planes left the probe
    # bucket empty at sf0.01 — a vacuous result set)
    q["s02_ann_lsh_topk"] = lambda s, d: similarity.ann_topk_lsh(
        load_table(s, d, "embeddings"), query_vec_id=7, k=10, num_planes=6)
    q["s03_ann_ivf_topk"] = lambda s, d: similarity.ann_topk_ivf(
        load_table(s, d, "embeddings"), query_vec_id=7, k=10)

    # the 100 TB serving path: corpus written partitioned by IVF cell,
    # probe = partition-pruned read (PartitionFilters; plan asserted in
    # tests/test_operators.py) — must return exactly what s03 returns,
    # so it shares s03's oracle
    def _ivf_layout(s, d):
        import tempfile
        key = (id(s), d)
        path = _IVF_LAYOUTS.get(key)
        if path is None:
            path = tempfile.mkdtemp(prefix="ivf_layout_") + "/emb"
            similarity.materialize_ivf(load_table(s, d, "embeddings"), path)
            _IVF_LAYOUTS[key] = path
        emb = load_table(s, d, "embeddings")
        qvec = list(emb.filter(F.col("vec_id") == 7)
                    .select("embedding").first()[0])
        return similarity.ann_topk_ivf_from_layout(
            s, path, qvec, k=10, exclude_id=7)
    q["s04_ann_ivf_layout"] = _ivf_layout

    # batched query-set serving: N queries answered in ONE job via a
    # bucket/cell equi-join (no per-query driver loop) — the shape a
    # 100 TB serving tier actually runs
    def _query_set(s, d):
        emb = load_table(s, d, "embeddings")
        return (emb.filter(F.col("vec_id").isin(list(_BATCH_QUERY_IDS)))
                .select(F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("query_vec")))
    q["s05_ann_batch_lsh"] = lambda s, d: similarity.ann_batch_topk_lsh(
        load_table(s, d, "embeddings"), _query_set(s, d), k=5, num_planes=6)
    q["s06_ann_batch_ivf"] = lambda s, d: similarity.ann_batch_topk_ivf(
        load_table(s, d, "embeddings"), _query_set(s, d), k=5)

    # batched serving from the cell-partitioned layout (s04's batched
    # analog); must return exactly what s06 returns, so it shares s06's
    # oracle
    def _batch_layout(s, d):
        import tempfile
        key = (id(s), d)
        path = _IVF_LAYOUTS.get(key)
        if path is None:
            path = tempfile.mkdtemp(prefix="ivf_layout_") + "/emb"
            similarity.materialize_ivf(load_table(s, d, "embeddings"), path)
            _IVF_LAYOUTS[key] = path
        return similarity.ann_batch_topk_from_layout(
            s, path, _query_set(s, d), k=5)
    q["s07_ann_batch_layout"] = _batch_layout

    # k-means-trained IVF layout (similarity.train_ivf_centroids —
    # Lloyd iterations as DataFrame ops).  Iterative, so no single
    # DuckDB statement replays it: registered WITHOUT an oracle_sql
    # entry on purpose (driver records the weaker rows-only check);
    # the strong checks — objective monotonicity, determinism, recall
    # >= hash-picked — live in tests/test_operators.py.
    def _ivf_trained(s, d):
        import tempfile
        key = (id(s), d, "trained")
        path = _IVF_LAYOUTS.get(key)
        if path is None:
            path = tempfile.mkdtemp(prefix="ivf_trained_") + "/emb"
            similarity.materialize_ivf(load_table(s, d, "embeddings"), path,
                                       train_iters=3)
            _IVF_LAYOUTS[key] = path
        emb = load_table(s, d, "embeddings")
        qvec = list(emb.filter(F.col("vec_id") == 7)
                    .select("embedding").first()[0])
        return similarity.ann_topk_ivf_from_layout(
            s, path, qvec, k=10, exclude_id=7)
    q["s08_ann_ivf_trained"] = _ivf_trained

    # IVF-PQ compressed serving (similarity.train_pq/pq_topk): codes
    # are 8 bytes/vector, probes ADC-score code columns only, exact
    # cosine re-ranks the top candidates.  Iterative training -> no
    # single-statement oracle (rows-only check); recall/determinism
    # asserted in tests/test_operators.py::test_pq_compressed_ann.
    def _pq(s, d):
        key = (id(s), d, "pq")
        cached = _IVF_LAYOUTS.get(key)
        if cached is None:
            emb = load_table(s, d, "embeddings")
            cb = similarity.train_pq(emb, iters=2)
            # packed=True: the serving shape — ONE bigint/vector
            codes = similarity.pq_encode(emb, cb, packed=True).persist()
            codes.count()
            cached = (cb, codes)
            _IVF_LAYOUTS[key] = cached
        cb, codes = cached
        emb = load_table(s, d, "embeddings")
        qvec = list(emb.filter(F.col("vec_id") == 7)
                    .select("embedding").first()[0])
        return similarity.pq_topk(codes, cb, qvec, k=10, rerank=50,
                                  vectors=emb, exclude_id=7)
    q["s09_ann_pq_rerank"] = _pq

    # MMR diversity rerank (r8): exact top-fetch candidates
    # (distributed TakeOrdered) then the greedy redundancy-penalized
    # selection over the k-scale candidate set — iterative, so golden-
    # checked (scripts/make_golden.py) like the trained-IVF paths
    q["s11_mmr_rerank"] = lambda s, d: similarity.mmr_rerank(
        load_table(s, d, "embeddings"), query_vec_id=7, k=10, fetch=50,
        lam=0.7)

    # JL random projection (64 -> 16 integer dims) + brute cosine
    # top-k on the PROJECTED vectors — the width-reduction scale path;
    # integer projection replays bit-for-bit in the oracle
    q["s10_projected_topk"] = lambda s, d: similarity.cosine_topk(
        similarity.random_project(load_table(s, d, "embeddings")),
        query_vec_id=7, k=10, vec_col="projected")

    # ---- multimodal plumbing (binary payload -> mapInPandas features) ----
    q["m01_media_features"] = lambda s, d: _media_features(s, d)

    # perceptual image near-dup (dHash): PNGs generated with CELL-
    # ALIGNED 2x2 blocks (w=18,h=16 vs the 9x8 dHash grid) and
    # r=g=b, so the decode -> grayscale -> block-average -> bit
    # pipeline reduces to pure integer arithmetic the oracle replays
    # WITHOUT a codec — a hash match proves the whole chain, banding
    # join and hamming verify included.  Odd ids perturb one cell of
    # their even neighbor's pattern (hamming <= 1 by construction).
    def _media_phash_pairs(s, d):
        import pandas as pd

        from mondrian_rest_spark.operators import media_codec, multimodal

        docs = load_table(s, d, "documents").filter(F.col("doc_id") < 64)

        def gen(batches):
            for pdf in batches:
                payloads = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    p = i - (i % 2)
                    px = bytearray()
                    for y in range(16):
                        cy = y // 2
                        for x in range(18):
                            cx = x // 2
                            v = (p * 31 + cy * 17 + cx * 29) % 256
                            if i % 2 == 1 and cy == 0 and cx == 0:
                                v = (v + 40) % 256
                            px += bytes((v, v, v))
                    payloads.append(
                        media_codec.png_encode(bytes(px), 18, 16, 3))
                yield pd.DataFrame({
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/png"})

        media = docs.select("doc_id").mapInPandas(
            gen, schema=multimodal.MEDIA_SCHEMA)
        return (multimodal.image_neardup_dhash(media, max_hamming=3)
                .orderBy("a_id", "b_id"))
    q["m05_image_phash_pairs"] = _media_phash_pairs

    # perceptual AUDIO near-dup (energy-envelope hash): WAVs generated
    # with FRAME-ALIGNED constant amplitudes (65 frames x 4 samples),
    # so decode -> abs-mean -> bits reduces to pure arithmetic for the
    # oracle, codec-free — the audio twin of m05.  Odd ids perturb
    # frame 0 of their even neighbor's envelope.
    def _media_ahash_pairs(s, d):
        import pandas as pd

        from mondrian_rest_spark.operators import media_codec, multimodal

        docs = load_table(s, d, "documents").filter(F.col("doc_id") < 64)

        def gen(batches):
            for pdf in batches:
                payloads = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    p = i - (i % 2)
                    samples = []
                    for f in range(65):
                        v = ((p * 37 + f * 53) % 2048) - 1024
                        if i % 2 == 1 and f == 0:
                            v = ((p * 37 + 700) % 2048) - 1024
                        samples += [v] * 4
                    payloads.append(media_codec.wav_encode(samples))
                yield pd.DataFrame({
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "payload": payloads,
                    "mime": "audio/wav"})

        media = docs.select("doc_id").mapInPandas(
            gen, schema=multimodal.MEDIA_SCHEMA)
        return (multimodal.audio_neardup_hash(media, max_hamming=3)
                .orderBy("a_id", "b_id"))
    q["m06_audio_ahash_pairs"] = _media_ahash_pairs

    # REAL image decode (r6 VERDICT item 4): PNG payloads built
    # deterministically from doc_id (pure-stdlib encoder), then decoded
    # back through operators/media_codec.png_decode's full
    # inflate+unfilter pipeline inside extract_features' mapInPandas.
    # The oracle recomputes dims and the mean pixel arithmetically, so
    # a hash match proves the decoder reproduced the actual pixels.
    def _media_decode(s, d):
        import pandas as pd

        from mondrian_rest_spark.operators import media_codec, multimodal

        docs = load_table(s, d, "documents").filter(F.col("doc_id") < 64)

        def gen(batches):
            for pdf in batches:
                payloads = []
                for i in pdf["doc_id"]:
                    w, h = 4 + int(i) % 13, 3 + int(i) % 7
                    px = bytes((int(i) + j) % 256 for j in range(w * h * 3))
                    payloads.append(media_codec.png_encode(px, w, h, 3))
                yield pd.DataFrame({
                    "media_id": pdf["doc_id"], "kind": "image",
                    "payload": payloads, "mime": "image/png"})

        media = docs.select("doc_id").mapInPandas(
            gen, schema=multimodal.MEDIA_SCHEMA)
        return (multimodal.extract_features(media)
                .select("media_id", "width", "height", "channels",
                        "mean_px"))
    q["m02_media_decode"] = _media_decode

    # JPEG SOF-header dims (VERDICT r7 #5): pure-stdlib marker walk —
    # header-exact width/height/components with no entropy decode, so
    # it works for baseline AND progressive JPEGs while reading only
    # header bytes.  The oracle recomputes the dims arithmetically.
    def _media_jpeg(s, d):
        import pandas as pd

        from mondrian_rest_spark.operators import media_codec, multimodal

        docs = load_table(s, d, "documents").filter(F.col("doc_id") < 64)

        def gen(batches):
            for pdf in batches:
                payloads = [media_codec.jpeg_header(
                    16 + int(i) % 1009, 9 + int(i) % 701,
                    3 if int(i) % 4 else 1) for i in pdf["doc_id"]]
                yield pd.DataFrame({
                    "media_id": pdf["doc_id"], "kind": "image",
                    "payload": payloads, "mime": "image/jpeg"})

        media = docs.select("doc_id").mapInPandas(
            gen, schema=multimodal.MEDIA_SCHEMA)
        return (multimodal.extract_features(media)
                .select("media_id", "width", "height", "channels"))
    q["m03_media_jpeg_dims"] = _media_jpeg

    # GIF/BMP/MP3 header parses (r8): dims from the GIF screen
    # descriptor / BMP BITMAPINFOHEADER, rate+channels+CBR duration
    # from the first MPEG-1 Layer III frame sync — all pure-stdlib
    # byte walks; oracle recomputes every field arithmetically
    def _media_mixed(s, d):
        import pandas as pd

        from mondrian_rest_spark.operators import media_codec, multimodal

        docs = load_table(s, d, "documents").filter(F.col("doc_id") < 96)

        def gen(batches):
            for pdf in batches:
                rows = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    if i % 3 == 0:
                        p, k, m = (media_codec.gif_header(
                            10 + i % 97, 5 + i % 53), "image", "image/gif")
                    elif i % 3 == 1:
                        p, k, m = (media_codec.bmp_header(
                            8 + i % 89, 6 + i % 31, 32 if i % 2 else 24),
                            "image", "image/bmp")
                    else:
                        p, k, m = (media_codec.mp3_frames(
                            2 + i % 5, 128, 44100, 1 if i % 2 else 2),
                            "audio", "audio/mpeg")
                    rows.append((i, k, p, m))
                yield pd.DataFrame(
                    rows, columns=["media_id", "kind", "payload", "mime"])

        media = docs.select("doc_id").mapInPandas(
            gen, schema=multimodal.MEDIA_SCHEMA)
        return (multimodal.extract_features(media)
                .select("media_id", "width", "height", "channels",
                        "duration_ms"))
    q["m04_media_mixed_headers"] = _media_mixed

    # ---- composed cleaning pipeline (the end-to-end use case) ----
    def _clean(s, d):
        from mondrian_rest_spark.operators import pipeline
        return pipeline.clean_corpus(load_table(s, d, "documents"))
    q["c01_clean_corpus"] = _clean

    # curation: best-k docs per language, and greedy per-language
    # token-budget packing (how a fixed-size training mix is filled)
    def _top_docs(s, d):
        from mondrian_rest_spark.operators import pipeline
        return pipeline.top_docs_per_stratum(
            load_table(s, d, "documents"), k=50)
    q["c02_top_docs_per_lang"] = _top_docs

    def _pack(s, d):
        from mondrian_rest_spark.operators import pipeline
        return pipeline.pack_token_budget(
            load_table(s, d, "documents"), budget_tokens=5000)
    q["x03_token_budget_pack"] = _pack

    # ---- text analysis ----
    q["t01_token_stats"] = lambda s, d: textstats.token_stats(
        load_table(s, d, "documents"))
    q["t02_language_id"] = lambda s, d: textstats.language_id(
        load_table(s, d, "documents"))
    q["t03_quality_score"] = lambda s, d: textstats.quality_score(
        load_table(s, d, "documents"))
    q["t04_fingerprint"] = lambda s, d: textstats.fingerprint(
        load_table(s, d, "documents"))
    q["t05_corpus_stats"] = lambda s, d: textstats.corpus_stats(
        load_table(s, d, "documents"))
    q["t06_top_tokens"] = lambda s, d: textstats.top_tokens(
        load_table(s, d, "documents"), k=20)
    q["t07_length_histogram"] = lambda s, d: textstats.length_histogram(
        load_table(s, d, "documents"), bucket_tokens=50)
    q["t08_source_stats"] = lambda s, d: textstats.source_stats(
        load_table(s, d, "documents"))
    q["t09_language_confusion"] = lambda s, d: textstats.language_confusion(
        load_table(s, d, "documents"))

    # within-document n-gram repetition (boilerplate/keyword-stuffing
    # quality signal) — one projection, higher-order functions only
    q["t10_repetition_ratio"] = lambda s, d: textstats.repetition_ratio(
        load_table(s, d, "documents"))

    # PII scrubbing pass with per-doc audit counts — codegen
    # regexp_replace over shared Java/RE2-safe patterns
    q["t11_pii_redaction"] = lambda s, d: textstats.redact_pii(
        load_table(s, d, "documents"))

    # reproducible hash-based train/val/test split (training pipeline
    # staple; engine-portable md5 bucketing, so DuckDB replays it)
    def _split(s, d):
        from mondrian_rest_spark.operators import sampling
        return sampling.split_counts(load_table(s, d, "documents"),
                                     val_frac=0.1, test_frac=0.05)
    q["x01_train_val_split"] = _split

    # deterministic stratified downsampling by predicted language:
    # per-stratum md5-bucket keep rates (partitioning-independent,
    # unlike DataFrame.sampleBy's rand), so DuckDB replays the exact
    # kept set
    def _stratified(s, d):
        from mondrian_rest_spark.operators import sampling
        docs = load_table(s, d, "documents")
        langs = textstats.language_id(docs).select("doc_id",
                                                   "predicted_lang")
        out = sampling.stratified_sample(
            docs.join(langs, "doc_id"), "predicted_lang",
            {"en": 0.5, "unknown": 0.05}, default_frac=0.2)
        return out.select("doc_id", "predicted_lang")
    q["x02_stratified_sample"] = _stratified

    # target-mixture downsampling (r8): per-stratum keep rates derived
    # from corpus counts so the KEPT corpus hits the declared source
    # proportions with maximum retention (binding stratum keeps all);
    # md5-bucket determinism, replayed exactly by the oracle
    def _mixture(s, d):
        from mondrian_rest_spark.operators import sampling
        return sampling.mixture_sample(
            load_table(s, d, "documents"), "lang",
            {"en": 0.5, "de": 0.25, "fr": 0.25},
            salt="mix-v1").select("doc_id", "lang")
    q["x04_mixture_sample"] = _mixture

    # sliding-window chunking (r9): long documents -> overlapping
    # context-window-sized training examples; pure per-row JVM codegen
    # (split + transform(sequence) + posexplode), zero shuffles
    q["x05_chunk_windows"] = lambda s, d: __import__(
        "mondrian_rest_spark.operators.pipeline",
        fromlist=["chunk_windows"]).chunk_windows(
        load_table(s, d, "documents"), window=64, stride=48)

    # token-budget chunking (r10, VERDICT r9 #8): window/stride in
    # tokenizer units (the token_stats BPE-ish subword pieces), the
    # way real pipelines size context windows; same zero-shuffle
    # split + transform(sequence) + posexplode plan
    q["x06_chunk_token_windows"] = lambda s, d: __import__(
        "mondrian_rest_spark.operators.pipeline",
        fromlist=["chunk_token_windows"]).chunk_token_windows(
        load_table(s, d, "documents"), window=64, stride=48)

    # ExactSubstr dedup ACTION: cut the duplicated spans out of the
    # text, keep the rest of the document (d13's spans composed with
    # a doc-keyed coverage join + position-ordered reassembly)
    q["x07_trim_duplicate_spans"] = lambda s, d: __import__(
        "mondrian_rest_spark.operators.pipeline",
        fromlist=["trim_duplicate_spans"]).trim_duplicate_spans(
        load_table(s, d, "documents"), n=5, min_docs=2)

    # operational decontamination policy: drop docs over the
    # contamination fraction, trim the eval spans out of the rest
    def _decontam_corpus(s, d):
        from mondrian_rest_spark.operators.pipeline import (
            decontaminate_corpus)
        docs = load_table(s, d, "documents")
        return decontaminate_corpus(
            docs.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"),
            n=5, max_fraction=0.2)
    q["x09_decontaminate_corpus"] = _decontam_corpus

    # temperature-scaled multinomial mixing (the mBERT/XLM-R/mT5
    # scheme, alpha=0.5): per-stratum sampling probability and the
    # per-doc repetition factor a sampler would apply
    q["x10_mixture_temperature"] = lambda s, d: __import__(
        "mondrian_rest_spark.operators.sampling",
        fromlist=["mixture_weights_temperature"]
    ).mixture_weights_temperature(
        load_table(s, d, "documents"), alpha=0.5, group_col="lang")

    # Gopher-style hard quality gate (rule battery with per-rule audit
    # flags); thresholds tuned to the synthetic corpus so every rule
    # discriminates (word-count 30+, >=1 distinct common stopword)
    q["x11_gopher_rules"] = lambda s, d: textstats.gopher_rules(
        load_table(s, d, "documents"), min_tokens=30,
        min_stopword_hits=1)

    # CCNet head/middle/tail split: NTILE bands over self-perplexity
    # bits-per-token, keep head+middle (the CCNet training slice)
    q["x12_perplexity_filter"] = lambda s, d: textstats.perplexity_filter(
        load_table(s, d, "documents"), n_buckets=3, keep_buckets=(1, 2))

    # corpus sink: write the Hive-partitioned curated layout, then
    # read the manifest back FROM THE FILES (n_files is layout
    # evidence the SQL oracle can't see — compared via pytest instead)
    def _curated_layout(s, d):
        import tempfile
        key = ("curated", s.sparkContext.applicationId, d)
        path = _LAYOUT_CACHE.get(key)
        if path is None:
            path = tempfile.mkdtemp(prefix="curated_") + "/docs"
            pipeline.write_curated_corpus(
                load_table(s, d, "documents"), path)
            _LAYOUT_CACHE[key] = path
        return pipeline.corpus_manifest(s, path).select(
            "lang", "n_docs", "n_chars")
    q["x13_curated_layout"] = _curated_layout

    # DSIR-style importance resampling (arXiv:2302.03169): keep the
    # quarter of the corpus whose hashed-bigram profile looks most
    # like the English target slice, ranked by the integer log2-proxy
    # importance weight (engine-portable — no ln())
    q["x08_dsir_sample"] = lambda s, d: __import__(
        "mondrian_rest_spark.operators.sampling",
        fromlist=["dsir_sample"]).dsir_sample(
        load_table(s, d, "documents"), target_filter="lang = 'en'",
        frac=0.25, dim=64)

    # JSON catalog calc members declared as MDX FORMULAS (r8) — the
    # reference XML CalculatedMember formula form, resolved at bind
    # time through the WITH MEMBER grammar (arith + measure tuple)
    def _json_catalog_formula(s, d):
        from mondrian_rest_spark.catalog_json import catalog_from_json
        from mondrian_rest_spark.planner import aggregate as agg2
        from mondrian_rest_spark.query import QueryModel
        cat2 = catalog_from_json("/root/repo/catalogs/corpus.json")
        return agg2(s, d, cat2, QueryModel(
            cube="Documents",
            measures=["Doc Count", "Avg Doc Size", "EN Chars"],
            drilldown=["Source"], nonempty=True))
    q["j02_json_formula_calc"] = _json_catalog_formula

    # ---- declarative JSON catalog (catalogs/corpus.json; reference
    # ---- binds schemas from XML files, api_helpers.rb:10-16) ----
    def _json_catalog(s, d):
        from mondrian_rest_spark.catalog_json import catalog_from_json
        from mondrian_rest_spark.planner import aggregate as agg2
        from mondrian_rest_spark.query import QueryModel
        cat = catalog_from_json("/root/repo/catalogs/corpus.json")
        return agg2(s, d, cat, QueryModel(
            cube="Documents",
            measures=["Doc Count", "Total Chars", "Chars per Doc"],
            drilldown=["Language", "Source"], nonempty=True))
    q["j01_json_catalog_agg"] = _json_catalog

    return q


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------

# -- approximate-operator oracle builders ----------------------------------
# The LSH / IVF / SimHash operators are *engine-portable by design*
# (integer quantization + literal hyperplanes + md5-digit token hashes —
# see operators/similarity.py module docstring), so DuckDB can replay
# the exact candidate generation and the driver hash-checks them like
# any exact query.  The plane literals below are derived from the same
# seeded generator the Spark plans use.

_QV = ("list_transform(embedding::DOUBLE[], "
       "x -> CAST(floor(x * 1000000) AS BIGINT))")


def _duck_idot(qcol: str, plane: list[int]) -> str:
    lit = "[" + ",".join(str(p) for p in plane) + "]"
    return (f"list_sum(list_transform(range(1, {len(plane) + 1}), "
            f"i -> {qcol}[i] * ({lit})[i]))")


def _duck_bucket(qcol: str, planes: list[list[int]]) -> str:
    n = len(planes)
    terms = " + ".join(
        f"(CASE WHEN {_duck_idot(qcol, pl)} > 0 "
        f"THEN {1 << (n - 1 - i)} ELSE 0 END)"
        for i, pl in enumerate(planes))
    return f"({terms})"


def _oracle_ann_lsh(query_vec_id: int = 7, k: int = 10,
                    num_planes: int = 6) -> str:
    planes = similarity.hyperplanes(num_planes, 64, similarity.LSH_SEED)
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ev, {_QV} AS qv
                     FROM embeddings),
        sig AS (SELECT vec_id, ev, {_duck_bucket('qv', planes)} AS bucket
                FROM emb)
        SELECT s.vec_id, round(list_cosine_similarity(s.ev, q.ev), 6) AS cosine
        FROM sig s JOIN sig q
          ON q.vec_id = {query_vec_id} AND s.bucket = q.bucket
         AND s.vec_id <> {query_vec_id}
        ORDER BY cosine DESC, s.vec_id LIMIT {k}"""


def _oracle_projected_topk(query_vec_id: int = 7, k: int = 10,
                           out_dim: int = 16) -> str:
    """JL projection replay: the same seeded integer planes, exact
    BIGINT dots, cosine on the projected vectors."""
    planes = similarity.hyperplanes(out_dim, 64, similarity.PROJ_SEED)
    proj = ", ".join(_duck_idot("qv", pl) for pl in planes)
    return f"""
        WITH emb AS (SELECT vec_id, {_QV} AS qv FROM embeddings),
        pv AS (SELECT vec_id, [{proj}]::DOUBLE[] AS p FROM emb)
        SELECT s.vec_id, round(list_cosine_similarity(s.p, q.p), 6) AS cosine
        FROM pv s JOIN pv q ON q.vec_id = {query_vec_id}
        WHERE s.vec_id <> {query_vec_id}
        ORDER BY cosine DESC, s.vec_id LIMIT {k}"""


_MD5_FOLD8 = ("list_reduce(list_transform(range(1, 9), "
              "i -> CAST(strpos('0123456789abcdef', "
              "substring(md5({expr}), i, 1)) - 1 AS BIGINT)), "
              "(x, y) -> x * 16 + y)")


def _oracle_hashed_features(dim: int = 32, n: int = 2) -> str:
    """Hashed bigram bucket counts, exploded dense (zeros included)."""
    fold = _MD5_FOLD8.format(expr="gram")
    return f"""
        WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
        g AS (SELECT doc_id,
                     unnest(list_transform(
                       range(1, greatest(len(toks) - {n - 1}, 0) + 1),
                       i -> array_to_string(toks[i:i+{n - 1}], ' ')))
                       AS gram
              FROM t),
        c AS (SELECT doc_id, {fold} % {dim} AS bucket, COUNT(*) AS cnt
              FROM g GROUP BY 1, 2)
        SELECT d.doc_id, CAST(idx.i AS INTEGER) AS feature_idx,
               COALESCE(c.cnt, 0) AS count
        FROM documents d
        CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) idx
        LEFT JOIN c ON c.doc_id = d.doc_id AND c.bucket = idx.i"""


def _oracle_neardup_lsh(threshold: float = 0.4) -> str:
    planes = similarity.hyperplanes(24, 64, similarity.NEARDUP_SEED)
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{_duck_bucket('qv', planes[t * 3:(t + 1) * 3])} AS bucket FROM emb"
        for t in range(8))
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ev, {_QV} AS qv
                     FROM embeddings),
        b AS ({per_table}),
        cand AS (SELECT DISTINCT a.vec_id AS a_id, bb.vec_id AS b_id
                 FROM b a JOIN b bb
                   ON a.tbl = bb.tbl AND a.bucket = bb.bucket
                  AND a.vec_id < bb.vec_id)
        SELECT a_id, b_id, cosine FROM (
          SELECT a_id, b_id,
                 round(list_cosine_similarity(ea.ev, eb.ev), 6) AS cosine
          FROM cand JOIN emb ea ON ea.vec_id = cand.a_id
               JOIN emb eb ON eb.vec_id = cand.b_id)
        WHERE cosine >= {threshold}"""


def _oracle_ann_ivf(query_vec_id: int = 7, k: int = 10,
                    n_cells: int = 16, n_probe: int = 4) -> str:
    d2 = ("list_sum(list_transform(range(1, 65), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ev, {_QV} AS qv
                     FROM embeddings),
        cents AS (SELECT vec_id AS cell_id, qv AS cq FROM emb
                  ORDER BY (vec_id::BIGINT * 2654435761) % 4294967296, vec_id
                  LIMIT {n_cells}),
        assigned AS (
          SELECT vec_id, ev, cell_id FROM (
            SELECT e.vec_id, e.ev, c.cell_id,
                   {d2.format(a='e.qv', b='c.cq')} AS d2
            FROM emb e CROSS JOIN cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cell_id) = 1),
        probe AS (
          SELECT c.cell_id, {d2.format(a='c.cq', b='q.qv')} AS d2
          FROM cents c JOIN emb q ON q.vec_id = {query_vec_id}
          ORDER BY d2, c.cell_id LIMIT {n_probe})
        SELECT a.vec_id, round(list_cosine_similarity(a.ev, q.ev), 6) AS cosine
        FROM assigned a JOIN probe p ON a.cell_id = p.cell_id
             JOIN emb q ON q.vec_id = {query_vec_id}
        WHERE a.vec_id <> {query_vec_id}
        ORDER BY cosine DESC, a.vec_id LIMIT {k}"""


#: query-set for the batched ANN entries (corpus members by id, the
#: same query-by-member convention as s01-s04)
_BATCH_QUERY_IDS = (3, 7, 11, 19, 23)


def _oracle_semantic_dedup(threshold: float = 0.4, n_cells: int = 8) -> str:
    """DuckDB replay of SemDeDup: the integer centroid pick + argmin
    cell assignment are the s03 oracle's, then all within-cell pairs
    above the cosine threshold."""
    d2 = ("list_sum(list_transform(range(1, 65), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ev, {_QV} AS qv
                     FROM embeddings),
        cents AS (SELECT vec_id AS cell_id, qv AS cq FROM emb
                  ORDER BY (vec_id::BIGINT * 2654435761) % 4294967296, vec_id
                  LIMIT {n_cells}),
        assigned AS (
          SELECT vec_id, ev, cell_id FROM (
            SELECT e.vec_id, e.ev, c.cell_id,
                   {d2.format(a='e.qv', b='c.cq')} AS d2
            FROM emb e CROSS JOIN cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cell_id) = 1)
        SELECT a_id, b_id, cell_id, cosine FROM (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cell_id,
                 round(list_cosine_similarity(a.ev, b.ev), 6) AS cosine
          FROM assigned a JOIN assigned b
               ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id)
        WHERE cosine >= {threshold}"""


def _oracle_semantic_contamination(threshold: float = 0.4,
                                   n_cells: int = 8) -> str:
    """DuckDB replay of cross-set SemDeDup: centroids hash-picked
    from the TRAIN side, both sets argmin-assigned, train×eval pairs
    within cells."""
    d2 = ("list_sum(list_transform(range(1, 65), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ev, {_QV} AS qv
                     FROM embeddings),
        tr AS (SELECT * FROM emb WHERE vec_id % 10 <> 0),
        ev2 AS (SELECT * FROM emb WHERE vec_id % 10 = 0),
        cents AS (SELECT vec_id AS cell_id, qv AS cq FROM tr
                  ORDER BY (vec_id::BIGINT * 2654435761) % 4294967296, vec_id
                  LIMIT {n_cells}),
        at AS (
          SELECT vec_id, ev, cell_id FROM (
            SELECT e.vec_id, e.ev, c.cell_id,
                   {d2.format(a='e.qv', b='c.cq')} AS d2
            FROM tr e CROSS JOIN cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cell_id) = 1),
        ae AS (
          SELECT vec_id, ev, cell_id FROM (
            SELECT e.vec_id, e.ev, c.cell_id,
                   {d2.format(a='e.qv', b='c.cq')} AS d2
            FROM ev2 e CROSS JOIN cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cell_id) = 1)
        SELECT train_id, eval_id, cell_id, cosine FROM (
          SELECT a.vec_id AS train_id, b.vec_id AS eval_id, a.cell_id,
                 round(list_cosine_similarity(a.ev, b.ev), 6) AS cosine
          FROM at a JOIN ae b ON a.cell_id = b.cell_id)
        WHERE cosine >= {threshold}"""


def _oracle_ann_batch_lsh(query_ids=_BATCH_QUERY_IDS, k: int = 5,
                          num_planes: int = 6) -> str:
    planes = similarity.hyperplanes(num_planes, 64, similarity.LSH_SEED)
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ev, {_QV} AS qv
                     FROM embeddings),
        sig AS (SELECT vec_id, ev, {_duck_bucket('qv', planes)} AS bucket
                FROM emb)
        SELECT query_id, vec_id, cosine FROM (
          SELECT q.vec_id AS query_id, s.vec_id,
                 round(list_cosine_similarity(s.ev, q.ev), 6) AS cosine
          FROM sig s JOIN sig q ON s.bucket = q.bucket
          WHERE q.vec_id IN ({ids}) AND s.vec_id <> q.vec_id)
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) <= {k}"""


def _oracle_ann_batch_ivf(query_ids=_BATCH_QUERY_IDS, k: int = 5,
                          n_cells: int = 16, n_probe: int = 4) -> str:
    d2 = ("list_sum(list_transform(range(1, 65), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS ev, {_QV} AS qv
                     FROM embeddings),
        cents AS (SELECT vec_id AS cell_id, qv AS cq FROM emb
                  ORDER BY (vec_id::BIGINT * 2654435761) % 4294967296, vec_id
                  LIMIT {n_cells}),
        assigned AS (
          SELECT vec_id, ev, cell_id FROM (
            SELECT e.vec_id, e.ev, c.cell_id,
                   {d2.format(a='e.qv', b='c.cq')} AS d2
            FROM emb e CROSS JOIN cents c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cell_id) = 1),
        probe AS (
          SELECT query_id, cell_id FROM (
            SELECT q.vec_id AS query_id, c.cell_id,
                   {d2.format(a='c.cq', b='q.qv')} AS pd2
            FROM cents c CROSS JOIN emb q WHERE q.vec_id IN ({ids}))
          QUALIFY row_number() OVER (PARTITION BY query_id
                                     ORDER BY pd2, cell_id) <= {n_probe})
        SELECT query_id, vec_id, cosine FROM (
          SELECT p.query_id, a.vec_id,
                 round(list_cosine_similarity(a.ev, q.ev), 6) AS cosine
          FROM assigned a JOIN probe p ON a.cell_id = p.cell_id
               JOIN emb q ON q.vec_id = p.query_id
          WHERE a.vec_id <> p.query_id)
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) <= {k}"""


def _oracle_simhash(max_hamming: int = 3) -> str:
    dig = ("list_reduce(list_transform(range(1, 16), "
           "i -> CAST(strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1 "
           "AS BIGINT)), (x, y) -> x * 16 + y)")
    sums = ", ".join(
        f"SUM((h >> {i}) & 1) AS s{i}" for i in range(60))
    bits = " + ".join(
        f"(CASE WHEN 2 * s{i} > n THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(60))
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS t
          FROM documents),
        th AS (SELECT doc_id, {dig} AS h FROM tok WHERE t <> ''),
        votes AS (SELECT doc_id, COUNT(*) AS n, {sums} FROM th GROUP BY doc_id),
        sh AS (SELECT doc_id, {bits} AS simhash FROM votes),
        ch AS (SELECT doc_id, simhash, c, (simhash >> (c * 15)) & 32767 AS v
               FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c) cc),
        cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                        a.simhash AS ha, b.simhash AS hb
                 FROM ch a JOIN ch b
                   ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id)
        SELECT a_id, b_id, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}"""


def _oracle_clean_corpus(threshold: float = 0.5, min_quality: float = 0.75,
                         languages: tuple[str, ...] = ("en",)) -> str:
    """Replays operators/pipeline.clean_corpus: exact dedup -> near-dup
    components keep-one -> quality gate -> language gate.  Built from
    the proven d01/d07/t02/t03 oracle fragments, scoped to the kept
    set at each stage."""
    sw = lambda lang: ", ".join(f"'{w}'" for w in textstats.STOPWORDS[lang])
    langs = ", ".join(f"'{l}'" for l in languages)
    return f"""
        WITH RECURSIVE
        k1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        d AS (SELECT doc_id, text FROM documents
              WHERE doc_id IN (SELECT doc_id FROM k1)),
        sh AS (
          SELECT doc_id, list_distinct(
              [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
               for i in range(1, len(w) - 1)]) AS s
          FROM (SELECT doc_id, {TOKENS} AS w FROM d) WHERE len(w) >= 3),
        p AS (
          SELECT a_id, b_id FROM (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   len(list_intersect(a.s, b.s)) * 1.0 /
                   len(list_distinct(list_concat(a.s, b.s))) AS j
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
          WHERE j >= {threshold}),
        e AS (SELECT a_id AS x, b_id AS y FROM p
              UNION SELECT b_id, a_id FROM p),
        reach(s2, t2) AS (
          SELECT doc_id, doc_id FROM d
          UNION
          SELECT r.s2, e.y FROM reach r JOIN e ON r.t2 = e.x),
        cl AS (SELECT s2 AS doc_id, MIN(t2) AS cluster FROM reach GROUP BY s2),
        kept AS (SELECT d.doc_id, d.text FROM d
                 JOIN cl ON d.doc_id = cl.doc_id AND d.doc_id = cl.cluster),
        q AS (
          SELECT doc_id,
                 round((CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END) +
                       (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END) +
                       (CASE WHEN mean_word_len BETWEEN 3 AND 12
                             THEN 0.25 ELSE 0.0 END) +
                       (CASE WHEN stopword_ratio >= 0.02
                             THEN 0.25 ELSE 0.0 END), 2) AS quality
          FROM (
            SELECT doc_id,
                   CAST(len({TOKENS}) AS INTEGER) AS n_tokens,
                   round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(list_filter({TOKENS},
                         t -> list_contains([{sw('en')}], t))) * 1.0 /
                         greatest(len({TOKENS}), 1), 6) AS stopword_ratio,
                   round(list_sum(list_transform({TOKENS}, t -> length(t)))
                         * 1.0 / greatest(len({TOKENS}), 1), 6) AS mean_word_len
            FROM kept)),
        l AS (
          SELECT doc_id,
                 CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
                      THEN 'unknown'
                      WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                      THEN 'en'
                      WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                      THEN 'de'
                      WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                      THEN 'fr'
                      ELSE 'es' END AS predicted_lang
          FROM (
            SELECT doc_id,
                   CAST(len(list_intersect({TOKENS}, [{sw('en')}])) AS INTEGER) AS en_hits,
                   CAST(len(list_intersect({TOKENS}, [{sw('de')}])) AS INTEGER) AS de_hits,
                   CAST(len(list_intersect({TOKENS}, [{sw('fr')}])) AS INTEGER) AS fr_hits,
                   CAST(len(list_intersect({TOKENS}, [{sw('es')}])) AS INTEGER) AS es_hits
            FROM kept))
        SELECT kept.doc_id, q.quality, l.predicted_lang
        FROM kept JOIN q USING (doc_id) JOIN l USING (doc_id)
        WHERE q.quality >= {min_quality} AND l.predicted_lang IN ({langs})"""


def oracle_sql() -> dict[str, str]:
    sw = lambda lang: ", ".join(f"'{w}'" for w in textstats.STOPWORDS[lang])
    shingles = (
        "SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
        "for i in range(1, len(w) - 1)]) AS s "
        f"FROM (SELECT doc_id, {TOKENS} AS w FROM documents) "
        "WHERE len(w) >= 3")
    neardup = f"""
        WITH sh AS ({shingles})
        SELECT a_id, b_id, jaccard FROM (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 round(len(list_intersect(a.s, b.s)) * 1.0 /
                       len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        WHERE jaccard >= 0.5"""
    neardup_cross = f"""
        WITH sh AS ({shingles})
        SELECT new_id, hist_id, jaccard FROM (
          SELECT a.doc_id AS new_id, b.doc_id AS hist_id,
                 round(len(list_intersect(a.s, b.s)) * 1.0 /
                       len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
          FROM sh a JOIN sh b
            ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
        WHERE jaccard >= 0.5"""

    return {
        "q01_totals": f"""
            SELECT {DEC('l_quantity')} AS sum_qty,
                   {DEC('l_extendedprice')} AS sum_price,
                   COUNT(l_linenumber) AS line_count,
                   COUNT(DISTINCT o_custkey) AS customer_count,
                   {REVENUE} AS revenue,
                   MAX(l_quantity) AS max_qty,
                   ROUND({DEC('l_discount')} / COUNT(l_linenumber), 6) AS avg_disc
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
        "q02_region_revenue": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   {REVENUE} AS revenue
            FROM {J_CUST} GROUP BY 1, 2""",
        "q03_crossjoin_3d": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   l_returnflag,
                   CAST(year(l_shipdate) AS INTEGER) AS "year",
                   {REVENUE} AS revenue, COUNT(l_linenumber) AS line_count
            FROM {J_CUST} GROUP BY 1, 2, 3, 4""",
        "q04_cut_member": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {DEC('l_quantity')} AS sum_qty,
                   COUNT(l_linenumber) AS line_count,
                   COUNT(DISTINCT o_custkey) AS customer_count
            FROM {J_CUST} WHERE r_regionkey = 2 GROUP BY 1, 2""",
        "q05_cut_set": f"""
            SELECT CAST(year(l_shipdate) AS INTEGER) AS "year", {REVENUE} AS revenue
            FROM {J_CUST} WHERE r_name IN ('AMERICA', 'EUROPE') GROUP BY 1""",
        "q06_cut_range": f"""
            SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                   CAST(quarter(l_shipdate) AS INTEGER) AS "quarter",
                   CAST(month(l_shipdate) AS INTEGER) AS "month",
                   {REVENUE} AS revenue
            FROM lineitem WHERE year(l_shipdate) BETWEEN 1996 AND 1998
            GROUP BY 1, 2, 3""",
        "q07_tuple_slicer": f"""
            SELECT p_brand, {REVENUE} AS revenue
            FROM {J_CUST} JOIN part ON l_partkey = p_partkey
            WHERE r_name = 'ASIA' AND l_returnflag = 'R' GROUP BY 1""",
        "q08_descendants_union": f"""
            SELECT c_custkey, c_name, {REVENUE} AS revenue
            FROM {J_CUST} WHERE r_regionkey IN (2, 3) GROUP BY 1, 2""",
        "q09_having": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue, COUNT(l_linenumber) AS line_count
            FROM {J_CUST} GROUP BY 1, 2
            HAVING {REVENUE} > 20000000""",
        "q10_order_limit": f"""
            SELECT p_brand, {REVENUE} AS revenue
            FROM {J_PART} GROUP BY 1
            ORDER BY revenue DESC, p_brand LIMIT 5 OFFSET 2""",
        "q11_order_property": f"""
            SELECT s_suppkey, s_name, s_acctbal, {DEC('l_quantity')} AS sum_qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1, 2, 3 ORDER BY s_acctbal DESC, s_suppkey LIMIT 5""",
        "q12_distinct_count": f"""
            SELECT n_nationkey AS supp_nation_key, n_name AS supp_nation,
                   COUNT(DISTINCT o_custkey) AS customer_count,
                   COUNT(l_linenumber) AS line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2""",
        "q13_year_revenue": f"""
            SELECT CAST(year(l_shipdate) AS INTEGER) AS "year", {REVENUE} AS revenue
            FROM lineitem GROUP BY 1""",
        "q14_calc_member": f"""
            SELECT p_brand, sum_price, line_count,
                   sum_price / line_count AS avg_price
            FROM (SELECT p_brand, {DEC('l_extendedprice')} AS sum_price,
                         COUNT(l_linenumber) AS line_count
                  FROM {J_PART} GROUP BY 1)""",
        "q15_lag_prev_period": f"""
            WITH agg AS (
              SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                     CAST(year(l_shipdate) AS INTEGER) AS "year",
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2, 3)
            SELECT cust_region_key, cust_region, "year", revenue,
                   lag(revenue) OVER (PARTITION BY cust_region_key
                                      ORDER BY "year") AS revenue_prev
            FROM agg""",
        "q16_named_set_topcount": f"""
            WITH top5 AS (
              SELECT o_custkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_custkey
              ORDER BY {REVENUE} DESC, o_custkey LIMIT 5)
            SELECT c_custkey, c_name, {REVENUE} AS revenue,
                   {DEC('l_quantity')} AS sum_qty
            FROM {J_CUST}
            WHERE o_custkey IN (SELECT o_custkey FROM top5)
            GROUP BY 1, 2""",
        "q17_dense_axes": f"""
            WITH regions AS (
              SELECT DISTINCT r_regionkey AS cust_region_key, r_name AS cust_region
              FROM customer JOIN nation ON c_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey),
            sts AS (SELECT DISTINCT o_orderstatus FROM orders),
            agg AS (
              SELECT r_regionkey AS k, o_orderstatus AS st,
                     {DEC('o_totalprice')} AS total_price,
                     COUNT(o_orderkey) AS order_count
              FROM {J_ORD_CUST} GROUP BY 1, 2)
            SELECT r.cust_region_key, r.cust_region, s.o_orderstatus,
                   a.total_price, a.order_count
            FROM regions r CROSS JOIN sts s
            LEFT JOIN agg a ON a.k = r.cust_region_key AND a.st = s.o_orderstatus""",
        "q18_virtual_cube": f"""
            SELECT cust_nation_key, cust_nation, revenue, total_price, order_count
            FROM (SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                         {REVENUE} AS revenue
                  FROM {J_CUST} GROUP BY 1, 2) sales
            FULL JOIN (SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                              {DEC('o_totalprice')} AS total_price,
                              COUNT(o_orderkey) AS order_count
                       FROM {J_ORD_CUST} GROUP BY 1, 2) ords
            USING (cust_nation_key, cust_nation)""",
        "q19_weekly_hierarchy": f"""
            SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                   CAST(weekofyear(l_shipdate) AS INTEGER) AS "week",
                   {REVENUE} AS revenue
            FROM lineitem GROUP BY 1, 2""",
        "q20_properties": f"""
            SELECT c_custkey, c_name, c_mktsegment, c_acctbal, {REVENUE} AS revenue
            FROM {J_CUST} WHERE r_regionkey = 2 GROUP BY 1, 2, 3, 4""",
        "q21_caption_substitution": f"""
            SELECT p_partkey, p_type AS p_name, {DEC('l_quantity')} AS sum_qty
            FROM {J_PART} GROUP BY 1, 2""",
        "q22_level_members": """
            SELECT DISTINCT n_nationkey AS cust_nation_key, n_name AS cust_nation
            FROM customer JOIN nation ON c_nationkey = n_nationkey""",
        "q23_member_children": """
            SELECT DISTINCT n_nationkey AS cust_nation_key, n_name AS cust_nation
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_regionkey = 2""",
        "q24_orders_totals": f"""
            SELECT total_price, order_count, order_customers,
                   total_price / order_count AS avg_order_value
            FROM (SELECT {DEC('o_totalprice')} AS total_price,
                         COUNT(o_orderkey) AS order_count,
                         COUNT(DISTINCT o_custkey) AS order_customers
                  FROM orders)""",
        "q25_sparse_skip": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   o_orderstatus, {DEC('o_totalprice')} AS total_price,
                   COUNT(o_orderkey) AS order_count
            FROM {J_ORD_CUST} GROUP BY 1, 2, 3""",
        "q26_mdx_passthrough": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   l_linestatus, {REVENUE} AS revenue
            FROM {J_CUST} GROUP BY 1, 2, 3""",

        "q37_mdx_children_hierarchize": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue, COUNT(l_linenumber) AS line_count
            FROM {J_CUST} WHERE r_regionkey = 2
            GROUP BY 1, 2""",

        "q35_mdx_virtual_with_member": f"""
            SELECT cust_region_key, cust_region, revenue,
                   revenue / total_price AS rev_to_orders
            FROM (SELECT r_regionkey AS cust_region_key,
                         r_name AS cust_region, {REVENUE} AS revenue
                  FROM {J_CUST} GROUP BY 1, 2) sales
            FULL JOIN (SELECT r_regionkey AS cust_region_key,
                              r_name AS cust_region,
                              {DEC('o_totalprice')} AS total_price
                       FROM {J_ORD_CUST} GROUP BY 1, 2) ords
            USING (cust_region_key, cust_region)""",

        "q36_mdx_topcount_crossjoin": f"""
            WITH top3 AS (
              SELECT n_nationkey FROM {J_CUST}
              GROUP BY 1 ORDER BY {REVENUE} DESC, n_nationkey LIMIT 3)
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   l_linestatus, {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_nationkey IN (SELECT n_nationkey FROM top3)
            GROUP BY 1, 2, 3""",

        "q39_mdx_lastperiods": f"""
            WITH yrs AS (
              SELECT DISTINCT year(l_shipdate) AS y FROM lineitem
              WHERE year(l_shipdate) <= 1997 ORDER BY y DESC LIMIT 3)
            SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                   {REVENUE} AS revenue
            FROM lineitem
            WHERE year(l_shipdate) IN (SELECT y FROM yrs)
            GROUP BY 1""",

        "q38_mdx_member_parent": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE r_regionkey = (SELECT n_regionkey FROM nation
                                 WHERE n_name = 'NATION_5')
            GROUP BY 1, 2""",

        "q41_mdx_member_lag": f"""
            WITH yrs AS (
              SELECT DISTINCT year(l_shipdate) AS y FROM lineitem
              WHERE year(l_shipdate) <= 1997 ORDER BY y DESC LIMIT 3)
            SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                   {REVENUE} AS revenue
            FROM lineitem
            WHERE year(l_shipdate) = (SELECT min(y) FROM yrs)
            GROUP BY 1""",

        "q51_mdx_siblings": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE r_regionkey = (SELECT n_regionkey FROM nation
                                 WHERE n_nationkey = 3)
            GROUP BY 1, 2""",

        "q50_mdx_openingperiod": f"""
            WITH pick AS (
              SELECT n.n_nationkey, c.c_custkey
              FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
              WHERE n.n_regionkey = 2
              ORDER BY n.n_nationkey, c.c_custkey LIMIT 1)
            SELECT c_custkey, c_name, {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE c_custkey = (SELECT c_custkey FROM pick)
            GROUP BY 1, 2""",

        "q48_mdx_filter_expr": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue, {DEC('l_quantity')} AS sum_qty
            FROM {J_CUST}
            GROUP BY 1, 2
            HAVING {REVENUE} > 2010 * {DEC('l_quantity')}""",

        "q49_mdx_set_aggregate": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   {REVENUE} AS revenue,
                   CAST(SUM(CASE WHEN year(l_shipdate) IN (1995, 1996)
                            THEN CAST(l_extendedprice * (1 - l_discount)
                                      AS DECIMAL(25,6)) END) AS DOUBLE)
                     AS rev_95_96
            FROM {J_CUST}
            GROUP BY 1, 2""",

        "q64_mdx_dimension_properties": f"""
            SELECT c_custkey, c_name, c_mktsegment, {REVENUE} AS revenue
            FROM {J_CUST} WHERE r_regionkey = 2 GROUP BY 1, 2, 3""",

        "q67_mdx_virtual_set_aggregate": f"""
            SELECT cust_region_key, cust_region, revenue, rev_95_96,
                   orders_95
            FROM (SELECT r_regionkey AS cust_region_key,
                         r_name AS cust_region, {REVENUE} AS revenue,
                         CAST(SUM(CASE WHEN year(l_shipdate) IN (1995, 1996)
                                  THEN CAST(l_extendedprice * (1 - l_discount)
                                            AS DECIMAL(25,6)) END)
                              AS DOUBLE) AS rev_95_96
                  FROM {J_CUST} GROUP BY 1, 2) sales
            FULL JOIN (SELECT r_regionkey AS cust_region_key,
                              r_name AS cust_region,
                              CAST(SUM(CASE WHEN year(o_orderdate) = 1995
                                       THEN CAST(o_totalprice
                                                 AS DECIMAL(25,6)) END)
                                   AS DOUBLE) AS orders_95
                       FROM {J_ORD_CUST} GROUP BY 1, 2) ords
            USING (cust_region_key, cust_region)""",

        "q66_mdx_virtual_rank": f"""
            SELECT cust_region_key, cust_region, revenue, total_price,
                   RANK() OVER (ORDER BY revenue DESC NULLS LAST)
                     AS rev_rank
            FROM (SELECT r_regionkey AS cust_region_key,
                         r_name AS cust_region, {REVENUE} AS revenue
                  FROM {J_CUST} GROUP BY 1, 2) sales
            FULL JOIN (SELECT r_regionkey AS cust_region_key,
                              r_name AS cust_region,
                              {DEC('o_totalprice')} AS total_price
                       FROM {J_ORD_CUST} GROUP BY 1, 2) ords
            USING (cust_region_key, cust_region)""",

        "q77_mdx_visualtotals": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_nationkey IN (1, 6)
            GROUP BY GROUPING SETS ((r_regionkey, r_name),
                                    (r_regionkey, r_name,
                                     n_nationkey, n_name))""",

        "q76_mdx_hierarchize_topcount": f"""
            WITH agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2),
            top5 AS (
              SELECT * FROM agg
              ORDER BY revenue DESC, cust_nation_key LIMIT 5)
            SELECT * FROM top5 ORDER BY cust_nation_key""",

        "q74_mdx_drilldownlevel": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            GROUP BY GROUPING SETS ((r_regionkey, r_name),
                                    (r_regionkey, r_name,
                                     n_nationkey, n_name))""",

        "q75_mdx_drilldownmember": f"""
            WITH agg AS (
              SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                     n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              GROUP BY GROUPING SETS ((r_regionkey, r_name),
                                      (r_regionkey, r_name,
                                       n_nationkey, n_name)))
            SELECT * FROM agg
            WHERE cust_nation_key IS NULL OR cust_region_key IN (1, 3)""",

        "q72_mdx_generate_descendants": f"""
            WITH agg AS (
              SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                     c_custkey, c_name, {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2, 3, 4)
            SELECT cust_region_key, cust_region, c_custkey, c_name,
                   revenue
            FROM agg
            QUALIFY row_number() OVER (PARTITION BY cust_region_key
                                       ORDER BY revenue ASC,
                                                c_custkey) <= 2""",

        "q73_mdx_generate_head": f"""
            WITH agg AS (
              SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                     n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2, 3, 4)
            SELECT cust_region_key, cust_region,
                   cust_nation_key, cust_nation, revenue
            FROM agg
            QUALIFY row_number() OVER (PARTITION BY cust_region_key
                                       ORDER BY cust_nation_key) <= 2""",

        "q70_mdx_filter_navigation": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST} WHERE r_regionkey = 2
            GROUP BY 1, 2 HAVING {REVENUE} > 0""",

        "q71_mdx_exists": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST} WHERE r_regionkey IN (0, 3)
            GROUP BY 1, 2""",

        "q69_mdx_iif_case": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue,
                   CASE WHEN {REVENUE} / COUNT(l_linenumber) > 50250
                        THEN 1 ELSE 0 END AS high_flag,
                   CASE WHEN {REVENUE} > 15000000 THEN 2
                        WHEN {REVENUE} > 8000000 THEN 1
                        ELSE 0 END AS band
            FROM {J_CUST} GROUP BY 1, 2""",

        "q68_mdx_nonempty_measure": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   CAST(year(l_shipdate) AS INTEGER) AS "year",
                   {REVENUE} AS revenue
            FROM {J_CUST} JOIN part ON l_partkey = p_partkey
            WHERE p_brand IN ('Brand#3', 'Brand#5')
            GROUP BY 1, 2, 3""",

        "q65_mdx_property_filter": f"""
            SELECT c_custkey, c_name, {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE r_regionkey = 2 AND c_mktsegment = 'BUILDING'
              AND c_acctbal > 0
            GROUP BY 1, 2""",

        "q62_mdx_set_avg": f"""
            WITH mv AS (
              SELECT r_regionkey AS cust_region_key,
                     year(l_shipdate) AS yr, {REVENUE} AS v
              FROM {J_CUST}
              WHERE year(l_shipdate) BETWEEN 1995 AND 1997
              GROUP BY 1, 2),
            agg AS (
              SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2)
            SELECT a.cust_region_key, a.cust_region, a.revenue,
                   m.avg_yearly_rev
            FROM agg a LEFT JOIN (
              SELECT cust_region_key, avg(v) AS avg_yearly_rev
              FROM mv GROUP BY 1) m USING (cust_region_key)""",

        "q63_mdx_set_median_stdev": f"""
            WITH mv AS (
              SELECT n_nationkey AS cust_nation_key,
                     year(l_shipdate) AS yr, {REVENUE} AS v
              FROM {J_CUST}
              WHERE year(l_shipdate) BETWEEN 1995 AND 1997
              GROUP BY 1, 2),
            agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation
              FROM {J_CUST} GROUP BY 1, 2)
            SELECT a.cust_nation_key, a.cust_nation,
                   m.med_yearly_rev, m.sd_yearly_rev
            FROM agg a LEFT JOIN (
              SELECT cust_nation_key, median(v) AS med_yearly_rev,
                     stddev_samp(v) AS sd_yearly_rev
              FROM mv GROUP BY 1) m USING (cust_nation_key)""",

        "q52_mdx_ancestor": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE r_regionkey = (SELECT n2.n_regionkey FROM customer c2
                                 JOIN nation n2
                                 ON c2.c_nationkey = n2.n_nationkey
                                 WHERE c2.c_custkey = 7)
            GROUP BY 1, 2""",

        "q53_mdx_edge_sibling": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_nationkey = (
                SELECT max(n2.n_nationkey)
                FROM customer c2
                JOIN nation n2 ON c2.c_nationkey = n2.n_nationkey
                WHERE n2.n_regionkey = (SELECT n_regionkey FROM nation
                                        WHERE n_nationkey = 7))
            GROUP BY 1, 2""",

        "q54_mdx_periodstodate": f"""
            SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP)
                     AS ship_date,
                   {REVENUE} AS revenue
            FROM lineitem
            WHERE year(l_shipdate) = 1996
              AND CAST(l_shipdate AS DATE) <= DATE '1996-02-10'
            GROUP BY 1""",

        "q55_mdx_topsum": f"""
            WITH agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2),
            r AS (
              SELECT *,
                     SUM(revenue) OVER (ORDER BY revenue DESC,
                                        cust_nation_key
                                        ROWS UNBOUNDED PRECEDING) AS run
              FROM agg)
            SELECT cust_nation_key, cust_nation, revenue
            FROM r WHERE run - revenue < 100000000""",

        "q56_mdx_mtd": f"""
            WITH agg AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                     CAST(quarter(l_shipdate) AS INTEGER) AS "quarter",
                     CAST(month(l_shipdate) AS INTEGER) AS "month",
                     CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP)
                       AS ship_date,
                     {REVENUE} AS revenue
              FROM lineitem
              WHERE year(l_shipdate) = 1996
              GROUP BY 1, 2, 3, 4)
            SELECT *, SUM(revenue) OVER (
                        PARTITION BY "year", "quarter", "month"
                        ORDER BY ship_date
                        ROWS UNBOUNDED PRECEDING) AS mtd_rev
            FROM agg""",

        "q57_mdx_measure_tuple": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue,
                   CAST(SUM(CASE WHEN year(l_shipdate) = 1995
                            THEN CAST(l_extendedprice * (1 - l_discount)
                                      AS DECIMAL(25,6)) END) AS DOUBLE)
                     AS rev_1995
            FROM {J_CUST}
            GROUP BY 1, 2""",

        "q58_mdx_except_members": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_nationkey NOT IN (3, 7)
              AND year(l_shipdate) <> 1995
            GROUP BY 1, 2""",

        "q59_mdx_with_set_literal": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_nationkey IN (3, 7, 21)
              AND year(l_shipdate) = 1996
            GROUP BY 1, 2""",

        "q60_mdx_rank": f"""
            WITH agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2)
            SELECT *, RANK() OVER (ORDER BY revenue DESC) AS rev_rank
            FROM agg""",

        "q61_mdx_generate_top": f"""
            WITH agg AS (
              SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                     n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2, 3, 4)
            SELECT cust_region_key, cust_region,
                   cust_nation_key, cust_nation, revenue
            FROM agg
            QUALIFY row_number() OVER (PARTITION BY cust_region_key
                                       ORDER BY revenue DESC,
                                                cust_nation_key) <= 2""",

        "q108_mdx_subset_x_years": f"""
            SELECT n_nationkey AS cust_nation_key,
                   n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS "year",
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_nationkey IN (
              SELECT n_nationkey FROM nation
              ORDER BY n_nationkey LIMIT 3 OFFSET 5)
            GROUP BY 1, 2, 3""",

        "q107_mdx_prop_filter_x_years": f"""
            SELECT c_custkey, c_name,
                   CAST(year(l_shipdate) AS INTEGER) AS "year",
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY 1, 2, 3""",

        "q105_mdx_toppercent_x_years": f"""
            WITH n AS (
              SELECT n_nationkey AS nk, {REVENUE} AS rev
              FROM {J_CUST} GROUP BY 1),
            keep AS (
              SELECT nk FROM (
                SELECT nk, rev,
                       SUM(rev) OVER (ORDER BY rev DESC, nk ASC
                                      ROWS UNBOUNDED PRECEDING) AS run,
                       SUM(rev) OVER () AS tot
                FROM n)
              WHERE run - rev < 0.30 * tot)
            SELECT n_nationkey AS cust_nation_key,
                   n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS "year",
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_nationkey IN (SELECT nk FROM keep)
            GROUP BY 1, 2, 3""",

        "q106_mdx_virtual_toppercent_x_years": f"""
            WITH n AS (
              SELECT n_nationkey AS nk, {DEC('o_totalprice')} AS tp
              FROM {J_ORD_CUST} GROUP BY 1),
            keep AS (
              SELECT nk FROM (
                SELECT nk, tp,
                       SUM(tp) OVER (ORDER BY tp DESC, nk ASC
                                     ROWS UNBOUNDED PRECEDING) AS run,
                       SUM(tp) OVER () AS tot
                FROM n)
              WHERE run - tp < 0.40 * tot),
            s AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     CAST(year(l_shipdate) AS INTEGER) AS y,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              WHERE n_nationkey IN (SELECT nk FROM keep)
              GROUP BY 1, 2, 3),
            o AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     CAST(year(o_orderdate) AS INTEGER) AS y,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST}
              WHERE n_nationkey IN (SELECT nk FROM keep)
              GROUP BY 1, 2, 3)
            SELECT COALESCE(s.nk, o.nk) AS cust_nation_key,
                   COALESCE(s.nn, o.nn) AS cust_nation,
                   COALESCE(s.y, o.y) AS "year",
                   s.revenue, o.total_price
            FROM s FULL OUTER JOIN o
              ON s.nk = o.nk AND s.y = o.y""",

        "q104_mdx_virtual_generate_x_topcount": f"""
            WITH yr AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
                     {REVENUE} AS rev
              FROM lineitem GROUP BY 1
              ORDER BY rev DESC, y ASC LIMIT 2),
            basis AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     {DEC('o_totalprice')} AS tp
              FROM {J_ORD_CUST} GROUP BY 1, 2),
            keep AS (
              SELECT rk, nk FROM (
                SELECT rk, nk, ROW_NUMBER() OVER (
                  PARTITION BY rk ORDER BY tp DESC, nk ASC) AS rn
                FROM basis) WHERE rn <= 2),
            s AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
                     r_regionkey AS rk, r_name AS rname,
                     n_nationkey AS nk, n_name AS nname,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              WHERE CAST(year(l_shipdate) AS INTEGER)
                    IN (SELECT y FROM yr)
                AND (r_regionkey, n_nationkey)
                    IN (SELECT (rk, nk) FROM keep)
              GROUP BY 1, 2, 3, 4, 5),
            o AS (
              SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
                     r_regionkey AS rk, r_name AS rname,
                     n_nationkey AS nk, n_name AS nname,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST}
              WHERE CAST(year(o_orderdate) AS INTEGER)
                    IN (SELECT y FROM yr)
                AND (r_regionkey, n_nationkey)
                    IN (SELECT (rk, nk) FROM keep)
              GROUP BY 1, 2, 3, 4, 5)
            SELECT COALESCE(s.y, o.y) AS "year",
                   COALESCE(s.rk, o.rk) AS cust_region_key,
                   COALESCE(s.rname, o.rname) AS cust_region,
                   COALESCE(s.nk, o.nk) AS cust_nation_key,
                   COALESCE(s.nname, o.nname) AS cust_nation,
                   s.revenue, o.total_price
            FROM s FULL OUTER JOIN o
              ON s.y = o.y AND s.rk = o.rk AND s.nk = o.nk""",

        "q103_mdx_generate_x_topcount": f"""
            WITH yr AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
                     {REVENUE} AS rev
              FROM lineitem GROUP BY 1
              ORDER BY rev DESC, y ASC LIMIT 2),
            basis AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     {REVENUE} AS rev
              FROM {J_CUST} GROUP BY 1, 2),
            keep AS (
              SELECT rk, nk FROM (
                SELECT rk, nk, ROW_NUMBER() OVER (
                  PARTITION BY rk ORDER BY rev DESC, nk ASC) AS rn
                FROM basis) WHERE rn <= 2)
            SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                   r_regionkey AS cust_region_key,
                   r_name AS cust_region,
                   n_nationkey AS cust_nation_key,
                   n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE CAST(year(l_shipdate) AS INTEGER)
                  IN (SELECT y FROM yr)
              AND (r_regionkey, n_nationkey)
                  IN (SELECT (rk, nk) FROM keep)
            GROUP BY 1, 2, 3, 4, 5""",

        "q102_mdx_nested_generate": f"""
            WITH agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     c_custkey, c_name,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2, 3, 4)
            SELECT cust_nation_key, cust_nation, c_custkey, c_name, revenue
            FROM agg
            QUALIFY row_number() OVER (PARTITION BY cust_nation_key
                                       ORDER BY revenue DESC,
                                                c_custkey) <= 3""",

        "q47_mdx_toppercent": f"""
            WITH agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2),
            r AS (
              SELECT *,
                     SUM(revenue) OVER (ORDER BY revenue DESC,
                                        cust_nation_key
                                        ROWS UNBOUNDED PRECEDING) AS run,
                     SUM(revenue) OVER () AS tot
              FROM agg)
            SELECT cust_nation_key, cust_nation, revenue
            FROM r WHERE run - revenue < 0.5 * tot""",

        "q46_mdx_ytd": f"""
            WITH agg AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                     CAST(month(l_shipdate) AS INTEGER) AS "month",
                     {REVENUE} AS revenue
              FROM lineitem GROUP BY 1, 2)
            SELECT "year", "month", revenue,
                   SUM(revenue) OVER (PARTITION BY "year" ORDER BY "month"
                                      ROWS UNBOUNDED PRECEDING)
                     AS ytd_revenue
            FROM agg""",

        "q45_mdx_virtual_children": f"""
            SELECT cust_nation_key, cust_nation, revenue, total_price
            FROM (SELECT n_nationkey AS cust_nation_key,
                         n_name AS cust_nation, {REVENUE} AS revenue
                  FROM {J_CUST} WHERE r_regionkey = 2 GROUP BY 1, 2) sales
            FULL JOIN (SELECT n_nationkey AS cust_nation_key,
                              n_name AS cust_nation,
                              {DEC('o_totalprice')} AS total_price
                       FROM {J_ORD_CUST} WHERE r_regionkey = 2
                       GROUP BY 1, 2) ords
            USING (cust_nation_key, cust_nation)""",

        "q42_mdx_range_union": f"""
            SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                   n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE year(l_shipdate) BETWEEN 1996 AND 1998
              AND n_nationkey IN (3, 7, 21)
            GROUP BY 1, 2, 3""",

        "q43_mdx_tail": f"""
            WITH agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2)
            SELECT cust_nation_key, cust_nation, revenue
            FROM agg ORDER BY cust_nation_key DESC LIMIT 5""",

        "q44_mdx_last_child": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   l_linestatus, {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_nationkey = (SELECT max(n_nationkey) FROM nation
                                 WHERE n_regionkey = 1)
            GROUP BY 1, 2, 3""",

        "q40_mdx_iif_member": f"""
            WITH agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue, COUNT(l_linenumber) AS line_count
              FROM {J_CUST} GROUP BY 1, 2)
            SELECT cust_nation_key, cust_nation, revenue,
                   CASE WHEN revenue / line_count > 50250
                        THEN revenue / line_count ELSE 0 END
                     AS yield_over_floor
            FROM agg""",

        "q34_mdx_with_set": f"""
            WITH agg AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2)
            SELECT cust_nation_key, cust_nation, revenue
            FROM agg ORDER BY revenue DESC, cust_nation_key LIMIT 3""",

        "q33_mdx_parallelperiod": f"""
            WITH agg AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS "year",
                     {REVENUE} AS revenue
              FROM lineitem GROUP BY 1)
            SELECT "year", revenue,
                   lag(revenue) OVER (ORDER BY "year")
                     AS prev_year_revenue
            FROM agg""",

        "q32_mdx_with_member": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   {REVENUE} AS revenue,
                   {DEC('l_discount')} / {DEC('l_extendedprice')}
                     AS discount_rate
            FROM {J_CUST} GROUP BY 1, 2""",
        "q27_parent_child_closure": f"""
            WITH oc AS (
              SELECT c_custkey, c_name, c_nationkey, o_totalprice, o_orderkey
              FROM orders JOIN customer ON o_custkey = c_custkey)
            SELECT 'C' || c_custkey AS node_id, c_name AS node_name,
                   {DEC('o_totalprice')} AS total_price,
                   COUNT(o_orderkey) AS order_count
            FROM oc GROUP BY 1, 2
            UNION ALL
            SELECT 'N' || n_nationkey, n_name, {DEC('o_totalprice')},
                   COUNT(o_orderkey)
            FROM oc JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2
            UNION ALL
            SELECT 'R' || r_regionkey, r_name, {DEC('o_totalprice')},
                   COUNT(o_orderkey)
            FROM oc JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2""",
        "q86_mdx_virtual_dense": f"""
            WITH m AS (SELECT n_nationkey, n_name FROM nation),
            s AS (
              SELECT n_nationkey AS nk, {REVENUE} AS revenue
              FROM {J_CUST} WHERE n_regionkey = 1 GROUP BY 1),
            o AS (
              SELECT n_nationkey AS nk,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} WHERE n_regionkey = 1 GROUP BY 1)
            SELECT m.n_nationkey AS cust_nation_key,
                   m.n_name AS cust_nation, s.revenue, o.total_price
            FROM m LEFT JOIN s ON m.n_nationkey = s.nk
                   LEFT JOIN o ON m.n_nationkey = o.nk""",
        "q101_mdx_ddltop_x_topcount": f"""
            WITH yr AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
                     {REVENUE} AS rev
              FROM lineitem GROUP BY 1
              ORDER BY rev DESC, y ASC LIMIT 2),
            basis AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     {DEC('l_quantity')} AS qty
              FROM {J_CUST} GROUP BY 1, 2),
            keep AS (
              SELECT rk, nk FROM (
                SELECT rk, nk, ROW_NUMBER() OVER (
                  PARTITION BY rk ORDER BY qty DESC, nk ASC) AS rn
                FROM basis) WHERE rn <= 2),
            agg AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
                     r_regionkey AS rk, r_name AS region_name,
                     n_nationkey AS nk, n_name AS nn,
                     GROUPING(n_nationkey) AS g,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              WHERE CAST(year(l_shipdate) AS INTEGER)
                    IN (SELECT y FROM yr)
              GROUP BY GROUPING SETS (
                (year(l_shipdate), r_regionkey, r_name),
                (year(l_shipdate), r_regionkey, r_name,
                 n_nationkey, n_name)))
            SELECT y AS "year", rk AS cust_region_key,
                   region_name AS cust_region,
                   nk AS cust_nation_key, nn AS cust_nation, revenue
            FROM agg
            WHERE g = 1 OR EXISTS (SELECT 1 FROM keep k
                                   WHERE k.rk = agg.rk
                                     AND k.nk = agg.nk)""",
        "q109_mdx_dense_ddltop": f"""
            WITH agg AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     GROUPING(n_nationkey) AS g,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              WHERE CAST(l_shipdate AS DATE) = DATE '1996-02-10'
              GROUP BY GROUPING SETS (
                (r_regionkey),
                (r_regionkey, n_nationkey))),
            parents AS (SELECT r_regionkey, r_name FROM region),
            pairs AS (
              SELECT r_regionkey, r_name, n_nationkey, n_name
              FROM nation JOIN region ON n_regionkey = r_regionkey),
            dense_children AS (
              SELECT p.r_regionkey, p.r_name, p.n_nationkey,
                     p.n_name, a.revenue
              FROM pairs p
              LEFT JOIN agg a ON a.g = 0 AND p.r_regionkey = a.rk
                             AND p.n_nationkey = a.nk),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY r_regionkey
                ORDER BY revenue DESC NULLS LAST, n_nationkey ASC
              ) AS rn FROM dense_children)
            SELECT p.r_regionkey AS cust_region_key,
                   p.r_name AS cust_region,
                   CAST(NULL AS INTEGER) AS cust_nation_key,
                   CAST(NULL AS VARCHAR) AS cust_nation,
                   a.revenue
            FROM parents p
            LEFT JOIN agg a ON a.g = 1 AND p.r_regionkey = a.rk
            UNION ALL
            SELECT r_regionkey, r_name, n_nationkey, n_name, revenue
            FROM ranked WHERE rn <= 2""",
        "q100_mdx_dense_drilldownlevel": f"""
            WITH agg AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     GROUPING(n_nationkey) AS g,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              WHERE CAST(l_shipdate AS DATE) = DATE '1996-02-10'
              GROUP BY GROUPING SETS (
                (r_regionkey),
                (r_regionkey, n_nationkey))),
            parents AS (SELECT r_regionkey, r_name FROM region),
            pairs AS (
              SELECT r_regionkey, r_name, n_nationkey, n_name
              FROM nation JOIN region ON n_regionkey = r_regionkey)
            SELECT p.r_regionkey AS cust_region_key,
                   p.r_name AS cust_region,
                   CAST(NULL AS INTEGER) AS cust_nation_key,
                   CAST(NULL AS VARCHAR) AS cust_nation,
                   a.revenue
            FROM parents p
            LEFT JOIN agg a ON a.g = 1 AND p.r_regionkey = a.rk
            UNION ALL
            SELECT p.r_regionkey, p.r_name, p.n_nationkey, p.n_name,
                   a.revenue
            FROM pairs p
            LEFT JOIN agg a ON a.g = 0 AND p.r_regionkey = a.rk
                           AND p.n_nationkey = a.nk""",
        "q99_virtual_rollup_routed": f"""
            WITH s AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2),
            o AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} GROUP BY 1, 2)
            SELECT COALESCE(s.nk, o.nk) AS cust_nation_key,
                   COALESCE(s.nn, o.nn) AS cust_nation,
                   s.revenue, o.total_price
            FROM s FULL OUTER JOIN o ON s.nk = o.nk""",
        "q97_mdx_virtual_tail": f"""
            WITH s AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2),
            o AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} GROUP BY 1, 2)
            SELECT COALESCE(s.nk, o.nk) AS cust_nation_key,
                   COALESCE(s.nn, o.nn) AS cust_nation,
                   s.revenue, o.total_price
            FROM s FULL OUTER JOIN o ON s.nk = o.nk
            ORDER BY cust_nation_key DESC LIMIT 4""",
        "q98_mdx_virtual_nav_filter": f"""
            WITH s AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     {REVENUE} AS revenue
              FROM {J_CUST} WHERE n_regionkey = 2 GROUP BY 1, 2),
            o AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} WHERE n_regionkey = 2 GROUP BY 1, 2)
            SELECT COALESCE(s.nk, o.nk) AS cust_nation_key,
                   COALESCE(s.nn, o.nn) AS cust_nation,
                   s.revenue, o.total_price
            FROM s FULL OUTER JOIN o ON s.nk = o.nk""",
        "q95_mdx_virtual_parallelperiod": f"""
            WITH s AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
                     {REVENUE} AS revenue
              FROM lineitem GROUP BY 1),
            o AS (
              SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
                     {DEC('o_totalprice')} AS total_price
              FROM orders GROUP BY 1),
            j AS (
              SELECT COALESCE(s.y, o.y) AS "year",
                     s.revenue, o.total_price
              FROM s FULL OUTER JOIN o ON s.y = o.y)
            SELECT "year", total_price,
                   lag(total_price, 1) OVER (ORDER BY "year")
                     AS prev_tp,
                   revenue
            FROM j""",
        "q96_mdx_virtual_ytd": f"""
            -- both displayed measures are Orders-side, so NON EMPTY
            -- keeps exactly the orders (year, quarter) pairs; the
            -- YTD window runs over that axis
            SELECT "year", "quarter", total_price,
                   SUM(total_price) OVER (
                     PARTITION BY "year" ORDER BY "quarter"
                     ROWS UNBOUNDED PRECEDING) AS ytd_tp
            FROM (
              SELECT CAST(year(o_orderdate) AS INTEGER) AS "year",
                     CAST(quarter(o_orderdate) AS INTEGER) AS "quarter",
                     {DEC('o_totalprice')} AS total_price
              FROM orders GROUP BY 1, 2)""",
        "q94_mdx_virtual_ddltop": f"""
            WITH s AS (
              SELECT r_regionkey AS rk, r_name AS rn,
                     n_nationkey AS nk, n_name AS nn,
                     grouping(n_nationkey) AS sub,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              GROUP BY GROUPING SETS (
                (r_regionkey, r_name),
                (r_regionkey, r_name, n_nationkey, n_name))),
            o AS (
              SELECT r_regionkey AS rk, r_name AS rn,
                     n_nationkey AS nk, n_name AS nn,
                     grouping(n_nationkey) AS sub,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST}
              GROUP BY GROUPING SETS (
                (r_regionkey, r_name),
                (r_regionkey, r_name, n_nationkey, n_name))),
            j AS (
              SELECT COALESCE(s.rk, o.rk) AS cust_region_key,
                     COALESCE(s.rn, o.rn) AS cust_region,
                     COALESCE(s.nk, o.nk) AS cust_nation_key,
                     COALESCE(s.nn, o.nn) AS cust_nation,
                     COALESCE(s.sub, o.sub) AS sub,
                     s.revenue, o.total_price
              FROM s FULL OUTER JOIN o
                ON s.rk IS NOT DISTINCT FROM o.rk
               AND s.nk IS NOT DISTINCT FROM o.nk
               AND s.sub = o.sub)
            SELECT cust_region_key, cust_region, cust_nation_key,
                   cust_nation, revenue, total_price
            FROM j
            QUALIFY sub = 1 OR row_number() OVER (
                PARTITION BY sub, cust_region_key
                ORDER BY revenue DESC NULLS LAST, cust_nation_key) <= 2""",
        "q91_mdx_filter_over_generate": f"""
            WITH cells AS (
              SELECT n_nationkey AS cust_nation_key,
                     n_name AS cust_nation,
                     c_custkey, c_name, c_mktsegment,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2, 3, 4, 5),
            ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY cust_nation_key
                       ORDER BY revenue DESC, c_custkey) AS r
              FROM cells)
            SELECT cust_nation_key, cust_nation, c_custkey, c_name,
                   revenue
            FROM ranked WHERE r <= 3 AND c_mktsegment = 'BUILDING'""",
        "q90_mdx_ddltop_x_members": f"""
            WITH g AS (
              SELECT r_regionkey AS cust_region_key,
                     r_name AS cust_region,
                     n_nationkey AS cust_nation_key,
                     n_name AS cust_nation,
                     CAST(year(l_shipdate) AS INTEGER) AS "year",
                     {REVENUE} AS revenue
              FROM {J_CUST}
              GROUP BY GROUPING SETS (
                (r_regionkey, r_name, year(l_shipdate)),
                (r_regionkey, r_name, n_nationkey, n_name,
                 year(l_shipdate)))),
            marg AS (
              SELECT cust_region_key, cust_nation_key,
                     rank() OVER (
                       PARTITION BY cust_region_key
                       ORDER BY SUM(revenue) DESC, cust_nation_key) AS r
              FROM g WHERE cust_nation_key IS NOT NULL
              GROUP BY 1, 2)
            SELECT g.* FROM g
            LEFT JOIN marg
              ON g.cust_region_key = marg.cust_region_key
             AND g.cust_nation_key = marg.cust_nation_key
            WHERE g.cust_nation_key IS NULL OR marg.r <= 2""",
        "q89_mdx_generate_2d": f"""
            WITH cells AS (
              SELECT r_regionkey AS cust_region_key,
                     r_name AS cust_region,
                     n_nationkey AS cust_nation_key,
                     n_name AS cust_nation,
                     CAST(year(l_shipdate) AS INTEGER) AS "year",
                     CAST(quarter(l_shipdate) AS INTEGER) AS "quarter",
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2, 3, 4, 5, 6),
            mn AS (
              SELECT cust_region_key, cust_nation_key,
                     rank() OVER (
                       PARTITION BY cust_region_key
                       ORDER BY SUM(revenue) DESC, cust_nation_key) AS r
              FROM cells GROUP BY 1, 2),
            mq AS (
              SELECT "year", "quarter",
                     rank() OVER (
                       PARTITION BY "year"
                       ORDER BY SUM(revenue) DESC, "quarter") AS r
              FROM cells GROUP BY 1, 2)
            SELECT c.cust_region_key, c.cust_region, c.cust_nation_key,
                   c.cust_nation, c."year", c."quarter", c.revenue
            FROM cells c
            JOIN mn ON c.cust_region_key = mn.cust_region_key
                   AND c.cust_nation_key = mn.cust_nation_key
                   AND mn.r <= 2
            JOIN mq ON c."year" = mq."year"
                   AND c."quarter" = mq."quarter" AND mq.r <= 2""",
        "r01_ragged_drilldown": f"""
            WITH geo AS (
              SELECT o_totalprice, c_custkey,
                     CASE WHEN n_nationkey % 5 = 0 THEN '' ELSE n_name
                     END AS geo_nation,
                     CASE WHEN c_custkey % 7 = 0 THEN (
                       CASE WHEN n_nationkey % 5 = 0 THEN '' ELSE n_name
                       END) ELSE c_name END AS geo_cust_name
              FROM orders JOIN customer ON o_custkey = c_custkey
                          JOIN nation ON c_nationkey = n_nationkey)
            SELECT geo_nation, c_custkey, geo_cust_name,
                   {DEC('o_totalprice')} AS total_price
            FROM geo
            WHERE geo_nation IS NOT NULL AND trim(geo_nation) <> ''
              AND (geo_cust_name IS NULL OR geo_nation IS NULL
                   OR geo_cust_name <> geo_nation)
            GROUP BY 1, 2, 3""",
        "q87_mdx_virtual_lastperiods": f"""
            WITH win AS (
              SELECT y FROM (
                SELECT DISTINCT CAST(year(l_shipdate) AS INTEGER) AS y
                FROM lineitem
                UNION
                SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER)
                FROM orders)
              WHERE y <= 1997 ORDER BY y DESC LIMIT 3),
            s AS (
              SELECT CAST(year(l_shipdate) AS INTEGER) AS y,
                     {REVENUE} AS revenue
              FROM lineitem GROUP BY 1),
            o AS (
              SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
                     {DEC('o_totalprice')} AS total_price
              FROM orders GROUP BY 1)
            SELECT w.y AS "year", s.revenue, o.total_price
            FROM win w LEFT JOIN s ON w.y = s.y
                       LEFT JOIN o ON w.y = o.y
            WHERE s.revenue IS NOT NULL OR o.total_price IS NOT NULL""",
        "q88_mdx_virtual_with_set": f"""
            WITH top5 AS (
              SELECT nk FROM (
                SELECT n_nationkey AS nk, {REVENUE} AS revenue
                FROM {J_CUST} GROUP BY 1)
              ORDER BY revenue DESC, nk LIMIT 5),
            s AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2),
            o AS (
              SELECT n_nationkey AS nk, n_name AS nn,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} GROUP BY 1, 2)
            SELECT COALESCE(s.nk, o.nk) AS cust_nation_key,
                   COALESCE(s.nn, o.nn) AS cust_nation,
                   s.revenue, o.total_price
            FROM s FULL OUTER JOIN o ON s.nk = o.nk
            WHERE COALESCE(s.nk, o.nk) IN (SELECT nk FROM top5)""",
        "q92_mdx_virtual_generate": f"""
            WITH s AS (
              SELECT r_regionkey AS rk, r_name AS rn,
                     n_nationkey AS nk, n_name AS nn,
                     {REVENUE} AS revenue
              FROM {J_CUST} GROUP BY 1, 2, 3, 4),
            o AS (
              SELECT r_regionkey AS rk, r_name AS rn,
                     n_nationkey AS nk, n_name AS nn,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} GROUP BY 1, 2, 3, 4),
            j AS (
              SELECT COALESCE(s.rk, o.rk) AS cust_region_key,
                     COALESCE(s.rn, o.rn) AS cust_region,
                     COALESCE(s.nk, o.nk) AS cust_nation_key,
                     COALESCE(s.nn, o.nn) AS cust_nation,
                     s.revenue, o.total_price
              FROM s FULL OUTER JOIN o
                ON s.rk = o.rk AND s.nk = o.nk)
            SELECT * FROM j
            QUALIFY row_number() OVER (
                PARTITION BY cust_region_key
                ORDER BY revenue DESC NULLS LAST, cust_nation_key) <= 2""",
        "q93_mdx_virtual_toppercent": f"""
            WITH o AS (
              SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} GROUP BY 1, 2)
            SELECT cust_nation_key, cust_nation, total_price FROM (
              SELECT *,
                     SUM(total_price) OVER (
                       ORDER BY total_price DESC, cust_nation_key
                       ROWS UNBOUNDED PRECEDING) AS run,
                     SUM(total_price) OVER () AS tot
              FROM o)
            WHERE run - total_price < 0.30 * tot""",
        "q85_mdx_drilldownleveltop": f"""
            WITH g AS (
              SELECT r_regionkey AS cust_region_key,
                     r_name AS cust_region,
                     n_nationkey AS cust_nation_key,
                     n_name AS cust_nation,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              GROUP BY GROUPING SETS (
                (r_regionkey, r_name),
                (r_regionkey, r_name, n_nationkey, n_name)))
            SELECT * FROM g
            QUALIFY cust_nation_key IS NULL
                OR row_number() OVER (
                     PARTITION BY cust_region_key,
                                  (cust_nation_key IS NULL)
                     ORDER BY revenue DESC, cust_nation_key) <= 2""",
        "q84_mdx_virtual_drilldownlevel": f"""
            WITH s AS (
              SELECT r_regionkey AS rk, r_name AS rn,
                     n_nationkey AS nk, n_name AS nn,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              GROUP BY GROUPING SETS (
                (r_regionkey, r_name),
                (r_regionkey, r_name, n_nationkey, n_name))
            ), o AS (
              SELECT r_regionkey AS rk, r_name AS rn,
                     n_nationkey AS nk, n_name AS nn,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST}
              GROUP BY GROUPING SETS (
                (r_regionkey, r_name),
                (r_regionkey, r_name, n_nationkey, n_name))
            )
            SELECT COALESCE(s.rk, o.rk) AS cust_region_key,
                   COALESCE(s.rn, o.rn) AS cust_region,
                   COALESCE(s.nk, o.nk) AS cust_nation_key,
                   COALESCE(s.nn, o.nn) AS cust_nation,
                   s.revenue, o.total_price
            FROM s FULL OUTER JOIN o
              ON s.rk IS NOT DISTINCT FROM o.rk
             AND s.nk IS NOT DISTINCT FROM o.nk""",
        "q83_mdx_visualtotals_x_ddl": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS "year",
                   CAST(quarter(l_shipdate) AS INTEGER) AS "quarter",
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE r_regionkey = 1 AND n_nationkey IN (1, 6)
            GROUP BY GROUPING SETS (
              (r_regionkey, r_name, year(l_shipdate)),
              (r_regionkey, r_name, year(l_shipdate),
               quarter(l_shipdate)),
              (r_regionkey, r_name, n_nationkey, n_name,
               year(l_shipdate)),
              (r_regionkey, r_name, n_nationkey, n_name,
               year(l_shipdate), quarter(l_shipdate)))""",
        "q80_mdx_drilldownlevel_2d": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS "year",
                   CAST(quarter(l_shipdate) AS INTEGER) AS "quarter",
                   {REVENUE} AS revenue
            FROM {J_CUST}
            GROUP BY GROUPING SETS (
              (r_regionkey, r_name, year(l_shipdate)),
              (r_regionkey, r_name, year(l_shipdate),
               quarter(l_shipdate)),
              (r_regionkey, r_name, n_nationkey, n_name,
               year(l_shipdate)),
              (r_regionkey, r_name, n_nationkey, n_name,
               year(l_shipdate), quarter(l_shipdate)))""",
        "q81_mdx_crossjoin_fn": f"""
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   l_returnflag, {REVENUE} AS revenue
            FROM {J_CUST} GROUP BY 1, 2, 3""",
        "q82_mdx_strtomember": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue
            FROM {J_CUST}
            WHERE n_regionkey = 1 AND n_nationkey IN (1, 6)
            GROUP BY 1, 2""",
        "q79_mdx_existing_dense": f"""
            WITH m AS (
              SELECT n_nationkey, n_name FROM nation
              WHERE n_regionkey = 1),
            a AS (
              SELECT n_nationkey AS nk, {REVENUE} AS revenue
              FROM {J_CUST} WHERE n_regionkey = 1 GROUP BY 1)
            SELECT m.n_nationkey AS cust_nation_key,
                   m.n_name AS cust_nation, a.revenue
            FROM m LEFT JOIN a ON m.n_nationkey = a.nk""",
        "q78_pc_rest_drilldown": f"""
            WITH RECURSIVE nodes AS (
              SELECT 'R' || r_regionkey AS node_id,
                     CAST(NULL AS VARCHAR) AS parent_id,
                     r_name AS node_name FROM region
              UNION ALL
              SELECT 'N' || n_nationkey, 'R' || n_regionkey, n_name
              FROM nation
              UNION ALL
              SELECT 'C' || c_custkey, 'N' || c_nationkey, c_name
              FROM customer
            ), closure AS (
              SELECT node_id AS ancestor_id, node_id AS descendant_id
              FROM nodes
              UNION ALL
              SELECT n.parent_id, c.descendant_id
              FROM closure c JOIN nodes n ON c.ancestor_id = n.node_id
              WHERE n.parent_id IS NOT NULL
            ), facts AS (
              SELECT 'C' || o_custkey AS fk, o_totalprice, o_orderkey
              FROM orders
              WHERE 'C' || o_custkey IN (
                SELECT descendant_id FROM closure
                WHERE ancestor_id = 'N1')
            )
            SELECT c.ancestor_id AS geo_node_id,
                   n.node_name AS geo_node_name,
                   {DEC('o_totalprice')} AS total_price,
                   COUNT(o_orderkey) AS order_count
            FROM facts f
            JOIN closure c ON f.fk = c.descendant_id
            JOIN nodes n ON c.ancestor_id = n.node_id
            GROUP BY 1, 2""",
        "q28_rollup_routed": f"""
            SELECT n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   {REVENUE} AS revenue, COUNT(l_linenumber) AS line_count
            FROM {J_CUST} WHERE year(l_shipdate) BETWEEN 1996 AND 1998
            GROUP BY 1, 2""",
        "q110_rollup_routed_dense": f"""
            WITH agg AS (
              SELECT n_nationkey AS nk, {REVENUE} AS revenue
              FROM {J_CUST} WHERE year(l_shipdate) = 1996
              GROUP BY 1),
            m AS (SELECT n_nationkey, n_name FROM nation)
            SELECT m.n_nationkey AS cust_nation_key,
                   m.n_name AS cust_nation, a.revenue
            FROM m LEFT JOIN agg a ON m.n_nationkey = a.nk""",
        "q111_mdx_virtual_dense_ddl": f"""
            WITH s AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     GROUPING(n_nationkey) AS g, {REVENUE} AS revenue
              FROM {J_CUST} WHERE year(l_shipdate) = 1996
              GROUP BY GROUPING SETS (
                (r_regionkey), (r_regionkey, n_nationkey))),
            o AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     GROUPING(n_nationkey) AS g,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} WHERE year(o_orderdate) = 1996
              GROUP BY GROUPING SETS (
                (r_regionkey), (r_regionkey, n_nationkey))),
            j AS (
              SELECT COALESCE(s.rk, o.rk) AS rk,
                     COALESCE(s.nk, o.nk) AS nk,
                     COALESCE(s.g, o.g) AS g, s.revenue, o.total_price
              FROM s FULL OUTER JOIN o
                ON s.g = o.g AND s.rk = o.rk
               AND s.nk IS NOT DISTINCT FROM o.nk),
            parents AS (SELECT r_regionkey, r_name FROM region),
            pairs AS (
              SELECT r_regionkey, r_name, n_nationkey, n_name
              FROM nation JOIN region ON n_regionkey = r_regionkey)
            SELECT p.r_regionkey AS cust_region_key,
                   p.r_name AS cust_region,
                   CAST(NULL AS INTEGER) AS cust_nation_key,
                   CAST(NULL AS VARCHAR) AS cust_nation,
                   j.revenue, j.total_price
            FROM parents p LEFT JOIN j ON j.g = 1 AND p.r_regionkey = j.rk
            UNION ALL
            SELECT p.r_regionkey, p.r_name, p.n_nationkey, p.n_name,
                   j.revenue, j.total_price
            FROM pairs p LEFT JOIN j ON j.g = 0 AND p.r_regionkey = j.rk
                                    AND p.n_nationkey = j.nk""",
        "q112_mdx_virtual_dense_generate": f"""
            WITH s AS (
              SELECT n_nationkey AS nk, {REVENUE} AS revenue
              FROM {J_CUST}
              WHERE CAST(l_shipdate AS DATE) = DATE '1996-02-10'
              GROUP BY 1),
            o AS (
              SELECT n_nationkey AS nk, {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST}
              WHERE CAST(o_orderdate AS DATE) = DATE '1996-02-10'
              GROUP BY 1),
            pairs AS (
              SELECT r_regionkey, r_name, n_nationkey, n_name
              FROM nation JOIN region ON n_regionkey = r_regionkey),
            dense AS (
              SELECT p.r_regionkey, p.r_name, p.n_nationkey, p.n_name,
                     s.revenue, o.total_price
              FROM pairs p LEFT JOIN s ON p.n_nationkey = s.nk
                           LEFT JOIN o ON p.n_nationkey = o.nk)
            SELECT r_regionkey AS cust_region_key, r_name AS cust_region,
                   n_nationkey AS cust_nation_key, n_name AS cust_nation,
                   revenue, total_price
            FROM dense
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY r_regionkey
              ORDER BY revenue DESC NULLS LAST, n_nationkey ASC) <= 2""",
        "q113_mdx_virtual_dense_ddltop": f"""
            WITH s AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     GROUPING(n_nationkey) AS g, {REVENUE} AS revenue
              FROM {J_CUST}
              WHERE CAST(l_shipdate AS DATE) = DATE '1996-02-10'
              GROUP BY GROUPING SETS (
                (r_regionkey), (r_regionkey, n_nationkey))),
            o AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     GROUPING(n_nationkey) AS g,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST}
              WHERE CAST(o_orderdate AS DATE) = DATE '1996-02-10'
              GROUP BY GROUPING SETS (
                (r_regionkey), (r_regionkey, n_nationkey))),
            j AS (
              SELECT COALESCE(s.rk, o.rk) AS rk,
                     COALESCE(s.nk, o.nk) AS nk,
                     COALESCE(s.g, o.g) AS g, s.revenue, o.total_price
              FROM s FULL OUTER JOIN o
                ON s.g = o.g AND s.rk = o.rk
               AND s.nk IS NOT DISTINCT FROM o.nk),
            parents AS (SELECT r_regionkey, r_name FROM region),
            pairs AS (
              SELECT r_regionkey, r_name, n_nationkey, n_name
              FROM nation JOIN region ON n_regionkey = r_regionkey),
            dense_children AS (
              SELECT p.r_regionkey, p.r_name, p.n_nationkey, p.n_name,
                     j.revenue, j.total_price
              FROM pairs p LEFT JOIN j ON j.g = 0 AND p.r_regionkey = j.rk
                                      AND p.n_nationkey = j.nk)
            SELECT p.r_regionkey AS cust_region_key,
                   p.r_name AS cust_region,
                   CAST(NULL AS INTEGER) AS cust_nation_key,
                   CAST(NULL AS VARCHAR) AS cust_nation,
                   j.revenue, j.total_price
            FROM parents p LEFT JOIN j ON j.g = 1 AND p.r_regionkey = j.rk
            UNION ALL
            SELECT r_regionkey, r_name, n_nationkey, n_name,
                   revenue, total_price
            FROM dense_children
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY r_regionkey
              ORDER BY total_price DESC NULLS LAST, n_nationkey ASC) <= 2""",
        "q114_mdx_virtual_day_alias_conformed": f"""
            WITH s AS (
              SELECT CAST(l_shipdate AS DATE) AS d, {REVENUE} AS revenue
              FROM {J_CUST} WHERE n_regionkey = 2 GROUP BY 1),
            o AS (
              SELECT CAST(o_orderdate AS DATE) AS d,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} WHERE n_regionkey = 2 GROUP BY 1)
            SELECT CAST(COALESCE(s.d, o.d) AS TIMESTAMP) AS ship_date,
                   s.revenue, o.total_price
            FROM s FULL OUTER JOIN o ON s.d = o.d""",
        "q116_rollup_routed_gs_dense": f"""
            WITH agg AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     GROUPING(n_nationkey) AS g,
                     {REVENUE} AS revenue
              FROM {J_CUST}
              WHERE year(l_shipdate) = 1996
              GROUP BY GROUPING SETS (
                (r_regionkey),
                (r_regionkey, n_nationkey))),
            parents AS (SELECT r_regionkey, r_name FROM region),
            pairs AS (
              SELECT r_regionkey, r_name, n_nationkey, n_name
              FROM nation JOIN region ON n_regionkey = r_regionkey)
            SELECT p.r_regionkey AS cust_region_key,
                   p.r_name AS cust_region,
                   CAST(NULL AS INTEGER) AS cust_nation_key,
                   CAST(NULL AS VARCHAR) AS cust_nation,
                   a.revenue
            FROM parents p
            LEFT JOIN agg a ON a.g = 1 AND p.r_regionkey = a.rk
            UNION ALL
            SELECT p.r_regionkey, p.r_name, p.n_nationkey, p.n_name,
                   a.revenue
            FROM pairs p
            LEFT JOIN agg a ON a.g = 0 AND p.r_regionkey = a.rk
                           AND p.n_nationkey = a.nk""",
        "q118_rollup_routed_ptd": f"""
            SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP)
                     AS ship_date,
                   {REVENUE} AS revenue
            FROM lineitem
            WHERE year(l_shipdate) = 1996
              AND CAST(l_shipdate AS DATE) <= DATE '1996-02-10'
            GROUP BY 1""",
        "q117_rollup_routed_dense_generate": f"""
            WITH agg AS (
              SELECT r_regionkey AS rk, n_nationkey AS nk,
                     {REVENUE} AS revenue
              FROM {J_CUST} WHERE year(l_shipdate) = 1996
              GROUP BY 1, 2),
            pairs AS (
              SELECT r_regionkey, r_name, n_nationkey, n_name
              FROM nation JOIN region ON n_regionkey = r_regionkey),
            dense AS (
              SELECT p.r_regionkey, p.r_name, p.n_nationkey, p.n_name,
                     a.revenue
              FROM pairs p LEFT JOIN agg a ON p.r_regionkey = a.rk
                                          AND p.n_nationkey = a.nk)
            SELECT r_regionkey AS cust_region_key,
                   r_name AS cust_region,
                   n_nationkey AS cust_nation_key,
                   n_name AS cust_nation, revenue
            FROM dense
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY r_regionkey
              ORDER BY revenue DESC NULLS LAST, n_nationkey ASC) <= 2""",
        "q115_mdx_virtual_dense_day_union": f"""
            WITH days AS (
              SELECT DISTINCT CAST(l_shipdate AS DATE) AS d
              FROM lineitem
              UNION
              SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders),
            s AS (
              SELECT CAST(l_shipdate AS DATE) AS d, {REVENUE} AS revenue
              FROM {J_CUST} WHERE n_regionkey = 2 GROUP BY 1),
            o AS (
              SELECT CAST(o_orderdate AS DATE) AS d,
                     {DEC('o_totalprice')} AS total_price
              FROM {J_ORD_CUST} WHERE n_regionkey = 2 GROUP BY 1)
            SELECT CAST(days.d AS TIMESTAMP) AS ship_date,
                   s.revenue, o.total_price
            FROM days LEFT JOIN s ON days.d = s.d
                      LEFT JOIN o ON days.d = o.d""",
        "q31_salted_skew_agg": f"""
            SELECT l_returnflag, {DEC('l_quantity')} AS sum_qty,
                   COUNT(*) AS line_count
            FROM lineitem GROUP BY 1""",
        "q30_median_price": """
            SELECT l_returnflag, median(l_extendedprice) AS median_price,
                   MAX(l_quantity) AS max_qty
            FROM lineitem GROUP BY 1""",
        "q29_grouping_rollup": f"""
            SELECT r_name AS cust_region, o_orderstatus,
                   {DEC('o_totalprice')} AS total_price,
                   COUNT(o_orderkey) AS order_count,
                   GROUPING(r_name, o_orderstatus) AS gid
            FROM {J_ORD_CUST}
            GROUP BY ROLLUP(r_name, o_orderstatus)""",
        "m01_media_features": """
            SELECT doc_id AS media_id,
                   CASE CAST(doc_id % 3 AS INTEGER)
                        WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                   md5(text) AS checksum
            FROM documents""",
        # m02: the Spark side PNG-encodes pixels (doc_id + j) % 256 at
        # (4 + doc_id%13) x (3 + doc_id%7) x 3 and decodes them back
        # through the real inflate+unfilter pipeline; the oracle
        # recomputes the same dims and mean pixel arithmetically — a
        # hash match proves the decoder recovered the actual pixels
        "m02_media_decode": """
            SELECT d.doc_id AS media_id,
                   CAST(d.w AS INTEGER) AS width,
                   CAST(d.h AS INTEGER) AS height,
                   CAST(3 AS INTEGER) AS channels,
                   avg((d.doc_id + g.j) % 256) AS mean_px
            FROM (SELECT doc_id, 4 + doc_id % 13 AS w,
                         3 + doc_id % 7 AS h
                  FROM documents WHERE doc_id < 64) d
            JOIN generate_series(0, 431) AS g(j)
              ON g.j < d.w * d.h * 3
            GROUP BY d.doc_id, d.w, d.h""",
        "m03_media_jpeg_dims": """
            SELECT doc_id AS media_id,
                   CAST(16 + doc_id % 1009 AS INTEGER) AS width,
                   CAST(9 + doc_id % 701 AS INTEGER) AS height,
                   CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END
                        AS INTEGER) AS channels
            FROM documents WHERE doc_id < 64""",

        "m04_media_mixed_headers": """
            SELECT doc_id AS media_id,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 10 + doc_id % 97
                             WHEN doc_id % 3 = 1 THEN 8 + doc_id % 89
                             ELSE 0 END AS INTEGER) AS width,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 5 + doc_id % 53
                             WHEN doc_id % 3 = 1 THEN 6 + doc_id % 31
                             ELSE 0 END AS INTEGER) AS height,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 3
                             WHEN doc_id % 3 = 1 THEN
                               CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 3 END
                             ELSE CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END
                        END AS INTEGER) AS channels,
                   CAST(CASE WHEN doc_id % 3 = 2 THEN
                          (CAST(FLOOR(144 * 128000 / 44100) AS BIGINT)
                           * (2 + doc_id % 5) * 8) // 128
                        ELSE NULL END AS INTEGER) AS duration_ms
            FROM documents WHERE doc_id < 96""",

        "w07_rolling_active_users": """
            WITH daily AS (
              SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
            days AS (SELECT DISTINCT d AS day FROM daily)
            SELECT CAST(day AS TIMESTAMP) AS day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
            FROM daily JOIN days ON daily.d <= day AND daily.d > day - 7
            GROUP BY day""",

        # ties inside one microsecond break on event_id in BOTH engines:
        # Spark's load_table truncates the parquet nanos to micros
        # (ns div 1000), so the oracle orders by the same truncation
        "w08_event_transitions": """
            WITH nxt AS (
              SELECT event_type AS from_type,
                     LEAD(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
              FROM events)
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(COUNT(*) / SUM(COUNT(*)) OVER
                         (PARTITION BY from_type), 6) AS prob
            FROM nxt WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type""",

        "t16_fertility_by_language": f"""
            WITH t AS (
              SELECT lang, len({TOKENS}) AS n_tokens,
                     len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'),
                         x -> x <> '')) AS n_pieces
              FROM documents)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_words,
                   CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
                   ROUND(SUM(n_pieces) / GREATEST(SUM(n_tokens), 1), 6)
                     AS fertility
            FROM t GROUP BY lang""",

        # the unigram LM is trained on the same corpus being scored;
        # both engines lowercase the same whitespace tokens, so N, V
        # and every count are integer-identical — the only float work
        # is the log2 fold, rounded to 6 on both sides
        "t17_self_perplexity": f"""
            WITH tok AS (
              SELECT doc_id, lower(t.tok) AS tok
              FROM documents, unnest({TOKENS}) AS t(tok)),
            uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
            tot AS (SELECT SUM(c) AS n_corpus, COUNT(*) AS v_vocab
                    FROM uni),
            dt AS (SELECT doc_id, tok, COUNT(*) AS c_doc
                   FROM tok GROUP BY doc_id, tok)
            SELECT doc_id, CAST(SUM(c_doc) AS BIGINT) AS n_tokens,
                   ROUND(SUM(c_doc * -log2((c + 1.0)
                                           / (n_corpus + v_vocab)))
                         / SUM(c_doc), 6) AS bits_per_token,
                   ROUND(POWER(2.0,
                         SUM(c_doc * -log2((c + 1.0)
                                           / (n_corpus + v_vocab)))
                         / SUM(c_doc)), 6) AS ppl
            FROM dt JOIN uni USING (tok) CROSS JOIN tot
            GROUP BY doc_id""",

        # rank = (count DESC, token ASC) row_number on both sides, so
        # each k's coverage is deterministic
        "t19_vocab_coverage": f"""
            WITH uni AS (
              SELECT lower(t.tok) AS tok, COUNT(*) AS c
              FROM documents, unnest({TOKENS}) AS t(tok) GROUP BY 1),
            ranked AS (
              SELECT c,
                     ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC)
                       AS rnk,
                     SUM(c) OVER (ORDER BY c DESC, tok ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM uni),
            tot AS (SELECT SUM(c) AS total FROM uni)
            SELECT k,
                   CAST((SELECT COUNT(*) FROM ranked WHERE rnk <= k)
                        AS BIGINT) AS distinct_tokens,
                   CAST(COALESCE((SELECT MAX(cum) FROM ranked
                                  WHERE rnk <= k), 0) AS BIGINT)
                     AS covered_tokens,
                   CAST(total AS BIGINT) AS total_tokens,
                   ROUND(COALESCE((SELECT MAX(cum) FROM ranked
                                   WHERE rnk <= k), 0)
                         / GREATEST(total, 1), 6) AS coverage
            FROM (VALUES (100), (1000), (10000)) AS ks(k), tot
            ORDER BY k""",

        # LM trained on the 'en' slice only; unseen tokens coalesce to
        # the add-one floor 1/(N+V+1) and are tallied as OOV
        "t18_ccnet_lm_score": f"""
            WITH lm AS (
              SELECT lower(t.tok) AS tok, COUNT(*) AS c
              FROM documents, unnest({TOKENS}) AS t(tok)
              WHERE lang = 'en' GROUP BY 1),
            tot AS (SELECT SUM(c) AS n_lm, COUNT(*) AS v_lm FROM lm),
            dt AS (
              SELECT doc_id, lower(t.tok) AS tok, COUNT(*) AS c_doc
              FROM documents, unnest({TOKENS}) AS t(tok)
              GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(SUM(c_doc) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN c IS NULL THEN c_doc ELSE 0 END)
                        AS BIGINT) AS oov_tokens,
                   ROUND(SUM(c_doc * -log2((COALESCE(c, 0) + 1.0)
                                           / (n_lm + v_lm + 1.0)))
                         / SUM(c_doc), 6) AS bits_per_token,
                   ROUND(POWER(2.0,
                         SUM(c_doc * -log2((COALESCE(c, 0) + 1.0)
                                           / (n_lm + v_lm + 1.0)))
                         / SUM(c_doc)), 6) AS ppl
            FROM dt LEFT JOIN lm USING (tok) CROSS JOIN tot
            GROUP BY doc_id""",

        # per-lang doc/char totals of the WRITTEN layout must equal the
        # source table's — the round-trip part of the sink contract
        # (file layout itself is pytest territory)
        "x13_curated_layout": """
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS n_chars
            FROM documents GROUP BY lang""",

        "x12_perplexity_filter": f"""
            WITH tok AS (
              SELECT doc_id, lower(t.tok) AS tok
              FROM documents, unnest({TOKENS}) AS t(tok)),
            uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
            tot AS (SELECT SUM(c) AS n_corpus, COUNT(*) AS v_vocab
                    FROM uni),
            dt AS (SELECT doc_id, tok, COUNT(*) AS c_doc
                   FROM tok GROUP BY doc_id, tok),
            sp AS (
              SELECT doc_id, CAST(SUM(c_doc) AS BIGINT) AS n_tokens,
                     SUM(c_doc * -log2((c + 1.0)
                                       / (n_corpus + v_vocab)))
                       / SUM(c_doc) AS bpt
              FROM dt JOIN uni USING (tok) CROSS JOIN tot
              GROUP BY doc_id)
            SELECT doc_id, n_tokens,
                   ROUND(bpt, 6) AS bits_per_token,
                   ROUND(POWER(2.0, bpt), 6) AS ppl,
                   CAST(NTILE(3) OVER (ORDER BY ROUND(bpt, 6), doc_id)
                        AS INTEGER) AS band,
                   NTILE(3) OVER (ORDER BY ROUND(bpt, 6), doc_id) <= 2
                     AS kept
            FROM sp""",

        "x11_gopher_rules": f"""
            WITH m AS (
              SELECT doc_id,
                     CAST(len({TOKENS}) AS INTEGER) AS n_tokens,
                     ROUND(list_sum(list_transform({TOKENS},
                             t -> length(t)))
                           / GREATEST(len({TOKENS}), 1), 6) AS mean_word_len,
                     ROUND(((length(text)
                             - length(replace(text, '#', '')))
                            + (length(text)
                               - length(replace(text, '...', ''))) / 3)
                           / GREATEST(len({TOKENS}), 1), 6) AS symbol_ratio,
                     ROUND(len(list_filter({TOKENS},
                             t -> regexp_matches(t, '[A-Za-z]')))
                           / GREATEST(len({TOKENS}), 1), 6)
                       AS alpha_word_ratio,
                     CAST(len(list_intersect({TOKENS}, [{sw('en')}]))
                          AS INTEGER) AS stopword_hits
              FROM documents)
            SELECT doc_id, n_tokens, mean_word_len, symbol_ratio,
                   alpha_word_ratio, stopword_hits,
                   n_tokens BETWEEN 30 AND 100000 AS r_word_count,
                   mean_word_len BETWEEN 3.0 AND 10.0 AS r_mean_word_len,
                   symbol_ratio <= 0.1 AS r_symbol_ratio,
                   alpha_word_ratio >= 0.8 AS r_alpha_words,
                   stopword_hits >= 1 AS r_stopwords,
                   (n_tokens BETWEEN 30 AND 100000)
                   AND (mean_word_len BETWEEN 3.0 AND 10.0)
                   AND symbol_ratio <= 0.1
                   AND alpha_word_ratio >= 0.8
                   AND stopword_hits >= 1 AS kept
            FROM m""",

        "w01_tumbling_day": f"""
            SELECT date_trunc('day', ts) AS win_start,
                   {DEC('value')} AS sum_value,
                   COUNT(event_id) AS event_count,
                   COUNT(DISTINCT user_id) AS user_count
            FROM events GROUP BY 1""",
        "w02_sliding_2d_1d": f"""
            SELECT ws AS win_start, {DEC('value')} AS sum_value,
                   COUNT(event_id) AS event_count,
                   COUNT(DISTINCT user_id) AS user_count
            FROM (SELECT e.*, date_trunc('day', ts) - i.i * INTERVAL 1 DAY AS ws
                  FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS i) i)
            GROUP BY ws""",
        "w05_funnel": """
            WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
            s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                        JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                     AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
            c AS (SELECT (SELECT COUNT(*) FROM s1) AS c1,
                         (SELECT COUNT(*) FROM s2) AS c2,
                         (SELECT COUNT(*) FROM s3) AS c3)
            SELECT 1 AS step_idx, 'view' AS step, c1 AS users,
                   ROUND(c1 / greatest(c1, 1), 6) AS conversion FROM c
            UNION ALL
            SELECT 2, 'click', c2, ROUND(c2 / greatest(c1, 1), 6) FROM c
            UNION ALL
            SELECT 3, 'purchase', c3, ROUND(c3 / greatest(c1, 1), 6)
            FROM c""",

        "w06_funnel_any_touch": """
            WITH s1 AS (SELECT DISTINCT user_id, ts AS t1 FROM events
                        WHERE event_type = 'view'),
            s2 AS (SELECT s1.user_id, s1.t1, MIN(e.ts) AS t2
                   FROM s1 JOIN events e ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL 7 DAY
                   GROUP BY 1, 2),
            s3 AS (SELECT s2.user_id, s2.t1, MIN(e.ts) AS t3
                   FROM s2 JOIN events e ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                     AND e.ts <= s2.t1 + INTERVAL 7 DAY
                   GROUP BY 1, 2),
            c AS (SELECT (SELECT COUNT(DISTINCT user_id) FROM s1) AS c1,
                         (SELECT COUNT(DISTINCT user_id) FROM s2) AS c2,
                         (SELECT COUNT(DISTINCT user_id) FROM s3) AS c3)
            SELECT 1 AS step_idx, 'view' AS step, c1 AS users,
                   ROUND(c1 / greatest(c1, 1), 6) AS conversion FROM c
            UNION ALL
            SELECT 2, 'click', c2, ROUND(c2 / greatest(c1, 1), 6) FROM c
            UNION ALL
            SELECT 3, 'purchase', c3, ROUND(c3 / greatest(c1, 1), 6)
            FROM c""",

        # same first-touch walk as w05; latencies in integer µs with
        # one division at the end, so avg/median replay bit-for-bit
        "w09_funnel_timing": """
            WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
            s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                        JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                     AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
            f AS (SELECT s1.user_id, t1, t2, t3
                  FROM s1 LEFT JOIN s2 USING (user_id)
                          LEFT JOIN s3 USING (user_id)),
            a AS (SELECT
                    COUNT(t2) AS n2,
                    AVG(date_diff('microsecond', t1, t2)) AS a2,
                    quantile_cont(date_diff('microsecond', t1, t2), 0.5)
                      AS p2,
                    COUNT(t3) AS n3,
                    AVG(date_diff('microsecond', t2, t3)) AS a3,
                    quantile_cont(date_diff('microsecond', t2, t3), 0.5)
                      AS p3
                  FROM f)
            SELECT 2 AS step_idx, 'view->click' AS step, n2 AS users,
                   ROUND(a2 / 1e6, 6) AS avg_seconds,
                   ROUND(p2 / 1e6, 6) AS p50_seconds FROM a
            UNION ALL
            SELECT 3, 'click->purchase', n3,
                   ROUND(a3 / 1e6, 6), ROUND(p3 / 1e6, 6) FROM a""",

        "w10_props_stats": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_with_prop,
                   CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT)
                     AS sum_val,
                   ROUND(AVG(CAST(props->>'$.k' AS BIGINT)), 6)
                     AS avg_val,
                   MIN(CAST(props->>'$.k' AS BIGINT)) AS min_val,
                   MAX(CAST(props->>'$.k' AS BIGINT)) AS max_val
            FROM events GROUP BY event_type""",

        # the oracle replays the near-dup pairs with brute-force exact
        # Jaccard (the LSH path exact-verifies candidates, so at this
        # scale the pair sets coincide), then joins each side's source
        "d16_cross_source_matrix": f"""
            WITH p AS ({neardup}),
            s AS (SELECT doc_id, source FROM documents)
            SELECT least(sa.source, sb.source) AS source_a,
                   greatest(sa.source, sb.source) AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM p JOIN s sa ON p.a_id = sa.doc_id
                   JOIN s sb ON p.b_id = sb.doc_id
            GROUP BY 1, 2""",

        # integer rolling sums -> exact variance numerator; the only
        # float ops are the final divide/sqrt, rounded to 6
        "w12_daily_anomalies": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            r AS (
              SELECT event_type, day, n,
                     COUNT(n) OVER w AS k, SUM(n) OVER w AS s,
                     SUM(n * n) OVER w AS q
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
            SELECT event_type, day, n,
                   ROUND(s * 1.0 / k, 6) AS mean_prev,
                   ROUND(CASE WHEN k >= 3
                              AND (k * q - s * s) * 1.0
                                  / (k * (k - 1)) > 0
                         THEN (n - s * 1.0 / k)
                              / sqrt((k * q - s * s) * 1.0
                                     / (k * (k - 1))) END, 6) AS z,
                   CASE WHEN k >= 3 AND (k * q - s * s) * 1.0
                             / (k * (k - 1)) > 0
                        THEN abs(ROUND((n - s * 1.0 / k)
                             / sqrt((k * q - s * s) * 1.0
                                    / (k * (k - 1))), 6)) > 3.0
                        WHEN k >= 3 AND k * q = s * s
                        THEN n * k <> s
                        END AS is_anomaly
            FROM r""",

        # same gap-islands session replay as w03; durations in integer
        # µs with one division at the end (funnel_timing's contract)
        "w11_session_stats": """
            WITH marked AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked),
            per AS (
              SELECT user_id, sid,
                     CAST(COUNT(*) AS BIGINT) AS n_events,
                     date_diff('microsecond', MIN(ts), MAX(ts)) AS dur_us
              FROM sess GROUP BY user_id, sid)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(SUM(n_events) AS BIGINT) AS n_events,
                   ROUND(AVG(n_events), 6) AS avg_events,
                   ROUND(AVG(dur_us) / 1e6, 6) AS avg_seconds,
                   ROUND(quantile_cont(dur_us, 0.5) / 1e6, 6)
                     AS p50_seconds,
                   ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                         * 1.0 / COUNT(*), 6) AS bounce_rate
            FROM per""",

        "w04_retention_cohorts": """
            WITH f AS (SELECT user_id, MIN(date_trunc('week', ts))
                              AS cohort_week
                       FROM events GROUP BY 1),
            a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                  FROM events)
            SELECT cohort_week,
                   CAST(floor(date_diff('day', cohort_week, wk) / 7)
                        AS BIGINT) AS week_offset,
                   COUNT(DISTINCT user_id) AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY 1, 2""",

        "t12_boilerplate_fraction": f"""
            WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
            g AS (SELECT doc_id,
                         list_distinct(CASE WHEN len(toks) >= 3 THEN
                           list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(toks[i:i+2], ' '))
                         ELSE [] END) AS grams FROM t),
            e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            b AS (SELECT gram FROM e GROUP BY 1 HAVING COUNT(*) >= 5),
            c AS (SELECT e.doc_id, COUNT(*) AS n_boiler
                  FROM e JOIN b USING (gram) GROUP BY 1)
            SELECT g.doc_id,
                   CAST(len(grams) AS INTEGER) AS n_distinct_grams,
                   CAST(COALESCE(n_boiler, 0) AS BIGINT) AS n_boilerplate,
                   round(CASE WHEN len(grams) > 0
                              THEN COALESCE(n_boiler, 0) * 1.0 / len(grams)
                              ELSE 0 END, 6) AS boilerplate_frac
            FROM g LEFT JOIN c USING (doc_id)""",

        "w03_session_30m": f"""
            WITH marked AS (
              SELECT user_id, ts, value, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked)
            SELECT user_id, MIN(ts) AS session_start,
                   {DEC('value')} AS sum_value,
                   COUNT(event_id) AS event_count
            FROM sess GROUP BY user_id, sid""",
        "d01_exact_dups": """
            SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
                   COUNT(*) AS dup_count
            FROM documents GROUP BY 1""",
        "d02_neardup_brute": neardup,
        "d03_neardup_minhash_lsh": neardup,
        "d11_neardup_jaccard_spill": f"""
            WITH sh AS ({shingles}),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            freq AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY g),
            ord AS (
              SELECT e.doc_id, e.g,
                     row_number() OVER (
                       PARTITION BY e.doc_id ORDER BY f.df, e.g) AS rn,
                     COUNT(*) OVER (PARTITION BY e.doc_id) AS sz
              FROM ex e JOIN freq f USING (g)),
            pref AS (
              SELECT * FROM ord
              WHERE rn <= sz - ceil(0.5 * sz - 1e-9) + 1),
            hotg AS (
              SELECT g FROM pref GROUP BY g HAVING COUNT(*) > 2),
            hotd AS (
              SELECT DISTINCT doc_id FROM pref
              WHERE g IN (SELECT g FROM hotg)),
            pairs AS ({neardup})
            SELECT a_id, b_id, jaccard,
                   (a_id IN (SELECT doc_id FROM hotd)
                    OR b_id IN (SELECT doc_id FROM hotd)) AS approximate
            FROM pairs""",
        # exact algorithm, different plan: the prefix-filter join must
        # reproduce the brute-force pairs bit-for-bit
        "d09_neardup_jaccard_prefix": neardup,
        # ingest-time exact dedup vs frozen prefix index: identical
        # to a cross-set brute-force join
        "d10_neardup_jaccard_index": neardup_cross,
        "d08_decontamination": f"""
            WITH sh AS (
              SELECT doc_id, source,
                     list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                    for i in range(1, len(w) - 1)]) AS s
              FROM (SELECT doc_id, source, {TOKENS} AS w FROM documents)
              WHERE len(w) >= 3)
            SELECT train_id, eval_id, jaccard FROM (
              SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
                     round(len(list_intersect(a.s, b.s)) * 1.0 /
                           len(list_distinct(list_concat(a.s, b.s))), 6)
                       AS jaccard
              FROM sh a JOIN sh b
                ON a.source <> 'src0' AND b.source = 'src0')
            WHERE jaccard >= 0.5""",
        "d07_neardup_clusters": f"""
            WITH RECURSIVE
            sh AS ({shingles}),
            p AS (
              SELECT a_id, b_id FROM (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       len(list_intersect(a.s, b.s)) * 1.0 /
                       len(list_distinct(list_concat(a.s, b.s))) AS j
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
              WHERE j >= 0.5),
            e AS (SELECT a_id AS x, b_id AS y FROM p
                  UNION SELECT b_id, a_id FROM p),
            reach(s, t) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.s, e.y FROM reach r JOIN e ON r.t = e.x)
            SELECT s AS doc_id, MIN(t) AS cluster FROM reach GROUP BY s""",
        "d05_embedding_neardup": """
            SELECT a_id, b_id, cosine FROM (
              SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                     round(list_cosine_similarity(
                         a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            WHERE cosine >= 0.4""",
        "s01_cosine_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 7)),
                     6) AS cosine
            FROM embeddings WHERE vec_id <> 7
            ORDER BY cosine DESC, vec_id LIMIT 10""",
        "t01_token_stats": f"""
            SELECT doc_id,
                   CAST(len({TOKENS}) AS INTEGER) AS n_tokens,
                   CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'),
                        x -> x <> '')) AS INTEGER) AS n_subword_pieces,
                   CAST(length(text) AS INTEGER) AS n_chars_measured,
                   round(length(text) * 1.0 / len({TOKENS}), 6) AS chars_per_token
            FROM documents""",
        "t02_language_id": f"""
            WITH h AS (
              SELECT doc_id,
                     CAST(len(list_intersect({TOKENS}, [{sw('en')}])) AS INTEGER) AS en_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('de')}])) AS INTEGER) AS de_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('fr')}])) AS INTEGER) AS fr_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('es')}])) AS INTEGER) AS es_hits
              FROM documents)
            SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
                   CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
                        THEN 'unknown'
                        WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                        THEN 'en'
                        WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                        THEN 'de'
                        WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                        THEN 'fr'
                        ELSE 'es' END AS predicted_lang
            FROM h""",
        "t03_quality_score": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len({TOKENS}) AS INTEGER) AS n_tokens,
                     round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /
                           greatest(length(text), 1), 6) AS punct_ratio,
                     round(len(list_filter({TOKENS},
                           t -> list_contains([{sw('en')}], t))) * 1.0 /
                           greatest(len({TOKENS}), 1), 6) AS stopword_ratio,
                     round(list_sum(list_transform({TOKENS}, t -> length(t))) * 1.0 /
                           greatest(len({TOKENS}), 1), 6) AS mean_word_len
              FROM documents)
            SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, mean_word_len,
                   round((CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN mean_word_len BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN stopword_ratio >= 0.02 THEN 0.25 ELSE 0.0 END),
                         2) AS quality
            FROM t""",
        "t04_fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents""",
        # approximate operators: candidate generation is integer-exact
        # and engine-portable, so DuckDB replays it bit-for-bit (recall
        # vs the exact counterparts is additionally asserted in
        # tests/test_operators.py)
        "d04_neardup_simhash": _oracle_simhash(max_hamming=3),
        # m05's arithmetic-replay idea on the time axis: the frame
        # energies, 64-bit MSB-first hash, signed conversion, band
        # join and hamming — all codec-free SQL
        "m06_audio_ahash_pairs": """
            WITH ids AS (SELECT doc_id AS i FROM documents
                         WHERE doc_id < 64),
            hv AS (
              SELECT i,
                list_sum(list_transform(range(0, 64), f ->
                  CASE WHEN
                    abs(CASE WHEN i % 2 = 1 AND f = 0
                        THEN ((i - (i % 2)) * 37 + 700) % 2048 - 1024
                        ELSE ((i - (i % 2)) * 37 + f * 53) % 2048
                             - 1024 END)
                    >
                    abs(((i - (i % 2)) * 37 + (f + 1) * 53) % 2048
                        - 1024)
                  THEN (CAST(1 AS HUGEINT) << (63 - f))
                  ELSE CAST(0 AS HUGEINT) END)) AS u
              FROM ids),
            hb AS (SELECT i,
                          CAST(CASE WHEN u >= (CAST(1 AS HUGEINT) << 63)
                               THEN u - (CAST(1 AS HUGEINT) << 64)
                               ELSE u END AS BIGINT) AS ahash, u
                   FROM hv),
            ch AS (SELECT i, ahash, r.c AS c,
                          CAST((u >> (r.c * 16)) % 65536 AS BIGINT)
                            AS chunk
                   FROM hb, range(0, 4) AS r(c)),
            p AS (SELECT DISTINCT a.i AS a_id, b.i AS b_id,
                         bit_count(xor(a.ahash, b.ahash)) AS hamming
                  FROM ch a JOIN ch b
                    ON a.c = b.c AND a.chunk = b.chunk AND a.i < b.i)
            SELECT CAST(a_id AS BIGINT) AS a_id,
                   CAST(b_id AS BIGINT) AS b_id,
                   CAST(hamming AS INTEGER) AS hamming
            FROM p WHERE hamming <= 3""",
        # pure-arithmetic dHash replay (no codec): the generated cell
        # values, the 64-bit MSB-first hash, the signed conversion,
        # the 4x16-bit band join and bit_count hamming — all in SQL
        "m05_image_phash_pairs": """
            WITH ids AS (SELECT doc_id AS i FROM documents
                         WHERE doc_id < 64),
            hv AS (
              SELECT i,
                list_sum(flatten(list_transform(range(0, 8), cy ->
                  list_transform(range(0, 8), cx ->
                    CASE WHEN
                      (CASE WHEN i % 2 = 1 AND cy = 0 AND cx = 0
                            THEN ((i - (i % 2)) * 31 + cy * 17
                                  + cx * 29 + 40) % 256
                            ELSE ((i - (i % 2)) * 31 + cy * 17
                                  + cx * 29) % 256 END)
                      >
                      ((i - (i % 2)) * 31 + cy * 17
                       + (cx + 1) * 29) % 256
                    THEN (CAST(1 AS HUGEINT) << (63 - (cy * 8 + cx)))
                    ELSE CAST(0 AS HUGEINT) END)))) AS u
              FROM ids),
            hb AS (SELECT i,
                          CAST(CASE WHEN u >= (CAST(1 AS HUGEINT) << 63)
                               THEN u - (CAST(1 AS HUGEINT) << 64)
                               ELSE u END AS BIGINT) AS dhash, u
                   FROM hv),
            ch AS (SELECT i, dhash,
                          r.c AS c,
                          CAST((u >> (r.c * 16)) % 65536 AS BIGINT)
                            AS chunk
                   FROM hb, range(0, 4) AS r(c)),
            p AS (SELECT DISTINCT a.i AS a_id, b.i AS b_id,
                         bit_count(xor(a.dhash, b.dhash)) AS hamming
                  FROM ch a JOIN ch b
                    ON a.c = b.c AND a.chunk = b.chunk AND a.i < b.i)
            SELECT CAST(a_id AS BIGINT) AS a_id,
                   CAST(b_id AS BIGINT) AS b_id,
                   CAST(hamming AS INTEGER) AS hamming
            FROM p WHERE hamming <= 3""",
        "d06_embedding_neardup_lsh": _oracle_neardup_lsh(threshold=0.4),
        "d12_semantic_dedup": _oracle_semantic_dedup(threshold=0.4, n_cells=8),
        "d15_semantic_contamination": _oracle_semantic_contamination(
            threshold=0.4, n_cells=8),
        "s02_ann_lsh_topk": _oracle_ann_lsh(query_vec_id=7, k=10),
        "s03_ann_ivf_topk": _oracle_ann_ivf(query_vec_id=7, k=10),
        # the partition-pruned layout path must be value-identical to
        # the inline IVF plan, so it shares the same oracle
        "s04_ann_ivf_layout": _oracle_ann_ivf(query_vec_id=7, k=10),
        "s10_projected_topk": _oracle_projected_topk(),
        "t13_hashed_features": _oracle_hashed_features(),
        "s05_ann_batch_lsh": _oracle_ann_batch_lsh(),
        "s06_ann_batch_ivf": _oracle_ann_batch_ivf(),
        "s07_ann_batch_layout": _oracle_ann_batch_ivf(),
        "c01_clean_corpus": _oracle_clean_corpus(),
        "t05_corpus_stats": f"""
            WITH t AS (SELECT doc_id, CAST(len({TOKENS}) AS INTEGER) AS n_tokens
                       FROM documents),
            q AS (
              SELECT doc_id,
                     round((CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END) +
                           (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END) +
                           (CASE WHEN mean_word_len BETWEEN 3 AND 12
                                 THEN 0.25 ELSE 0.0 END) +
                           (CASE WHEN stopword_ratio >= 0.02
                                 THEN 0.25 ELSE 0.0 END), 2) AS quality
              FROM (
                SELECT doc_id,
                       CAST(len({TOKENS}) AS INTEGER) AS n_tokens,
                       round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                             * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,
                       round(len(list_filter({TOKENS},
                             t -> list_contains([{sw('en')}], t))) * 1.0 /
                             greatest(len({TOKENS}), 1), 6) AS stopword_ratio,
                       round(list_sum(list_transform({TOKENS}, t -> length(t)))
                             * 1.0 / greatest(len({TOKENS}), 1), 6) AS mean_word_len
                FROM documents)),
            l AS (
              SELECT doc_id,
                     CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
                          THEN 'unknown'
                          WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'en'
                          WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'de'
                          WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'fr'
                          ELSE 'es' END AS predicted_lang
              FROM (
                SELECT doc_id,
                       CAST(len(list_intersect({TOKENS}, [{sw('en')}])) AS INTEGER) AS en_hits,
                       CAST(len(list_intersect({TOKENS}, [{sw('de')}])) AS INTEGER) AS de_hits,
                       CAST(len(list_intersect({TOKENS}, [{sw('fr')}])) AS INTEGER) AS fr_hits,
                       CAST(len(list_intersect({TOKENS}, [{sw('es')}])) AS INTEGER) AS es_hits
                FROM documents))
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(t.n_tokens) AS BIGINT) AS total_tokens,
                   ROUND(CAST(SUM(CAST(q.quality AS DECIMAL(25,6))) AS DOUBLE)
                         / COUNT(*), 6) AS mean_quality,
                   CAST(SUM(CASE WHEN predicted_lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                   CAST(SUM(CASE WHEN predicted_lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
                   CAST(SUM(CASE WHEN predicted_lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
                   CAST(SUM(CASE WHEN predicted_lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
                   CAST(SUM(CASE WHEN predicted_lang = 'unknown' THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown
            FROM t JOIN q USING (doc_id) JOIN l USING (doc_id)""",
        # split bucket = first 8 md5 hex digits of 'salt:id' mod 10000
        # (32-bit value; digit-fold replays Spark's conv(...,16,10))
        "c02_top_docs_per_lang": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len({TOKENS}) AS INTEGER) AS n_tokens,
                     round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /
                           greatest(length(text), 1), 6) AS punct_ratio,
                     round(len(list_filter({TOKENS},
                           t -> list_contains([{sw('en')}], t))) * 1.0 /
                           greatest(len({TOKENS}), 1), 6) AS stopword_ratio,
                     round(list_sum(list_transform({TOKENS}, t -> length(t))) * 1.0 /
                           greatest(len({TOKENS}), 1), 6) AS mean_word_len
              FROM documents),
            qual AS (
              SELECT doc_id,
                   round((CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN mean_word_len BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN stopword_ratio >= 0.02 THEN 0.25 ELSE 0.0 END),
                         2) AS quality
              FROM t),
            h AS (
              SELECT doc_id,
                     CAST(len(list_intersect({TOKENS}, [{sw('en')}])) AS INTEGER) AS en_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('de')}])) AS INTEGER) AS de_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('fr')}])) AS INTEGER) AS fr_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('es')}])) AS INTEGER) AS es_hits
              FROM documents),
            lang AS (
              SELECT doc_id,
                     CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
                          THEN 'unknown'
                          WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'en'
                          WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'de'
                          WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'fr'
                          ELSE 'es' END AS predicted_lang
              FROM h)
            SELECT doc_id, predicted_lang, quality,
                   CAST(lang_rank AS INTEGER) AS lang_rank
            FROM (
              SELECT qual.doc_id, lang.predicted_lang, qual.quality,
                     row_number() OVER (PARTITION BY lang.predicted_lang
                                        ORDER BY qual.quality DESC,
                                                 qual.doc_id) AS lang_rank
              FROM qual JOIN lang USING (doc_id))
            WHERE lang_rank <= 50""",

        "x03_token_budget_pack": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len({TOKENS}) AS INTEGER) AS n_tokens,
                     round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /
                           greatest(length(text), 1), 6) AS punct_ratio,
                     round(len(list_filter({TOKENS},
                           t -> list_contains([{sw('en')}], t))) * 1.0 /
                           greatest(len({TOKENS}), 1), 6) AS stopword_ratio,
                     round(list_sum(list_transform({TOKENS}, t -> length(t))) * 1.0 /
                           greatest(len({TOKENS}), 1), 6) AS mean_word_len
              FROM documents),
            qual AS (
              SELECT doc_id, n_tokens,
                   round((CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN mean_word_len BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN stopword_ratio >= 0.02 THEN 0.25 ELSE 0.0 END),
                         2) AS quality
              FROM t),
            h AS (
              SELECT doc_id,
                     CAST(len(list_intersect({TOKENS}, [{sw('en')}])) AS INTEGER) AS en_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('de')}])) AS INTEGER) AS de_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('fr')}])) AS INTEGER) AS fr_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('es')}])) AS INTEGER) AS es_hits
              FROM documents),
            lang AS (
              SELECT doc_id,
                     CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
                          THEN 'unknown'
                          WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'en'
                          WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'de'
                          WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'fr'
                          ELSE 'es' END AS predicted_lang
              FROM h)
            SELECT doc_id, predicted_lang, quality, n_tokens, cum_tokens
            FROM (
              SELECT qual.doc_id, lang.predicted_lang, qual.quality,
                     qual.n_tokens,
                     CAST(SUM(qual.n_tokens) OVER (
                            PARTITION BY lang.predicted_lang
                            ORDER BY qual.quality DESC, qual.doc_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_tokens
              FROM qual JOIN lang USING (doc_id))
            WHERE cum_tokens - n_tokens < 5000""",

        "t08_source_stats": f"""
            WITH t AS (
              SELECT doc_id, source,
                     CAST(len({TOKENS}) AS INTEGER) AS n_tokens,
                     round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /
                           greatest(length(text), 1), 6) AS punct_ratio,
                     round(len(list_filter({TOKENS},
                           t -> list_contains([{sw('en')}], t))) * 1.0 /
                           greatest(len({TOKENS}), 1), 6) AS stopword_ratio,
                     round(list_sum(list_transform({TOKENS}, t -> length(t))) * 1.0 /
                           greatest(len({TOKENS}), 1), 6) AS mean_word_len
              FROM documents),
            qual AS (
              SELECT doc_id, source, n_tokens,
                   round((CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN mean_word_len BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END) +
                         (CASE WHEN stopword_ratio >= 0.02 THEN 0.25 ELSE 0.0 END),
                         2) AS quality
              FROM t)
            SELECT source, COUNT(doc_id) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                   round(CAST(SUM(CAST(quality AS DECIMAL(25,6))) AS DOUBLE)
                         / COUNT(doc_id), 6) AS mean_quality
            FROM qual GROUP BY source""",

        "t10_repetition_ratio": f"""
            WITH t AS (SELECT doc_id, {TOKENS} AS toks FROM documents),
            g AS (SELECT doc_id,
                         CASE WHEN len(toks) >= 3 THEN
                           list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(toks[i:i+2], ' '))
                         ELSE [] END AS grams FROM t)
            SELECT doc_id,
                   CAST(len(grams) AS INTEGER) AS total_ngrams,
                   CAST(len(list_distinct(grams)) AS INTEGER)
                     AS distinct_ngrams,
                   round(CASE WHEN len(grams) > 0
                              THEN 1 - len(list_distinct(grams)) * 1.0
                                   / len(grams)
                              ELSE 0 END, 6) AS repetition_ratio
            FROM g""",

        "t11_pii_redaction": f"""
            WITH s1 AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text,
                       '{textstats.PII_EMAIL}')) AS INTEGER) AS n_emails,
                     regexp_replace(text, '{textstats.PII_EMAIL}',
                                    '<EMAIL>', 'g') AS t1
              FROM documents),
            s2 AS (
              SELECT doc_id, n_emails,
                     CAST(len(regexp_extract_all(t1,
                       '{textstats.PII_IPV4}')) AS INTEGER) AS n_ips,
                     regexp_replace(t1, '{textstats.PII_IPV4}',
                                    '<IP>', 'g') AS t2
              FROM s1)
            SELECT doc_id,
                   regexp_replace(t2, '{textstats.PII_PHONE}',
                                  '<PHONE>', 'g') AS clean_text,
                   n_emails, n_ips,
                   CAST(len(regexp_extract_all(t2,
                     '{textstats.PII_PHONE}')) AS INTEGER) AS n_phones
            FROM s2""",

        "t09_language_confusion": f"""
            WITH h AS (
              SELECT doc_id, lang AS true_lang,
                     CAST(len(list_intersect({TOKENS}, [{sw('en')}])) AS INTEGER) AS en_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('de')}])) AS INTEGER) AS de_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('fr')}])) AS INTEGER) AS fr_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('es')}])) AS INTEGER) AS es_hits
              FROM documents)
            SELECT true_lang,
                   CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
                        THEN 'unknown'
                        WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                        THEN 'en'
                        WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                        THEN 'de'
                        WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                        THEN 'fr'
                        ELSE 'es' END AS predicted_lang,
                   COUNT(doc_id) AS n_docs
            FROM h GROUP BY 1, 2""",

        "t06_top_tokens": f"""
            SELECT token, COUNT(*) AS occurrences
            FROM (SELECT unnest({TOKENS}) AS token FROM documents)
            WHERE token <> ''
            GROUP BY token
            ORDER BY occurrences DESC, token LIMIT 20""",

        "t07_length_histogram": f"""
            SELECT (len({TOKENS}) // 50) * 50 AS bucket_lo,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY 1 ORDER BY 1""",

        "x02_stratified_sample": f"""
            WITH h AS (
              SELECT doc_id,
                     CAST(len(list_intersect({TOKENS}, [{sw('en')}])) AS INTEGER) AS en_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('de')}])) AS INTEGER) AS de_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('fr')}])) AS INTEGER) AS fr_hits,
                     CAST(len(list_intersect({TOKENS}, [{sw('es')}])) AS INTEGER) AS es_hits
              FROM documents),
            lang AS (
              SELECT doc_id,
                     CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
                          THEN 'unknown'
                          WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'en'
                          WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'de'
                          WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
                          THEN 'fr'
                          ELSE 'es' END AS predicted_lang
              FROM h),
            b AS (
              SELECT doc_id,
                     list_reduce(list_transform(range(1, 9),
                       i -> CAST(strpos('0123456789abcdef',
                                 substring(md5('sample-v1:' || doc_id), i, 1))
                            - 1 AS BIGINT)),
                       (x, y) -> x * 16 + y) % 10000 AS bucket
              FROM documents)
            SELECT lang.doc_id, lang.predicted_lang
            FROM lang JOIN b USING (doc_id)
            WHERE b.bucket < CASE lang.predicted_lang
                               WHEN 'en' THEN 5000
                               WHEN 'unknown' THEN 500
                               ELSE 2000 END""",

        "t14_bigram_novelty": r"""
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents),
            g AS (
              SELECT doc_id, md5(array_to_string(toks[i:i+1], ' ')) AS gr
              FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1))
                        AS r(i)),
            freq AS (SELECT gr, COUNT(*) AS c FROM g GROUP BY gr),
            per AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                     CAST(SUM(CASE WHEN c <= 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_rare
              FROM g JOIN freq USING (gr) GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(n_bigrams, 0) AS n_bigrams,
                   COALESCE(n_rare, 0) AS n_rare,
                   round(COALESCE(n_rare, 0) * 1.0 /
                         greatest(COALESCE(n_bigrams, 0), 1), 6) AS novelty
            FROM documents d LEFT JOIN per USING (doc_id)""",

        "x10_mixture_temperature": r"""
            WITH per AS (
              SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY lang),
            q2 AS (SELECT *,
                          CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                               AS DECIMAL(25,6)) AS s
                   FROM per),
            tot AS (SELECT SUM(s) AS ts,
                           CAST(SUM(n_tokens) AS BIGINT) AS tn FROM q2)
            SELECT lang, n_docs, n_tokens,
                   round(CAST(s AS DOUBLE) / CAST(ts AS DOUBLE), 6) AS p,
                   round(CAST(s AS DOUBLE) / CAST(ts AS DOUBLE) * tn /
                         greatest(n_tokens, 1), 6) AS repetition_factor
            FROM q2, tot""",

        "x08_dsir_sample": f"""
            WITH t AS (
              SELECT doc_id, lang,
                     string_split_regex(trim(text), '\\s+') AS toks
              FROM documents),
            g AS (
              SELECT doc_id, lang,
                     {_MD5_FOLD8.format(expr="gram")} % 64 AS b
              FROM (SELECT doc_id, lang,
                           unnest(list_transform(
                             range(1, greatest(len(toks) - 1, 0) + 1),
                             i -> array_to_string(toks[i:i+1], ' ')))
                             AS gram
                    FROM t)),
            raw AS (SELECT b, COUNT(*) AS nr FROM g GROUP BY b),
            tgt AS (SELECT b, COUNT(*) AS nt FROM g
                    WHERE lang = 'en' GROUP BY b),
            w AS (SELECT raw.b,
                         CAST(length(bin(COALESCE(nt, 0) + 1)) -
                              length(bin(nr + 1)) AS BIGINT) AS wt
                  FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
            dc AS (SELECT doc_id, b, COUNT(*) AS c FROM g
                   GROUP BY doc_id, b),
            sc AS (SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
                          CAST(SUM(c * wt) AS BIGINT) AS raw_score
                   FROM dc JOIN w USING (b) GROUP BY dc.doc_id),
            f AS (SELECT d.doc_id,
                         COALESCE(n_grams, 0) AS n_grams,
                         COALESCE(raw_score, 0) AS raw_score,
                         round(COALESCE(raw_score, 0) * 1.0 /
                               greatest(COALESCE(n_grams, 0), 1), 6)
                           AS mean_weight
                  FROM documents d LEFT JOIN sc USING (doc_id)),
            ranked AS (SELECT *, row_number() OVER (
                         ORDER BY mean_weight DESC, doc_id) AS rn FROM f)
            SELECT doc_id, n_grams, raw_score, mean_weight FROM ranked
            WHERE rn <= (SELECT CAST(floor(COUNT(*) * 0.25) AS BIGINT)
                         FROM documents)""",

        "d13_duplicate_spans": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
            g AS (
              SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                     md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM toks, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                           AS r(i)),
            dup AS (SELECT gr FROM g GROUP BY gr
                    HAVING COUNT(DISTINCT doc_id) >= 2),
            occ AS (SELECT doc_id, pos AS s, pos + 4 AS e
                    FROM g JOIN dup USING (gr)),
            m AS (SELECT doc_id, s, e,
                         max(e) OVER (PARTITION BY doc_id ORDER BY s
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pe
                  FROM occ),
            isl AS (SELECT doc_id, s, e,
                           SUM(CASE WHEN pe IS NULL OR s > pe + 1
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS island
                    FROM m)
            SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
                   MAX(e) - MIN(s) + 1 AS span_tokens,
                   COUNT(*) AS n_grams
            FROM isl GROUP BY doc_id, island""",

        # d14's islands replay partitioned per (train doc, benchmark)
        # then rolled up per benchmark
        "d17_contamination_by_benchmark": r"""
            WITH tr AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE source NOT IN ('src0', 'src1')),
            ev AS (
              SELECT doc_id, source AS benchmark,
                     string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE source IN ('src0', 'src1')),
            g AS (
              SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                     md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM tr, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                         AS r(i)),
            eg AS (
              SELECT DISTINCT benchmark,
                     md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM ev, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                         AS r(i)),
            occ AS (SELECT doc_id, benchmark, pos AS s, pos + 4 AS e
                    FROM g JOIN eg USING (gr)),
            m AS (SELECT doc_id, benchmark, s, e,
                         max(e) OVER (PARTITION BY doc_id, benchmark
                                      ORDER BY s
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pe
                  FROM occ),
            isl AS (SELECT doc_id, benchmark, s, e,
                           SUM(CASE WHEN pe IS NULL OR s > pe + 1
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY doc_id, benchmark
                                   ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS island
                    FROM m),
            sp AS (SELECT benchmark, doc_id,
                          MAX(e) - MIN(s) + 1 AS span_tokens
                   FROM isl GROUP BY benchmark, doc_id, island)
            SELECT benchmark,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT)
                     AS n_train_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(span_tokens) AS BIGINT)
                     AS contaminated_tokens
            FROM sp GROUP BY benchmark""",

        "d14_contaminated_spans": r"""
            WITH tr AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE source <> 'src0'),
            ev AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE source = 'src0'),
            g AS (
              SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                     md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM tr, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                         AS r(i)),
            eg AS (
              SELECT DISTINCT md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM ev, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                         AS r(i)),
            occ AS (SELECT doc_id, pos AS s, pos + 4 AS e
                    FROM g JOIN eg USING (gr)),
            m AS (SELECT doc_id, s, e,
                         max(e) OVER (PARTITION BY doc_id ORDER BY s
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pe
                  FROM occ),
            isl AS (SELECT doc_id, s, e,
                           SUM(CASE WHEN pe IS NULL OR s > pe + 1
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS island
                    FROM m)
            SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
                   MAX(e) - MIN(s) + 1 AS span_tokens,
                   COUNT(*) AS n_grams
            FROM isl GROUP BY doc_id, island""",

        "t15_duplication_profile": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
            g AS (
              SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                     md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM toks, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                           AS r(i)),
            dup AS (SELECT gr FROM g GROUP BY gr
                    HAVING COUNT(DISTINCT doc_id) >= 2),
            occ AS (SELECT doc_id, pos AS s, pos + 4 AS e
                    FROM g JOIN dup USING (gr)),
            m AS (SELECT doc_id, s, e,
                         max(e) OVER (PARTITION BY doc_id ORDER BY s
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pe
                  FROM occ),
            isl AS (SELECT doc_id, s, e,
                           SUM(CASE WHEN pe IS NULL OR s > pe + 1
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS island
                    FROM m),
            spans AS (SELECT doc_id, MAX(e) - MIN(s) + 1 AS stok
                      FROM isl GROUP BY doc_id, island),
            pd AS (SELECT doc_id, SUM(stok) AS dup_t FROM spans
                   GROUP BY doc_id),
            base AS (
              SELECT d.doc_id, d.source,
                     CAST(len(string_split_regex(trim(d.text), '\s+'))
                          AS BIGINT) AS nt,
                     pd.dup_t
              FROM documents d LEFT JOIN pd USING (doc_id))
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN dup_t IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS docs_with_dups,
                   CAST(SUM(nt) AS BIGINT) AS total_tokens,
                   CAST(COALESCE(SUM(dup_t), 0) AS BIGINT)
                     AS duplicated_tokens,
                   round(COALESCE(SUM(dup_t), 0) * 1.0 /
                         greatest(SUM(nt), 1), 6) AS dup_token_fraction
            FROM base GROUP BY source""",

        "x07_trim_duplicate_spans": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
            tok AS (
              SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t[i] AS w
              FROM toks, unnest(range(1, len(t) + 1)) AS r(i)),
            g AS (
              SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                     md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM toks, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                           AS r(i)),
            dup AS (SELECT gr FROM g GROUP BY gr
                    HAVING COUNT(DISTINCT doc_id) >= 2),
            occ AS (SELECT doc_id, pos AS s, pos + 4 AS e
                    FROM g JOIN dup USING (gr)),
            m AS (SELECT doc_id, s, e,
                         max(e) OVER (PARTITION BY doc_id ORDER BY s
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pe
                  FROM occ),
            isl AS (SELECT doc_id, s, e,
                           SUM(CASE WHEN pe IS NULL OR s > pe + 1
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS island
                    FROM m),
            spans AS (SELECT doc_id, MIN(s) AS ss, MAX(e) AS se
                      FROM isl GROUP BY doc_id, island),
            kept AS (
              SELECT tok.doc_id,
                     string_agg(tok.w, ' ' ORDER BY tok.pos) AS clean_text,
                     COUNT(*) AS n_tokens_kept
              FROM tok
              WHERE NOT EXISTS (SELECT 1 FROM spans
                                WHERE spans.doc_id = tok.doc_id
                                  AND tok.pos BETWEEN spans.ss AND spans.se)
              GROUP BY tok.doc_id),
            tot AS (SELECT doc_id, COUNT(*) AS total FROM tok GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(kept.clean_text, '') AS clean_text,
                   COALESCE(kept.n_tokens_kept, 0) AS n_tokens_kept,
                   COALESCE(tot.total, 0) - COALESCE(kept.n_tokens_kept, 0)
                     AS removed_tokens
            FROM documents d
            LEFT JOIN kept USING (doc_id)
            LEFT JOIN tot USING (doc_id)""",

        "x09_decontaminate_corpus": r"""
            WITH tr AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE source <> 'src0'),
            ev AS (
              SELECT string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE source = 'src0'),
            g AS (
              SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                     md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM tr, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                         AS r(i)),
            eg AS (
              SELECT DISTINCT md5(array_to_string(t[i:i+4], ' ')) AS gr
              FROM ev, unnest(range(1, greatest(len(t) - 4, 0) + 1))
                         AS r(i)),
            occ AS (SELECT doc_id, pos AS s, pos + 4 AS e
                    FROM g JOIN eg USING (gr)),
            m AS (SELECT doc_id, s, e,
                         max(e) OVER (PARTITION BY doc_id ORDER BY s
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pe
                  FROM occ),
            isl AS (SELECT doc_id, s, e,
                           SUM(CASE WHEN pe IS NULL OR s > pe + 1
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY doc_id ORDER BY s
                                   ROWS UNBOUNDED PRECEDING) AS island
                    FROM m),
            spans AS (SELECT doc_id, MIN(s) AS ss, MAX(e) AS se,
                             MAX(e) - MIN(s) + 1 AS stok
                      FROM isl GROUP BY doc_id, island),
            contam AS (SELECT doc_id, SUM(stok) AS ct FROM spans
                       GROUP BY doc_id),
            surv AS (SELECT tr.doc_id, tr.t
                     FROM tr LEFT JOIN contam USING (doc_id)
                     WHERE COALESCE(ct, 0) <= len(tr.t) * 0.2),
            tok AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t[i] AS w
                    FROM surv, unnest(range(1, len(t) + 1)) AS r(i)),
            kept AS (
              SELECT tok.doc_id,
                     string_agg(tok.w, ' ' ORDER BY tok.pos) AS clean_text,
                     COUNT(*) AS n_tokens_kept
              FROM tok
              WHERE NOT EXISTS (SELECT 1 FROM spans
                                WHERE spans.doc_id = tok.doc_id
                                  AND tok.pos BETWEEN spans.ss AND spans.se)
              GROUP BY tok.doc_id),
            tot AS (SELECT doc_id, COUNT(*) AS total FROM tok
                    GROUP BY doc_id)
            SELECT s.doc_id,
                   COALESCE(kept.clean_text, '') AS clean_text,
                   COALESCE(kept.n_tokens_kept, 0) AS n_tokens_kept,
                   COALESCE(tot.total, 0) - COALESCE(kept.n_tokens_kept, 0)
                     AS removed_tokens
            FROM surv s
            LEFT JOIN kept USING (doc_id)
            LEFT JOIN tot USING (doc_id)""",

        "x05_chunk_windows": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS words
              FROM documents WHERE trim(text) <> '')
            SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
                   array_to_string(words[i*48+1 : i*48+64], ' ')
                     AS chunk_text,
                   CAST(len(words[i*48+1 : i*48+64]) AS INTEGER)
                     AS n_words
            FROM w, unnest(range(0, ((len(words) - 1) // 48) + 1))
                      AS t(i)
            WHERE len(words) > 0""",

        "x06_chunk_token_windows": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(
                       string_split_regex(text, '[^A-Za-z0-9]+'),
                       x -> x <> '') AS pieces
              FROM documents)
            SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
                   array_to_string(pieces[i*48+1 : i*48+64], ' ')
                     AS chunk_text,
                   CAST(len(pieces[i*48+1 : i*48+64]) AS INTEGER)
                     AS n_tokens
            FROM w, unnest(range(0, ((len(pieces) - 1) // 48) + 1))
                      AS t(i)
            WHERE len(pieces) > 0""",

        "x04_mixture_sample": """
            WITH cnt AS (
              SELECT lang, COUNT(*) AS n,
                     CASE lang WHEN 'en' THEN 0.5
                               WHEN 'de' THEN 0.25
                               ELSE 0.25 END AS w
              FROM documents WHERE lang IN ('en', 'de', 'fr')
              GROUP BY 1),
            t AS (SELECT MIN(n / w) AS t FROM cnt),
            kf AS (SELECT lang,
                          CAST(ROUND(LEAST(1.0, w * t.t / n) * 10000)
                               AS BIGINT) AS kb
                   FROM cnt, t),
            b AS (
              SELECT doc_id,
                     list_reduce(list_transform(range(1, 9),
                       i -> CAST(strpos('0123456789abcdef',
                                 substring(md5('mix-v1:' || doc_id), i, 1))
                            - 1 AS BIGINT)),
                       (x, y) -> x * 16 + y) % 10000 AS bucket
              FROM documents)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN kf USING (lang) JOIN b USING (doc_id)
            WHERE b.bucket < kf.kb""",

        "x01_train_val_split": """
            WITH b AS (
              SELECT doc_id,
                     list_reduce(list_transform(range(1, 9),
                       i -> CAST(strpos('0123456789abcdef',
                                 substring(md5('split-v1:' || doc_id), i, 1))
                            - 1 AS BIGINT)),
                       (x, y) -> x * 16 + y) % 10000 AS bucket
              FROM documents),
            s AS (SELECT doc_id,
                         CASE WHEN bucket < 1000 THEN 'val'
                              WHEN bucket < 1500 THEN 'test'
                              ELSE 'train' END AS split
                  FROM b)
            SELECT split, COUNT(doc_id) AS n_docs,
                   MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
            FROM s GROUP BY split""",

        "j01_json_catalog_agg": """
            SELECT lang, source,
                   COUNT(doc_id) AS doc_count,
                   CAST(SUM(CAST(n_chars AS DECIMAL(25,6))) AS DOUBLE)
                     AS total_chars,
                   CAST(SUM(CAST(n_chars AS DECIMAL(25,6))) AS DOUBLE)
                     / COUNT(doc_id) AS chars_per_doc
            FROM documents GROUP BY lang, source""",

        "j02_json_formula_calc": """
            SELECT source,
                   COUNT(doc_id) AS doc_count,
                   CAST(SUM(CAST(n_chars AS DECIMAL(25,6))) AS DOUBLE)
                     / COUNT(doc_id) AS avg_doc_size,
                   CAST(SUM(CASE WHEN lang = 'en'
                            THEN CAST(n_chars AS DECIMAL(25,6)) END)
                        AS DOUBLE) AS en_chars
            FROM documents GROUP BY source""",
    }

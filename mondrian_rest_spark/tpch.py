"""Test cube catalog over the driver-generated TPC-H-ish star schema.

Analog of the reference's fixture catalogs (spec/fixtures/foodmart.xml,
webshop.xml) declared over /root/testdata/sf*/ parquet tables
(schemas in FIXTURES.md §B).  Exercises every linkage style the
reference supports: star join (J1), snowflake chain (J2), degenerate
dims (J3), crossjoin axes (J5), virtual cube drill-across (J6),
plus sum/count/distinct-count/expression measures (A1/A2/A3/A5),
calculated members incl. PREVMEMBER lag (A7/A8) and a TopCount named
set (W1).
"""

from __future__ import annotations

from .catalog import (
    Bridge,
    CalculatedMember,
    Catalog,
    Cube,
    Dimension,
    Hierarchy,
    Level,
    Measure,
    NamedSet,
    ParentChild,
    ParentChildSource,
    Property,
    VirtualCube,
)


def _customer_dim(fact_fk: str, bridge: str | None) -> Dimension:
    """Customer snowflake: customer ⋈ nation ⋈ region, keyed c_custkey.

    Shared (conformed) between the Sales and Orders cubes — identical
    aliases so virtual-cube drill-across joins line up.
    """
    return Dimension(
        name="Customer",
        tables=(("customer", None, None),
                ("nation", "c_nationkey", "n_nationkey"),
                ("region", "n_regionkey", "r_regionkey")),
        fact_fk=fact_fk,
        dim_pk="c_custkey",
        bridge=bridge,
        hierarchies=(
            Hierarchy(name="Customer", levels=(
                Level("Region", key="r_regionkey", key_alias="cust_region_key",
                      caption="r_name", caption_alias="cust_region"),
                Level("Nation", key="n_nationkey", key_alias="cust_nation_key",
                      caption="n_name", caption_alias="cust_nation"),
                Level("Customer", key="c_custkey", key_alias="c_custkey",
                      caption="c_name", caption_alias="c_name",
                      properties=(
                          Property("Market Segment", "c_mktsegment", "c_mktsegment"),
                          Property("Account Balance", "c_acctbal", "c_acctbal"),
                      )),
            )),
        ),
    )


def _time_dim(ts_col: str, date_alias: str) -> Dimension:
    """Derived TimeDimension (reference: foodmart.xml:49-68) — levels are
    date-part expressions over the fact timestamp, no dim table join.
    Conformed across cubes via shared aliases (year/quarter/month)."""
    return Dimension(
        name="Time",
        time_dimension=True,
        hierarchies=(
            # keys_globally_unique declarations (ADVICE r7 #3): the
            # planner answers LASTPERIODS/.Lag navigability from the
            # catalog instead of probing the fact — quarter/month/week
            # keys repeat every year, a date key never does
            Hierarchy(name="Time", levels=(
                Level("Year", key=f"year({ts_col})", key_alias="year",
                      keys_globally_unique=True),
                Level("Quarter", key=f"quarter({ts_col})", key_alias="quarter",
                      keys_globally_unique=False),
                Level("Month", key=f"month({ts_col})", key_alias="month",
                      keys_globally_unique=False),
                Level("Day", key=f"to_date({ts_col})", key_alias=date_alias,
                      keys_globally_unique=True),
            )),
            Hierarchy(name="Weekly", levels=(
                Level("Year", key=f"year({ts_col})", key_alias="year",
                      keys_globally_unique=True),
                Level("Week", key=f"weekofyear({ts_col})", key_alias="week",
                      keys_globally_unique=False),
            )),
        ),
    )


SALES = Cube(
    name="Sales",
    fact="lineitem",
    # annotations passthrough (reference mondrian_ext.rb:46-52; the
    # foodmart schema annotates cubes/dims for client hints)
    annotations={"caption": "Lineitem Sales", "source": "tpch.lineitem"},
    bridges=(
        Bridge("orders", table="orders", fact_key="l_orderkey",
               bridge_key="o_orderkey", provides=("o_custkey", "o_orderdate")),
    ),
    dimensions=(
        _customer_dim(fact_fk="o_custkey", bridge="orders"),
        Dimension(
            name="Supplier",
            tables=(("supplier", None, None),
                    ("nation", "s_nationkey", "n_nationkey"),
                    ("region", "n_regionkey", "r_regionkey")),
            fact_fk="l_suppkey",
            dim_pk="s_suppkey",
            hierarchies=(
                Hierarchy(name="Supplier", levels=(
                    Level("Region", key="r_regionkey", key_alias="supp_region_key",
                          caption="r_name", caption_alias="supp_region"),
                    Level("Nation", key="n_nationkey", key_alias="supp_nation_key",
                          caption="n_name", caption_alias="supp_nation"),
                    Level("Supplier", key="s_suppkey", key_alias="s_suppkey",
                          caption="s_name", caption_alias="s_name",
                          properties=(
                              Property("Account Balance", "s_acctbal", "s_acctbal"),
                          )),
                )),
            ),
        ),
        Dimension(
            name="Part",
            tables=(("part", None, None),),
            fact_fk="l_partkey",
            dim_pk="p_partkey",
            hierarchies=(
                Hierarchy(name="Part", levels=(
                    Level("Brand", key="p_brand", key_alias="p_brand"),
                    Level("Part", key="p_partkey", key_alias="p_partkey",
                          caption="p_name", caption_alias="p_name",
                          properties=(
                              Property("Type", "p_type", "p_type"),
                              Property("Size", "p_size", "p_size"),
                              Property("Retail Price", "p_retailprice", "p_retailprice"),
                          )),
                )),
            ),
        ),
        _time_dim("l_shipdate", "ship_date"),
        # Degenerate dims (reference: foodmart.xml:413-433 Store cube)
        Dimension(name="Return Flag", hierarchies=(
            Hierarchy(name="Return Flag", levels=(
                Level("Return Flag", key="l_returnflag", key_alias="l_returnflag"),)),
        )),
        Dimension(name="Line Status", hierarchies=(
            Hierarchy(name="Line Status", levels=(
                Level("Line Status", key="l_linestatus", key_alias="l_linestatus"),)),
        )),
    ),
    measures=(
        # DECIMAL-input sums: exact and order-independent (see Measure.result_cast)
        Measure("Quantity", "sum_qty", "sum",
                "CAST(l_quantity AS DECIMAL(25,6))", result_cast="double",
                format_string="Standard"),
        Measure("Extended Price", "sum_price", "sum",
                "CAST(l_extendedprice AS DECIMAL(25,6))", result_cast="double"),
        Measure("Line Count", "line_count", "count", "l_linenumber"),
        Measure("Customer Count", "customer_count", "count_distinct",
                "o_custkey", bridge="orders"),
        # HLL++ scale path for the non-additive distinct count above
        Measure("Approx Customer Count", "approx_customer_count",
                "approx_count_distinct", "o_custkey", bridge="orders"),
        # SQL expression measure (reference: foodmart.xml:305-344 MeasureExpression)
        Measure("Revenue", "revenue", "sum",
                "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))",
                result_cast="double", format_string="#,###.00",
                annotations={"description": "discounted extended price"}),
        Measure("Max Quantity", "max_qty", "max", "l_quantity"),
        Measure("Median Price", "median_price", "median", "l_extendedprice"),
        # sketch path for the exact median above (percentile summaries merge)
        Measure("Approx Median Price", "approx_median_price",
                "approx_median", "l_extendedprice"),
        Measure("Avg Discount", "avg_disc", "avg", "l_discount"),
        Measure("Discount Sum", "sum_disc", "sum",
                "CAST(l_discount AS DECIMAL(25,6))", result_cast="double"),
    ),
    calc_members=(
        # Profit-style post-agg arithmetic (reference: foodmart.xml:345-350)
        CalculatedMember("Avg Price", "avg_price", expr="sum_price / line_count"),
        # PREVMEMBER time shift (reference: foodmart.xml:351-358)
        CalculatedMember("Revenue Prev Period", "revenue_prev",
                         lag_of="revenue", lag_dim="Time"),
    ),
    named_sets=(
        NamedSet("Top5 Customers", dimension="Customer", level="Customer",
                 top_by="revenue", k=5),
    ),
)


ORDERS = Cube(
    name="Orders",
    fact="orders",
    dimensions=(
        _customer_dim(fact_fk="o_custkey", bridge=None),
        # Parent-child hierarchy drillable through the normal REST
        # surface (reference HR cube foodmart.xml:529-547, VERDICT r9
        # #1): a region -> nation -> customer tree with string node
        # ids; a member's cell aggregates its WHOLE subtree.  No
        # closure table in the test data, so the closure is built
        # distributedly (known_depth=2 skips convergence checks).
        Dimension(
            name="Geo Tree",
            parent_child=ParentChild(
                sources=(
                    ParentChildSource(
                        "region", "concat('R', r_regionkey)", None,
                        "r_name"),
                    ParentChildSource(
                        "nation", "concat('N', n_nationkey)",
                        "concat('R', n_regionkey)", "n_name"),
                    ParentChildSource(
                        "customer", "concat('C', c_custkey)",
                        "concat('N', c_nationkey)", "c_name"),
                ),
                known_depth=2,
            ),
            fact_fk="concat('C', o_custkey)",
            broadcastable=True,   # closure is dim-sized (nodes × depth)
            hierarchies=(
                Hierarchy(name="Geo Tree", levels=(
                    Level("Node", key="node_id", key_alias="geo_node_id",
                          caption="node_name",
                          caption_alias="geo_node_name"),
                )),
            ),
        ),
        _time_dim("o_orderdate", "order_date"),
        Dimension(name="Order Status", hierarchies=(
            Hierarchy(name="Order Status", levels=(
                Level("Order Status", key="o_orderstatus", key_alias="o_orderstatus"),)),
        )),
        Dimension(name="Order Priority", hierarchies=(
            Hierarchy(name="Order Priority", levels=(
                Level("Order Priority", key="o_orderpriority", key_alias="o_orderpriority"),)),
        )),
    ),
    measures=(
        Measure("Total Price", "total_price", "sum",
                "CAST(o_totalprice AS DECIMAL(25,6))", result_cast="double"),
        Measure("Order Count", "order_count", "count", "o_orderkey"),
        Measure("Ordering Customers", "order_customers", "count_distinct", "o_custkey"),
    ),
    calc_members=(
        CalculatedMember("Avg Order Value", "avg_order_value",
                         expr="total_price / order_count"),
    ),
)


EVENTS = Cube(
    name="Events",
    fact="events",
    dimensions=(
        Dimension(
            name="Time",
            time_dimension=True,
            hierarchies=(
                Hierarchy(name="Time", levels=(
                    Level("Year", key="year(ts)", key_alias="year"),
                    Level("Month", key="month(ts)", key_alias="month"),
                    Level("Day", key="to_date(ts)", key_alias="event_date"),
                    Level("Hour", key="hour(ts)", key_alias="hour"),
                )),
            ),
        ),
        Dimension(name="Event Type", hierarchies=(
            Hierarchy(name="Event Type", levels=(
                Level("Event Type", key="event_type", key_alias="event_type"),)),
        )),
    ),
    measures=(
        Measure("Value", "sum_value", "sum",
                "CAST(value AS DECIMAL(25,6))", result_cast="double"),
        Measure("Events", "event_count", "count", "event_id"),
        Measure("Users", "user_count", "count_distinct", "user_id"),
    ),
)


CATALOG = Catalog(
    name="tpch",
    cubes=(SALES, ORDERS, EVENTS),
    virtual_cubes=(
        VirtualCube("Orders and Sales", cube_names=("Sales", "Orders"),
                    conformed_dimensions=("Customer", "Time"),
                    # Day's member-key alias differs per fact
                    # (ship_date vs order_date) but the LEVEL conforms
                    # by rename — Mondrian's shared-dim-via-own-FK
                    # semantics (foodmart time_by_day on Sales vs
                    # Warehouse); r14, VERDICT r13 #6
                    alias_conformed_levels=(("Time", "Day"),)),
    ),
)

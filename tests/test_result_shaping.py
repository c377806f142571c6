"""Aggregation-JSON shaping regressions.

Pins the property-offset fix (ADVICE r2): ``to_aggregation_result``
must skip exactly the property columns the planner EMITS (deduped),
not ``len(qm.properties)`` — a duplicate property request used to
shift every measure in the values matrix (and IndexError with one
measure)."""

from mondrian_rest_spark import result, tpch
from mondrian_rest_spark.planner import aggregate
from mondrian_rest_spark.query import QueryModel

BASE = dict(cube="Sales", measures=["Revenue"],
            drilldown=["Customer.Customer"],
            cut=["[Customer].[Region].[&2]"])


def test_aggregation_json_duplicate_property_offsets(spark, sf_dir):
    qm1 = QueryModel(**BASE, properties=["Customer.Customer.Market Segment"])
    qm2 = QueryModel(**BASE, properties=["Customer.Customer.Market Segment"] * 2)
    rows1 = aggregate(spark, sf_dir, tpch.CATALOG, qm1).collect()
    rows2 = aggregate(spark, sf_dir, tpch.CATALOG, qm2).collect()
    # planner dedups: identical frames either way
    assert rows1[0].asDict().keys() == rows2[0].asDict().keys()
    r1 = result.to_aggregation_result(tpch.CATALOG, qm1, rows1)
    r2 = result.to_aggregation_result(tpch.CATALOG, qm2, rows2)
    assert r1["values"] == r2["values"]
    # reference layout: one [per-measure] list per axis tuple
    cells = [c[0] for c in r1["values"] if c[0] is not None]
    assert cells, "expected non-empty revenue cells"
    assert all(isinstance(v, float) and v > 0 for v in cells)


def test_tidy_header_matches_frame_width_with_duplicate_property(spark, sf_dir):
    qm2 = QueryModel(**BASE, properties=["Customer.Customer.Market Segment"] * 2)
    df = aggregate(spark, sf_dir, tpch.CATALOG, qm2)
    header = result.tidy_header(tpch.CATALOG, qm2)
    assert len(header) == len(df.columns)
    assert header.count("Market Segment") == 1


def test_reference_values_layout_3_axes(spark, sf_dir, duck):
    """Golden reference nesting for a 3-drilldown query
    (mondrian_ext.rb:250-256 transpose; api_spec.rb:128-132 layout):
    values is ONE FLAT LIST over the axis-member product (last
    drilldown varying fastest), one [per-measure] list per tuple,
    nulls for combinations with no data."""
    qm = QueryModel(cube="Sales", measures=["Revenue"],
                    drilldown=["Customer.Region", "Return Flag", "Time.Year"],
                    nonempty=True)
    rows = aggregate(spark, sf_dir, tpch.CATALOG, qm).collect()
    res = result.to_aggregation_result(tpch.CATALOG, qm, rows)

    # independent expectation from DuckDB over the same parquet
    got = duck.execute("""
        SELECT r_regionkey, l_returnflag, CAST(year(l_shipdate) AS INT) AS y,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(25,6))) AS DOUBLE) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2, 3""").fetchall()
    cells = {(r, f, y): rev for r, f, y, rev in got}
    regions = sorted({k[0] for k in cells})
    flags = sorted({k[1] for k in cells})
    years = sorted({k[2] for k in cells})
    expected = [[cells.get((r, f, y))]
                for r in regions for f in flags for y in years]

    assert len(res["values"]) == len(regions) * len(flags) * len(years)
    assert res["values"] == expected
    # cell_keys align with the same enumeration
    assert res["cell_keys"][0] == [regions[0], flags[0], years[0]]
    assert len(res["cell_keys"]) == len(res["values"])
    # 1 measure axis + 3 member axes, unique members each
    assert len(res["axes"]) == 4
    assert [m["key"] for m in res["axes"][1]["members"]] == regions


def test_values_layout_no_drilldown(spark, sf_dir):
    qm = QueryModel(cube="Sales", measures=["Revenue", "Line Count"])
    rows = aggregate(spark, sf_dir, tpch.CATALOG, qm).collect()
    res = result.to_aggregation_result(tpch.CATALOG, qm, rows)
    # bare measure list (reference: values[0] is the scalar cell)
    assert len(res["values"]) == 2
    assert isinstance(res["values"][0], float)


def test_axis_members_carry_properties(spark, sf_dir):
    """api_spec.rb:217-229: axes[-1].members[*].properties holds the
    requested member properties."""
    qm = QueryModel(**BASE, properties=["Customer.Customer.Market Segment",
                                        "Customer.Customer.Account Balance"])
    rows = aggregate(spark, sf_dir, tpch.CATALOG, qm).collect()
    res = result.to_aggregation_result(tpch.CATALOG, qm, rows)
    members = res["axes"][-1]["members"]
    assert members
    for m in members:
        assert "Market Segment" in m["properties"]
        assert "Account Balance" in m["properties"]


def test_ancestor_level_properties_attach_to_ancestor_hash(spark, sf_dir):
    """Reference get_props (api_formatters.rb): a property of an
    ancestor level lands in that ancestor's hash inside `ancestors`,
    not in the leaf member's properties."""
    qm = QueryModel(cube="Sales", measures=["Revenue"],
                    drilldown=["Supplier.Supplier"], parents=True,
                    properties=["Supplier.Supplier.Account Balance"],
                    cut=["[Supplier].[Region].[&1]"], nonempty=True)
    rows = aggregate(spark, sf_dir, tpch.CATALOG, qm).collect()
    res = result.to_aggregation_result(tpch.CATALOG, qm, rows)
    m = res["axes"][1]["members"][0]
    # leaf-level property on the leaf hash
    assert "Account Balance" in m["properties"]
    # ancestors (Region, Nation) carry no leaf-level property map
    assert all("properties" not in a for a in m["ancestors"])


def test_axis_members_carry_ancestors_with_parents(spark, sf_dir):
    qm = QueryModel(cube="Sales", measures=["Revenue"],
                    drilldown=["Customer.Nation"], parents=True,
                    nonempty=True)
    rows = aggregate(spark, sf_dir, tpch.CATALOG, qm).collect()
    res = result.to_aggregation_result(tpch.CATALOG, qm, rows)
    m = res["axes"][1]["members"][0]
    assert m["level_name"] == "Nation"
    assert len(m["ancestors"]) == 1
    assert m["ancestors"][0]["level_name"] == "Region"
    assert m["full_name"].startswith("[Customer].[" )
    assert m["full_name"].count("].[") == 2      # dim + region + nation

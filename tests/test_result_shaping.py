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
    vals = [v for v in r1["values"] if v is not None]
    assert vals, "expected non-empty revenue cells"
    assert all(isinstance(v, float) and v > 0 for v in vals)


def test_tidy_header_matches_frame_width_with_duplicate_property(spark, sf_dir):
    qm2 = QueryModel(**BASE, properties=["Customer.Customer.Market Segment"] * 2)
    df = aggregate(spark, sf_dir, tpch.CATALOG, qm2)
    header = result.tidy_header(tpch.CATALOG, qm2)
    assert len(header) == len(df.columns)
    assert header.count("Market Segment") == 1

"""Catalog model tests (analog of reference metadata specs,
api_spec.rb:23-114)."""

import pytest

from mondrian_rest_spark import tpch
from mondrian_rest_spark.catalog import Measure
from mondrian_rest_spark.members import cube_metadata, cube_names


def test_cube_lookup():
    c = tpch.CATALOG.cube("sales")  # case-insensitive
    assert c.name == "Sales" and c.fact == "lineitem"
    with pytest.raises(KeyError):
        tpch.CATALOG.cube("nope")


def test_measure_lookup_by_name_and_alias():
    c = tpch.CATALOG.cube("Sales")
    assert c.measure("Revenue").alias == "revenue"
    assert c.measure("revenue").name == "Revenue"
    assert c.default_measure.name == "Quantity"


def test_bad_aggregator_rejected():
    with pytest.raises(ValueError):
        Measure("X", "x", "mode", "col")


def test_virtual_cube():
    v = tpch.CATALOG.virtual_cube("Orders and Sales")
    assert v.conformed_dimensions == ("Customer", "Time")


def test_hierarchy_resolution():
    d = tpch.CATALOG.cube("Sales").dimension("Time")
    assert d.hierarchy("Weekly").levels[1].name == "Week"
    assert d.default_hierarchy().levels[0].name == "Year"


def test_metadata_shape():
    meta = cube_metadata(tpch.CATALOG, "Sales")
    names = {d["name"] for d in meta["dimensions"]}
    assert {"Customer", "Supplier", "Part", "Time", "Return Flag"} <= names
    aggs = {m["aggregator"] for m in meta["measures"]}
    assert {"SUM", "COUNT", "DISTINCT_COUNT", "MAX", "AVG"} <= aggs
    ns = {n["name"]: n for n in meta["named_sets"]}
    assert "Top5 Customers" in ns       # reference named-set hash shape
    assert ns["Top5 Customers"]["dimension"] == "Customer"
    assert ns["Top5 Customers"]["level"] == "Customer"
    m = next(x for x in meta["measures"] if x["name"] == "Revenue")
    assert m["full_name"] == "[Measures].[Revenue]" and m["caption"] == "Revenue"
    assert "Orders and Sales" in cube_names(tpch.CATALOG)

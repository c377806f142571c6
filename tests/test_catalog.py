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


# --- declarative JSON catalog (reference api_helpers.rb:10-16 binds
# --- schemas from XML files; SURVEY §1.4: JSON catalog validated
# --- against df.schema) ---

CORPUS_JSON = "/root/repo/catalogs/corpus.json"


def test_catalog_from_json_binds(spark, sf_dir):
    from mondrian_rest_spark.catalog_json import (catalog_from_json,
                                                  validate_catalog)
    cat = catalog_from_json(CORPUS_JSON)
    assert cat.name == "corpus"
    cube = cat.cube("Documents")
    assert cube.fact == "documents"
    assert cube.measure("Total Chars").format_string == "#,###"
    assert cube.named_set("Top Languages").k == 3
    validate_catalog(spark, sf_dir, cat)   # must not raise


def test_json_catalog_query_matches_oracle(spark, sf_dir, duck):
    """Smoke query on the JSON-bound dataset: per-language doc counts
    and char totals, plus a post-agg calc member."""
    from mondrian_rest_spark.catalog_json import catalog_from_json
    from mondrian_rest_spark.planner import aggregate
    from mondrian_rest_spark.query import QueryModel

    cat = catalog_from_json(CORPUS_JSON)
    rows = aggregate(spark, sf_dir, cat, QueryModel(
        cube="Documents",
        measures=["Doc Count", "Total Chars", "Chars per Doc"],
        drilldown=["Language"])).collect()
    exp = {r[0]: r[1:] for r in duck.execute(
        "SELECT lang, COUNT(doc_id), CAST(SUM(CAST(n_chars AS "
        "DECIMAL(25,6))) AS DOUBLE) FROM documents GROUP BY lang"
    ).fetchall()}
    assert len(rows) == len(exp)
    for r in rows:
        dc, tc = exp[r.lang]
        assert (r.doc_count, r.total_chars) == (dc, tc)
        assert r.chars_per_doc == tc / dc


def test_json_catalog_named_set_cut(spark, sf_dir, duck):
    from mondrian_rest_spark.catalog_json import catalog_from_json
    from mondrian_rest_spark.planner import aggregate
    from mondrian_rest_spark.query import QueryModel

    cat = catalog_from_json(CORPUS_JSON)
    rows = aggregate(spark, sf_dir, cat, QueryModel(
        cube="Documents", measures=["Doc Count"],
        drilldown=["Top Languages"])).collect()
    exp = duck.execute(
        "SELECT lang, COUNT(doc_id) AS n FROM documents GROUP BY lang "
        "ORDER BY n DESC, lang LIMIT 3").fetchall()
    assert {r.lang for r in rows} == {e[0] for e in exp}


def test_json_catalog_validation_errors(spark, sf_dir):
    import json as _json

    import pytest

    from mondrian_rest_spark.catalog_json import (CatalogError,
                                                  catalog_from_json,
                                                  validate_catalog)
    doc = _json.load(open(CORPUS_JSON))
    # unknown key -> bind-time error naming the allowed set
    bad = _json.loads(_json.dumps(doc))
    bad["cubes"][0]["measures"][0]["agggg"] = "sum"
    with pytest.raises(CatalogError, match="unknown keys"):
        catalog_from_json(bad)
    # bad aggregator
    bad = _json.loads(_json.dumps(doc))
    bad["cubes"][0]["measures"][0]["agg"] = "total"
    with pytest.raises(CatalogError, match="bad aggregator"):
        catalog_from_json(bad)
    # named set ranking by an unknown measure
    bad = _json.loads(_json.dumps(doc))
    bad["cubes"][0]["named_sets"][0]["top_by"] = "Nope"
    with pytest.raises(CatalogError, match="Nope"):
        catalog_from_json(bad)
    # typo'd physical column -> caught by schema validation, with the
    # level named
    bad = _json.loads(_json.dumps(doc))
    bad["cubes"][0]["dimensions"][0]["hierarchies"][0]["levels"][0][
        "key"] = "langg"
    with pytest.raises(CatalogError, match="Language.*langg|langg"):
        validate_catalog(spark, sf_dir, catalog_from_json(bad))
    # nonexistent fact table
    bad = _json.loads(_json.dumps(doc))
    bad["cubes"][0]["fact"] = "no_such_table"
    with pytest.raises(CatalogError, match="no_such_table"):
        validate_catalog(spark, sf_dir, catalog_from_json(bad))


def test_json_catalog_rejects_internal_hll_sketch_agg():
    """'hll_sketch' is the rollup layout's internal companion of
    approx_count_distinct — a user-declared sketch measure would put
    raw binary sketches in query results, so binding rejects it."""
    import copy
    import json

    import pytest

    from mondrian_rest_spark.catalog_json import CatalogError, catalog_from_json

    with open("/root/repo/catalogs/corpus.json") as f:
        doc = json.load(f)
    bad = copy.deepcopy(doc)
    bad["cubes"][0]["measures"].append(
        {"name": "Sketch", "agg": "hll_sketch", "expr": "doc_id"})
    with pytest.raises(CatalogError, match="internal"):
        catalog_from_json(json.dumps(bad))


def test_json_catalog_formula_calc_members():
    """MDX formulas (the reference XML CalculatedMember form) bind at
    catalog load through the WITH MEMBER grammar; bad formulas are
    bind-time CatalogErrors."""
    import json

    from mondrian_rest_spark.catalog_json import (CatalogError,
                                                  catalog_from_json)
    cat = catalog_from_json("/root/repo/catalogs/corpus.json")
    cube = cat.cube("Documents")
    by_name = {c.name: c for c in cube.calc_members}
    assert by_name["Avg Doc Size"].expr == "total_chars / doc_count"
    assert by_name["EN Chars"].set_of == "Total Chars"
    assert by_name["EN Chars"].set_fn == "aggregate"
    base = json.load(open("/root/repo/catalogs/corpus.json"))
    base["cubes"][0]["calc_members"].append(
        {"name": "Bad", "formula": "[Measures].[Nope] + )"})
    with pytest.raises(CatalogError, match="formula"):
        catalog_from_json(base)
    base["cubes"][0]["calc_members"][-1] = {
        "name": "Bad2", "formula": "[Measures].[No Such Measure] * 2"}
    with pytest.raises(CatalogError, match="unknown measure|No Such"):
        catalog_from_json(base)

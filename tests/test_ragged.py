"""Ragged hierarchies: hideMemberIf visibility rules (SURVEY §1.1 /
§7.5.5; reference foodmart.xml:565-603 'Sales Ragged' — Israel has no
province level, Washington the city repeats its state's name)."""

import pytest

from mondrian_rest_spark.catalog import (Catalog, Cube, Dimension, Hierarchy,
                                         Level, Measure)
from mondrian_rest_spark.members import level_members, member_children


@pytest.fixture(scope="module")
def ragged_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ragged")
    geo = spark.createDataFrame(
        [(1, "USA", "Washington", "Seattle"),
         (2, "USA", "Washington", "Washington"),  # city repeats its province
         (3, "USA", "CA", "San Francisco"),
         (4, "Israel", "", "Tel Aviv"),    # no province level
         (5, "Israel", "", "Haifa"),
         (6, "France", "IDF", "Paris")],
        ["geo_id", "country", "province", "city"])
    geo.write.parquet(str(d / "geography.parquet"))
    spark.createDataFrame(
        [(i, float(i)) for i in range(1, 7)],
        ["geo_fk", "amount"]).write.parquet(str(d / "fact.parquet"))
    return str(d)


GEO = Dimension(
    name="Geography",
    hierarchies=(Hierarchy("Geography", (
        Level("Country", key="country", key_alias="country"),
        Level("Province", key="province", key_alias="province",
              hide_member_if="if_blank_name"),
        Level("City", key="city", key_alias="city",
              hide_member_if="if_parents_name"),
    )),),
    tables=(("geography", None, None),),
    fact_fk="geo_fk", dim_pk="geo_id", broadcastable=True)

CAT = Catalog("ragged", (Cube(
    name="RaggedSales", fact="fact", dimensions=(GEO,),
    measures=(Measure("Amount", "amount", "sum", "amount"),)),))


def test_bad_hide_member_if_rejected():
    with pytest.raises(ValueError):
        Level("x", key="c", key_alias="c", hide_member_if="sometimes")


def test_if_blank_name_hides_empty_provinces(spark, ragged_dir):
    provs = {r.province for r in level_members(
        spark, ragged_dir, CAT, "RaggedSales", "Geography", "Province").collect()}
    assert provs == {"Washington", "CA", "IDF"}  # Israel's blank province hidden


def test_if_parents_name_hides_echoing_city(spark, ragged_dir):
    cities = {r.city for r in level_members(
        spark, ragged_dir, CAT, "RaggedSales", "Geography", "City").collect()}
    assert "Washington" not in cities    # repeats parent province name
    assert cities == {"Seattle", "San Francisco", "Tel Aviv", "Haifa", "Paris"}


def test_children_respect_visibility(spark, ragged_dir):
    kids = {r.city for r in member_children(
        spark, ragged_dir, CAT, "RaggedSales", "Geography", "Province",
        "Washington").collect()}
    assert kids == {"Seattle"}           # hidden echo-city dropped


def test_unhidden_levels_unaffected(spark, ragged_dir):
    countries = {r.country for r in level_members(
        spark, ragged_dir, CAT, "RaggedSales", "Geography", "Country").collect()}
    assert countries == {"USA", "Israel", "France"}


def test_ragged_drilldown_aggregation(spark, ragged_dir):
    """r11 (VERDICT r10 #2): hidden members leave the AXIS of an
    aggregation drilldown too, not just the member listings — the
    visibility predicate filters the base frame pre-aggregation."""
    from mondrian_rest_spark.planner import aggregate
    from mondrian_rest_spark.query import QueryModel

    provs = aggregate(spark, ragged_dir, CAT, QueryModel(
        cube="RaggedSales", measures=["Amount"],
        drilldown=["Geography.Province"], nonempty=True)).collect()
    # Israel's blank province (facts 4, 5) is hidden at this grain
    assert {r.province for r in provs} == {"Washington", "CA", "IDF"}
    assert sum(r.amount for r in provs) == 1 + 2 + 3 + 6

    cities = aggregate(spark, ragged_dir, CAT, QueryModel(
        cube="RaggedSales", measures=["Amount"],
        drilldown=["Geography.City"], nonempty=True)).collect()
    # Washington-the-city echoes its province -> hidden (fact 2)
    assert {r.city for r in cities} == {
        "Seattle", "San Francisco", "Tel Aviv", "Haifa", "Paris"}

    # dense mode: the member frame applies the same visibility rules
    dense = aggregate(spark, ragged_dir, CAT, QueryModel(
        cube="RaggedSales", measures=["Amount"],
        drilldown=["Geography.Province"], nonempty=False)).collect()
    assert {r.province for r in dense} == {"Washington", "CA", "IDF"}

    # two-level drill: both levels' rules compose
    both = aggregate(spark, ragged_dir, CAT, QueryModel(
        cube="RaggedSales", measures=["Amount"],
        drilldown=["Geography.Province", "Geography.City"],
        nonempty=True)).collect()
    assert {(r.province, r.city) for r in both} == {
        ("Washington", "Seattle"), ("CA", "San Francisco"),
        ("IDF", "Paris")}

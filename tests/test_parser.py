"""Parser unit tests — analog of the reference's query_builder_spec.rb
parse_cut/parse_drilldown coverage (spec lines :124-151, :112-121)."""

import pytest

from mondrian_rest_spark.parser import (
    ParseError,
    parse_cut,
    parse_drilldown,
    parse_measure_filter,
    parse_property,
    parse_segments,
)


def test_segments_bracketed():
    assert parse_segments("[Customer].[Nation].[&21]") == ["Customer", "Nation", "&21"]


def test_segments_plain():
    assert parse_segments("Customer.Nation") == ["Customer", "Nation"]


def test_segments_mixed_spaces_in_brackets():
    assert parse_segments("[Return Flag].[R]") == ["Return Flag", "R"]


def test_segments_unbalanced():
    with pytest.raises(ParseError):
        parse_segments("[Customer.[Nation]")


def test_cut_member_key():
    c = parse_cut("[Customer].[Region].[&2]")
    assert c.kind == "member"
    assert c.members[0].by_key and c.members[0].value == "2"
    assert c.path == ("Customer", "Region")


def test_cut_member_caption():
    c = parse_cut("[Customer].[Region].[ASIA]")
    assert not c.members[0].by_key and c.members[0].value == "ASIA"


def test_cut_set():
    c = parse_cut("{[Customer].[Region].[&1],[Customer].[Region].[&2]}")
    assert c.kind == "set" and len(c.members) == 2


def test_cut_set_mixed_levels_rejected():
    # reference validates all set members share one level (query_helper.rb:55-56)
    with pytest.raises(ParseError):
        parse_cut("{[Customer].[Region].[&1],[Customer].[Nation].[&2]}")


def test_cut_range():
    c = parse_cut("([Time].[Year].[1996]:[Time].[Year].[1998])")
    assert c.kind == "range"
    assert [m.value for m in c.members] == ["1996", "1998"]


def test_cut_named_set():
    c = parse_cut("[Top5 Customers]", named_set_names={"Top5 Customers"})
    assert c.kind == "named_set" and c.named_set == "Top5 Customers"


def test_drilldown_forms():
    d = parse_drilldown("Customer.Nation")
    assert (d.dimension, d.hierarchy, d.level) == ("Customer", None, "Nation")
    d = parse_drilldown("Time.Weekly.Week")
    assert (d.dimension, d.hierarchy, d.level) == ("Time", "Weekly", "Week")
    d = parse_drilldown("[Customer]")
    assert (d.dimension, d.level) == ("Customer", None)


def test_drilldown_too_many_segments():
    # reference query_helper.rb:112-115
    with pytest.raises(ParseError):
        parse_drilldown("A.B.C.D")


def test_drilldown_key_ref_rejected():
    with pytest.raises(ParseError):
        parse_drilldown("Customer.[&3]")


def test_measure_filter_ops():
    # reference regex query_helper.rb:4-7
    f = parse_measure_filter("Revenue > 1000")
    assert (f.measure, f.op, f.value) == ("Revenue", ">", 1000.0)
    f = parse_measure_filter("Store Sqft <> 42.5")
    assert (f.measure, f.op, f.value) == ("Store Sqft", "!=", 42.5)
    with pytest.raises(ParseError):
        parse_measure_filter("Revenue >> 10")


def test_property_ref():
    p = parse_property("Customer.Customer.Market Segment")
    assert (p.dimension, p.level, p.prop) == ("Customer", "Customer", "Market Segment")
    with pytest.raises(ParseError):
        parse_property("Customer.Market Segment")

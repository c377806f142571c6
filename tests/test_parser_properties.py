"""Property-based parser tests (hypothesis) — goes beyond the
reference's golden-string specs (SURVEY §5: the reference has no
property-based testing).  Invariants:

- parse_segments round-trips any segment list through bracket quoting;
- parse_cut classifies member/set/range consistently and preserves
  every member value and &-key flag;
- malformed inputs raise ParseError, never arbitrary exceptions.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mondrian_rest_spark.parser import (ParseError, parse_cut,
                                        parse_measure_filter, parse_segments)

# segment text: no brackets or dots (those are the quoting/sep chars);
# bracket-quoting makes anything else — spaces, '&', unicode — legal
SEG = st.text(
    alphabet=st.characters(blacklist_characters="[].", min_codepoint=32),
    min_size=1, max_size=12).map(str.strip).filter(bool)
PATHS = st.lists(SEG, min_size=2, max_size=3)


def quote(segs):
    return ".".join(f"[{s}]" for s in segs)


@given(PATHS)
def test_segments_roundtrip_quoted(segs):
    assert parse_segments(quote(segs)) == segs


@given(st.lists(SEG.filter(lambda s: "&" not in s and not s.isspace()),
                min_size=2, max_size=3))
def test_segments_roundtrip_bare(segs):
    assert parse_segments(".".join(segs)) == segs


@given(PATHS, st.booleans())
def test_cut_member_preserves_value_and_key_flag(segs, by_key):
    *path, value = segs
    if len(path) < 1:
        return
    raw = quote(path) + f".[{'&' if by_key else ''}{value}]"
    cut = parse_cut(raw)
    assert cut.kind == "member"
    m = cut.members[0]
    assert m.path == tuple(path)
    assert m.value == value.lstrip("&")
    assert m.by_key == (by_key or value.startswith("&"))


@given(st.lists(SEG, min_size=1, max_size=2),
       st.lists(SEG, min_size=2, max_size=4))
@settings(max_examples=50)
def test_cut_set_preserves_all_members(path, values):
    # all set members must share one level (reference
    # query_helper.rb:55-56 — parse_cut rejects mixed paths)
    refs = [f"{quote(path)}.[{v}]" for v in values]
    cut = parse_cut("{" + ",".join(refs) + "}")
    assert cut.kind == "set"
    assert [m.value for m in cut.members] == [v.lstrip("&") for v in values]
    assert all(m.path == tuple(path) for m in cut.members)


@given(st.lists(SEG, min_size=1, max_size=2), SEG, SEG)
@settings(max_examples=25)
def test_cut_set_mixed_levels_rejected(path, v1, v2):
    other = quote(path + ["x"])
    refs = [f"{quote(path)}.[{v1}]", f"{other}.[{v2}]"]
    with pytest.raises(ParseError):
        parse_cut("{" + ",".join(refs) + "}")


@given(st.lists(SEG, min_size=1, max_size=2), SEG, SEG)
@settings(max_examples=50)
def test_cut_range_classification(path, lo, hi):
    # range endpoints must share a level (same rule as set cuts)
    cut = parse_cut(f"({quote(path)}.[{lo}]:{quote(path)}.[{hi}])")
    assert cut.kind == "range"
    assert len(cut.members) == 2
    assert cut.members[0].value == lo.lstrip("&")
    assert cut.members[1].value == hi.lstrip("&")


@given(st.text(max_size=30))
@settings(max_examples=200)
def test_parser_total_no_crashes(s):
    """The parser is total: any input either parses or raises ParseError."""
    for fn in (parse_segments, parse_cut, parse_measure_filter):
        try:
            fn(s)
        except ParseError:
            pass


@pytest.mark.parametrize("bad", ["[a.[b]", "[a]b.[c]", "a..b", "", "[]"])
def test_malformed_segments_rejected(bad):
    with pytest.raises(ParseError):
        parse_segments(bad)

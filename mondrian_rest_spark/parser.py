"""Mini-parsers for member references, cuts, and drilldown specs.

Analog of the reference's parse layer (query_helper.rb:39-135
parse_cut / parse_drilldown; &Key quoting per query_builder_spec.rb:31).
The reference hands cut strings to the olap4j MDX parser; we parse the
same surface grammar directly:

    member   [Customer].[Nation].[&21]      (&N = key reference)
             [Customer].[Nation].[BRAZIL]   (caption reference)
    set      {[..].[..],[..].[..]}
    range    ([Time].[Year].[1995]:[Time].[Year].[1997])
    drill    Customer.Nation | [Customer].[Nation] | Time.Weekly.Week
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class ParseError(ValueError):
    """Maps to the reference's HTTP 400 on malformed params
    (api.rb error! paths; query_helper.rb:112-115)."""


def parse_segments(s: str) -> list[str]:
    """Split a dotted, optionally bracket-quoted path into segments.

    '[Customer].[Nation].[&21]' -> ['Customer', 'Nation', '&21']
    'Customer.Nation'           -> ['Customer', 'Nation']
    """
    s = s.strip()
    if not s:
        raise ParseError("empty member/level path")
    segs: list[str] = []
    i, n = 0, len(s)
    while i < n:
        if s[i] == "[":
            j = s.index("]", i) if "]" in s[i:] else -1
            if j < 0 or "[" in s[i + 1:j]:
                raise ParseError(f"unbalanced bracket in {s!r}")
            segs.append(s[i + 1:j])
            i = j + 1
            if i < n:
                if s[i] != ".":
                    raise ParseError(f"expected '.' at pos {i} in {s!r}")
                i += 1
        else:
            j = s.find(".", i)
            if j < 0:
                segs.append(s[i:])
                i = n
            else:
                segs.append(s[i:j])
                i = j + 1
    if any(not seg for seg in segs):
        raise ParseError(f"empty segment in {s!r}")
    return segs


@dataclass(frozen=True)
class MemberRef:
    """A single member reference: path to the level + one value."""

    path: tuple[str, ...]   # dimension[, hierarchy], level
    value: str
    by_key: bool            # True when written [&key]


def _parse_member(s: str) -> MemberRef:
    segs = parse_segments(s)
    if len(segs) < 2:
        raise ParseError(f"member ref needs at least Dim.Value: {s!r}")
    raw = segs[-1]
    by_key = raw.startswith("&")
    return MemberRef(path=tuple(segs[:-1]), value=raw.lstrip("&"), by_key=by_key)


@dataclass(frozen=True)
class Cut:
    """Parsed cut (reference: query_helper.rb:39-94).

    kind: 'member' | 'set' | 'range' | 'named_set' | 'exclude'

    'exclude' (spelled ``!{...}``) keeps every member of the level
    EXCEPT the listed ones — the compiled form of Mondrian's
    ``EXCEPT(<level>.Members, {...})`` set algebra, which no positive
    member list can express without enumerating the level.
    """

    kind: str
    members: tuple[MemberRef, ...] = ()
    named_set: str | None = None

    @property
    def path(self) -> tuple[str, ...]:
        return self.members[0].path


def parse_cut(s: str, named_set_names: set[str] = frozenset()) -> Cut:
    s = s.strip()
    if not s:
        raise ParseError("empty cut")
    # Named set shortcut (reference: query_helper.rb:76-80)
    bare = s[1:-1] if s.startswith("[") and s.endswith("]") and "." not in s else s
    if bare in named_set_names:
        return Cut(kind="named_set", named_set=bare)
    if s.startswith("{") and s.endswith("}"):
        parts = _split_top_level(s[1:-1], ",")
        members = tuple(_parse_member(p) for p in parts)
        if len({m.path for m in members}) != 1:
            # reference validates all set members share one level (query_helper.rb:55-56)
            raise ParseError(f"set cut members must share a level: {s!r}")
        return Cut(kind="set", members=members)
    if s.startswith("!{") and s.endswith("}"):
        parts = _split_top_level(s[2:-1], ",")
        members = tuple(_parse_member(p) for p in parts)
        if len({m.path for m in members}) != 1:
            raise ParseError(f"exclusion cut members must share a level: {s!r}")
        return Cut(kind="exclude", members=members)
    if s.startswith("(") and s.endswith(")") and ":" in s:
        lo_s, hi_s = _split_top_level(s[1:-1], ":")
        lo, hi = _parse_member(lo_s), _parse_member(hi_s)
        if lo.path != hi.path:
            raise ParseError(f"range cut endpoints must share a level: {s!r}")
        return Cut(kind="range", members=(lo, hi))
    return Cut(kind="member", members=(_parse_member(s),))


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on sep outside [brackets]."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


@dataclass(frozen=True)
class DrilldownSpec:
    """Dim[.Hierarchy][.Level] (reference: query_helper.rb:99-135;
    >3 segments or &key quoting rejected per :112-115)."""

    dimension: str
    hierarchy: str | None = None
    level: str | None = None


def parse_drilldown(s: str, named_set_names: set[str] = frozenset()) -> DrilldownSpec | str:
    """Returns a DrilldownSpec, or the named-set name when the spec is a
    named set shortcut (reference: query_helper.rb:100-103)."""
    s = s.strip()
    bare = s[1:-1] if s.startswith("[") and s.endswith("]") and "." not in s else s
    if bare in named_set_names:
        return bare
    segs = parse_segments(s)
    if len(segs) > 3:
        raise ParseError(f"drilldown has too many segments: {s!r}")
    if any(seg.startswith("&") for seg in segs):
        raise ParseError(f"key references not allowed in drilldown: {s!r}")
    if len(segs) == 1:
        return DrilldownSpec(dimension=segs[0])
    if len(segs) == 2:
        return DrilldownSpec(dimension=segs[0], level=segs[1])
    return DrilldownSpec(dimension=segs[0], hierarchy=segs[1], level=segs[2])


# Measure filter: "Revenue > 1000" (reference: query_helper.rb:4-7, :137-150)
_FILTER_RE = re.compile(r"^\s*(.+?)\s*(>=|<=|<>|>|<|=)\s*(-?\d+(?:\.\d+)?)\s*$")

_OP_MAP = {"=": "=", "<>": "!=", ">": ">", "<": "<", ">=": ">=", "<=": "<="}


@dataclass(frozen=True)
class MeasureFilter:
    measure: str
    op: str      # SQL operator
    value: float


def parse_measure_filter(s: str) -> MeasureFilter:
    m = _FILTER_RE.match(s)
    if not m:
        raise ParseError(f"bad measure filter: {s!r}")
    name, op, val = m.group(1), m.group(2), float(m.group(3))
    if any(ch in name for ch in "<>="):  # lazy .+? must not eat an operator
        raise ParseError(f"bad measure filter: {s!r}")
    return MeasureFilter(measure=name.strip().strip("[]"), op=_OP_MAP[op], value=val)


@dataclass(frozen=True)
class PropertyRef:
    """Dim[.Hierarchy].Level.PropName (reference: api_helpers.rb:110-132;
    the 4-segment Dimension.Hierarchy.Level.Property form is exercised by
    api_spec.rb 'with format Dimension.Hierarchy.Level.Property')."""

    dimension: str
    level: str
    prop: str
    hierarchy: str | None = None


def parse_property(s: str) -> PropertyRef:
    segs = parse_segments(s)
    if len(segs) == 3:
        return PropertyRef(*segs)
    if len(segs) == 4:
        return PropertyRef(dimension=segs[0], hierarchy=segs[1],
                           level=segs[2], prop=segs[3])
    raise ParseError(f"property ref needs Dim[.Hierarchy].Level.Prop: {s!r}")

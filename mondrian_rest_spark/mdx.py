"""MDX-subset compiler: the grammar the reference *generates*
(query_helper.rb:190-316) parsed back into a QueryModel and executed
as the same DataFrame plans.

Analog of the reference's POST /mdx passthrough (api.rb:21-50), scoped
per SURVEY §2.10 Q6: arbitrary MDX is out of scope (that would mean
reimplementing Mondrian); the supported surface is exactly what
build_query emits, which covers every query the REST layer can express:

    [WITH [MEMBER [Measures].[X] AS <arith over [Measures] refs>
                                   | ([Measures].[M], PARALLELPERIOD([D].[L][, n]))
                                   | ([Measures].[M], <member>)
                                   | SUM(YTD()|QTD()|MTD()|WTD(), [Measures].[M])
                                   | AGGREGATE|SUM|AVG|MIN|MAX|COUNT
                                     |MEDIAN|STDEV[P]|VAR[P](
                                         <member|{set}|range>, [Measures].[M])
                                     (explicit fns aggregate member
                                      CELL VALUES, Mondrian-style;
                                      AGGREGATE rolls up the union)
                                   | RANK(<level>.CurrentMember,
                                          [ORDER(]<level>.Members
                                          [, [Measures].[M], BASC|BDESC)])]
          [SET [Name] AS TOPCOUNT|BOTTOMCOUNT([D].[L].Members, n,
                                              [Measures].[M])
                       | mset   (member-set literal / set algebra —
                                 macro-expanded at each reference)] ...]
    SELECT {[Measures].[X], ...} ON COLUMNS,
           <axis> [[DIMENSION] PROPERTIES <[D].[L].[Prop] | MEMBER_*>,
                   ...] ON ROWS
    FROM [Cube]
    [WHERE (<slicer> [* <slicer>]...)]
    [CELL PROPERTIES VALUE|FORMATTED_VALUE|FORMAT_STRING, ...]

    axis := [NON EMPTY] axis'
    axis' := DISTINCT(axis') | SUBSET(axis', o[, l])
           | HEAD(axis'[, n]) | TAIL(axis'[, n])
           | ORDER(axis', [Measures].[M], BASC|BDESC)
           | FILTER(axis', <bool>)     bool := cmp | bool AND|OR bool
                                            | NOT bool | (bool) [AND > OR]
                                       cmp  := <arith cmp over measures
                                               and literals>, e.g.
                                               [Measures].[A] > 2*[Measures].[B]
                                            | <level>.CurrentMember
                                              .Properties("P") <op> literal
                                              (axis-set restriction ->
                                               dim-side predicate; top-
                                               level AND conjuncts only)
                                            | <level>.CurrentMember
                                              .Parent IS <member>
                                            | ANCESTOR(<level>
                                              .CurrentMember, <level>)
                                              IS <member>
                                              (member-navigation
                                               restriction -> catalog-
                                               validated ancestor cut;
                                               top-level AND conjuncts
                                               only)
           | TOPCOUNT(axis', n, [Measures].[M])
           | TOPPERCENT|BOTTOMPERCENT(axis', pct, [Measures].[M])
           | TOPSUM|BOTTOMSUM(axis', value, [Measures].[M])
           | CROSSJOIN(axis', axis') | NONEMPTYCROSSJOIN(axis', axis')
           | NONEMPTY(axis'[, [Measures].[M]])
           | EXISTS(axis', mset)   (same dim -> ancestor cut;
                                    unrelated dim -> no-op per spec)
           | EXISTING axis'        (no-op: axis enumeration is already
                                    context-restricted in this engine)
           | DRILLDOWNLEVEL(<level path>.Members)
           | DRILLDOWNMEMBER(<level path>.Members, {<member>, ...})
           | VISUALTOTALS({<parent member>, <child member>, ...})
             (mixed-depth axis: ONE grouping-sets aggregate
              {(parent), (parent, child)}; dense (no NON EMPTY) fills
              per-grouping-set member frames since r12, and DDLTOP
              ranks the dense children since r13;
              VISUALTOTALS cuts facts to the listed children so the
              parent subtotal IS the visible total)
           | {set} | <member>:<member>
           | UNION|EXCEPT|INTERSECT(mset, mset)
           | <path>.Members
           | <member>.Children | <member>.Parent | HIERARCHIZE(axis')
           | <member>.FirstChild | <member>.LastChild
           | <member>.Siblings | <member>.FirstSibling | <member>.LastSibling
           | <member>.Lag(n) | <member>.Lead(n) | LASTPERIODS(n, <member>)
           | OPENINGPERIOD|CLOSINGPERIOD(<level path>, <member>)
           | ANCESTOR(<member>, <level path>)
           | PERIODSTODATE(<level path>, <member>)
           | DESCENDANTS(<member>, <level path>) | [Named Set]
           | GENERATE(<level path>.Members,
                      TOPCOUNT|BOTTOMCOUNT(nav, n, [Measures].[M])
                      | HEAD|TAIL(nav[, n]))
             nav := <level path>.CurrentMember.Children
                  | DESCENDANTS(<level path>.CurrentMember, <level path>)
    mset := {<member>,...} | <member> | <level path>.Members
          | UNION|EXCEPT|INTERSECT(mset, mset)
          (two-register parse-time algebra: any nesting — including
           full-level operands, e.g. EXCEPT([L].Members, {...}) "all
           but X" — compiles to one positive set cut, one exclusion
           cut (!{...} -> NOT IN pushed to the scans), a bare
           drilldown, or the empty set)
    slicer := <member> | {<member>,...} | (<member>:<member>)
            | UNION|EXCEPT|INTERSECT(mset, mset) | [Named Set]
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .parser import ParseError
from .planner import aggregate
from .query import QueryModel

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<bracket>\[[^\]\[]*\])
      | (?P<str>'[^']*')
      | (?P<dstr>"[^"]*")
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<op><>|>=|<=|[><=])
      | (?P<arith>[+/])
      | (?P<punct>[{}(),.*:\-])
      | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
    )""", re.VERBOSE)


def tokenize(s: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        if s[i].isspace():
            i += 1
            continue
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ParseError(f"bad MDX at position {i}: {s[i:i+20]!r}")
        out.append(m.group().strip())
        i = m.end()
    return _unwrap_str_fns(out)


def _unwrap_str_fns(toks: list[str]) -> list[str]:
    """StrToMember("[A].[B].[&K]") / StrToSet("{...}") — parse-time
    string unwraps (r10, VERDICT r9 #7).  Mondrian evaluates the string
    argument and parses the result; with a string LITERAL that is
    exactly a token splice, so the inner text is tokenized (and
    recursively unwrapped) in place.  Non-literal arguments (string
    concatenation, member references) are out of subset — a clear 400.
    StrToSet of a bare member path is normalized to a one-member set,
    matching Mondrian's coercion."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        u = t.upper()
        if u in ("STRTOMEMBER", "STRTOSET"):
            if (i + 3 >= len(toks) or toks[i + 1] != "("
                    or toks[i + 2][:1] not in ("'", '"')
                    or toks[i + 3] != ")"):
                raise ParseError(
                    f"{t} supports a single string LITERAL argument in "
                    "this MDX subset")
            inner = tokenize(toks[i + 2][1:-1])   # recursively unwraps
            if u == "STRTOMEMBER":
                if not inner or "{" in inner or "}" in inner:
                    raise ParseError(
                        "StrToMember string must be a member path, got "
                        f"{toks[i + 2]}")
            elif not (inner and inner[0] == "{"):
                inner = ["{"] + inner + ["}"]
            out.extend(inner)
            i += 4
            continue
        out.append(t)
        i += 1
    return out


@dataclass
class _P:
    toks: list[str]
    pos: int = 0

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of MDX")
        self.pos += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t.upper() != tok.upper():
            raise ParseError(f"expected {tok!r}, got {t!r}")

    def peek_upper(self) -> str:
        t = self.peek()
        return t.upper() if t else ""


def _path(p: _P) -> list[str]:
    """[A].[B].[C] (bracketed segments joined by dots)."""
    segs = []
    while True:
        t = p.peek()
        if t is None or not t.startswith("["):
            if not segs:
                raise ParseError(f"expected member path, got {t!r}")
            return segs
        segs.append(p.next()[1:-1])
        if p.peek() == ".":
            nxt = p.toks[p.pos + 1] if p.pos + 1 < len(p.toks) else ""
            if nxt.startswith("["):
                p.next()  # consume '.'
                continue
        return segs


def _path_str(segs: list[str]) -> str:
    return ".".join(f"[{s}]" for s in segs)


class MdxQuery:
    """Accumulates QueryModel fields while walking the axis tree."""

    def __init__(self) -> None:
        self.qm_kwargs: dict = dict(measures=[], drilldown=[], cut=[],
                                    filter=[], filter_exprs=[],
                                    nonempty=False,
                                    with_members=[], with_sets=[],
                                    children_of=[], parent_of=[],
                                    lastperiods=[], member_lags=[],
                                    edge_child_of=[], siblings_of=[],
                                    ancestor_of=[], edge_sibling_of=[],
                                    periods_to_date=[], properties=[],
                                    property_filters=[], nav_filters=[],
                                    nonempty_measures=[], existing_dims=[],
                                    gs_axes=[], visual_totals=[],
                                    gs_top=[])
        # WITH SET bodies that are member-set literals/algebra (not the
        # TOPCOUNT ranked form): name -> (level_path, kind, members),
        # macro-expanded at each reference DURING parsing — the
        # QueryModel sees only the compiled drilldown+cut, so the
        # planner needs no new machinery (a parse-time analog of
        # Mondrian's named-set substitution)
        self.set_macros: dict = {}


def _guard_gs_dim(q: MdxQuery, dim_seg: str, what: str) -> None:
    """One grouping-sets axis (DRILLDOWNLEVEL/DRILLDOWNMEMBER/
    VISUALTOTALS) per DIMENSION (r10 — r9 capped at one per query;
    k dims still compile to a single Expand pass with 2^k sets)."""
    for spec, _ in q.qm_kwargs.get("gs_axes", []):
        if spec.split(".")[0].lower() == dim_seg.lower():
            raise ParseError(
                "one DRILLDOWNLEVEL/DRILLDOWNMEMBER/VISUALTOTALS per "
                f"dimension in this MDX subset ({what} repeats "
                f"[{dim_seg}])")


def _merge_sub(q: MdxQuery, sub: MdxQuery) -> None:
    """Fold a sub-expression's accumulated fields into the parent."""
    for k, v in sub.qm_kwargs.items():
        if isinstance(v, list):
            q.qm_kwargs[k] = q.qm_kwargs.get(k, []) + v
        elif isinstance(v, bool):
            q.qm_kwargs[k] = q.qm_kwargs.get(k, False) or v
        else:
            q.qm_kwargs[k] = v


def _simple_set(sub: MdxQuery) -> bool:
    """True when a set-function's inner expression is a bare
    single-level `.Members` set — the only shape an inline computed
    named set can stand for (same test the TOPCOUNT crossjoin-operand
    form applies)."""
    sk = sub.qm_kwargs
    return (len(sk["drilldown"]) == 1 and "." in sk["drilldown"][0]
            and not sk["cut"] and not sk["filter"]
            and not sk["filter_exprs"]
            and not sk["property_filters"]
            and not sk["nonempty_measures"]
            and not sk.get("empty_set")
            and not sk["with_sets"] and "order" not in sk
            and "limit" not in sk)


def _inline_ext_set(q: MdxQuery, sub: MdxQuery, kind: str, arg,
                    top_by, bottom: bool) -> None:
    """Register a set function in crossjoin position as an inline
    COMPUTED named set (r12 — extends the TOPCOUNT-as-operand form to
    TOPPERCENT/BOTTOMPERCENT/TOPSUM/BOTTOMSUM/HEAD/TAIL): the member
    set is evaluated once at plan time in the SLICER context
    (planner.named_set_frame, kind-dispatched) and rides the query as
    a drilldown + memoized member-set cut, so no axis-global
    order/limit ever truncates the crossjoin."""
    name = (f"{kind.capitalize()} Set "
            f"{len(q.qm_kwargs.setdefault('with_sets_ext', [])) + 1}")
    q.qm_kwargs["with_sets_ext"].append(
        (name, sub.qm_kwargs["drilldown"][0], kind, arg, top_by,
         bottom))
    q.qm_kwargs["drilldown"].append(name)


def _axis(p: _P, q: MdxQuery) -> None:
    t = p.peek_upper()
    if t == "NON":
        p.next()
        p.expect("EMPTY")
        q.qm_kwargs["nonempty"] = True
        _axis(p, q)
        return
    _axis_expr(p, q)


def _int(p: _P, what: str) -> int:
    """Consume an integer token; malformed MDX is a 400 (ParseError),
    never a bare ValueError (which would surface as a 500)."""
    tok = p.next()
    try:
        return int(tok)
    except ValueError:
        raise ParseError(f"{what} must be an integer, got {tok!r}")


def _measure_ref(p: _P) -> str:
    segs = _path(p)
    if len(segs) != 2 or segs[0].lower() != "measures":
        raise ParseError(f"expected [Measures].[X], got {_path_str(segs)}")
    return segs[1]


def _order_key(p: _P) -> str:
    """ORDER key: [Measures].[X], or a member method / property
    (reference query_helper.rb:166-188, methods query_helper.rb:8):
    <level>.CurrentMember.{Caption|Key|Name} or
    <level>.CurrentMember.Properties('P').  Encoded as the REST order
    string ('Dim[.Hier].Level.<Method|P>')."""
    segs = _path(p)
    if len(segs) == 2 and segs[0].lower() == "measures":
        return segs[1]
    p.expect(".")
    p.expect("CURRENTMEMBER")
    p.expect(".")
    w = p.next()
    if w.upper() == "PROPERTIES":
        p.expect("(")
        prop = p.next()
        if not prop.startswith("'"):
            raise ParseError("Properties() takes a quoted property name")
        p.expect(")")
        return ".".join(segs) + "." + prop[1:-1]
    if w.upper() not in ("CAPTION", "KEY", "NAME", "UNIQUENAME"):
        raise ParseError(f"unknown member order method {w!r}")
    return ".".join(segs) + "." + w.capitalize().replace(
        "Uniquename", "UniqueName")


def _axis_expr(p: _P, q: MdxQuery) -> None:
    """axis' ( '*' axis' )* — the infix crossjoin form the reference
    exercises in raw MDX (api_spec.rb:284-296).  Function-wrapped
    operands (TOPCOUNT/ORDER/SUBSET/...) are rejected in infix position:
    our QueryModel applies order/limit to the whole axis, so compiling
    `TOPCOUNT(x, n, m) * y` here would silently truncate the crossjoin
    instead of the inner set — a clear 400 beats a wrong answer."""
    # _axis_term returns False (plain set), True (axis-GLOBAL set
    # function — order/limit claims the whole axis, so infix
    # composition would silently truncate the crossjoin), or "gs"
    # (a grouping-sets axis: DRILLDOWNLEVEL/DRILLDOWNMEMBER/
    # VISUALTOTALS, which r10 makes crossjoin-composable — k of them
    # still compile to ONE Expand pass)
    saw_global = _axis_term(p, q, infix_hint=False) is True
    infix = False
    while p.peek() == "*":
        p.next()
        infix = True
        saw_global = (_axis_term(p, q, infix_hint=True) is True
                      or saw_global)
    if infix and saw_global:
        raise ParseError(
            "set functions cannot be crossjoined with * in this MDX "
            "subset (order/limit would apply to the whole axis, not "
            "the inner set); wrap the crossjoin inside the function "
            "(e.g. TOPCOUNT(CROSSJOIN(a, b), n, m)) instead")


def _crossjoin_operand(p: _P, q: MdxQuery) -> None:
    """An operand of function-form CROSSJOIN(a, b): every term is in
    crossjoin position, so a simple TOPCOUNT compiles to an inline
    named set (same path as the infix `TOPCOUNT(...) * set` form) and
    other set functions are rejected — compiling them here would apply
    order/limit to the WHOLE axis and silently truncate the crossjoin
    to the inner set's n rows (the wrong-answer mode the infix path
    already guards against)."""
    while True:
        if _axis_term(p, q, infix_hint=True) is True:
            raise ParseError(
                "set functions cannot be crossjoin operands in this MDX "
                "subset (order/limit would apply to the whole axis, not "
                "the inner set); wrap the crossjoin inside the function "
                "(e.g. TOPCOUNT(CROSSJOIN(a, b), n, m)) instead")
        if p.peek() == "*":
            p.next()
            continue
        break


def _guard_nesting(fn: str, kwargs: dict, incompatible: tuple) -> None:
    """Set functions flatten into ONE axis-global QueryModel, so the
    planner applies them in a fixed stage order (HAVING filter →
    distinct → top_percent → order → offset/limit → tail) regardless
    of how the MDX nested them.  A wrapper over an inner expression
    that already set a kwarg the planner applies at-or-after the
    wrapper's own stage (or a scalar kwarg the wrapper itself needs)
    would silently apply the stages in the wrong order —
    HEAD(TAIL(s, 5), 2) would return the first 2 rows of the whole
    axis instead of the first 2 of the last 5.  Per this file's rule
    (see _axis_expr), a clear 400 beats a wrong answer, mirroring the
    HIERARCHIZE-over-ORDER guard."""
    for key in incompatible:
        if key in kwargs:
            raise ParseError(
                f"{fn} cannot wrap a set that already applies {key} in "
                "this MDX subset (set functions flatten into one "
                "axis-global plan, so this nesting would apply them in "
                "the wrong order); nest the other function inside "
                f"{fn} instead, or split the query")


# For each outer wrapper: the inner-expression kwargs whose planner
# stage runs at-or-after the wrapper's own stage (flattening would
# reverse the nesting), plus the wrapper's own scalar kwargs (a second
# assignment would silently drop the inner one).  Stage-commuting
# combinations (e.g. ORDER over FILTER, TAIL over SUBSET, HEAD over a
# bare SUBSET offset) stay legal.
_NESTING_CONFLICTS = {
    "FILTER": ("top_percent", "top_sum", "offset", "limit", "tail"),
    "DISTINCT": ("top_percent", "top_sum", "offset", "limit", "tail"),
    "TOPPERCENT": ("top_percent", "top_sum", "offset", "limit", "tail"),
    "BOTTOMPERCENT": ("top_percent", "top_sum", "offset", "limit", "tail"),
    "TOPSUM": ("top_percent", "top_sum", "offset", "limit", "tail"),
    "BOTTOMSUM": ("top_percent", "top_sum", "offset", "limit", "tail"),
    "ORDER": ("order", "offset", "limit", "tail"),
    "SUBSET": ("offset", "limit", "tail"),
    "HEAD": ("limit", "tail"),
    "TAIL": ("tail",),
    "TOPCOUNT": ("order", "offset", "limit", "tail"),
}


_SIMPLE_COND_RE = re.compile(
    r"\{m:([^}]+)\} (>=|<=|!=|>|<|=) (-?\d+(?:\.\d+)?)")


def _filter_boolean(p: _P, q: MdxQuery) -> None:
    """The FILTER condition: ``cmp (AND cmp)* (OR cmp (AND cmp)*)*``
    with Mondrian's (= SQL's) AND-binds-tighter precedence.  A pure
    conjunction splits into independent HAVING entries; any OR keeps
    the whole disjunct chain as ONE expression template, so
    ``A AND B OR C`` compiles as ``(A AND B) OR C``, never
    ``A AND (B OR C)``.

    Member-PROPERTY conditions (``<level>.CurrentMember
    .Properties("P") <op> literal``) are axis-set restrictions, not
    cell conditions: they compile to dim-side predicates
    (qm.property_filters) and may only appear as top-level AND
    conjuncts — OR-ing an axis restriction with a cell condition has
    no single-stage equivalent, so that is a clear 400."""
    groups = [_and_chain(p, q)]
    while p.peek_upper() == "OR":
        p.next()
        groups.append(_and_chain(p, q))
    prop_groups = [g for g in groups if any(t is None for t in g)]
    if prop_groups and len(groups) > 1:
        raise ParseError(
            "a member-property FILTER condition cannot appear under "
            "OR in this MDX subset (it restricts the axis member set, "
            "not the cells); split the FILTER or drop the OR")
    groups = [[t for t in g if t is not None] for g in groups]
    if len(groups) == 1:
        for tmpl in groups[0]:
            _classify_condition(q, tmpl)
        return
    # the WHOLE disjunction gets outer parens: emit_mdx joins FILTER
    # conditions with AND, so an unwrapped `a or b` next to another
    # condition would re-lex with different grouping (AND binds
    # tighter) — the echo must re-compile to the same plan
    disj = "( " + " or ".join(
        "( " + " and ".join(g) + " )" if len(g) > 1 else g[0]
        for g in groups) + " )"
    q.qm_kwargs["filter_exprs"].append(disj)


def _and_chain(p: _P, q: MdxQuery | None = None) -> list[str | None]:
    """Conjuncts of the FILTER condition.  With ``q`` given (top-level
    chains only), each conjunct is first tried as a member-property
    condition, which records into q.qm_kwargs['property_filters'] and
    contributes a ``None`` marker; nested parenthesized/NOT contexts
    pass q=None, so property conditions there fail over to the measure
    parser's clear 400."""
    out = [_bool_or_prop(p, q)]
    while p.peek_upper() == "AND":
        p.next()
        out.append(_bool_or_prop(p, q))
    return out


def _bool_or_prop(p: _P, q: MdxQuery | None) -> str | None:
    if q is not None:
        save = p.pos
        try:
            q.qm_kwargs["property_filters"].append(_property_condition(p))
            return None
        except ParseError:
            p.pos = save
        try:
            q.qm_kwargs["nav_filters"].append(_navigation_condition(p))
            return None
        except _CommittedParseError:
            raise        # structurally a nav condition; keep the
        except ParseError:  # specific diagnostic, don't backtrack
            p.pos = save
    return _bool_primary(p)


class _CommittedParseError(ParseError):
    """A ParseError raised AFTER a speculative parse has structurally
    committed (e.g. a navigation condition past its IS): backtracking
    fallbacks must re-raise it instead of swallowing the diagnostic."""


def _navigation_condition(p: _P) -> tuple:
    """Member-NAVIGATION filter conjunct (VERDICT r8 #3) — the two
    Mondrian idioms power users hit first:

    * ``<level path>.CurrentMember.Parent IS <member>``
    * ``ANCESTOR(<level path>.CurrentMember, <level path>) IS
      <member>``

    Both compile to an ancestor-member cut (the planner validates the
    level distance — .Parent must name the level EXACTLY one up — then
    pushes the key predicate to the dimension scan).  Like property
    conditions these restrict the axis member set, which coincides
    with the cut semantics because every member has exactly one
    ancestor path: slicing facts to the ancestor drops precisely the
    members outside it."""
    if p.peek_upper() == "ANCESTOR":
        p.next()
        p.expect("(")
        path = _path(p)
        p.expect(".")
        p.expect("CURRENTMEMBER")
        p.expect(",")
        anc = _path(p)
        p.expect(")")
        p.expect("IS")
        m = _path(p)
        if len(m) < 3:
            raise ParseError(
                f"ANCESTOR ... IS needs [Dim].[Level].[member], got "
                f"{_path_str(m)}")
        if [s.lower() for s in m[:-1]] != [s.lower() for s in anc]:
            raise _CommittedParseError(
                f"ANCESTOR level {_path_str(anc)} does not match the "
                f"comparison member's level {_path_str(m[:-1])}")
        return (_path_str(path), "ancestor", _path_str(m))
    path = _path(p)
    p.expect(".")
    p.expect("CURRENTMEMBER")
    p.expect(".")
    if p.next().upper() != "PARENT":
        raise ParseError("expected .Parent in a navigation condition")
    p.expect("IS")
    m = _path(p)
    if len(m) < 3:
        raise ParseError(
            f".Parent IS needs [Dim].[Level].[member], got "
            f"{_path_str(m)}")
    return (_path_str(path), "parent", _path_str(m))


def _property_condition(p: _P) -> tuple:
    """``<level path>.CurrentMember.Properties("Name") <op> literal``
    — Mondrian's member-property FILTER idiom (e.g. FILTER(
    [Customer].[Customer].Members, [Customer].[Customer].CurrentMember
    .Properties("Market Segment") = "BUILDING")).  Compiles to a
    dim-side predicate pushed to the property's scan."""
    path = _path(p)
    if len(path) < 2:
        raise ParseError("property condition needs [Dim].[Level]")
    p.expect(".")
    p.expect("CURRENTMEMBER")
    p.expect(".")
    p.expect("PROPERTIES")
    p.expect("(")
    t = p.next()
    if len(t) < 2 or t[0] not in "'\"" or t[-1] != t[0]:
        raise ParseError(f"Properties() needs a quoted name, got {t!r}")
    name = t[1:-1]
    p.expect(")")
    op = p.next()
    if op not in ("=", "<>", ">", ">=", "<", "<="):
        raise ParseError(
            f"property condition operator must be =, <>, >, >=, <, "
            f"<=; got {op!r}")
    v = p.next()
    if v == "-":
        v = "-" + p.next()
    if v and v[0] in "'\"":
        if len(v) < 2 or v[-1] != v[0]:
            raise ParseError(f"bad string literal {v!r}")
        value: object = v[1:-1]
    else:
        try:
            value = int(v)
        except ValueError:
            try:
                value = float(v)
            except ValueError:
                raise ParseError(
                    f"property comparison value must be a quoted "
                    f"string or a number, got {v!r}")
    return (_path_str(list(path) + [name]), op, value)


def _bool_primary(p: _P) -> str:
    """A comparison, an optionally NOT-prefixed term, or a
    PARENTHESIZED boolean group — tried as a nested AND/OR chain first
    so the debug echo's own output re-lexes; on failure the parens are
    re-read as arithmetic grouping (``([Measures].[A] + 1) > 2``)."""
    if p.peek_upper() == "NOT":
        p.next()
        return "not " + _bool_primary(p)
    if p.peek() == "(":
        save = p.pos
        p.next()
        try:
            inner = [_and_chain(p)]
            while p.peek_upper() == "OR":
                p.next()
                inner.append(_and_chain(p))
            p.expect(")")
            if len(inner) == 1 and len(inner[0]) == 1:
                return "( " + inner[0][0] + " )"
            return "( " + " or ".join(
                " and ".join(g) for g in inner) + " )"
        except ParseError:
            p.pos = save
    return _one_condition(p)


def _one_condition(p: _P) -> str:
    """One comparison over measure arithmetic (the most common
    hand-written Mondrian idiom is ``[Measures].[A] > [Measures].[B]``,
    reference api_helpers.rb:42-54 executes it via Mondrian)."""
    tmpl = _calc_tokens(p, stop_words=("AND", "OR", "ON"))
    if not _SIMPLE_COND_RE.fullmatch(tmpl) and not re.search(
            r"(^|\s)(>=|<=|!=|>|<|=)(\s|$)", tmpl):
        raise ParseError(
            f"FILTER condition must be a comparison, got {tmpl!r}")
    return tmpl


def _classify_condition(q: MdxQuery, tmpl: str) -> None:
    """Legacy measure-vs-literal conditions keep compiling to the
    REST-equivalent ``qm.filter`` string (so rollup routing and the
    /aggregate round-trip see them unchanged); everything else becomes
    an expression template in ``qm.filter_exprs``, resolved to
    post-agg aliases at plan time."""
    m = _SIMPLE_COND_RE.fullmatch(tmpl)
    if m:
        op = "<>" if m.group(2) == "!=" else m.group(2)
        q.qm_kwargs["filter"].append(f"{m.group(1)} {op} {m.group(3)}")
    else:
        q.qm_kwargs["filter_exprs"].append(tmpl)


def _axis_term(p: _P, q: MdxQuery, infix_hint: bool = False) -> bool:
    """Parse one axis term; returns True when it was a set function
    (which imposes axis-global order/limit/filter semantics).
    ``infix_hint`` marks a term appearing to the right of ``*`` —
    a simple TOPCOUNT there compiles to an inline named set instead."""
    t = p.peek_upper()
    if t == "EXISTING":
        # EXISTING <set>: the set restricted to the CURRENT context
        # (slicer/cuts).  Under NON EMPTY this is a no-op — members
        # outside the context aggregate over nothing and drop.  Under
        # DENSE axes (no NON EMPTY) it is NOT: Mondrian's EXISTING
        # drops out-of-context members where a plain dense fill would
        # surface them as null rows (ADVICE/VERDICT r9 #3) — so the
        # set's dimensions are recorded and the planner restricts
        # THOSE dense member frames by the same-dimension WHERE cuts
        # (the members_frame `restrict` join, which applies coarser-
        # level predicates and projects back).
        p.next()
        n_before = len(q.qm_kwargs["drilldown"])
        r = _axis_term(p, q, infix_hint)
        for d in q.qm_kwargs["drilldown"][n_before:]:
            q.qm_kwargs.setdefault("existing_dims", []).append(
                d.split(".")[0])
        return r
    if t == "CROSSJOIN":
        # CROSSJOIN(set1, set2) — the explicit function form of the
        # infix `*` the grammar already parses (r10, VERDICT r9 #7).
        # Each operand is in crossjoin position: the same guards apply
        # (a simple TOPCOUNT compiles to an inline named set; other
        # set functions 400 — order/limit would silently apply to the
        # whole axis), and operands may themselves be infix chains or
        # nested CROSSJOINs, so N-ary composition works.
        p.next()
        p.expect("(")
        _crossjoin_operand(p, q)
        p.expect(",")
        _crossjoin_operand(p, q)
        p.expect(")")
        return False
    if t == "EXISTS":
        # EXISTS(set1, set2): tuples of set1 that exist with set2 via
        # hierarchy relations (MDX spec; no measure-group 3rd arg in
        # this subset).  set2 on the SAME dimension compiles to an
        # ancestor cut — every member has exactly one ancestor path,
        # so slicing facts to set2 keeps exactly the related members;
        # set2 on an UNRELATED dimension leaves set1 unchanged (the
        # spec's behavior for non-overlapping hierarchies), compiled
        # as a no-op.  set2 DEEPER than set1 (e.g. regions having a
        # given customer) hits the planner's ascendant-drill 400 — a
        # documented restriction, not a wrong answer.
        p.next()
        p.expect("(")
        sub = MdxQuery()
        sub.set_macros = q.set_macros
        _axis_expr(p, sub)
        p.expect(",")
        level2, kind2, mem2 = _member_set_operand(p)
        p.expect(")")
        dims1 = {d.split(".")[0].lower()
                 for d in sub.qm_kwargs["drilldown"] if "." in d}
        _merge_sub(q, sub)
        if dims1 and level2[0].lower() not in dims1:
            return False                   # unrelated dim: no-op
        if kind2 == "pos":
            if mem2:
                q.qm_kwargs["cut"].append(
                    "{" + ",".join(_path_str(m) for m in mem2) + "}")
            else:
                q.qm_kwargs["empty_set"] = True
        elif mem2:
            q.qm_kwargs["cut"].append(
                "!{" + ",".join(_path_str(m) for m in mem2) + "}")
        # neg([]) == the whole level: EXISTS over everything, no cut
        return False
    if t == "NONEMPTY":
        # NONEMPTY(set[, measure]) function form: the 1-arg form == the
        # NON EMPTY axis prefix (implicit current-context measures);
        # the 2-arg form restricts by THAT measure only — tuples where
        # it is empty drop even if other displayed measures have data
        # (Mondrian NonEmpty(set, filter_set) with a measure filter)
        p.next()
        p.expect("(")
        _crossjoin_operand(p, q)
        if p.peek() == ",":
            p.next()
            q.qm_kwargs["nonempty_measures"].append(_measure_ref(p))
        else:
            q.qm_kwargs["nonempty"] = True
        p.expect(")")
        return False
    if t == "VISUALTOTALS":
        # VISUALTOTALS({parent, child, child, ...}): the parent's
        # total reflects only the LISTED children (Mondrian's visible
        # total).  Compiles onto the DRILLDOWNMEMBER grouping-sets
        # machinery plus a cut to the listed children: the cut
        # restricts the fact rows, so the parent subtotal row
        # aggregates exactly the visible children — no second pass.
        # A child that is NOT actually under the listed parent is a
        # 400: the planner checks each child's ancestor key at the
        # parent level against the parent member (r10, ADVICE r9 —
        # without the check the foreign child's facts leak into its
        # OWN parent's subtotal row, which survives NON EMPTY, while
        # the child row itself is dropped by the subset filter), and
        # additionally ANDs a cut on the parent member so foreign
        # facts can never enter the aggregate.
        p.next()
        p.expect("(")
        p.expect("{")
        members = []
        while True:
            members.append(_path(p))
            if p.peek() == ",":
                p.next()
                continue
            break
        p.expect("}")
        p.expect(")")
        if len(members) < 2:
            raise ParseError(
                "VISUALTOTALS needs {parent, child, ...} — at least "
                "one child member")
        parent, children = members[0], members[1:]
        if len(parent) < 3:
            raise ParseError(
                f"VISUALTOTALS parent needs [Dim].[Level].[member], "
                f"got {_path_str(parent)}")
        for m in children:
            if m[0].lower() != parent[0].lower():
                raise ParseError(
                    f"VISUALTOTALS member {_path_str(m)} is not on the "
                    f"parent's dimension {_path_str([parent[0]])}")
            if m[:-1] == parent[:-1]:
                raise ParseError(
                    f"VISUALTOTALS child {_path_str(m)} is at the "
                    f"parent's own level; list the parent first, then "
                    f"its children")
        _guard_gs_dim(q, parent[0], "VISUALTOTALS")
        q.qm_kwargs.setdefault("gs_axes", []).append(
            (".".join(parent[:-1]), "{" + _path_str(parent) + "}"))
        children_cut = "{" + ",".join(_path_str(m) for m in children) + "}"
        q.qm_kwargs["cut"].append(children_cut)
        q.qm_kwargs.setdefault("visual_totals", []).append(
            ("{" + _path_str(parent) + "}", children_cut))
        return "gs"
    if t in ("DRILLDOWNLEVELTOP", "DRILLDOWNLEVELBOTTOM"):
        # DRILLDOWNLEVELTOP(<level>.Members, n, [Measures].[M]) =
        # the level's members PLUS each member's best n children by M
        # (BOTTOM: worst n) — Mondrian's drill-with-budget idiom.
        # Rides the grouping-sets machinery: subtotal rows keep, child
        # rows rank-filter per parent (one axis-sized window after the
        # Expand aggregate).  Mondrian evaluates the set BEFORE any
        # crossjoin, so composing with another axis set would change
        # which children compete — sole axis expression, clear 400
        # otherwise (enforced in the planner via gs_top).
        p.next()
        p.expect("(")
        outer = _path(p)
        p.expect(".")
        p.expect("MEMBERS")
        p.expect(",")
        n = _int(p, f"{t} count")
        if n < 1:
            raise ParseError(f"{t} count must be >= 1, got {n}")
        p.expect(",")
        measure = _measure_ref(p)
        p.expect(")")
        _guard_gs_dim(q, outer[0], t)
        q.qm_kwargs.setdefault("gs_axes", []).append(
            (".".join(outer), None))
        q.qm_kwargs.setdefault("gs_top", []).append(
            (".".join(outer), n, measure, t == "DRILLDOWNLEVELBOTTOM"))
        return "gs"
    if t in ("DRILLDOWNLEVEL", "DRILLDOWNMEMBER"):
        # DRILLDOWNLEVEL(<level>.Members) = the level's members PLUS
        # each member's children, hierarchized (parent subtotal row
        # before its children); DRILLDOWNMEMBER(<level>.Members,
        # {m, ...}) drills only the listed members.  Both compile to
        # ONE grouping-sets aggregate — a single Expand pass, no
        # second scan; parent rows carry NULL child columns
        # (Mondrian's mixed-depth axis).  Dense (no NON EMPTY) fills
        # per-grouping-set member frames since r12 (planner
        # _densify_gs).  r10 (VERDICT r9 #4): crossjoin-composable,
        # one per DIMENSION — k grouping-sets axes compile to 2^k
        # sets in the same single Expand pass.
        p.next()
        p.expect("(")
        outer = _path(p)
        p.expect(".")
        p.expect("MEMBERS")
        subset = None
        if t == "DRILLDOWNMEMBER":
            p.expect(",")
            p.expect("{")
            members = []
            while True:
                members.append(_path(p))
                if p.peek() == ",":
                    p.next()
                    continue
                break
            p.expect("}")
            for m in members:
                if [s.lower() for s in m[:len(outer)]] != \
                        [s.lower() for s in outer]:
                    raise ParseError(
                        f"DRILLDOWNMEMBER subset member {_path_str(m)} "
                        f"is not on the drilled level "
                        f"{_path_str(outer)}")
            subset = "{" + ",".join(_path_str(m) for m in members) + "}"
        elif p.peek() == ",":
            raise ParseError(
                "DRILLDOWNLEVEL supports the 1-arg form "
                "(<level>.Members) in this MDX subset")
        p.expect(")")
        _guard_gs_dim(q, outer[0], t)
        q.qm_kwargs.setdefault("gs_axes", []).append(
            (".".join(outer), subset))
        return "gs"
    if t == "GENERATE":
        # GENERATE(<level>.Members, <inner>) — the union of the inner
        # set evaluated at each member of the outer set.  Supported
        # inner forms (r9 generalizes VERDICT r8 #6 beyond the
        # canonical idiom):
        #
        #   TOPCOUNT|BOTTOMCOUNT(<nav>, n, [Measures].[M])  per-parent
        #     best/worst n by measure
        #   HEAD|TAIL(<nav>[, n])                           per-parent
        #     first/last n in hierarchy (key) order
        #   nav := <outer>.CurrentMember.Children
        #        | DESCENDANTS(<outer>.CurrentMember, <level path>)
        #     (the deeper DESCENDANTS level generalizes .Children)
        #
        # All compile to a (parent, target) drilldown plus ONE
        # axis-sized per-parent rank window each — never the fact.
        # Fully general GENERATE (arbitrary inner set expressions)
        # stays out of scope (SURVEY §2.10 Q6); one GENERATE per
        # DIMENSION (r11 lifts the r10 one-per-query cap: k GENERATEs
        # on different dimensions compose as independent per-parent
        # windows ranking by the MARGINAL measure — Mondrian's
        # pre-crossjoin evaluation for additive measures).
        p.next()
        p.expect("(")
        outer = _path(p)
        p.expect(".")
        p.expect("MEMBERS")
        p.expect(",")
        fn = p.next().upper()
        nested = None   # (nested_outer_path_segs, mode) after flattening
        if fn == "GENERATE":
            # Nested GENERATE (r12): GENERATE(L1.Members,
            # GENERATE(<nav to Lmid>, inner)).  The outer iterates the
            # FULL L1 level and GENERATE unions with duplicate removal
            # (Mondrian default), so the union over every L1 member of
            # the nested set is exactly Lmid's full member set:
            # the expression collapses to GENERATE(Lmid.Members, inner).
            # Parse the nav, remember the collapse for planner-side
            # ancestry validation, and fall through to the ordinary
            # single-GENERATE inner parse with outer := Lmid.
            p.expect("(")
            if p.peek_upper() == "DESCENDANTS":
                p.next()
                p.expect("(")
                nv = _path(p)
                p.expect(".")
                p.expect("CURRENTMEMBER")
                p.expect(",")
                mid = _path(p)
                p.expect(")")
                if [s.lower() for s in nv] != [s.lower() for s in outer]:
                    raise ParseError(
                        "nested GENERATE DESCENDANTS must navigate the "
                        f"outer level ({_path_str(outer)}.CurrentMember)"
                        f", got {_path_str(nv)}.CurrentMember")
                if mid[0].lower() != outer[0].lower():
                    raise ParseError(
                        "nested GENERATE DESCENDANTS target must stay "
                        f"on dimension {_path_str([outer[0]])}, got "
                        f"{_path_str(mid)}")
                nested = (outer, "descendants")
                outer = mid
            else:
                nv = _path(p)
                p.expect(".")
                p.expect("CURRENTMEMBER")
                p.expect(".")
                p.expect("CHILDREN")
                if [s.lower() for s in nv] != [s.lower() for s in outer]:
                    raise ParseError(
                        "nested GENERATE inner set must navigate the "
                        f"outer level ({_path_str(outer)}.CurrentMember)"
                        f", got {_path_str(nv)}.CurrentMember")
                # Lmid (the child level of L1) is named by the
                # INNERMOST navigation path; outer is replaced there.
                nested = (outer, "children")
                outer = None
            p.expect(",")
            fn = p.next().upper()
            if fn == "GENERATE":
                raise ParseError(
                    "GENERATE nests at most one level in this MDX "
                    "subset")
        if fn not in ("TOPCOUNT", "BOTTOMCOUNT", "HEAD", "TAIL"):
            raise ParseError(
                "GENERATE supports TOPCOUNT/BOTTOMCOUNT(<nav>, n, "
                "[Measures].[M]) and HEAD/TAIL(<nav>[, n]) as its "
                f"inner set in this MDX subset; got {fn!r}")
        p.expect("(")
        target = None
        if p.peek_upper() == "DESCENDANTS":
            p.next()
            p.expect("(")
            inner = _path(p)
            p.expect(".")
            p.expect("CURRENTMEMBER")
            p.expect(",")
            tpath = _path(p)
            p.expect(")")
            anchor = outer if outer is not None else inner
            if tpath[0].lower() != anchor[0].lower():
                raise ParseError(
                    "GENERATE DESCENDANTS target must stay on the "
                    f"outer dimension {_path_str([anchor[0]])}, got "
                    f"{_path_str(tpath)}")
            target = tpath[-1]
        else:
            inner = _path(p)
            p.expect(".")
            p.expect("CURRENTMEMBER")
            p.expect(".")
            p.expect("CHILDREN")
        if outer is None:
            # nested "children" form: the innermost navigation path
            # names Lmid, the flattened outer level (validated as the
            # immediate child of the nested outer in the planner)
            outer = inner
            if nested[0][0].lower() != outer[0].lower():
                raise ParseError(
                    "nested GENERATE levels must stay on dimension "
                    f"{_path_str([nested[0][0]])}, got "
                    f"{_path_str(outer)}")
        elif [s.lower() for s in inner] != [s.lower() for s in outer]:
            raise ParseError(
                "GENERATE inner set must navigate the outer level "
                f"({_path_str(outer)}.CurrentMember), got "
                f"{_path_str(inner)}.CurrentMember")
        if fn in ("TOPCOUNT", "BOTTOMCOUNT"):
            p.expect(",")
            n = _int(p, f"GENERATE {fn} count")
            p.expect(",")
            top_by = _measure_ref(p)
            asc = fn == "BOTTOMCOUNT"
        else:
            n = 1                      # Mondrian HEAD/TAIL default
            if p.peek() == ",":
                p.next()
                n = _int(p, f"GENERATE {fn} count")
            top_by = None              # hierarchy-order, no measure
            asc = fn == "HEAD"
        if n < 1:
            raise ParseError(f"GENERATE {fn} count must be >= 1")
        p.expect(")")
        p.expect(")")
        if nested is not None:
            p.expect(")")   # the nested GENERATE's own closer
        # one GENERATE per DIMENSION (r11, VERDICT r10 #3 — r10 capped
        # at one per query, like the r10 grouping-sets lift): each
        # composes as an independent per-parent window
        prev = q.qm_kwargs.get("generate_top")
        dims_taken = ([prev[0].split(".")[0].lower()] if prev else []) \
            + [e[0].split(".")[0].lower()
               for e in q.qm_kwargs.get("generate_more", [])]
        if outer[0].lower() in dims_taken:
            raise ParseError(
                "one GENERATE per dimension in this MDX subset "
                f"(GENERATE repeats [{outer[0]}])")
        if prev is None:
            q.qm_kwargs["generate_top"] = (".".join(outer), n, top_by, asc)
            if top_by is None or target is not None:
                q.qm_kwargs["generate_inner"] = (
                    "key" if top_by is None else "measure", target)
        else:
            q.qm_kwargs.setdefault("generate_more", []).append(
                (".".join(outer), n, top_by, asc,
                 "key" if top_by is None else "measure", target))
        if nested is not None:
            q.qm_kwargs.setdefault("generate_nested", []).append(
                (".".join(outer), ".".join(nested[0]), nested[1]))
        return "gen"
    if t in ("DISTINCT", "SUBSET", "ORDER", "FILTER", "TOPCOUNT", "CROSSJOIN",
             "HEAD", "TAIL", "NONEMPTYCROSSJOIN", "TOPPERCENT",
             "BOTTOMPERCENT", "TOPSUM", "BOTTOMSUM"):
        p.next()
        p.expect("(")
        if t in ("TOPSUM", "BOTTOMSUM"):
            # minimal best-first prefix whose cumulative measure
            # reaches the ABSOLUTE value (TOPPERCENT's sibling)
            sub = MdxQuery()
            sub.set_macros = q.set_macros
            _axis_expr(p, sub)
            p.expect(",")
            tok = p.next()
            try:
                val = float(tok)
            except ValueError:
                raise ParseError(
                    f"{t} value must be numeric, got {tok!r}")
            p.expect(",")
            top_by = _measure_ref(p)
            p.expect(")")
            if _simple_set(sub) and (infix_hint or p.peek() == "*"):
                # crossjoin operand (r12): the minimal-prefix member
                # SET, crossjoined — an inline computed named set,
                # exactly like the TOPCOUNT form below
                _inline_ext_set(q, sub, "sum", val, top_by,
                                t == "BOTTOMSUM")
                return False
            _guard_nesting(t, sub.qm_kwargs, _NESTING_CONFLICTS[t])
            _merge_sub(q, sub)
            q.qm_kwargs["top_sum"] = (val, top_by, t == "BOTTOMSUM")
            return True
        if t in ("TOPPERCENT", "BOTTOMPERCENT"):
            # minimal best-first prefix reaching pct% of the set total
            sub = MdxQuery()
            sub.set_macros = q.set_macros
            _axis_expr(p, sub)
            p.expect(",")
            tok = p.next()
            try:
                pct = float(tok)
            except ValueError:
                raise ParseError(
                    f"{t} percentage must be numeric, got {tok!r}")
            if not 0 < pct <= 100:
                raise ParseError(f"{t} percentage must be in (0, 100]")
            p.expect(",")
            top_by = _measure_ref(p)
            p.expect(")")
            if _simple_set(sub) and (infix_hint or p.peek() == "*"):
                _inline_ext_set(q, sub, "percent", pct, top_by,
                                t == "BOTTOMPERCENT")
                return False
            _guard_nesting(t, sub.qm_kwargs, _NESTING_CONFLICTS[t])
            _merge_sub(q, sub)
            q.qm_kwargs["top_percent"] = (pct, top_by,
                                          t == "BOTTOMPERCENT")
            return True
        if t == "DISTINCT":
            _axis_expr(p, q)
            _guard_nesting(t, q.qm_kwargs, _NESTING_CONFLICTS[t])
            q.qm_kwargs["distinct"] = True
        elif t == "SUBSET":
            sub = MdxQuery()
            sub.set_macros = q.set_macros
            _axis_expr(p, sub)
            p.expect(",")
            off = _int(p, "SUBSET offset")
            cnt = None
            if p.peek() == ",":
                p.next()
                cnt = _int(p, "SUBSET count")
            if off < 0 or (cnt is not None and cnt < 0):
                raise ParseError("SUBSET offset/count must be >= 0")
            p.expect(")")
            if _simple_set(sub) and (infix_hint or p.peek() == "*"):
                # crossjoin operand (r12): the hierarchy-order slice of
                # the level's member set — dim-side, fact-independent
                _inline_ext_set(q, sub, "subset", (off, cnt), None,
                                False)
                return False
            _guard_nesting(t, sub.qm_kwargs, _NESTING_CONFLICTS[t])
            _merge_sub(q, sub)
            q.qm_kwargs["offset"] = off
            if cnt is not None:
                q.qm_kwargs["limit"] = cnt
            return True
        elif t in ("HEAD", "TAIL"):
            # HEAD = first n of the axis total order (offset 0 limit n);
            # TAIL = last n (QueryModel.tail — reverse-order limit +
            # forward re-sort in the planner).  Mondrian defaults n=1.
            sub = MdxQuery()
            sub.set_macros = q.set_macros
            _axis_expr(p, sub)
            n = 1
            if p.peek() == ",":
                p.next()
                n = _int(p, f"{t} count")
            if n < 0:
                raise ParseError(f"{t} count must be >= 0")
            p.expect(")")
            if _simple_set(sub) and (infix_hint or p.peek() == "*"):
                # crossjoin operand (r12): the first/last-n MEMBER set
                # in hierarchy (key) order — dim-side, fact-independent
                _inline_ext_set(q, sub, "tail" if t == "TAIL"
                                else "head", n, None, False)
                return False
            _guard_nesting(t, sub.qm_kwargs, _NESTING_CONFLICTS[t])
            _merge_sub(q, sub)
            if t == "HEAD":
                q.qm_kwargs["limit"] = n
            else:
                q.qm_kwargs["tail"] = n
            return True
        elif t == "ORDER":
            _axis_expr(p, q)
            _guard_nesting(t, q.qm_kwargs, _NESTING_CONFLICTS[t])
            p.expect(",")
            q.qm_kwargs["order"] = _order_key(p)
            if p.peek() == ",":
                p.next()
                q.qm_kwargs["order_desc"] = p.next().upper() == "BDESC"
        elif t == "FILTER":
            _axis_expr(p, q)
            _guard_nesting(t, q.qm_kwargs, _NESTING_CONFLICTS[t])
            p.expect(",")
            before = (len(q.qm_kwargs.get("filter", [])),
                      len(q.qm_kwargs.get("filter_exprs", [])),
                      len(q.qm_kwargs.get("nonempty_measures", [])))
            _filter_boolean(p, q)
            after = (len(q.qm_kwargs.get("filter", [])),
                     len(q.qm_kwargs.get("filter_exprs", [])),
                     len(q.qm_kwargs.get("nonempty_measures", [])))
            if before == after:
                # dim-side-only conditions (member-property / member-
                # navigation filters): per-DIMENSION set restrictions,
                # freely crossjoin-composable (r12) — only MEASURE
                # conditions are axis-global (they filter tuple CELLS,
                # so in infix position they would silently change
                # meaning; those keep the 400 below)
                p.expect(")")
                return False
        elif t == "TOPCOUNT":
            sub = MdxQuery()
            sub.set_macros = q.set_macros   # WITH SET macros stay visible
            _axis_expr(p, sub)
            p.expect(",")
            n = _int(p, "TOPCOUNT count")
            p.expect(",")
            top_by = _measure_ref(p)
            p.expect(")")
            sk = sub.qm_kwargs
            simple = (len(sk["drilldown"]) == 1 and "." in sk["drilldown"][0]
                      and not sk["cut"] and not sk["filter"]
                      and not sk["filter_exprs"]
                      and not sk["property_filters"]
                      and not sk["nonempty_measures"]
                      and not sk.get("empty_set")
                      and not sk["with_sets"] and "order" not in sk
                      and "limit" not in sk)
            if simple and (infix_hint or p.peek() == "*"):
                # TOPCOUNT as an infix-crossjoin operand (reference
                # api_spec.rb:284-296 `TOPCOUNT(...) * set`): Mondrian
                # semantics are "the top-n SET, crossjoined" — exactly
                # an inline named set, so no axis-global order/limit
                name = f"TopCount Set {len(q.qm_kwargs['with_sets']) + 1}"
                q.qm_kwargs["with_sets"].append(
                    (name, sk["drilldown"][0], n, top_by, False))
                q.qm_kwargs["drilldown"].append(name)
                return False
            # whole-axis TOPCOUNT: rank + truncate the axis itself
            _guard_nesting(t, sub.qm_kwargs, _NESTING_CONFLICTS[t])
            _merge_sub(q, sub)
            q.qm_kwargs["order"] = top_by
            q.qm_kwargs["order_desc"] = True
            q.qm_kwargs["limit"] = n
            return True
        elif t in ("CROSSJOIN", "NONEMPTYCROSSJOIN"):
            _crossjoin_operand(p, q)
            p.expect(",")
            _crossjoin_operand(p, q)
            if t == "NONEMPTYCROSSJOIN":
                # Mondrian's NonEmptyCrossJoin = crossjoin restricted
                # to tuples with data — exactly our nonempty axis
                q.qm_kwargs["nonempty"] = True
        p.expect(")")
        # DISTINCT/CROSSJOIN are axis-shape-neutral; the rest impose
        # axis-global order/limit/filter semantics
        return t in ("SUBSET", "ORDER", "FILTER", "TOPCOUNT", "HEAD", "TAIL")
    if t == "DESCENDANTS":
        q.qm_kwargs["drilldown"].append(_descendants(p, q))
        return False
    if t == "LASTPERIODS":
        # LASTPERIODS(n, <member>): the n periods ending at the member
        # (Mondrian idiom on time levels; resolved against the catalog
        # at plan time — QueryModel.lastperiods)
        p.next()
        p.expect("(")
        n = _int(p, "LASTPERIODS count")
        p.expect(",")
        segs = _path(p)
        if len(segs) < 3:
            raise ParseError(
                f"LASTPERIODS needs [Dim].[Level].[member], got "
                f"{_path_str(segs)}")
        p.expect(")")
        q.qm_kwargs["lastperiods"].append((_path_str(segs), n))
        return False
    if t in ("OPENINGPERIOD", "CLOSINGPERIOD"):
        # OPENINGPERIOD(level, member): the FIRST descendant of the
        # member at the level in hierarchy order (CLOSINGPERIOD = the
        # last) — the classic Mondrian time idiom; generalizes
        # .FirstChild/.LastChild to any descendant level, resolved as
        # one lexicographic dim-side walk at plan time
        # (QueryModel.edge_child_of 3-tuples)
        p.next()
        p.expect("(")
        level_path = _path(p)
        if len(level_path) < 2:
            raise ParseError(
                f"{t} level must be [Dim].[Level], got "
                f"{_path_str(level_path)}")
        p.expect(",")
        member = _path(p)
        p.expect(")")
        if len(member) < 3:
            raise ParseError(
                f"{t} member needs [Dim].[Level].[member], got "
                f"{_path_str(member)}")
        if level_path[0].lower() != member[0].lower():
            raise ParseError(
                f"{t}: level dimension {level_path[0]!r} does not match "
                f"member dimension {member[0]!r}")
        q.qm_kwargs["edge_child_of"].append(
            (_path_str(member), t == "CLOSINGPERIOD", level_path[-1]))
        return False
    if t == "ANCESTOR":
        # ANCESTOR(member, level): the member's ancestor at the level
        # (generalizes .Parent to any height); resolved as a bounded
        # dim-side lookup at plan time (QueryModel.ancestor_of)
        p.next()
        p.expect("(")
        member = _path(p)
        if len(member) < 3:
            raise ParseError(
                f"ANCESTOR member needs [Dim].[Level].[member], got "
                f"{_path_str(member)}")
        p.expect(",")
        level_path = _path(p)
        if len(level_path) < 2:
            raise ParseError(
                f"ANCESTOR level must be [Dim].[Level], got "
                f"{_path_str(level_path)}")
        p.expect(")")
        if level_path[0].lower() != member[0].lower():
            raise ParseError(
                f"ANCESTOR: level dimension {level_path[0]!r} does not "
                f"match member dimension {member[0]!r}")
        q.qm_kwargs["ancestor_of"].append(
            (_path_str(member), level_path[-1]))
        return False
    if t == "PERIODSTODATE":
        # PERIODSTODATE(level, member): all members of the member's
        # level from the opening of its ancestor period at the level
        # through the member itself (YTD(m) == PERIODSTODATE(Year, m));
        # resolved as bounded lookups + a key-range cut at plan time
        # (QueryModel.periods_to_date)
        p.next()
        p.expect("(")
        level_path = _path(p)
        if len(level_path) < 2:
            raise ParseError(
                f"PERIODSTODATE level must be [Dim].[Level], got "
                f"{_path_str(level_path)}")
        p.expect(",")
        member = _path(p)
        p.expect(")")
        if len(member) < 3:
            raise ParseError(
                f"PERIODSTODATE member needs [Dim].[Level].[member], "
                f"got {_path_str(member)}")
        if level_path[0].lower() != member[0].lower():
            raise ParseError(
                f"PERIODSTODATE: level dimension {level_path[0]!r} does "
                f"not match member dimension {member[0]!r}")
        q.qm_kwargs["periods_to_date"].append(
            (level_path[-1], _path_str(member)))
        return False
    if t == "HIERARCHIZE":
        # HIERARCHIZE(set): hierarchical member order — this engine's
        # DEFAULT axis order (root-level keys outermost, asc; planner
        # orderBy key_aliases), so over a plain set it is a no-op
        # wrapper.  r9 generalizes to ANY inner axis expression:
        # wrapping a RANKED set (ORDER/TOPCOUNT/TOPPERCENT/TOPSUM —
        # Mondrian's pick-then-display-hierarchically idiom) keeps the
        # rank's tuple selection and re-sorts the display
        # hierarchically (qm.hierarchize, one axis-sized re-sort).
        p.next()
        p.expect("(")
        _axis_expr(p, q)
        p.expect(")")
        if ("order" in q.qm_kwargs
                or q.qm_kwargs.get("top_percent") is not None
                or q.qm_kwargs.get("top_sum") is not None):
            q.qm_kwargs["hierarchize"] = True
        return False
    if t in ("UNION", "EXCEPT", "INTERSECT"):
        level_path, kind, members = _member_set_operand(p)
        q.qm_kwargs["drilldown"].append(".".join(level_path))
        if kind == "pos":
            if members:
                q.qm_kwargs["cut"].append(
                    "{" + ",".join(_path_str(m) for m in members) + "}")
            else:
                # EXCEPT/INTERSECT evaluated to the empty set: a valid
                # zero-row axis (Mondrian semantics), kept as an
                # always-false slice so the schema still carries the level
                q.qm_kwargs["empty_set"] = True
        elif members:
            # the level's COMPLEMENT (EXCEPT(<level>.Members, {...})):
            # one exclusion cut pushed to the scans like any other
            q.qm_kwargs["cut"].append(
                "!{" + ",".join(_path_str(m) for m in members) + "}")
        # neg([]) == the whole level: a plain drilldown, no cut
        return False
    if t == "{":
        _set_expr(p, q)
        return False
    # member path: Level.Members, <member>.Children, a member range
    # a:b, or bare [Named Set]
    segs = _path(p)
    if p.peek() == ":":
        # axis member range [A].[L].[a]:[A].[L].[b] — drill the level,
        # cut to the range (same compile as the REST range cut)
        p.next()
        segs_b = _path(p)
        if len(segs) < 3 or segs[:-1] != segs_b[:-1]:
            raise ParseError(
                f"member range endpoints must share a level: "
                f"{_path_str(segs)} : {_path_str(segs_b)}")
        q.qm_kwargs["drilldown"].append(".".join(segs[:-1]))
        q.qm_kwargs["cut"].append(
            f"({_path_str(segs)}:{_path_str(segs_b)})")
        return False
    if p.peek() == "." :
        p.next()
        w = p.next().upper()
        if w == "MEMBERS":
            q.qm_kwargs["drilldown"].append(".".join(segs))
            return False
        if w == "CHILDREN":
            # Mondrian axis idiom: the member's children = drill the
            # child level + implicit member slice (resolved against
            # the catalog at plan time — QueryModel.children_of)
            if len(segs) < 3:
                raise ParseError(
                    f".Children needs [Dim].[Level].[member], got "
                    f"{_path_str(segs)}")
            q.qm_kwargs["children_of"].append(_path_str(segs))
            return False
        if w == "SIBLINGS":
            # Mondrian member navigation: children of the member's
            # parent (incl. the member itself); a top-level member's
            # siblings are all members of its level.  Resolved against
            # the catalog at plan time (QueryModel.siblings_of).
            if len(segs) < 3:
                raise ParseError(
                    f".Siblings needs [Dim].[Level].[member], got "
                    f"{_path_str(segs)}")
            q.qm_kwargs["siblings_of"].append(_path_str(segs))
            return False
        if w == "PARENT":
            # Mondrian axis idiom: the member's parent = drill the
            # parent level + slice to the parent member (looked up
            # against the catalog at plan time — QueryModel.parent_of)
            if len(segs) < 3:
                raise ParseError(
                    f".Parent needs [Dim].[Level].[member], got "
                    f"{_path_str(segs)}")
            q.qm_kwargs["parent_of"].append(_path_str(segs))
            return False
        if w in ("FIRSTCHILD", "LASTCHILD"):
            # Mondrian member navigation: the member's first/last child
            # in level key order = drill the child level + cut to the
            # edge child's key (dim-side lookup at plan time)
            label = "FirstChild" if w == "FIRSTCHILD" else "LastChild"
            if len(segs) < 3:
                raise ParseError(
                    f".{label} needs [Dim].[Level].[member], got "
                    f"{_path_str(segs)}")
            q.qm_kwargs["edge_child_of"].append(
                (_path_str(segs), w == "LASTCHILD"))
            return False
        if w in ("FIRSTSIBLING", "LASTSIBLING"):
            # Mondrian member navigation: the first/last child of the
            # member's parent (a top-level member's FirstSibling is the
            # level's first member) — dim-side bounded lookup at plan
            # time (QueryModel.edge_sibling_of)
            label = "FirstSibling" if w == "FIRSTSIBLING" else "LastSibling"
            if len(segs) < 3:
                raise ParseError(
                    f".{label} needs [Dim].[Level].[member], got "
                    f"{_path_str(segs)}")
            q.qm_kwargs["edge_sibling_of"].append(
                (_path_str(segs), w == "LASTSIBLING"))
            return False
        if w in ("LAG", "LEAD"):
            # <member>.Lag(n)/.Lead(n): the member shifted n positions
            # along the level's member order (QueryModel.member_lags;
            # positive = Lag).  Mondrian's Lag(-n) == Lead(n) holds.
            if len(segs) < 3:
                raise ParseError(
                    f".{w.capitalize()} needs [Dim].[Level].[member], "
                    f"got {_path_str(segs)}")
            p.expect("(")
            neg = False
            if p.peek() == "-":
                p.next()
                neg = True
            n = _int(p, f".{w.capitalize()} shift")
            if neg:
                n = -n
            p.expect(")")
            if w == "LEAD":
                n = -n
            q.qm_kwargs["member_lags"].append((_path_str(segs), n))
            return False
        raise ParseError(
            f"expected .Members, .Children, .Parent, .Siblings, "
            f".FirstChild, .LastChild, .FirstSibling, .LastSibling, "
            f".Lag or .Lead after {_path_str(segs)}, got .{w}")
    if len(segs) == 1:
        macro = q.set_macros.get(segs[0])
        if macro is not None:
            # WITH SET member-set macro: expand to drilldown+cut here
            # (shadows a same-named schema set for this query, like
            # Mondrian's query-scoped named sets)
            level_path, mkind, members = macro
            q.qm_kwargs["drilldown"].append(".".join(level_path))
            if mkind == "pos":
                if members:
                    q.qm_kwargs["cut"].append(
                        "{" + ",".join(_path_str(m) for m in members)
                        + "}")
                else:
                    q.qm_kwargs["empty_set"] = True
            elif members:
                q.qm_kwargs["cut"].append(
                    "!{" + ",".join(_path_str(m) for m in members) + "}")
            return False
        q.qm_kwargs["drilldown"].append(segs[0])  # named set shortcut
        return False
    raise ParseError(f"expected .Members after {_path_str(segs)}")


def _member_set_operand(p: _P) -> tuple[list[str], str, list[list[str]]]:
    """One operand of UNION/EXCEPT/INTERSECT(mset, mset): a brace
    member set, a single member, the FULL level (``<level>.Members``),
    or a nested combinator — all members on ONE shared level.  Returns
    (level path segs, kind, [member path segs]) where kind is ``pos``
    (exactly these members) or ``neg`` (the level's complement of
    these members; ``neg []`` == the whole level).  Set arithmetic
    happens at PARSE time on the two-register algebra, which is closed
    under all three combinators, so any nesting compiles to ONE
    positive set cut, ONE exclusion cut (``!{...}``), a bare
    drilldown, or the empty set."""
    t = p.peek_upper()
    if t in ("UNION", "EXCEPT", "INTERSECT"):
        p.next()
        p.expect("(")
        level_a, ka, mem_a = _member_set_operand(p)
        p.expect(",")
        level_b, kb, mem_b = _member_set_operand(p)
        p.expect(")")
        if level_a != level_b:
            raise ParseError(
                f"{t} operands must share a level in this MDX subset; "
                f"got {'.'.join(level_a)} and {'.'.join(level_b)}")

        def minus(a, b):
            return [m for m in a if m not in b]

        def inter(a, b):
            return [m for m in a if m in b]

        def union(a, b):
            out = list(a)
            out += [m for m in b if m not in out]  # dedups (Mondrian ALL keeps)
            return out

        if t == "UNION":
            if ka == "pos" and kb == "pos":
                k, merged = "pos", union(mem_a, mem_b)
            elif ka == "neg" and kb == "neg":
                k, merged = "neg", inter(mem_a, mem_b)
            elif ka == "neg":                      # neg(a) ∪ b = neg(a−b)
                k, merged = "neg", minus(mem_a, mem_b)
            else:
                k, merged = "neg", minus(mem_b, mem_a)
        elif t == "EXCEPT":
            if ka == "pos" and kb == "pos":
                k, merged = "pos", minus(mem_a, mem_b)
            elif ka == "pos":                      # a − neg(b) = a ∩ b
                k, merged = "pos", inter(mem_a, mem_b)
            elif kb == "pos":                      # neg(a) − b = neg(a∪b)
                k, merged = "neg", union(mem_a, mem_b)
            else:                                  # neg(a) − neg(b) = b−a
                k, merged = "pos", minus(mem_b, mem_a)
        else:  # INTERSECT
            if ka == "pos" and kb == "pos":
                k, merged = "pos", inter(mem_a, mem_b)
            elif ka == "neg" and kb == "neg":
                k, merged = "neg", union(mem_a, mem_b)
            elif ka == "neg":                      # neg(a) ∩ b = b−a
                k, merged = "pos", minus(mem_b, mem_a)
            else:
                k, merged = "pos", minus(mem_a, mem_b)
        # an empty positive result is VALID set algebra (Mondrian
        # returns an empty set, not an error): callers compile it to
        # an always-false axis/slicer, never a 400
        return level_a, k, merged
    members: list[list[str]] = []
    if t == "{":
        p.next()
        while True:
            members.append(_path(p))
            if p.peek() == ",":
                p.next()
                continue
            break
        p.expect("}")
    else:
        segs = _path(p)
        if p.peek() == ".":
            # <level>.Members operand: the FULL level = neg([])
            p.next()
            w = p.next().upper()
            if w != "MEMBERS":
                raise ParseError(
                    f"expected .Members after {_path_str(segs)} in a "
                    f"set-algebra operand, got .{w}")
            if len(segs) < 2:
                raise ParseError(
                    f".Members operand needs [Dim].[Level], got "
                    f"{_path_str(segs)}")
            return segs, "neg", []
        members.append(segs)
    for m in members:
        if len(m) < 3:
            raise ParseError(
                f"UNION members need [Dim].[Level].[member], got "
                f"{_path_str(m)}")
        if m[:-1] != members[0][:-1]:
            raise ParseError(
                "UNION operands must share a level in this MDX subset; "
                f"got {_path_str(members[0])} and {_path_str(m)}")
    return members[0][:-1], "pos", members


def _descendants(p: _P, q: MdxQuery) -> str:
    """DESCENDANTS([member path], [level path]) -> drilldown at the
    level + member cut (reference query_helper.rb:242-252)."""
    p.expect("DESCENDANTS")
    p.expect("(")
    member = _path(p)
    p.expect(",")
    level = _path(p)
    p.expect(")")
    q.qm_kwargs["cut"].append(_path_str(member))
    return ".".join(level)


def _set_expr(p: _P, q: MdxQuery) -> None:
    """{m1, m2, ...} — member set (drill at the shared level + set
    cut), or union of DESCENDANTS (query_helper.rb:253-256)."""
    p.expect("{")
    if p.peek_upper() == "DESCENDANTS":
        levels, members = [], []
        while True:
            sub = MdxQuery()
            levels.append(_descendants(p, sub))
            members.append(sub.qm_kwargs["cut"][0])
            if p.peek() == ",":
                p.next()
                continue
            break
        p.expect("}")
        if len(set(levels)) != 1:
            raise ParseError("DESCENDANTS union must target one level")
        q.qm_kwargs["drilldown"].append(levels[0])
        q.qm_kwargs["cut"].append("{" + ",".join(members) + "}")
        return
    members = []
    while True:
        members.append(_path(p))
        if p.peek() == ",":
            p.next()
            continue
        break
    p.expect("}")
    # drill at the members' level, cut to the set
    level_path = members[0][:-1]
    q.qm_kwargs["drilldown"].append(".".join(level_path))
    q.qm_kwargs["cut"].append(
        "{" + ",".join(_path_str(m) for m in members) + "}")


def _slicer(p: _P, q: MdxQuery) -> None:
    """WHERE (<cut> [* <cut>]...) — tuple slicer
    (query_helper.rb:305-314)."""
    p.expect("(")
    while True:
        t = p.peek()
        if t is not None and t.upper() in ("UNION", "EXCEPT", "INTERSECT"):
            level_path, kind, members = _member_set_operand(p)
            if kind == "pos":
                if members:
                    q.qm_kwargs["cut"].append(
                        "{" + ",".join(_path_str(m) for m in members) + "}")
                else:
                    # empty slicer set: every cell aggregates over
                    # nothing (dense axes still enumerate members,
                    # null cells)
                    q.qm_kwargs["empty_slicer"] = True
            elif members:
                # complement slicer: keep all fact rows EXCEPT the
                # listed members' (one exclusion cut)
                q.qm_kwargs["cut"].append(
                    "!{" + ",".join(_path_str(m) for m in members) + "}")
            # neg([]) == the whole level: slicing to everything is a
            # no-op, no cut
        elif t == "(":
            # range cut (a:b) — the form the REST layer's range cuts
            # round-trip through (query_helper.rb:66-72)
            p.next()
            a = _path(p)
            p.expect(":")
            b = _path(p)
            p.expect(")")
            q.qm_kwargs["cut"].append(f"({_path_str(a)}:{_path_str(b)})")
        elif t == "{":
            p.expect("{")
            members = []
            while True:
                members.append(_path(p))
                if p.peek() == ",":
                    p.next()
                    continue
                break
            p.expect("}")
            q.qm_kwargs["cut"].append(
                "{" + ",".join(_path_str(m) for m in members) + "}")
        else:
            segs = _path(p)
            macro = q.set_macros.get(segs[0]) if len(segs) == 1 else None
            if macro is not None:
                # WITH SET macro as a slicer: same compile as the
                # set-algebra slicer branch above
                _, mkind, members = macro
                if mkind == "pos":
                    if members:
                        q.qm_kwargs["cut"].append(
                            "{" + ",".join(_path_str(m) for m in members)
                            + "}")
                    else:
                        q.qm_kwargs["empty_slicer"] = True
                elif members:
                    q.qm_kwargs["cut"].append(
                        "!{" + ",".join(_path_str(m) for m in members)
                        + "}")
            else:
                q.qm_kwargs["cut"].append(
                    segs[0] if len(segs) == 1 else _path_str(segs))
        if p.peek() == "*":
            p.next()
            continue
        break
    p.expect(")")


def _calc_expr(p: _P) -> str:
    """WITH MEMBER formula -> expr template: arithmetic over
    ``[Measures].[X]`` refs (emitted as ``{m:X}`` placeholders — the
    planner resolves them to post-agg aliases), numeric literals, and
    ``+ - * /`` with parentheses.  Mondrian's quoted form
    (``AS '...'``) is accepted by re-tokenizing the string body.
    Binary minus needs surrounding spaces (``a - b``): ``-5`` lexes as
    a negative literal."""
    t = p.peek()
    if t is not None and t.startswith("'"):
        inner = _P(tokenize(p.next()[1:-1]))
        out = _calc_body(inner, stop_words=())
        if inner.peek() is not None:
            raise ParseError(
                f"trailing tokens in WITH MEMBER formula at {inner.peek()!r}")
        return out
    return _calc_body(p, stop_words=("MEMBER", "SELECT", "SET"))


def _calc_body(p: _P, stop_words: tuple) -> str:
    # tuple form first: ([Measures].[M], PARALLELPERIOD([Dim].[Lvl][, n]))
    # -> a lag template the planner maps onto the PREVMEMBER machinery;
    # then SUM(YTD(), [Measures].[M]) -> a running-total template
    save = p.pos
    try:
        return _parallelperiod_tuple(p)
    except ParseError:
        p.pos = save
    try:
        return _ytd_call(p)
    except ParseError:
        p.pos = save
    try:
        return _set_agg_call(p)
    except ParseError:
        p.pos = save
    try:
        return _rank_call(p)
    except ParseError:
        p.pos = save
    try:
        return _measure_member_tuple(p)
    except ParseError:
        p.pos = save
    return _calc_tokens(p, stop_words)


def _with_set_body(p: _P) -> tuple:
    """WITH SET formula: TOPCOUNT/BOTTOMCOUNT(<level>.Members, n,
    [Measures].[M]) — the stored-named-set shape
    (foodmart.xml:405-410), here defined inline per query.  Returns
    (level_path, k, top_by, ascending).  Accepts Mondrian's quoted
    form too."""
    t = p.peek()
    if t is not None and t.startswith("'"):
        inner = _P(tokenize(p.next()[1:-1]))
        out = _with_set_body(inner)
        if inner.peek() is not None:
            raise ParseError(
                f"trailing tokens in WITH SET formula at {inner.peek()!r}")
        return out
    fn = p.next().upper()
    if fn not in ("TOPCOUNT", "BOTTOMCOUNT"):
        raise ParseError(
            "WITH SET supports TOPCOUNT/BOTTOMCOUNT(<level>.Members, "
            f"n, [Measures].[M]) in this MDX subset; got {fn!r}")
    p.expect("(")
    path = _path(p)
    p.expect(".")
    p.expect("MEMBERS")
    p.expect(",")
    k = _int(p, "WITH SET count")
    p.expect(",")
    top_by = _measure_ref(p)
    p.expect(")")
    return (".".join(path), k, top_by, fn == "BOTTOMCOUNT")


def _with_set_ext_body(p: _P) -> tuple:
    """WITH SET formula for the r12 computed-set kinds:
    TOPPERCENT/BOTTOMPERCENT(<level>.Members, pct, [Measures].[M]),
    TOPSUM/BOTTOMSUM(<level>.Members, value, [Measures].[M]),
    HEAD/TAIL(<level>.Members[, n]).  Returns (level_path, kind, arg,
    top_by, bottom).  Accepts Mondrian's quoted form too."""
    t = p.peek()
    if t is not None and t.startswith("'"):
        inner = _P(tokenize(p.next()[1:-1]))
        out = _with_set_ext_body(inner)
        if inner.peek() is not None:
            raise ParseError(
                f"trailing tokens in WITH SET formula at {inner.peek()!r}")
        return out
    fn = p.next().upper()
    p.expect("(")
    path = _path(p)
    p.expect(".")
    p.expect("MEMBERS")
    if fn in ("HEAD", "TAIL"):
        n = 1
        if p.peek() == ",":
            p.next()
            n = _int(p, f"WITH SET {fn} count")
        if n < 0:
            raise ParseError(f"WITH SET {fn} count must be >= 0")
        p.expect(")")
        return (".".join(path), fn.lower(), n, None, False)
    if fn == "SUBSET":
        p.expect(",")
        off = _int(p, "WITH SET SUBSET offset")
        cnt = None
        if p.peek() == ",":
            p.next()
            cnt = _int(p, "WITH SET SUBSET count")
        if off < 0 or (cnt is not None and cnt < 0):
            raise ParseError("WITH SET SUBSET offset/count must be >= 0")
        p.expect(")")
        return (".".join(path), "subset", (off, cnt), None, False)
    p.expect(",")
    tok = p.next()
    try:
        arg = float(tok)
    except ValueError:
        raise ParseError(
            f"WITH SET {fn} argument must be numeric, got {tok!r}")
    if fn in ("TOPPERCENT", "BOTTOMPERCENT") and not 0 < arg <= 100:
        raise ParseError(f"WITH SET {fn} percentage must be in (0, 100]")
    p.expect(",")
    top_by = _measure_ref(p)
    p.expect(")")
    kind = "percent" if fn in ("TOPPERCENT", "BOTTOMPERCENT") else "sum"
    return (".".join(path), kind, arg, top_by,
            fn in ("BOTTOMPERCENT", "BOTTOMSUM"))


def _set_macro_body(p: _P) -> tuple:
    """WITH SET body that is a member-set literal ({...}), a single
    member, a full level (.Members), or UNION/EXCEPT/INTERSECT algebra
    over those — everything _member_set_operand's two-register algebra
    covers.  Accepts Mondrian's quoted form (``AS '...'``)."""
    t = p.peek()
    if t is not None and t.startswith("'"):
        inner = _P(tokenize(p.next()[1:-1]))
        out = _member_set_operand(inner)
        if inner.peek() is not None:
            raise ParseError(
                f"trailing tokens in WITH SET formula at {inner.peek()!r}")
        return out
    return _member_set_operand(p)


def _parallelperiod_tuple(p: _P) -> str:
    p.expect("(")
    name = _measure_ref(p)
    p.expect(",")
    p.expect("PARALLELPERIOD")
    p.expect("(")
    path = _path(p)
    lag_n = 1
    if p.peek() == ",":
        p.next()
        lag_n = _int(p, "PARALLELPERIOD lag")
        if lag_n < 1:
            raise ParseError("PARALLELPERIOD shift must be >= 1")
    p.expect(")")
    p.expect(")")
    return "{lag:" + name + ":" + ".".join(path) + ":" + str(lag_n) + "}"


def _ytd_call(p: _P) -> str:
    """SUM(YTD()|QTD()|MTD()|WTD(), [Measures].[M]) — Mondrian's
    to-date running totals (the classic time-intelligence idioms).
    Compiles to a ``{ytd:M}``-style template the planner maps onto a
    cumulative window within the anchor time level (year / quarter /
    month / week)."""
    p.expect("SUM")
    p.expect("(")
    fn = p.next().upper()
    if fn not in ("YTD", "QTD", "MTD", "WTD"):
        raise ParseError(f"expected YTD(), QTD(), MTD() or WTD(), "
                         f"got {fn!r}")
    p.expect("(")
    p.expect(")")
    p.expect(",")
    name = _measure_ref(p)
    p.expect(")")
    return "{" + fn.lower() + ":" + name + "}"


def _rank_call(p: _P) -> str:
    """``RANK(<level>.CurrentMember, ORDER(<level>.Members,
    [Measures].[M], BASC|BDESC))`` — the member's 1-based rank in its
    level ordered by a measure (ties share a rank, exactly SQL
    ``RANK()``; the idiomatic Mondrian leaderboard calc) — and the
    2-arg form ``RANK(<level>.CurrentMember, <level>.Members)`` — the
    member's ordinal position in the level's key order.  Compiles to
    a ``{rank:...}`` template the planner maps onto an axis-sized
    rank()/row_number() window (never the fact)."""
    p.expect("RANK")
    p.expect("(")
    member = _path(p)
    p.expect(".")
    p.expect("CURRENTMEMBER")
    p.expect(",")
    if p.peek_upper() == "ORDER":
        p.next()
        p.expect("(")
        setp = _path(p)
        p.expect(".")
        p.expect("MEMBERS")
        p.expect(",")
        by = _measure_ref(p)
        direction = "desc"
        if p.peek() == ",":
            p.next()
            word = p.next().upper()
            if word not in ("BASC", "BDESC", "ASC", "DESC"):
                raise ParseError(
                    f"RANK order direction must be BASC/BDESC, got {word!r}")
            direction = "asc" if word in ("BASC", "ASC") else "desc"
        p.expect(")")
    else:
        setp = _path(p)
        p.expect(".")
        p.expect("MEMBERS")
        by, direction = "", "pos"
    p.expect(")")
    if [s.lower() for s in member] != [s.lower() for s in setp]:
        raise ParseError(
            "RANK member and set must reference the same level, got "
            f"{_path_str(member)} vs {_path_str(setp)}")
    if ":" in by or any(":" in s for s in member):
        raise ParseError("RANK names cannot contain ':'")
    return "{rank:" + by + ":" + direction + ":" + ".".join(member) + "}"


def _measure_member_tuple(p: _P) -> str:
    """``([Measures].[M], <member>)`` — the measure evaluated in a
    FIXED member context (the most common hand-written Mondrian calc
    tuple, e.g. last year's revenue as its own column).  Exactly
    Mondrian's ``AGGREGATE({member}, M)``, so it compiles to the same
    ``{setagg:aggregate:...}`` template: one conditional fact-side
    aggregate in the shared groupBy, no extra pass.  One member
    coordinate per tuple in this subset (a clear 400 otherwise)."""
    p.expect("(")
    name = _measure_ref(p)
    p.expect(",")
    coords = [_path(p)]
    while p.peek() == ",":
        p.next()
        coords.append(_path(p))
    p.expect(")")
    if len(coords) > 1:
        raise ParseError(
            "measure tuples support ONE member coordinate in this MDX "
            "subset; aggregate the extra coordinates via "
            "AGGREGATE({...}, m) per dimension")
    member = coords[0]
    if len(member) < 3:
        raise ParseError(
            f"measure tuple member needs [Dim].[Level].[member], got "
            f"{_path_str(member)}")
    if ":" in name:
        raise ParseError(f"measure name {name!r} cannot contain ':'")
    return "{setagg:aggregate:" + name + ":" + _path_str(member) + "}"


#: canonical spellings for WITH MEMBER set aggregates (Mondrian
#: accepts both STDEV/STDDEV and VAR/VARIANCE; *P = population)
_SET_AGG_WORDS = {
    "AGGREGATE": "aggregate", "SUM": "sum", "AVG": "avg", "MIN": "min",
    "MAX": "max", "COUNT": "count", "MEDIAN": "median",
    "STDEV": "stdev", "STDDEV": "stdev", "STDEVP": "stdevp",
    "VAR": "var", "VARIANCE": "var", "VARP": "varp",
}


def _set_agg_call(p: _P) -> str:
    """AGGREGATE|SUM|AVG|MIN|MAX|COUNT|MEDIAN|STDEV|VAR(...)(<member
    set>, [Measures].[M]) — Mondrian's set-aggregate calculated
    members (the other classic WITH MEMBER idiom next to time
    intelligence; reference api_helpers.rb:42-54 passes arbitrary MDX
    to Mondrian).  The set is a member literal, a brace set, or a
    member range on ONE level.  AGGREGATE applies the measure's own
    rollup over the set's union of facts; the explicit functions
    aggregate the members' CELL VALUES (Mondrian semantics — the
    planner proves when a fact-side conditional aggregate is
    equivalent and otherwise runs an axis-grained member-value pass).
    Compiles to a ``{setagg:fn:M:<cut>}`` template."""
    fn = p.next().upper()
    if fn not in _SET_AGG_WORDS:
        raise ParseError(f"expected a set-aggregate function, got {fn!r}")
    p.expect("(")
    cut = _set_agg_operand(p)
    p.expect(",")
    name = _measure_ref(p)
    p.expect(")")
    if ":" in name:
        raise ParseError(f"measure name {name!r} cannot contain ':'")
    return "{setagg:" + _SET_AGG_WORDS[fn] + ":" + name + ":" + cut + "}"


def _set_agg_operand(p: _P) -> str:
    """The member-set argument of a set aggregate -> a REST cut string
    (the planner re-parses it with parse_cut and compiles the same
    predicate a WHERE slicer would)."""
    t = p.peek()
    if t == "{":
        p.next()
        members = []
        while True:
            members.append(_path(p))
            if p.peek() == ",":
                p.next()
                continue
            break
        p.expect("}")
        for m in members:
            if len(m) < 3 or m[:-1] != members[0][:-1]:
                raise ParseError(
                    "set-aggregate members must share one level: "
                    f"{_path_str(m)}")
        return "{" + ",".join(_path_str(m) for m in members) + "}"
    if t == "(":
        p.next()
        a = _path(p)
        p.expect(":")
        b = _path(p)
        p.expect(")")
        if len(a) < 3 or a[:-1] != b[:-1]:
            raise ParseError("range endpoints must share a level")
        return f"({_path_str(a)}:{_path_str(b)})"
    a = _path(p)
    if p.peek() == ":":
        p.next()
        b = _path(p)
        if len(a) < 3 or a[:-1] != b[:-1]:
            raise ParseError("range endpoints must share a level")
        return f"({_path_str(a)}:{_path_str(b)})"
    if len(a) < 3:
        raise ParseError(
            f"set-aggregate member needs [Dim].[Level].[member], got "
            f"{_path_str(a)}")
    return _path_str(a)


def _calc_tokens(p: _P, stop_words: tuple, bool_ok: bool = False) -> str:
    parts: list[str] = []
    # paren stack: True = an IIF argument list (commas legal inside)
    stack: list[bool] = []
    pending_fn = False
    while True:
        t = p.peek()
        if t is None:
            break
        u = t.upper()
        if not stack and u in stop_words:
            break
        if t == "(":
            stack.append(pending_fn)
            pending_fn = False
            parts.append(p.next())
        elif t == ")":
            if not stack:
                break
            stack.pop()
            parts.append(p.next())
        elif t in ("+", "-", "*", "/"):
            parts.append(p.next())
        elif u == "CASE":
            # searched or simple CASE -> Spark SQL CASE (same syntax);
            # sub-expressions recurse so WHEN/THEN/ELSE/END nest and
            # misplaced keywords stay clear ParseErrors
            p.next()
            parts.append(_case_sql(p))
        elif u in ("AND", "OR", "NOT") and (bool_ok or any(stack)):
            # boolean connectives are legal inside a condition context
            # (IIF/COALESCE arg lists, CASE WHEN conditions) — never at
            # the top of a value formula.  any(stack), not bare stack:
            # a plain grouping paren (stack entry False) is NOT a
            # condition context — '([A] AND [B]) + 1' must ParseError
            # (400), not surface later as a Spark AnalysisException
            p.next()
            parts.append(u)
        elif u == "IIF":
            # IIF(cond, a, b) -> SQL if(cond, a, b)
            p.next()
            if p.peek() != "(":
                raise ParseError("IIF needs a parenthesized argument list")
            pending_fn = True
            parts.append("if")
        elif u == "COALESCEEMPTY":
            # COALESCEEMPTY(a, b[, ...]) -> SQL coalesce: empty cells
            # are nulls in this engine, exactly Mondrian's semantics
            # (reference foodmart.xml:359-366 Profit Growth)
            p.next()
            if p.peek() != "(":
                raise ParseError(
                    "COALESCEEMPTY needs a parenthesized argument list")
            pending_fn = True
            parts.append("coalesce")
        elif t in (">", "<", ">=", "<=", "=", "<>"):
            parts.append("!=" if p.next() == "<>" else t)
        elif t == "," and stack and stack[-1]:
            parts.append(p.next())
        elif t.startswith("["):
            parts.append("{m:" + _measure_ref(p) + "}")
        elif re.fullmatch(r"-?\d+(?:\.\d+)?", t):
            parts.append(p.next())
        else:
            raise ParseError(
                f"unsupported token {t!r} in WITH MEMBER formula (this "
                "MDX subset supports arithmetic, comparisons, "
                "IIF(cond, a, b), CASE [expr] WHEN ... THEN ... [ELSE "
                "...] END and COALESCEEMPTY(a, b) over [Measures] refs)")
    if stack:
        raise ParseError("unbalanced parentheses in WITH MEMBER formula")
    if not parts:
        raise ParseError("empty WITH MEMBER formula")
    return " ".join(parts)


def _case_sql(p: _P) -> str:
    """Body of a CASE already consumed its CASE token: parse
    ``[operand] WHEN <cond|value> THEN <expr> ... [ELSE <expr>] END``
    into the identical Spark SQL CASE.  Both Mondrian forms compile:
    searched (WHEN carries a boolean over measures) and simple (a CASE
    operand before the first WHEN, WHEN carries match values).
    Reference analog: Mondrian evaluates CASE in calc-member formulas
    via its own MDX engine (api_helpers.rb:42-54 passthrough)."""
    out = ["CASE"]
    if p.peek_upper() != "WHEN":
        out.append(_calc_tokens(p, stop_words=("WHEN",)))
    n_when = 0
    while p.peek_upper() == "WHEN":
        p.next()
        out.append("WHEN")
        out.append(_calc_tokens(p, stop_words=("THEN",), bool_ok=True))
        p.expect("THEN")
        out.append("THEN")
        out.append(_calc_tokens(p, stop_words=("WHEN", "ELSE", "END")))
        n_when += 1
    if not n_when:
        raise ParseError("CASE needs at least one WHEN ... THEN branch")
    if p.peek_upper() == "ELSE":
        p.next()
        out.append("ELSE")
        out.append(_calc_tokens(p, stop_words=("END",)))
    if p.peek_upper() != "END":
        raise ParseError(f"CASE missing END (got {p.peek()!r})")
    p.next()
    out.append("END")
    return " ".join(out)


def compile_mdx(mdx: str, cube_hint: str | None = None) -> QueryModel:
    """MDX string -> QueryModel.  Raises ParseError outside the
    supported subset (reference behavior: Mondrian errors -> 400,
    api_helpers.rb:42-54)."""
    p = _P(tokenize(mdx))
    q = MdxQuery()
    with_members: list = []
    with_sets: list = []
    if p.peek_upper() == "WITH":
        p.next()
        while p.peek_upper() in ("MEMBER", "SET"):
            kind = p.next().upper()
            if kind == "MEMBER":
                name = _measure_ref(p)
                p.expect("AS")
                with_members.append((name, _calc_expr(p)))
            else:
                segs = _path(p)
                if len(segs) != 1:
                    raise ParseError(
                        f"WITH SET name must be a single bracketed "
                        f"segment, got {_path_str(segs)}")
                p.expect("AS")
                save = p.pos
                head = p.peek_upper()
                if head is not None and head.startswith("'"):
                    # Mondrian's quoted form: classify by the first
                    # token INSIDE the quotes
                    inner_toks = tokenize(p.peek()[1:-1])
                    head = inner_toks[0].upper() if inner_toks else ""
                ranked = head in ("TOPCOUNT", "BOTTOMCOUNT")
                ext = head in ("TOPPERCENT", "BOTTOMPERCENT",
                               "TOPSUM", "BOTTOMSUM", "HEAD", "TAIL",
                               "SUBSET")
                try:
                    if ext:
                        # r12 computed-set kinds ride with_sets_ext —
                        # same machinery as the crossjoin-operand form
                        q.qm_kwargs.setdefault(
                            "with_sets_ext", []).append(
                            (segs[0],) + _with_set_ext_body(p))
                    else:
                        with_sets.append((segs[0],) + _with_set_body(p))
                except ParseError:
                    if ranked or ext:
                        # a malformed set-function body keeps its
                        # precise diagnostic instead of a macro error
                        raise
                    # member-set literal / set-algebra body: a macro
                    # expanded at each axis/slicer reference
                    p.pos = save
                    q.set_macros[segs[0]] = _set_macro_body(p)
        if not with_members and not with_sets and not q.set_macros \
                and not q.qm_kwargs.get("with_sets_ext"):
            raise ParseError("WITH must introduce at least one MEMBER "
                             "or SET")
    q.qm_kwargs["with_members"] = with_members
    q.qm_kwargs["with_sets"] = with_sets
    p.expect("SELECT")
    # axis 0: measures
    p.expect("{")
    while True:
        q.qm_kwargs["measures"].append(_measure_ref(p))
        if p.peek() == ",":
            p.next()
            continue
        break
    p.expect("}")
    p.expect("ON")
    p.expect("COLUMNS")
    if p.peek() == ",":
        p.next()
        _axis(p, q)
        # [DIMENSION] PROPERTIES <ref>, ... (Mondrian axis clause,
        # spec §2.8.1): member properties to carry on the axis.
        # Level-property refs map onto the same qm.properties the
        # REST properties[] param uses; the intrinsic MEMBER_* names
        # are accepted as no-ops because keys, names, and captions
        # are ALWAYS in the result payload (result.py)
        if p.peek_upper() in ("DIMENSION", "PROPERTIES"):
            if p.peek_upper() == "DIMENSION":
                p.next()
            p.expect("PROPERTIES")
            while True:
                t = p.peek()
                if t is not None and not t.startswith("["):
                    word = p.next().upper()
                    if word not in ("MEMBER_CAPTION", "MEMBER_NAME",
                                    "MEMBER_UNIQUE_NAME", "MEMBER_KEY",
                                    "MEMBER_VALUE"):
                        raise ParseError(
                            f"unsupported intrinsic member property "
                            f"{word!r}")
                else:
                    segs = _path(p)
                    if len(segs) not in (3, 4):
                        raise ParseError(
                            "DIMENSION PROPERTIES ref needs [Dim]"
                            "[.Hierarchy].[Level].[Property], got "
                            f"{_path_str(segs)}")
                    q.qm_kwargs["properties"].append(_path_str(segs))
                if p.peek() == ",":
                    p.next()
                    continue
                break
        p.expect("ON")
        p.expect("ROWS")
    p.expect("FROM")
    cube = _path(p)[0]
    if p.peek_upper() == "WHERE":
        p.next()
        _slicer(p, q)
    # CELL PROPERTIES <prop>, ... (Mondrian query-tail clause): the
    # payload already carries every supported cell property (values;
    # formatString per measure for FORMATTED_VALUE/FORMAT_STRING), so
    # recognized names are accepted; unknown ones are a clear 400
    if p.peek_upper() == "CELL":
        p.next()
        p.expect("PROPERTIES")
        while True:
            w = p.next().upper()
            if w not in ("VALUE", "FORMATTED_VALUE", "FORMAT_STRING"):
                raise ParseError(f"unsupported cell property {w!r}")
            if p.peek() == ",":
                p.next()
                continue
            break
    if p.peek() is not None:
        raise ParseError(f"trailing MDX tokens at {p.peek()!r}")
    return QueryModel(cube=cube, **q.qm_kwargs)


def execute_mdx(spark: SparkSession, sf_dir: str, cat: Catalog,
                mdx: str) -> DataFrame:
    return aggregate(spark, sf_dir, cat, compile_mdx(mdx))


def formula_template(formula: str) -> str:
    """Parse a catalog-declared MDX calc-member formula — the analog
    of the reference XML ``<CalculatedMember formula="...">``
    (foodmart.xml:345-366) — into the engine's calc template.  Accepts
    exactly the WITH MEMBER body grammar: measure arithmetic with
    IIF/COALESCEEMPTY, measure-member tuples, PARALLELPERIOD /
    YTD-family time shifts, set aggregates, RANK."""
    p = _P(tokenize(formula))
    tmpl = _calc_body(p, stop_words=())
    if p.peek() is not None:
        raise ParseError(
            f"trailing calc-member formula tokens at {p.peek()!r}")
    return tmpl


# ---------------------------------------------------------------------------
# emitter: QueryModel -> MDX (the reference's debug=true echo)
# ---------------------------------------------------------------------------

def _emit_formula(tmpl: str) -> str:
    """Inverse of _calc_expr: expr template -> MDX formula text."""
    lag = re.fullmatch(r"\{lag:([^:}]+):([^:}]+):(\d+)\}", tmpl)
    if lag:
        name, lvl, n = lag.groups()
        lvlb = ".".join(f"[{s}]" for s in lvl.split("."))
        return f"([Measures].[{name}], PARALLELPERIOD({lvlb}, {n}))"
    ytd = re.fullmatch(r"\{(ytd|qtd|mtd|wtd):([^}]+)\}", tmpl)
    if ytd:
        return (f"SUM({ytd.group(1).upper()}(), "
                f"[Measures].[{ytd.group(2)}])")
    sa = re.fullmatch(r"\{setagg:([a-z]+):([^:]+):(.+)\}", tmpl, re.DOTALL)
    if sa:
        fn, name, cut = sa.groups()
        return f"{fn.upper()}({cut}, [Measures].[{name}])"
    rk = re.fullmatch(r"\{rank:([^:}]*):(asc|desc|pos):([^}]+)\}", tmpl)
    if rk:
        name, direction, lvl = rk.groups()
        lvlb = ".".join(f"[{s}]" for s in lvl.split("."))
        if direction == "pos":
            return f"RANK({lvlb}.CurrentMember, {lvlb}.Members)"
        return (f"RANK({lvlb}.CurrentMember, ORDER({lvlb}.Members, "
                f"[Measures].[{name}], "
                f"{'BASC' if direction == 'asc' else 'BDESC'}))")
    out = re.sub(r"\{m:([^}]+)\}",
                 lambda m: f"[Measures].[{m.group(1)}]", tmpl)
    # SQL spellings back to their MDX forms (inverse of _calc_tokens)
    out = re.sub(r"\bif\b(?=\s*\()", "IIF", out)
    out = re.sub(r"\bcoalesce\b(?=\s*\()", "COALESCEEMPTY", out)
    return out.replace("!=", "<>")

def emit_mdx(cat: Catalog, qm) -> str:
    """QueryModel -> the MDX the reference would generate for it
    (query_helper.rb:190-316; echoed by debug=true, api.rb:39 /
    api_spec.rb:183-203).

    Inverse of :func:`compile_mdx` over the supported subset:
    ``compile_mdx(emit_mdx(cat, qm))`` reproduces the QueryModel (see
    the round-trip test in tests/test_mdx.py).
    """
    from .parser import parse_drilldown, parse_measure_filter

    try:
        cube = cat.cube(qm.cube)
    except KeyError:
        cube = None  # virtual cube: measures explicit, no named sets
    measures = list(qm.measures)
    if not measures and cube is not None:
        measures = [cube.default_measure.name]
    cols = "{" + ", ".join(f"[Measures].[{m}]" for m in measures) + "}"

    ns_names = {s.name for s in cube.named_sets} if cube else set()
    ns_names |= {ws[0] for ws in getattr(qm, "with_sets", [])}
    ns_names |= {ws[0] for ws in getattr(qm, "with_sets_ext", [])}
    sets = []
    for d in qm.drilldown:
        parsed = parse_drilldown(d, ns_names)
        if isinstance(parsed, str):
            sets.append(f"[{parsed}]")
        else:
            segs = [parsed.dimension]
            if parsed.hierarchy:
                segs.append(parsed.hierarchy)
            if parsed.level:
                segs.append(parsed.level)
            sets.append(_path_str(segs) + ".Members")
    for ch in getattr(qm, "children_of", []):
        from .parser import parse_segments
        sets.append(_path_str(parse_segments(ch)) + ".Children")
    for pp in getattr(qm, "parent_of", []):
        from .parser import parse_segments
        sets.append(_path_str(parse_segments(pp)) + ".Parent")
    for sb in getattr(qm, "siblings_of", []):
        from .parser import parse_segments
        sets.append(_path_str(parse_segments(sb)) + ".Siblings")
    for lp_path, n in getattr(qm, "lastperiods", []):
        from .parser import parse_segments
        sets.append(f"LASTPERIODS({n}, {_path_str(parse_segments(lp_path))})")
    for lg_path, n in getattr(qm, "member_lags", []):
        from .parser import parse_segments
        sets.append(_path_str(parse_segments(lg_path)) +
                    (f".Lag({n})" if n >= 0 else f".Lead({-n})"))
    for ec in getattr(qm, "edge_child_of", []):
        from .parser import parse_segments
        ec_path, last = ec[0], ec[1]
        target = ec[2] if len(ec) > 2 else None
        member = _path_str(parse_segments(ec_path))
        if target is None:
            sets.append(member + (".LastChild" if last else ".FirstChild"))
        else:
            dim_seg = parse_segments(ec_path)[0]
            fn = "CLOSINGPERIOD" if last else "OPENINGPERIOD"
            sets.append(f"{fn}([{dim_seg}].[{target}], {member})")
    for sb_path, last in getattr(qm, "edge_sibling_of", []):
        from .parser import parse_segments
        sets.append(_path_str(parse_segments(sb_path)) +
                    (".LastSibling" if last else ".FirstSibling"))
    for anc_path, target in getattr(qm, "ancestor_of", []):
        from .parser import parse_segments
        dim_seg = parse_segments(anc_path)[0]
        member = _path_str(parse_segments(anc_path))
        sets.append(f"ANCESTOR({member}, [{dim_seg}].[{target}])")
    for anchor, m_path in getattr(qm, "periods_to_date", []):
        from .parser import parse_segments
        dim_seg = parse_segments(m_path)[0]
        member = _path_str(parse_segments(m_path))
        sets.append(f"PERIODSTODATE([{dim_seg}].[{anchor}], {member})")
    vt_parents = {p for p, _ in getattr(qm, "visual_totals", []) or []}
    gs_top_by_spec = {s: (n, m, asc) for s, n, m, asc in
                      getattr(qm, "gs_top", []) or []}
    for ddl_path, ddl_subset in getattr(qm, "gs_axes", []) or []:
        lvlb = ".".join(f"[{s}]" for s in ddl_path.split("."))
        if ddl_path in gs_top_by_spec:
            n, m, asc = gs_top_by_spec[ddl_path]
            fn = "DRILLDOWNLEVELBOTTOM" if asc else "DRILLDOWNLEVELTOP"
            sets.append(f"{fn}({lvlb}.Members, {n}, [Measures].[{m}])")
        elif ddl_subset is None:
            sets.append(f"DRILLDOWNLEVEL({lvlb}.Members)")
        elif ddl_subset in vt_parents:
            # a VISUALTOTALS-originated axis echoes as itself: the
            # parent member + the children cut the compiler appended
            children = dict(
                (p, c) for p, c in qm.visual_totals)[ddl_subset]
            sets.append(
                "VISUALTOTALS({" + ddl_subset[1:-1] + ","
                + children[1:-1] + "})")
        else:
            sets.append(f"DRILLDOWNMEMBER({lvlb}.Members, "
                        f"{ddl_subset})")
    gen_all = []
    if getattr(qm, "generate_top", None) is not None:
        g_path, g_n, g_m, g_asc = qm.generate_top
        _, g_target = (getattr(qm, "generate_inner", None)
                       or ("measure", None))
        gen_all.append((g_path, g_n, g_m, g_asc, g_target))
    for g_path, g_n, g_m, g_asc, _, g_target in \
            getattr(qm, "generate_more", []) or []:
        gen_all.append((g_path, g_n, g_m, g_asc, g_target))
    for g_path, g_n, g_m, g_asc, g_target in gen_all:
        lvlb = ".".join(f"[{s}]" for s in g_path.split("."))
        nav = (f"{lvlb}.CurrentMember.Children" if g_target is None
               else f"DESCENDANTS({lvlb}.CurrentMember, "
                    f"[{g_path.split('.')[0]}].[{g_target}])")
        if g_m is None:
            g_fn = "HEAD" if g_asc else "TAIL"
            sets.append(f"GENERATE({lvlb}.Members, {g_fn}({nav}, "
                        f"{g_n}))")
        else:
            g_fn = "BOTTOMCOUNT" if g_asc else "TOPCOUNT"
            sets.append(f"GENERATE({lvlb}.Members, {g_fn}({nav}, "
                        f"{g_n}, [Measures].[{g_m}]))")

    if getattr(qm, "empty_set", False):
        # axis-empty echo: re-express ONE drilldown as EXCEPT of a
        # dummy member with itself — parse-time set algebra, so any
        # member path re-compiles to the same drilldown + empty_set
        # (axis semantics preserved: zero tuples even in dense mode)
        for i, stext in enumerate(sets):
            if stext.endswith(".Members"):
                m = "{" + stext[:-len(".Members")] + ".[&__none__]}"
                sets[i] = f"EXCEPT({m}, {m})"
                break

    axis = None
    if sets:
        # reference nesting: Crossjoin(d1, Crossjoin(d2, d3))
        axis = sets[-1]
        for s in reversed(sets[:-1]):
            axis = f"CROSSJOIN({s}, {axis})"
        if qm.distinct:
            axis = f"DISTINCT({axis})"
        prop_filters = getattr(qm, "property_filters", [])
        if qm.filter or getattr(qm, "filter_exprs", []) or prop_filters:
            # parse_measure_filter returns SQL ops; '<>' is the MDX
            # spelling the tokenizer re-reads ('!=' would not lex)
            from .parser import parse_segments
            pf_conds = []
            for ref, op, value in prop_filters:
                segs = parse_segments(ref)
                lit = (f'"{value}"' if isinstance(value, str)
                       else str(value))
                pf_conds.append(
                    f"{_path_str(segs[:-1])}.CurrentMember"
                    f'.Properties("{segs[-1]}") {op} {lit}')
            conds = " AND ".join(
                [f"[Measures].[{mf.measure}] "
                 f"{'<>' if mf.op == '!=' else mf.op} "
                 # integral thresholds echo without '.0' so the
                 # re-lexed qm.filter string round-trips bit-identical
                 + (str(int(mf.value)) if float(mf.value).is_integer()
                    else str(mf.value))
                 for mf in map(parse_measure_filter, qm.filter)]
                + [_emit_formula(t)
                   for t in getattr(qm, "filter_exprs", [])]
                + pf_conds)
            axis = f"FILTER({axis}, {conds})"
        if getattr(qm, "top_percent", None) is not None:
            pct, m, asc = qm.top_percent
            fn = "BOTTOMPERCENT" if asc else "TOPPERCENT"
            pct_s = str(int(pct)) if float(pct).is_integer() else str(pct)
            axis = f"{fn}({axis}, {pct_s}, [Measures].[{m}])"
        if getattr(qm, "top_sum", None) is not None:
            val, m, asc = qm.top_sum
            fn = "BOTTOMSUM" if asc else "TOPSUM"
            val_s = str(int(val)) if float(val).is_integer() else str(val)
            axis = f"{fn}({axis}, {val_s}, [Measures].[{m}])"
        if qm.order:
            if "." not in qm.order:
                okey = f"[Measures].[{qm.order}]"
            else:
                head, last = qm.order.rsplit(".", 1)
                lvl = ".".join(f"[{s}]" for s in head.split("."))
                if last.lower() in ("caption", "key", "name"):
                    okey = f"{lvl}.CurrentMember.{last.capitalize()}"
                else:
                    okey = f"{lvl}.CurrentMember.Properties('{last}')"
            axis = (f"ORDER({axis}, {okey}, "
                    f"{'BDESC' if qm.order_desc else 'BASC'})")
        if qm.offset or qm.limit is not None:
            args = f"{qm.offset or 0}"
            if qm.limit is not None:
                args += f", {qm.limit}"
            axis = f"SUBSET({axis}, {args})"
        if getattr(qm, "tail", None) is not None:
            axis = f"TAIL({axis}, {qm.tail})"
        for m in getattr(qm, "nonempty_measures", []):
            axis = f"NONEMPTY({axis}, [Measures].[{m}])"
        if getattr(qm, "hierarchize", False):
            axis = f"HIERARCHIZE({axis})"
        if qm.nonempty:
            axis = f"NON EMPTY {axis}"

    mdx = ""
    defs = [f"MEMBER [Measures].[{n}] AS {_emit_formula(tmpl)}"
            for n, tmpl in getattr(qm, "with_members", [])]
    for name, level_path, k, top_by, asc in getattr(qm, "with_sets", []):
        lvlb = ".".join(f"[{s}]" for s in level_path.split("."))
        fn = "BOTTOMCOUNT" if asc else "TOPCOUNT"
        defs.append(f"SET [{name}] AS {fn}({lvlb}.Members, {k}, "
                    f"[Measures].[{top_by}])")
    for name, level_path, kind, arg, top_by, bottom in \
            getattr(qm, "with_sets_ext", []):
        lvlb = ".".join(f"[{s}]" for s in level_path.split("."))
        if kind == "subset":
            off, cnt = arg
            tailstr = f", {cnt}" if cnt is not None else ""
            defs.append(f"SET [{name}] AS SUBSET"
                        f"({lvlb}.Members, {off}{tailstr})")
        elif kind in ("head", "tail"):
            defs.append(f"SET [{name}] AS {kind.upper()}"
                        f"({lvlb}.Members, {int(arg)})")
        else:
            fn = (("BOTTOM" if bottom else "TOP")
                  + ("PERCENT" if kind == "percent" else "SUM"))
            # no exponent notation — '5e+06' would not re-tokenize
            args = f"{arg:f}".rstrip("0").rstrip(".")
            defs.append(f"SET [{name}] AS {fn}({lvlb}.Members, "
                        f"{args}, [Measures].[{top_by}])")
    if defs:
        mdx = f"WITH {' '.join(defs)} "
    mdx += f"SELECT {cols} ON COLUMNS"
    if axis:
        mdx += f", {axis}"
        props = getattr(qm, "properties", None)
        if props:
            from .parser import parse_segments
            refs = ", ".join(_path_str(parse_segments(pr)) for pr in props)
            mdx += f" DIMENSION PROPERTIES {refs}"
        mdx += " ON ROWS"
    mdx += f" FROM [{qm.cube}]"
    def _emit_cut(c: str) -> str:
        if c.startswith("!{"):
            # exclusion cut: echo as the set algebra it compiled from
            from .parser import parse_cut as _pcut
            cut = _pcut(c)
            lvl = _path_str(list(cut.members[0].path))
            mems = ",".join(
                _path_str(list(m.path)
                          + [("&" if m.by_key else "") + m.value])
                for m in cut.members)
            return f"EXCEPT({lvl}.Members, {{{mems}}})"
        return f"[{c}]" if not c.startswith(("[", "{", "(")) else c
    # VISUALTOTALS-originated children cuts echo inside the
    # VISUALTOTALS(...) axis expression above — emitting them in WHERE
    # too would duplicate the cut on every echo re-compile (idempotent
    # predicate, but the canonical round-trip breaks)
    vt_children = {c for _, c in getattr(qm, "visual_totals", []) or []}
    emit_cuts = list(qm.cut)
    for c in vt_children:
        if c in emit_cuts:
            emit_cuts.remove(c)    # drop ONE copy per VISUALTOTALS
    cuts = [_emit_cut(c) for c in emit_cuts]  # bare named sets need brackets
    if getattr(qm, "empty_slicer", False):
        # canonical empty-slicer echo: EXCEPT of a literal with itself
        # is resolved at PARSE time (no catalog lookup), so any member
        # path re-compiles to empty_slicer=True — a faithful
        # round-trip of "every cell aggregates over nothing"
        dummy = "{[None].[None].[&0]}"
        cuts.append(f"EXCEPT({dummy}, {dummy})")
    if cuts:
        mdx += " WHERE (" + " * ".join(cuts) + ")"
    return mdx

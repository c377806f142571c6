"""Property-based MDX→oracle fuzzing (round-7 advice item 5).

test_fuzz_oracle.py fuzzes REST QueryModels; this file fuzzes the
POSTed-MDX surface itself: hypothesis composes random MDX *text* from
the supported grammar (mdx.py module docstring) — axis atoms
(.Members / {set} / DESCENDANTS / .Children / .Lag / .Lead /
LASTPERIODS / WITH SET named sets) × axis wrappers (FILTER / ORDER /
SUBSET / TOPCOUNT) × WITH MEMBER formulas × WHERE slicer tuples — and
every case is value-compared against an independently generated
DuckDB SQL oracle over the same star schema (reference analog: the
raw-MDX specs in api_spec.rb:284-296, which hand-pick a few strings;
here the grammar itself is the generator).

The oracle mirrors the engine's documented semantics:
- axis atoms contribute GROUP BY columns and (for member-anchored
  atoms) WHERE predicates;
- WITH SET named sets are computed over the UNCUT cube with an
  ascending-key tie-break (planner.named_set_frame);
- FILTER→HAVING, ORDER→ORDER BY (+ remaining axis keys as
  tie-breakers, mirroring the planner's deterministic total order),
  SUBSET/TOPCOUNT→LIMIT/OFFSET;
- .Lag/.Lead/LASTPERIODS resolve against the fact's distinct Year
  keys, which are contiguous in this data, so plain year arithmetic
  is exact.

derandomize=True keeps the corpus stable run-to-run; bump
max_examples locally to hunt.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mondrian_rest_spark import tpch
from mondrian_rest_spark.mdx import execute_mdx

from test_fuzz_oracle import MEASURES, STAR, canon

# --- axis atoms ------------------------------------------------------------
# each atom: the MDX set text + its oracle contribution
# (select exprs, output aliases, key alias, WHERE predicate or None)

NATION_SEL = ["cn.n_nationkey AS cust_nation_key", "cn.n_name AS cust_nation"]
NATION_OUT = ["cust_nation_key", "cust_nation"]

ATOMS = {
    "m_cust_region": dict(
        dim="Customer", lvl=0, kind="members",
        mdx="[Customer].[Region].Members",
        sel=["cr.r_regionkey AS cust_region_key", "cr.r_name AS cust_region"],
        out=["cust_region_key", "cust_region"], key="cust_region_key",
        pred=None),
    "m_cust_nation": dict(
        dim="Customer", lvl=1, kind="members",
        mdx="[Customer].[Nation].Members",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key", pred=None),
    "m_supp_region": dict(
        dim="Supplier", lvl=0, kind="members",
        mdx="[Supplier].[Region].Members",
        sel=["sr.r_regionkey AS supp_region_key", "sr.r_name AS supp_region"],
        out=["supp_region_key", "supp_region"], key="supp_region_key",
        pred=None),
    "m_brand": dict(
        dim="Part", lvl=0, kind="members", mdx="[Part].[Brand].Members",
        sel=["p.p_brand AS p_brand"], out=["p_brand"], key="p_brand",
        pred=None),
    "m_year": dict(
        dim="Time", lvl=0, kind="members", mdx="[Time].[Year].Members",
        sel=["year(l.l_shipdate) AS year"], out=["year"], key="year",
        pred=None),
    "m_month": dict(
        dim="Time", lvl=2, kind="members", mdx="[Time].[Month].Members",
        sel=["month(l.l_shipdate) AS month"], out=["month"], key="month",
        pred=None),
    "m_rflag": dict(
        dim="Return Flag", lvl=0, kind="members",
        mdx="[Return Flag].[Return Flag].Members",
        sel=["l.l_returnflag AS l_returnflag"], out=["l_returnflag"],
        key="l_returnflag", pred=None),
    "m_lstatus": dict(
        dim="Line Status", lvl=0, kind="members",
        mdx="[Line Status].[Line Status].Members",
        sel=["l.l_linestatus AS l_linestatus"], out=["l_linestatus"],
        key="l_linestatus", pred=None),
    "set_nation": dict(
        dim="Customer", lvl=1, kind="set",
        mdx="{[Customer].[Nation].[&3], [Customer].[Nation].[&7], "
            "[Customer].[Nation].[&21]}",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cn.n_nationkey IN (3, 7, 21)"),
    "desc_nation": dict(
        dim="Customer", lvl=1, kind="desc",
        mdx="DESCENDANTS([Customer].[Region].[&2], [Customer].[Nation])",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cr.r_regionkey = 2"),
    "child_supp": dict(
        dim="Supplier", lvl=1, kind="children",
        mdx="[Supplier].[Region].[&1].Children",
        sel=["sn.n_nationkey AS supp_nation_key",
             "sn.n_name AS supp_nation"],
        out=["supp_nation_key", "supp_nation"], key="supp_nation_key",
        pred="sr.r_regionkey = 1"),
    "child_cust": dict(
        dim="Customer", lvl=1, kind="children",
        mdx="[Customer].[Region].[&0].Children",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cr.r_regionkey = 0"),
    # testdata shipdate years are 1995-2001 (contiguous), so member
    # arithmetic below is exact against the planner's key-order walk
    "lag_year": dict(
        dim="Time", lvl=0, kind="lag",
        mdx="[Time].[Year].[1998].Lag(2)",
        sel=["year(l.l_shipdate) AS year"], out=["year"], key="year",
        pred="year(l.l_shipdate) = 1996"),
    "lead_year": dict(
        dim="Time", lvl=0, kind="lag",
        mdx="[Time].[Year].[1996].Lead(1)",
        sel=["year(l.l_shipdate) AS year"], out=["year"], key="year",
        pred="year(l.l_shipdate) = 1997"),
    "lastp_year": dict(
        dim="Time", lvl=0, kind="lastp",
        mdx="LASTPERIODS(3, [Time].[Year].[1998])",
        sel=["year(l.l_shipdate) AS year"], out=["year"], key="year",
        pred="year(l.l_shipdate) BETWEEN 1996 AND 1998"),
    "range_year": dict(
        dim="Time", lvl=0, kind="range",
        mdx="[Time].[Year].[1997]:[Time].[Year].[1999]",
        sel=["year(l.l_shipdate) AS year"], out=["year"], key="year",
        pred="year(l.l_shipdate) BETWEEN 1997 AND 1999"),
    "union_nation": dict(
        dim="Customer", lvl=1, kind="union",
        mdx="UNION({[Customer].[Nation].[&3], [Customer].[Nation].[&7]}, "
            "UNION([Customer].[Nation].[&9], {[Customer].[Nation].[&21]}))",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cn.n_nationkey IN (3, 7, 9, 21)"),
    # r8: EXCEPT over the FULL level -> one exclusion cut (!{...})
    "except_all_nation": dict(
        dim="Customer", lvl=1, kind="union",
        mdx="EXCEPT([Customer].[Nation].Members, "
            "{[Customer].[Nation].[&3], [Customer].[Nation].[&7]})",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cn.n_nationkey NOT IN (3, 7)"),
    # edge-child lookups resolve through the DIM SNOWFLAKE CHAIN
    # (members of Supplier.Nation are nations with suppliers), so the
    # oracle subquery joins the chain's root table too
    "first_child": dict(
        dim="Customer", lvl=1, kind="edgechild",
        mdx="[Customer].[Region].[&2].FirstChild",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cn.n_nationkey = (SELECT min(n2.n_nationkey) "
             "FROM customer c2 JOIN nation n2 "
             "ON c2.c_nationkey = n2.n_nationkey "
             "WHERE n2.n_regionkey = 2)"),
    "last_child_supp": dict(
        dim="Supplier", lvl=1, kind="edgechild",
        mdx="[Supplier].[Region].[&3].LastChild",
        sel=["sn.n_nationkey AS supp_nation_key",
             "sn.n_name AS supp_nation"],
        out=["supp_nation_key", "supp_nation"], key="supp_nation_key",
        pred="sn.n_nationkey = (SELECT max(n2.n_nationkey) "
             "FROM supplier s2 JOIN nation n2 "
             "ON s2.s_nationkey = n2.n_nationkey "
             "WHERE n2.n_regionkey = 3)"),
    # r8 navigation: .Siblings = children of the member's parent
    # (testdata: nation n lives in region n % 5, so nation 7's
    # siblings are the region-2 nations)
    "sib_nation": dict(
        dim="Customer", lvl=1, kind="siblings",
        mdx="[Customer].[Nation].[&7].Siblings",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cn.n_regionkey = (SELECT n_regionkey FROM nation "
             "WHERE n_nationkey = 7)"),
    # r8 navigation: OPENINGPERIOD one-step == FirstChild; the member
    # set is customers-with-facts, so the walk resolves through the
    # snowflake chain like the edge-child atoms above
    "open_nation": dict(
        dim="Customer", lvl=1, kind="edgechild",
        mdx="OPENINGPERIOD([Customer].[Nation], [Customer].[Region].[&4])",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cn.n_nationkey = (SELECT min(n2.n_nationkey) "
             "FROM customer c2 JOIN nation n2 "
             "ON c2.c_nationkey = n2.n_nationkey "
             "WHERE n2.n_regionkey = 4)"),
    # r8 navigation: .FirstSibling = first child of the member's
    # parent (nation 7's region, resolved through the chain)
    "firstsib_nation": dict(
        dim="Customer", lvl=1, kind="edgesib",
        mdx="[Customer].[Nation].[&7].FirstSibling",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cn.n_nationkey = (SELECT min(n2.n_nationkey) "
             "FROM customer c2 JOIN nation n2 "
             "ON c2.c_nationkey = n2.n_nationkey "
             "WHERE n2.n_regionkey = (SELECT n_regionkey FROM nation "
             "WHERE n_nationkey = 7))"),
    # r8 navigation: ANCESTOR = .Parent generalized to any height
    # (customer 7's region, two levels up the snowflake)
    "anc_region": dict(
        dim="Customer", lvl=0, kind="ancestor",
        mdx="ANCESTOR([Customer].[Customer].[&7], [Customer].[Region])",
        sel=["cr.r_regionkey AS cust_region_key",
             "cr.r_name AS cust_region"],
        out=["cust_region_key", "cust_region"], key="cust_region_key",
        pred="cr.r_regionkey = (SELECT n2.n_regionkey FROM customer c2 "
             "JOIN nation n2 ON c2.c_nationkey = n2.n_nationkey "
             "WHERE c2.c_custkey = 7)"),
    # r8: PERIODSTODATE = the member's level from the opening of its
    # ancestor period through the member (range cut; the engine's
    # opening = MIN existing key within the period, so year = 1996
    # AND key <= member is the equivalent fact predicate)
    "ptd_day": dict(
        dim="Time", lvl=3, kind="ptd",
        mdx="PERIODSTODATE([Time].[Year], [Time].[Day].[&1996-02-10])",
        sel=["CAST(l.l_shipdate AS DATE) AS ship_date"], out=["ship_date"],
        key="ship_date",
        pred="year(l.l_shipdate) = 1996 "
             "AND CAST(l.l_shipdate AS DATE) <= DATE '1996-02-10'"),
}

#: planner drill resolution order (planner.py _aggregate_cube): plain
#: drilldowns (incl. ranges/unions — they compile to drill+cut) in
#: textual order, then .Children, .Siblings, .FirstSibling/
#: .LastSibling, .FirstChild/.LastChild/OPENINGPERIOD, .Parent,
#: ANCESTOR, LASTPERIODS, PERIODSTODATE, .Lag/.Lead — the axis key
#: order that drives ORDER BY tie-breaks
_KIND_RANK = {"members": 0, "set": 0, "desc": 0, "range": 0, "union": 0,
              "children": 1, "siblings": 2, "edgesib": 3, "edgechild": 4,
              "parent": 5, "ancestor": 6, "lastp": 7, "ptd": 8,
              "lag": 9}

# --- WITH SET named sets (computed over the UNCUT cube) --------------------

WITH_SETS = {
    "Customer.Nation": dict(
        mdx_level="[Customer].[Nation]", keyexpr="cn.n_nationkey",
        dim="Customer", sel=NATION_SEL, out=NATION_OUT,
        key="cust_nation_key"),
    "Part.Brand": dict(
        mdx_level="[Part].[Brand]", keyexpr="p.p_brand",
        dim="Part", sel=["p.p_brand AS p_brand"], out=["p_brand"],
        key="p_brand"),
    "Supplier.Region": dict(
        mdx_level="[Supplier].[Region]", keyexpr="sr.r_regionkey",
        dim="Supplier",
        sel=["sr.r_regionkey AS supp_region_key",
             "sr.r_name AS supp_region"],
        out=["supp_region_key", "supp_region"], key="supp_region_key"),
}

# WITH SET member-literal/algebra macro bodies (r8): the body text +
# the same oracle contribution shape as an ATOM (drill + predicate)
MACRO_SETS = {
    "nations_literal": dict(
        dim="Customer",
        body="{[Customer].[Nation].[&3], [Customer].[Nation].[&7], "
             "[Customer].[Nation].[&21]}",
        sel=NATION_SEL, out=NATION_OUT, key="cust_nation_key",
        pred="cn.n_nationkey IN (3, 7, 21)"),
    "not_asia": dict(
        dim="Customer",
        body="EXCEPT([Customer].[Region].Members, "
             "{[Customer].[Region].[&2]})",
        sel=["cr.r_regionkey AS cust_region_key",
             "cr.r_name AS cust_region"],
        out=["cust_region_key", "cust_region"], key="cust_region_key",
        pred="cr.r_regionkey <> 2"),
}

# --- slicer cuts -----------------------------------------------------------
# cut -> (mdx slicer text, SQL predicate, dimension, level index)

SLICERS = {
    "cust_region": ("[Customer].[Region].[&2]", "cr.r_regionkey = 2",
                    "Customer", 0),
    "cust_nations": ("{[Customer].[Nation].[&3], [Customer].[Nation].[&7], "
                     "[Customer].[Nation].[&21]}",
                     "cn.n_nationkey IN (3, 7, 21)", "Customer", 1),
    "year_range": ("([Time].[Year].[1996]:[Time].[Year].[1998])",
                   "year(l.l_shipdate) BETWEEN 1996 AND 1998", "Time", 0),
    "rflag": ("[Return Flag].[Return Flag].[&R]", "l.l_returnflag = 'R'",
              "Return Flag", 0),
    "lstatus": ("[Line Status].[Line Status].[&F]", "l.l_linestatus = 'F'",
                "Line Status", 0),
    "supp_region": ("[Supplier].[Region].[&1]", "sr.r_regionkey = 1",
                    "Supplier", 0),
    # r8: complement slicer (EXCEPT over the full level)
    "not_year_1995": ("EXCEPT([Time].[Year].Members, {[Time].[Year].[1995]})",
                      "year(l.l_shipdate) <> 1995", "Time", 0),
}

# --- WITH MEMBER formulas ("Calc Measure" -> alias calc_measure) -----------
# name -> (MDX formula, oracle SQL expression builder over measure SQL)

REV = MEASURES["Revenue"][1]
CNT = MEASURES["Line Count"][1]
PRICE = MEASURES["Quantity"][1]  # placeholder; real price SQL below
EXT = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)"

CALCS = {
    "ratio": ("[Measures].[Revenue] / [Measures].[Line Count]",
              f"({REV}) / ({CNT})"),
    "sumratio": ("([Measures].[Revenue] + [Measures].[Extended Price]) "
                 "/ [Measures].[Line Count]",
                 f"(({REV}) + ({EXT})) / ({CNT})"),
    "scaled": ("[Measures].[Revenue] * 2 + 1", f"({REV}) * 2 + 1"),
    "iif": ("IIF([Measures].[Revenue] / [Measures].[Line Count] > 50250, "
            "[Measures].[Revenue] / [Measures].[Line Count], 0)",
            f"CASE WHEN ({REV}) / ({CNT}) > 50250 "
            f"THEN ({REV}) / ({CNT}) ELSE 0 END"),
    # set-aggregate WITH MEMBER (r8): conditional fact-side aggregate;
    # conflicts with any Time drill/cut (the engine 400s the context
    # replacement), so the generator drops Time atoms/cuts for these
    "setagg_years": (
        "AGGREGATE({[Time].[Year].[1995],[Time].[Year].[1996]}, "
        "[Measures].[Revenue])",
        "CAST(SUM(CASE WHEN year(l.l_shipdate) IN (1995, 1996) THEN "
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END) "
        "AS DOUBLE)"),
    # MAX over a max measure: the distributive fast path (member-value
    # max == fact-side max); MAX over a SUM measure is member-value
    # semantics, covered by test_mdx + the q62/q63 oracle entries
    "setagg_range_max": (
        "MAX(([Time].[Year].[1996]:[Time].[Year].[1998]), "
        "[Measures].[Max Quantity])",
        "MAX(CASE WHEN year(l.l_shipdate) BETWEEN 1996 AND 1998 "
        "THEN l_quantity END)"),
    # r8: COALESCEEMPTY -> SQL coalesce (empty cells are nulls)
    "coalesce": ("COALESCEEMPTY([Measures].[Revenue] / "
                 "[Measures].[Line Count], 0)",
                 f"COALESCE(({REV}) / ({CNT}), 0)"),
    # r9: searched CASE (multi-branch) and simple CASE in WITH MEMBER
    "case_searched": (
        "CASE WHEN [Measures].[Revenue] > 15000000 THEN 2 "
        "WHEN [Measures].[Revenue] > 8000000 THEN 1 ELSE 0 END",
        f"CASE WHEN ({REV}) > 15000000 THEN 2 "
        f"WHEN ({REV}) > 8000000 THEN 1 ELSE 0 END"),
    "case_simple": (
        "CASE [Measures].[Line Count] WHEN 0 THEN -1 ELSE "
        "[Measures].[Line Count] END",
        f"CASE ({CNT}) WHEN 0 THEN -1 ELSE ({CNT}) END"),
    # r9: boolean connectives inside an IIF condition
    "iif_and": (
        "IIF(([Measures].[Revenue] > 8000000 AND "
        "[Measures].[Line Count] > 100), 1, 0)",
        f"CASE WHEN ({REV}) > 8000000 AND ({CNT}) > 100 "
        f"THEN 1 ELSE 0 END"),
    # r8: measure-member tuple = the measure in a fixed member context
    # (compiles to the single-member set aggregate)
    "tuple_year": (
        "([Measures].[Revenue], [Time].[Year].[1995])",
        "CAST(SUM(CASE WHEN year(l.l_shipdate) = 1995 THEN "
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END) "
        "AS DOUBLE)"),
}

#: calcs that restrict a dimension — the generator must not also
#: drill or slice it (engine raises a clear 400 on the conflict)
CALC_DIM_CONFLICT = {"setagg_years": "Time", "setagg_range_max": "Time",
                     "tuple_year": "Time"}

# measures usable in FILTER/ORDER/TOPCOUNT/WITH SET rankings
RANK_MEASURES = ["Revenue", "Quantity", "Line Count", "Max Quantity"]
FILTER_VALUES = [0, 100, 10_000, 5_000_000]


@st.composite
def mdx_specs(draw):
    atoms = draw(st.lists(st.sampled_from(sorted(ATOMS)),
                          min_size=0, max_size=3, unique=True))
    # one atom per dimension (two sets on one hierarchy is a 400)
    seen = set()
    atoms = [a for a in atoms
             if not (ATOMS[a]["dim"] in seen or seen.add(ATOMS[a]["dim"]))]

    with_set = macro_set = None
    if draw(st.booleans()):
        if draw(st.booleans()):
            lvl = draw(st.sampled_from(sorted(WITH_SETS)))
            if WITH_SETS[lvl]["dim"] not in seen:
                seen.add(WITH_SETS[lvl]["dim"])
                with_set = (lvl, draw(st.sampled_from([2, 3, 5])),
                            draw(st.sampled_from(RANK_MEASURES)),
                            draw(st.booleans()))  # True = BOTTOMCOUNT
        else:
            mk = draw(st.sampled_from(sorted(MACRO_SETS)))
            if MACRO_SETS[mk]["dim"] not in seen:
                seen.add(MACRO_SETS[mk]["dim"])
                macro_set = mk

    measures = draw(st.lists(
        st.sampled_from(["Revenue", "Quantity", "Line Count",
                         "Max Quantity", "Avg Discount", "Customer Count"]),
        min_size=1, max_size=3, unique=True))
    calc = draw(st.sampled_from([None] + sorted(CALCS)))
    if calc in CALC_DIM_CONFLICT:
        # a set-aggregate REPLACES its dimension's context — the
        # engine 400s when the query also drills/slices it, so drop
        # conflicting atoms (cuts are filtered below via cut_ok)
        atoms = [a for a in atoms
                 if ATOMS[a]["dim"] != CALC_DIM_CONFLICT[calc]]

    has_axis = bool(atoms) or with_set is not None or macro_set is not None
    # axis wrappers: FILTER -> ORDER -> SUBSET chain, or a whole-axis
    # TOPCOUNT (which imposes its own order+limit)
    topcount = filt = order = subset = None
    if has_axis:
        shape = draw(st.sampled_from(["chain", "topcount", "toppercent",
                                      "topsum"]))
        if shape == "topcount":
            topcount = ("count", draw(st.sampled_from([1, 3, 10])),
                        draw(st.sampled_from(RANK_MEASURES)))
        elif shape == "toppercent":
            topcount = ("pct", draw(st.sampled_from([10, 40, 75])),
                        draw(st.sampled_from(RANK_MEASURES)),
                        draw(st.booleans()))
        elif shape == "topsum":
            topcount = ("sum",
                        draw(st.sampled_from([100, 500_000, 40_000_000])),
                        draw(st.sampled_from(RANK_MEASURES)),
                        draw(st.booleans()))
        else:
            if draw(st.booleans()):
                # value is a literal, OR (k, measure) for the r8
                # measure-arithmetic conditions ([A] > k * [B])
                filt = draw(st.lists(
                    st.tuples(st.sampled_from(RANK_MEASURES),
                              st.sampled_from([">", ">=", "<", "<="]),
                              st.one_of(
                                  st.sampled_from(FILTER_VALUES),
                                  st.tuples(st.sampled_from([2, 100, 2000]),
                                            st.sampled_from(RANK_MEASURES)))),
                    min_size=1, max_size=2))
                # r8: sometimes join the two conditions with OR instead
                # of AND (one expression template; SQL precedence)
                if len(filt) == 2 and draw(st.booleans()):
                    filt = ("or", filt)
            if draw(st.booleans()):
                # order by a measure, or by a drilled member's Key
                keys = [("measure", m) for m in RANK_MEASURES]
                keys += [("member", a) for a in atoms
                         if ATOMS[a]["kind"] == "members"]
                order = (draw(st.sampled_from(keys)), draw(st.booleans()))
            # at most one pagination wrapper: SUBSET, HEAD or TAIL
            subset = draw(st.sampled_from(
                [None,
                 ("subset", 0, 3), ("subset", 2, 10), ("subset", 0, 1),
                 ("head", 1), ("head", 4),
                 ("tail", 1), ("tail", 4)]))

    # RANK WITH MEMBER (r8): rank a drilled level's members by a
    # measure, partitioned by the other drilled dims.  Constraints
    # keep the single-SELECT oracle sound: no FILTER (the planner
    # ranks BEFORE the HAVING stage, SQL windows run after), no
    # TOPPERCENT/TOPSUM (their oracle rewrites the SELECT), no named
    # sets (their drill would join the rank partition)
    rank_calc = None
    memb_atoms = [a for a in atoms if ATOMS[a]["kind"] == "members"]
    if (memb_atoms and calc is None and filt is None
            and with_set is None and macro_set is None
            and not (topcount and topcount[0] in ("pct", "sum"))
            and draw(st.booleans())):
        rank_calc = (draw(st.sampled_from(sorted(memb_atoms))),
                     draw(st.sampled_from(RANK_MEASURES)),
                     draw(st.booleans()))   # True = BASC

    cuts = draw(st.lists(st.sampled_from(sorted(SLICERS)),
                         min_size=0, max_size=2, unique=True))
    # a slicer may share a dimension only with a plain .Members atom
    # drilled at-or-below the cut level (ascendant drill is a 400;
    # member-anchored atoms carry their own implicit cut)
    def cut_ok(c):
        _, _, cdim, clvl = SLICERS[c]
        if with_set and WITH_SETS[with_set[0]]["dim"] == cdim:
            return False
        if macro_set and MACRO_SETS[macro_set]["dim"] == cdim:
            return False
        for a in atoms:
            if ATOMS[a]["dim"] != cdim:
                continue
            if ATOMS[a]["kind"] != "members" or ATOMS[a]["lvl"] < clvl:
                return False
        return True
    cuts = [c for c in cuts if cut_ok(c)]
    if calc in CALC_DIM_CONFLICT:
        cuts = [c for c in cuts
                if SLICERS[c][2] != CALC_DIM_CONFLICT[calc]]
    seen_cd = set()
    cuts = [c for c in cuts
            if not (SLICERS[c][2] in seen_cd or seen_cd.add(SLICERS[c][2]))]

    return dict(atoms=atoms, with_set=with_set, macro_set=macro_set,
                measures=measures,
                calc=calc, rank_calc=rank_calc, topcount=topcount,
                filt=filt, order=order, subset=subset, cuts=cuts)


def build_mdx(spec) -> str:
    defs = []
    if spec["calc"]:
        defs.append("MEMBER [Measures].[Calc Measure] AS "
                    + CALCS[spec["calc"]][0])
    if spec["with_set"]:
        lvl, k, by, bottom = spec["with_set"]
        fn = "BOTTOMCOUNT" if bottom else "TOPCOUNT"
        defs.append(f"SET [Fuzz Set] AS {fn}("
                    f"{WITH_SETS[lvl]['mdx_level']}.Members, {k}, "
                    f"[Measures].[{by}])")
    if spec.get("macro_set"):
        defs.append(
            f"SET [Macro Set] AS {MACRO_SETS[spec['macro_set']]['body']}")
    if spec.get("rank_calc"):
        atom, by, asc = spec["rank_calc"]
        lvl_path = ATOMS[atom]["mdx"].rsplit(".Members", 1)[0]
        defs.append(
            f"MEMBER [Measures].[Rank Calc] AS RANK({lvl_path}"
            f".CurrentMember, ORDER({lvl_path}.Members, "
            f"[Measures].[{by}], {'BASC' if asc else 'BDESC'}))")
    mdx = f"WITH {' '.join(defs)} " if defs else ""

    ms = list(spec["measures"]) + (["Calc Measure"] if spec["calc"] else [])
    if spec.get("rank_calc"):
        ms.append("Rank Calc")
    mdx += ("SELECT {" + ", ".join(f"[Measures].[{m}]" for m in ms)
            + "} ON COLUMNS")

    sets = [ATOMS[a]["mdx"] for a in spec["atoms"]]
    if spec["with_set"]:
        sets.append("[Fuzz Set]")
    if spec.get("macro_set"):
        sets.append("[Macro Set]")
    if sets:
        axis = " * ".join(sets)
        if spec["topcount"] and spec["topcount"][0] == "count":
            _, n, by = spec["topcount"]
            axis = f"TOPCOUNT({axis}, {n}, [Measures].[{by}])"
        elif spec["topcount"] and spec["topcount"][0] == "pct":
            _, pct, by, bottom = spec["topcount"]
            fn = "BOTTOMPERCENT" if bottom else "TOPPERCENT"
            axis = f"{fn}({axis}, {pct}, [Measures].[{by}])"
        elif spec["topcount"]:
            _, val, by, bottom = spec["topcount"]
            fn = "BOTTOMSUM" if bottom else "TOPSUM"
            axis = f"{fn}({axis}, {val}, [Measures].[{by}])"
        else:
            if spec["filt"]:
                filt, joiner = spec["filt"], " AND "
                if isinstance(filt, tuple) and filt[0] == "or":
                    filt, joiner = filt[1], " OR "
                conds = joiner.join(
                    f"[Measures].[{m}] {op} {v[0]} * [Measures].[{v[1]}]"
                    if isinstance(v, tuple) else
                    f"[Measures].[{m}] {op} {v}"
                    for m, op, v in filt)
                axis = f"FILTER({axis}, {conds})"
            if spec["order"]:
                (okind, oref), desc = spec["order"]
                if okind == "measure":
                    okey = f"[Measures].[{oref}]"
                else:
                    a = ATOMS[oref]
                    lvl_path = a["mdx"].rsplit(".Members", 1)[0]
                    okey = f"{lvl_path}.CurrentMember.Key"
                axis = f"ORDER({axis}, {okey}, {'BDESC' if desc else 'BASC'})"
            if spec["subset"]:
                if spec["subset"][0] == "subset":
                    _, off, n = spec["subset"]
                    axis = f"SUBSET({axis}, {off}, {n})"
                else:
                    fn, n = spec["subset"]
                    axis = f"{fn.upper()}({axis}, {n})"
        mdx += f", NON EMPTY {axis} ON ROWS"
    mdx += " FROM [Sales]"
    if spec["cuts"]:
        mdx += (" WHERE ("
                + " * ".join(SLICERS[c][0] for c in spec["cuts"]) + ")")
    return mdx


def build_oracle_sql(spec) -> str:
    sel, aliases, key_aliases, preds = [], [], [], []
    # key order must mirror the planner's drill resolution order, not
    # the MDX textual order (see _KIND_RANK).  [Fuzz Set] is a plain
    # drilldown — rank 0, textually after the other atoms.
    entries = [(_KIND_RANK[ATOMS[a]["kind"]], i, ATOMS[a])
               for i, a in enumerate(spec["atoms"])]
    if spec["with_set"]:
        lvl, k, by, bottom = spec["with_set"]
        ws = WITH_SETS[lvl]
        direction = "ASC" if bottom else "DESC"
        entries.append((0, len(spec["atoms"]), dict(
            sel=ws["sel"], out=ws["out"], key=ws["key"],
            pred=f"{ws['keyexpr']} IN (SELECT __k FROM ("
                 f"SELECT {ws['keyexpr']} AS __k, {MEASURES[by][1]} AS __v "
                 f"{STAR} GROUP BY 1 ORDER BY __v {direction}, __k "
                 f"LIMIT {k}))")))
    if spec.get("macro_set"):
        ms = MACRO_SETS[spec["macro_set"]]
        entries.append((0, len(spec["atoms"]) + 1, dict(
            sel=ms["sel"], out=ms["out"], key=ms["key"],
            pred=ms["pred"])))
    for _, _, atom in sorted(entries, key=lambda e: (e[0], e[1])):
        sel += atom["sel"]
        aliases += atom["out"]
        key_aliases.append(atom["key"])
        if atom["pred"]:
            preds.append(atom["pred"])
    for c in spec["cuts"]:
        preds.append(SLICERS[c][1])

    msel = [f"{MEASURES[m][1]} AS {MEASURES[m][0]}"
            for m in spec["measures"]]
    if spec["calc"]:
        msel.append(f"{CALCS[spec['calc']][1]} AS calc_measure")
    if spec.get("rank_calc"):
        atom, by, asc = spec["rank_calc"]
        others = [ATOMS[a]["key"] for a in spec["atoms"] if a != atom]
        part = f"PARTITION BY {', '.join(others)} " if others else ""
        msel.append(
            f"RANK() OVER ({part}ORDER BY {MEASURES[by][1]} "
            f"{'ASC' if asc else 'DESC'} NULLS LAST) AS rank_calc")

    sql = "SELECT " + ", ".join(sel + msel) + STAR
    if preds:
        sql += " WHERE " + " AND ".join(preds)
    if sel:
        sql += " GROUP BY " + ", ".join(aliases)

    order_terms, limit = [], None
    if spec["topcount"] and spec["topcount"][0] in ("pct", "sum"):
        # TOPPERCENT/TOPSUM: minimal best-first prefix reaching pct%
        # of the set total (PCT) or an absolute value (SUM) —
        # running/total windows over the grouped result, tie-broken
        # exactly like the planner (rank, then axis keys)
        kind, thr, by, bottom = spec["topcount"]
        direction = "ASC" if bottom else "DESC"
        tie = "".join(f", {k}" for k in key_aliases)
        outer_cols = ", ".join(aliases
                               + [MEASURES[m][0] for m in spec["measures"]]
                               + (["calc_measure"] if spec["calc"] else []))
        threshold = (f"{thr / 100.0} * __tot" if kind == "pct"
                     else str(thr))
        return (f"SELECT {outer_cols} FROM ("
                f"SELECT *, SUM(__rank) OVER (ORDER BY __rank {direction}"
                f"{tie} ROWS UNBOUNDED PRECEDING) AS __run, "
                f"SUM(__rank) OVER () AS __tot FROM ("
                f"{sql.replace('SELECT ', 'SELECT ' + MEASURES[by][1] + ' AS __rank, ', 1)}"
                f")) WHERE __run - __rank < {threshold}")
    if spec["topcount"]:
        _, n, by = spec["topcount"]
        order_terms = [f"{MEASURES[by][1]} DESC"] + list(key_aliases)
        limit = (0, n)
    else:
        if spec["filt"]:
            filt, joiner = spec["filt"], " AND "
            if isinstance(filt, tuple) and filt[0] == "or":
                filt, joiner = filt[1], " OR "
            sql += " HAVING " + joiner.join(
                f"{MEASURES[m][1]} {op} {v[0]} * {MEASURES[v[1]][1]}"
                if isinstance(v, tuple) else
                f"{MEASURES[m][1]} {op} {v}" for m, op, v in filt)
        if spec["order"]:
            (okind, oref), desc = spec["order"]
            if okind == "measure":
                expr, skip = MEASURES[oref][1], MEASURES[oref][0]
            else:
                expr, skip = ATOMS[oref]["key"], ATOMS[oref]["key"]
            order_terms = ([expr + (" DESC" if desc else "")]
                           + [a for a in key_aliases if a != skip])
        elif key_aliases:
            order_terms = list(key_aliases)
        if spec["subset"]:
            kind = spec["subset"][0]
            if kind == "subset":
                _, off, n = spec["subset"]
                limit = (off, n)
            elif kind == "head":
                limit = (0, spec["subset"][1])
            else:   # tail = last n of the total order: reverse + limit
                order_terms = [t[:-5] if t.endswith(" DESC")
                               else t + " DESC" for t in order_terms]
                limit = (0, spec["subset"][1])
    if order_terms:
        sql += " ORDER BY " + ", ".join(order_terms)
    if limit:
        sql += f" LIMIT {limit[1]} OFFSET {limit[0]}"
    return sql


@settings(max_examples=150, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(spec=mdx_specs())
def test_random_mdx_matches_generated_oracle(spark, sf_dir, duck, spec):
    mdx = build_mdx(spec)
    got = execute_mdx(spark, sf_dir, tpch.CATALOG, mdx).toPandas()
    exp = duck.execute(build_oracle_sql(spec)).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), \
        f"columns {sorted(got.columns)} != {sorted(exp.columns)}\n{mdx}"
    assert len(got) == len(exp), \
        f"rows {len(got)} != {len(exp)}\n{mdx}\n{build_oracle_sql(spec)}"
    a, b = canon(got), canon(exp)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) |
                  ((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs()))
        else:
            ok = (av.isna() & bv.isna()) | (av.astype(object) ==
                                            bv.astype(object))
        assert bool(ok.all()), (
            f"col {c} mismatch at row {int((~ok).idxmax())}: "
            f"spark={av[(~ok).idxmax()]!r} duck={bv[(~ok).idxmax()]!r}\n"
            f"{mdx}\n{build_oracle_sql(spec)}")


def test_mdx_fuzz_corpus_is_large_enough():
    """The advice's done-bar: 100+ generated MDX cases; settings pin
    max_examples=150 (derandomized), so the corpus size is explicit."""
    s = (test_random_mdx_matches_generated_oracle
         ._hypothesis_internal_use_settings)
    assert s.max_examples >= 100


# --- mutation fuzz: no 500s -----------------------------------------------
# The HTTP layer maps ParseError -> 400 and KeyError -> 404/400; ANY
# other exception from a posted-MDX plan is a 500.  Mutating valid MDX
# (delete/duplicate/swap a token) must therefore either still execute
# or fail with exactly those types.

from mondrian_rest_spark.parser import ParseError  # noqa: E402


#: r8 grammar forms the spec generator doesn't emit — mutated too so
#: malformed PROPERTIES/GENERATE/RANK/NONEMPTY-2-arg never 500
_MUTATION_SEEDS = [
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY [Customer].[Customer].Members '
    'DIMENSION PROPERTIES [Customer].[Customer].[Market Segment], '
    'MEMBER_CAPTION ON ROWS FROM [Sales] '
    'WHERE ([Customer].[Region].[&2]) '
    'CELL PROPERTIES VALUE, FORMATTED_VALUE',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY FILTER([Customer].[Customer].Members, '
    '[Customer].[Customer].CurrentMember'
    '.Properties("Market Segment") = "BUILDING" '
    'AND [Measures].[Revenue] > 0) ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY GENERATE([Customer].[Region].Members, '
    'TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, '
    '[Measures].[Revenue])) ON ROWS FROM [Sales]',
    'WITH MEMBER [Measures].[MedR] AS '
    'MEDIAN(([Time].[Year].[1995]:[Time].[Year].[1997]), '
    '[Measures].[Revenue]) '
    'SELECT {[Measures].[MedR]} ON COLUMNS, '
    'NON EMPTY [Customer].[Region].Members ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NONEMPTY([Customer].[Region].Members, [Measures].[Revenue]) '
    'ON ROWS FROM [Sales]',
    # r9 grammar forms: CASE in WITH MEMBER, navigation FILTER,
    # EXISTS/EXISTING — mutated so malformed variants never 500
    'WITH MEMBER [Measures].[Band] AS '
    'CASE WHEN [Measures].[Revenue] > 15000000 THEN 2 '
    'WHEN [Measures].[Revenue] > 8000000 THEN 1 ELSE 0 END '
    'SELECT {[Measures].[Band]} ON COLUMNS, '
    'NON EMPTY [Customer].[Region].Members ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY FILTER([Customer].[Nation].Members, '
    '[Customer].[Nation].CurrentMember.Parent IS '
    '[Customer].[Region].[&2] AND [Measures].[Revenue] > 0) '
    'ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY FILTER([Customer].[Customer].Members, '
    'ANCESTOR([Customer].[Customer].CurrentMember, '
    '[Customer].[Region]) IS [Customer].[Region].[&1]) '
    'ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY EXISTS([Customer].[Nation].Members, '
    '{[Customer].[Region].[&0],[Customer].[Region].[&3]}) '
    'ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY EXISTING [Customer].[Nation].Members ON ROWS '
    'FROM [Sales] WHERE ([Customer].[Region].[&2])',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY DRILLDOWNLEVEL([Customer].[Region].Members) ON ROWS '
    'FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY DRILLDOWNMEMBER([Customer].[Region].Members, '
    '{[Customer].[Region].[&1],[Customer].[Region].[&3]}) ON ROWS '
    'FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY GENERATE([Customer].[Region].Members, '
    'TAIL([Customer].[Region].CurrentMember.Children, 2)) ON ROWS '
    'FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY GENERATE([Customer].[Region].Members, '
    'BOTTOMCOUNT(DESCENDANTS([Customer].[Region].CurrentMember, '
    '[Customer].[Customer]), 2, [Measures].[Revenue])) ON ROWS '
    'FROM [Sales]',
    # r12: set functions in crossjoin position — mutated variants
    # (missing args, garbage percents, swapped parens) must 400
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY TOPPERCENT([Customer].[Nation].Members, 30, '
    '[Measures].[Revenue]) * [Time].[Year].Members ON ROWS '
    'FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY TAIL([Customer].[Nation].Members, 2) * '
    'TOPCOUNT([Time].[Year].Members, 2, [Measures].[Revenue]) '
    'ON ROWS FROM [Sales]',
    'WITH SET [Big] AS TOPSUM([Customer].[Nation].Members, 5000000, '
    '[Measures].[Revenue]) SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY [Big] ON ROWS FROM [Sales]',
    # r12: nested GENERATE — mutated variants (wrong nesting depth,
    # wrong dimension, dangling parens) must 400, never 500
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY GENERATE([Customer].[Region].Members, '
    'GENERATE([Customer].[Region].CurrentMember.Children, '
    'TOPCOUNT([Customer].[Nation].CurrentMember.Children, 2, '
    '[Measures].[Revenue]))) ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY GENERATE([Customer].[Region].Members, '
    'GENERATE(DESCENDANTS([Customer].[Region].CurrentMember, '
    '[Customer].[Nation]), TAIL([Customer].[Nation].CurrentMember'
    '.Children, 2))) ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY VISUALTOTALS({[Customer].[Region].[&1], '
    '[Customer].[Nation].[&1], [Customer].[Nation].[&6]}) ON ROWS '
    'FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY HIERARCHIZE(TOPCOUNT([Customer].[Nation].Members, 5, '
    '[Measures].[Revenue])) ON ROWS FROM [Sales]',
    # r10: EXISTING under DENSE axes (no NON EMPTY) — the context
    # restriction path through the dense member frames must never 500
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'EXISTING [Customer].[Nation].Members ON ROWS '
    'FROM [Sales] WHERE ([Customer].[Region].[&1])',
    # r10: function-form CROSSJOIN (nested) and StrToMember/StrToSet
    # literal unwraps — mutations must 400, never 500
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY CROSSJOIN(CROSSJOIN([Customer].[Region].Members, '
    '[Return Flag].[Return Flag].Members), [Time].[Year].Members) '
    'ON ROWS FROM [Sales]',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY StrToSet("{[Customer].[Nation].[&1],'
    '[Customer].[Nation].[&6]}") ON ROWS FROM [Sales] '
    'WHERE (StrToMember("[Customer].[Region].[&1]"))',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'NON EMPTY DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, '
    '[Measures].[Revenue]) ON ROWS FROM [Sales]',
    # r14: dense (no NON EMPTY) grouping-sets / GENERATE / DDLTOP on
    # VIRTUAL cubes and alias-conformed Day — mutations of the new
    # forms must 400, never 500
    'SELECT {[Measures].[Revenue], [Measures].[Total Price]} '
    'ON COLUMNS, DRILLDOWNLEVEL([Customer].[Region].Members) '
    'ON ROWS FROM [Orders and Sales] WHERE ([Time].[Year].[&1996])',
    'SELECT {[Measures].[Revenue]} ON COLUMNS, '
    'GENERATE([Customer].[Region].Members, '
    'TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, '
    '[Measures].[Revenue])) ON ROWS FROM [Orders and Sales] '
    'WHERE ([Time].[Day].[&1996-02-10])',
    'SELECT {[Measures].[Total Price]} ON COLUMNS, '
    'DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, '
    '[Measures].[Total Price]) ON ROWS FROM [Orders and Sales]',
    'SELECT {[Measures].[Revenue], [Measures].[Total Price]} '
    'ON COLUMNS, NON EMPTY [Time].[Day].Members ON ROWS '
    'FROM [Orders and Sales] WHERE ([Customer].[Region].[&2])',
]


@st.composite
def mutated_mdx(draw):
    if draw(st.booleans()):
        mdx = draw(st.sampled_from(_MUTATION_SEEDS))
    else:
        spec = draw(mdx_specs())
        mdx = build_mdx(spec)
    toks = mdx.replace("(", " ( ").replace(")", " ) ").replace(
        ",", " , ").split()
    op = draw(st.sampled_from(["del", "dup", "swap", "noop"]))
    if toks and op != "noop":
        i = draw(st.integers(0, len(toks) - 1))
        if op == "del":
            del toks[i]
        elif op == "dup":
            toks.insert(i, toks[i])
        elif op == "swap" and len(toks) > 1:
            j = draw(st.integers(0, len(toks) - 1))
            toks[i], toks[j] = toks[j], toks[i]
    return " ".join(toks)


@settings(max_examples=120, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(mdx=mutated_mdx())
def test_mutated_mdx_never_500s(spark, sf_dir, mdx):
    try:
        execute_mdx(spark, sf_dir, tpch.CATALOG, mdx).collect()
    except (ParseError, KeyError):
        pass     # 400 / 404 — the documented client-error surface


# --- rollup router x MDX parity fuzz (VERDICT r7 #8) -----------------------
# Every generated MDX query also runs through RollupManager.route and
# must match the direct plan byte-for-byte.  A wide rollup grain makes
# a large share of the corpus actually ROUTE (the interesting lane);
# queries the router refuses (calc members, WITH SET, non-reaggregable
# measures, uncovered grains) must still return identical results via
# the base fallback.

_ROLLUP_MGR = {}


def _router(spark, sf_dir):
    key = spark.sparkContext.applicationId
    if key not in _ROLLUP_MGR:
        from mondrian_rest_spark.plans.rollup import RollupManager
        mgr = RollupManager(spark, sf_dir, tpch.CATALOG, "Sales")
        mgr.register("fuzz_wide", (
            "Customer.Region", "Customer.Nation", "Supplier.Region",
            "Part.Brand", "Time.Year", "Time.Month",
            "Return Flag.Return Flag", "Line Status.Line Status"))
        _ROLLUP_MGR[key] = mgr
    return _ROLLUP_MGR[key]


@settings(max_examples=100, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(spec=mdx_specs())
def test_random_mdx_route_matches_direct(spark, sf_dir, spec):
    from mondrian_rest_spark.mdx import compile_mdx
    from mondrian_rest_spark.planner import aggregate

    import dataclasses

    mgr = _router(spark, sf_dir)
    qm = compile_mdx(build_mdx(spec))
    # r13: DENSE routes too (Mondrian's REST default) — every corpus
    # query also runs as its dense variant; 400s must match as well
    for qv in (qm, dataclasses.replace(qm, nonempty=False)):
        try:
            direct = aggregate(spark, sf_dir, tpch.CATALOG, qv).toPandas()
            d_err = None
        except ParseError as e:
            direct, d_err = None, str(e)
        try:
            routed_df, source = mgr.route(qv)
            routed = routed_df.toPandas() if d_err is None else None
            r_err = None
        except ParseError as e:
            routed, source, r_err = None, "err", str(e)
        assert (d_err is None) == (r_err is None), (
            f"dense={not qv.nonempty}: error parity diverges "
            f"(direct={d_err!r}, routed={r_err!r})\n{build_mdx(spec)}")
        if d_err is not None:
            continue
        assert sorted(routed.columns) == sorted(direct.columns), \
            f"{source}: columns diverge\n{build_mdx(spec)}"
        a, b = canon(routed), canon(direct)
        assert len(a) == len(b), \
            f"{source}: rows {len(a)} != {len(b)}\n{build_mdx(spec)}"
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = ((av.isna() & bv.isna()) |
                      ((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs()))
            else:
                ok = (av.isna() & bv.isna()) | (av.astype(object) ==
                                                bv.astype(object))
            assert bool(ok.all()), (
                f"{source}: col {c} diverges\n{build_mdx(spec)}")


def test_route_parity_corpus_actually_routes(spark, sf_dir):
    """Guard against the lane silently testing only the base fallback:
    a representative covered query must route to the wide rollup."""
    from mondrian_rest_spark.mdx import compile_mdx
    mgr = _router(spark, sf_dir)
    qm = compile_mdx(
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY [Customer].[Nation].Members ON ROWS FROM [Sales] "
        "WHERE ([Time].[Year].[1996])")
    _, source = mgr.route(qm)
    assert source == "fuzz_wide"


# --- GENERATE per-parent top-N: parametrized mini-net ----------------------
# GENERATE changes the drilldown set itself (it drills (parent, child)
# and windows per parent), so it doesn't fit the single-SELECT oracle
# above; a QUALIFY oracle over the same star covers the combinations.

_GENERATE_CASES = [
    ("Customer", "cr.r_regionkey", "cust_region_key", "cust_region",
     "cr.r_name", "cn.n_nationkey", "cust_nation_key", "cust_nation",
     "cn.n_name", n, by, bottom)
    for n, by, bottom in [(1, "Revenue", False), (2, "Quantity", False),
                          (3, "Revenue", True), (2, "Line Count", False)]
] + [
    ("Supplier", "sr.r_regionkey", "supp_region_key", "supp_region",
     "sr.r_name", "sn.n_nationkey", "supp_nation_key", "supp_nation",
     "sn.n_name", 2, "Revenue", False),
]


@pytest.mark.parametrize("case", _GENERATE_CASES)
def test_generate_topcount_matches_qualify_oracle(spark, sf_dir, duck, case):
    (dim, pkey, pk_alias, pc_alias, pcap, ckey, ck_alias, cc_alias,
     ccap, n, by, bottom) = case
    from mondrian_rest_spark.mdx import execute_mdx
    fn = "BOTTOMCOUNT" if bottom else "TOPCOUNT"
    got = execute_mdx(
        spark, sf_dir, tpch.CATALOG,
        f"SELECT {{[Measures].[{by}]}} ON COLUMNS, "
        f"NON EMPTY GENERATE([{dim}].[Region].Members, "
        f"{fn}([{dim}].[Region].CurrentMember.Children, {n}, "
        f"[Measures].[{by}])) ON ROWS FROM [Sales]").toPandas()
    m_alias, m_expr = MEASURES[by]
    direction = "ASC" if bottom else "DESC"
    exp = duck.execute(f"""
        WITH agg AS (
          SELECT {pkey} AS {pk_alias}, {pcap} AS {pc_alias},
                 {ckey} AS {ck_alias}, {ccap} AS {cc_alias},
                 {m_expr} AS {m_alias}
          {STAR} GROUP BY 1, 2, 3, 4)
        SELECT * FROM agg
        QUALIFY row_number() OVER (PARTITION BY {pk_alias}
                                   ORDER BY {m_alias} {direction},
                                            {ck_alias}) <= {n}""").fetchdf()
    assert sorted(got.columns) == sorted(exp.columns)
    a, b = canon(got), canon(exp)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) |
                  ((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs()))
        else:
            ok = (av.isna() & bv.isna()) | (av.astype(object) ==
                                            bv.astype(object))
        assert bool(ok.all()), f"col {c} diverges ({case})"


_NESTED_GENERATE_CASES = [
    ("children", 2, "Revenue", False),
    ("children", 3, "Quantity", True),
    ("descendants", 2, "Revenue", False),
    ("descendants", 1, "Line Count", False),
]


@pytest.mark.parametrize("case", _NESTED_GENERATE_CASES)
def test_nested_generate_matches_qualify_oracle(spark, sf_dir, duck, case):
    """r12 (VERDICT r11 #6): nested GENERATE collapses to the inner
    window — every (nav form, n, measure, direction) combination must
    match the per-NATION QUALIFY oracle (i.e. the flattened query's
    oracle), since the outer Region loop unions to the full Nation
    member set."""
    nav, n, by, bottom = case
    from mondrian_rest_spark.mdx import execute_mdx
    fn = "BOTTOMCOUNT" if bottom else "TOPCOUNT"
    inner = (f"{fn}([Customer].[Nation].CurrentMember.Children, {n}, "
             f"[Measures].[{by}])")
    if nav == "children":
        outer_nav = "[Customer].[Region].CurrentMember.Children"
    else:
        outer_nav = ("DESCENDANTS([Customer].[Region].CurrentMember, "
                     "[Customer].[Nation])")
    got = execute_mdx(
        spark, sf_dir, tpch.CATALOG,
        f"SELECT {{[Measures].[{by}]}} ON COLUMNS, "
        f"NON EMPTY GENERATE([Customer].[Region].Members, "
        f"GENERATE({outer_nav}, {inner})) ON ROWS FROM [Sales]"
    ).toPandas()
    m_alias, m_expr = MEASURES[by]
    direction = "ASC" if bottom else "DESC"
    exp = duck.execute(f"""
        WITH agg AS (
          SELECT cn.n_nationkey AS cust_nation_key,
                 cn.n_name AS cust_nation,
                 c.c_custkey, c.c_name,
                 {m_expr} AS {m_alias}
          {STAR} GROUP BY 1, 2, 3, 4)
        SELECT * FROM agg
        QUALIFY row_number() OVER (PARTITION BY cust_nation_key
                                   ORDER BY {m_alias} {direction},
                                            c_custkey) <= {n}""").fetchdf()
    assert sorted(got.columns) == sorted(exp.columns)
    a, b = canon(got), canon(exp)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) |
                  ((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs()))
        else:
            ok = (av.isna() & bv.isna()) | (av.astype(object) ==
                                            bv.astype(object))
        assert bool(ok.all()), f"col {c} diverges ({case})"


def test_generate_routes_through_rollup(spark, sf_dir):
    """GENERATE routes when the rollup covers the (parent, child)
    grain — the per-parent window runs over the rollup rows and the
    kept set is bit-identical to the base path."""
    from mondrian_rest_spark.mdx import compile_mdx
    from mondrian_rest_spark.planner import aggregate
    mgr = _router(spark, sf_dir)
    qm = compile_mdx(
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, "
        "[Measures].[Revenue])) ON ROWS FROM [Sales]")
    routed_df, source = mgr.route(qm)
    assert source == "fuzz_wide"
    direct = canon(aggregate(spark, sf_dir, tpch.CATALOG, qm).toPandas())
    routed = canon(routed_df.toPandas())
    assert sorted(routed.columns) == sorted(direct.columns)
    assert len(routed) == len(direct) == 10
    for c in routed.columns:
        av, bv = routed[c], direct[c]
        if av.dtype.kind == "f":
            assert bool(((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs()).all())
        else:
            assert bool((av.astype(object) == bv.astype(object)).all())


def test_generate_rollup_routing_refusals(spark, sf_dir):
    from mondrian_rest_spark.mdx import compile_mdx
    mgr = _router(spark, sf_dir)
    # ranked by an approximate measure: the routed estimate could
    # reorder the top-N -> must stay on the base path
    qm = compile_mdx(
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "TOPCOUNT([Customer].[Region].CurrentMember.Children, 2, "
        "[Measures].[Approx Customer Count])) ON ROWS FROM [Sales]")
    _, source = mgr.route(qm)
    assert source == "base"
    # child level (Customer) not in the rollup grain -> base
    qm = compile_mdx(
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Nation].Members, "
        "TOPCOUNT([Customer].[Nation].CurrentMember.Children, 2, "
        "[Measures].[Revenue])) ON ROWS FROM [Sales]")
    _, source = mgr.route(qm)
    assert source == "base"
    # r9: non-default inner forms (HEAD/TAIL, DESCENDANTS target) are
    # served from base by design — the routed window materializes the
    # (parent, immediate-child) pair only
    for mdx in (
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "HEAD([Customer].[Region].CurrentMember.Children, 2)) "
        "ON ROWS FROM [Sales]",
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY GENERATE([Customer].[Region].Members, "
        "TOPCOUNT(DESCENDANTS([Customer].[Region].CurrentMember, "
        "[Customer].[Nation]), 2, [Measures].[Revenue])) "
        "ON ROWS FROM [Sales]",
    ):
        _, source = mgr.route(compile_mdx(mdx))
        assert source == "base"


# --- member-property FILTER: hypothesis mini-net ---------------------------

_PROP_CONDS = {
    "seg": ('[Customer].[Customer].CurrentMember'
            '.Properties("Market Segment")',
            "c_mktsegment", st.sampled_from(
                ["BUILDING", "MACHINERY", "AUTOMOBILE"])),
    "bal": ('[Customer].[Customer].CurrentMember'
            '.Properties("Account Balance")',
            "c_acctbal", st.sampled_from([-100, 0, 2500.5, 9000])),
}


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(which=st.sampled_from(["seg", "bal", "both"]),
       op=st.sampled_from(["=", "<>", ">", "<="]),
       seg=_PROP_CONDS["seg"][2], bal=_PROP_CONDS["bal"][2],
       having=st.booleans())
def test_property_filter_matches_oracle(spark, sf_dir, duck, which,
                                        op, seg, bal, having):
    conds_mdx, conds_sql = [], []
    if which in ("seg", "both"):
        o = op if op in ("=", "<>") else "="
        conds_mdx.append(f'{_PROP_CONDS["seg"][0]} {o} "{seg}"')
        conds_sql.append(f"c_mktsegment {o} '{seg}'")
    if which in ("bal", "both"):
        o = op if op in (">", "<=") else ">"
        conds_mdx.append(f'{_PROP_CONDS["bal"][0]} {o} {bal}')
        conds_sql.append(f"c_acctbal {o} {bal}")
    if having:
        conds_mdx.append("[Measures].[Revenue] > 1000")
    mdx = ("SELECT {[Measures].[Revenue]} ON COLUMNS, "
           "NON EMPTY FILTER([Customer].[Customer].Members, "
           + " AND ".join(conds_mdx) + ") ON ROWS FROM [Sales]")
    got = execute_mdx(spark, sf_dir, tpch.CATALOG, mdx).toPandas()
    sql = (f"SELECT c_custkey, c_name, {MEASURES['Revenue'][1]} AS revenue "
           f"{STAR} WHERE " + " AND ".join(conds_sql)
           + " GROUP BY 1, 2"
           + (" HAVING " + MEASURES["Revenue"][1] + " > 1000"
              if having else ""))
    exp = duck.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns)
    a, b = canon(got), canon(exp)
    assert len(a) == len(b), mdx
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert bool(((av.isna() & bv.isna()) |
                         ((av - bv).abs()
                          <= 1e-9 + 1e-9 * bv.abs())).all()), mdx
        else:
            assert bool((av.astype(object) == bv.astype(object)).all()), mdx


def test_nonempty_measure_routes_through_rollup(spark, sf_dir):
    """2-arg NONEMPTY re-aggregates from rollup rows with the same
    post-agg isNotNull the base path applies."""
    from mondrian_rest_spark.mdx import compile_mdx
    from mondrian_rest_spark.planner import aggregate
    mgr = _router(spark, sf_dir)
    qm = compile_mdx(
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY NONEMPTY([Customer].[Nation].Members, "
        "[Measures].[Quantity]) ON ROWS FROM [Sales] "
        "WHERE ([Time].[Year].[1996])")
    routed_df, source = mgr.route(qm)
    assert source == "fuzz_wide"
    direct = canon(aggregate(spark, sf_dir, tpch.CATALOG, qm).toPandas())
    routed = canon(routed_df.toPandas())
    assert sorted(routed.columns) == sorted(direct.columns)
    assert len(routed) == len(direct)
    for c in routed.columns:
        av, bv = routed[c], direct[c]
        if av.dtype.kind == "f":
            assert bool(((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs()).all())
        else:
            assert bool((av.astype(object) == bv.astype(object)).all())


def test_hierarchize_ranked_routes_with_parity(spark, sf_dir):
    """HIERARCHIZE(TOPCOUNT(...)) routes through a covering rollup and
    the routed frame is row-for-row identical to the direct plan
    (post-limit hierarchical re-sort applied on both paths)."""
    from mondrian_rest_spark.mdx import compile_mdx
    from mondrian_rest_spark.planner import aggregate

    mgr = _router(spark, sf_dir)
    qm = compile_mdx(
        "SELECT {[Measures].[Revenue]} ON COLUMNS, "
        "NON EMPTY HIERARCHIZE(TOPCOUNT([Customer].[Nation].Members, "
        "5, [Measures].[Revenue])) ON ROWS FROM [Sales]")
    assert qm.hierarchize
    routed, source = mgr.route(qm)
    assert source == "fuzz_wide"
    direct = aggregate(spark, sf_dir, tpch.CATALOG, qm)
    got = [tuple(r) for r in routed.collect()]
    exp = [tuple(r) for r in direct.collect()]
    assert got == exp            # including the hierarchical row order
    assert [r[0] for r in got] == sorted(r[0] for r in got)


# --- virtual-cube drill-across fuzz lane (r11) ------------------------------
# Random MDX against [Orders and Sales]: conformed-dim atoms x measure
# subsets spanning both base cubes x optional slicer / axis wrapper /
# cross-cube WITH MEMBER.  The oracle mirrors drill-across semantics
# directly: one aggregate per base cube, FULL OUTER JOIN on the
# conformed keys (NON EMPTY = the union of the supports), wrappers on
# the joined frame — independently derived, never the engine's plan.

S_STAR_V = """
    FROM lineitem l
    JOIN orders ob  ON l.l_orderkey = ob.o_orderkey
    JOIN customer c ON ob.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region cr  ON cn.n_regionkey = cr.r_regionkey
"""
O_STAR_V = """
    FROM orders o2
    JOIN customer c ON o2.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region cr  ON cn.n_regionkey = cr.r_regionkey
"""

_NSEL = ["cn.n_nationkey AS cust_nation_key", "cn.n_name AS cust_nation"]
_NOUT = ["cust_nation_key", "cust_nation"]

V_ATOMS = {
    "region": dict(
        dim="Customer", mdx="[Customer].[Region].Members",
        sel_s=["cr.r_regionkey AS cust_region_key",
               "cr.r_name AS cust_region"],
        sel_o=["cr.r_regionkey AS cust_region_key",
               "cr.r_name AS cust_region"],
        out=["cust_region_key", "cust_region"], key="cust_region_key",
        pred_s=None, pred_o=None),
    "nation_set": dict(
        dim="Customer",
        mdx="{[Customer].[Nation].[&3], [Customer].[Nation].[&7], "
            "[Customer].[Nation].[&21]}",
        sel_s=_NSEL, sel_o=_NSEL, out=_NOUT, key="cust_nation_key",
        pred_s="cn.n_nationkey IN (3, 7, 21)",
        pred_o="cn.n_nationkey IN (3, 7, 21)"),
    "desc_nation": dict(
        dim="Customer",
        mdx="DESCENDANTS([Customer].[Region].[&2], [Customer].[Nation])",
        sel_s=_NSEL, sel_o=_NSEL, out=_NOUT, key="cust_nation_key",
        pred_s="cr.r_regionkey = 2", pred_o="cr.r_regionkey = 2"),
    "year": dict(
        dim="Time", mdx="[Time].[Year].Members",
        sel_s=["year(l.l_shipdate) AS year"],
        sel_o=["year(o2.o_orderdate) AS year"],
        out=["year"], key="year", pred_s=None, pred_o=None),
    # the r11 virtualized time walks: both facts' year keys are
    # contiguous through 1998, so key arithmetic over the UNION
    # member set is exact
    "lastp_year": dict(
        dim="Time", mdx="LASTPERIODS(3, [Time].[Year].[1998])",
        sel_s=["year(l.l_shipdate) AS year"],
        sel_o=["year(o2.o_orderdate) AS year"],
        out=["year"], key="year",
        pred_s="year(l.l_shipdate) BETWEEN 1996 AND 1998",
        pred_o="year(o2.o_orderdate) BETWEEN 1996 AND 1998"),
    "lag_year": dict(
        dim="Time", mdx="[Time].[Year].[1998].Lag(2)",
        sel_s=["year(l.l_shipdate) AS year"],
        sel_o=["year(o2.o_orderdate) AS year"],
        out=["year"], key="year",
        pred_s="year(l.l_shipdate) = 1996",
        pred_o="year(o2.o_orderdate) = 1996"),
}

#: alias, per-side SQL aggregate, owning side
V_MEASURES = {
    "Revenue": ("revenue",
                "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
                "AS DECIMAL(25,6))) AS DOUBLE)", "s"),
    "Quantity": ("sum_qty",
                 "CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) "
                 "AS DOUBLE)", "s"),
    "Total Price": ("total_price",
                    "CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) "
                    "AS DOUBLE)", "o"),
    "Order Count": ("order_count", "COUNT(o2.o_orderkey)", "o"),
}

V_SLICERS = {
    "region2": ("[Customer].[Region].[&2]",
                ("cr.r_regionkey = 2", "cr.r_regionkey = 2"), "Customer"),
    "years": ("([Time].[Year].[1996]:[Time].[Year].[1998])",
              ("year(l.l_shipdate) BETWEEN 1996 AND 1998",
               "year(o2.o_orderdate) BETWEEN 1996 AND 1998"), "Time"),
}


@st.composite
def vmdx_specs(draw):
    atoms = draw(st.lists(st.sampled_from(sorted(V_ATOMS)),
                          min_size=1, max_size=2, unique=True))
    seen: set = set()
    atoms = [a for a in atoms
             if not (V_ATOMS[a]["dim"] in seen
                     or seen.add(V_ATOMS[a]["dim"]))]
    measures = draw(st.lists(st.sampled_from(sorted(V_MEASURES)),
                             min_size=1, max_size=3, unique=True))
    calc = draw(st.booleans())
    slicer = draw(st.sampled_from([None] + sorted(V_SLICERS)))
    wrapper = draw(st.sampled_from(
        [None, None, ("topcount", draw(st.integers(2, 6)),
                      draw(st.sampled_from(measures))),
         ("filter", draw(st.sampled_from(measures)),
          draw(st.sampled_from([0, 100, 5_000_000]))),
         ("order", draw(st.sampled_from(measures)),
          draw(st.booleans())),
         ("subset", draw(st.integers(0, 3)),
          draw(st.integers(2, 5)))]))
    # r14: DENSE (no NON EMPTY) drill-across — the fill enumerates the
    # axis member frames (UNION member sources for degenerate dims)
    # and left-joins the nonempty body; wrappers stay NON EMPTY (their
    # oracle semantics differ on dense axes)
    dense = wrapper is None and draw(st.booleans())
    return dict(atoms=atoms, measures=measures, calc=calc,
                slicer=slicer, wrapper=wrapper, dense=dense)


#: dense member-frame oracle per atom (canonical aliases); each entry =
#: (SQL, [conds]); the slicer appends its cond only when it restricts
#: the frame — i.e. when its level's columns ARE on the frame (a cut at
#: the axis's own level restricts the axis; a coarser/other-dim cut
#: constrains facts and leaves the dense axis full)
_V_YEAR_UNION = ("SELECT year FROM (SELECT DISTINCT year(l_shipdate) "
                 "AS year FROM lineitem UNION SELECT DISTINCT "
                 "year(o_orderdate) AS year FROM orders) ty")
V_MEM = {
    "region": ("SELECT r_regionkey AS cust_region_key, "
               "r_name AS cust_region FROM region", []),
    "nation_set": ("SELECT n_nationkey AS cust_nation_key, "
                   "n_name AS cust_nation FROM nation "
                   "WHERE n_nationkey IN (3, 7, 21)", []),
    "desc_nation": ("SELECT n_nationkey AS cust_nation_key, "
                    "n_name AS cust_nation FROM nation "
                    "WHERE n_regionkey = 2", []),
    "year": (_V_YEAR_UNION, []),
    "lastp_year": (_V_YEAR_UNION, ["year BETWEEN 1996 AND 1998"]),
    "lag_year": (_V_YEAR_UNION, ["year = 1996"]),
}
#: slicer restriction ON THE FRAME, keyed (slicer, atom)
V_MEM_SLICER = {
    ("region2", "region"): "cust_region_key = 2",
    ("years", "year"): "year BETWEEN 1996 AND 1998",
    ("years", "lastp_year"): "year BETWEEN 1996 AND 1998",
    ("years", "lag_year"): "year = 1996",
}


def build_vmdx(spec) -> str:
    cols = [f"[Measures].[{m}]" for m in spec["measures"]]
    with_clause = ""
    if spec["calc"]:
        with_clause = ("WITH MEMBER [Measures].[Cross Ratio] AS "
                       "[Measures].[Revenue] / [Measures].[Total Price] ")
        cols.append("[Measures].[Cross Ratio]")
    axis = " * ".join(V_ATOMS[a]["mdx"] for a in spec["atoms"])
    if spec["wrapper"] and spec["wrapper"][0] == "topcount":
        _, n, m = spec["wrapper"]
        axis = f"TOPCOUNT({axis}, {n}, [Measures].[{m}])"
    elif spec["wrapper"] and spec["wrapper"][0] == "filter":
        _, m, v = spec["wrapper"]
        axis = f"FILTER({axis}, [Measures].[{m}] > {v})"
    elif spec["wrapper"] and spec["wrapper"][0] == "order":
        _, m, desc = spec["wrapper"]
        axis = (f"ORDER({axis}, [Measures].[{m}], "
                f"{'BDESC' if desc else 'BASC'})")
    elif spec["wrapper"] and spec["wrapper"][0] == "subset":
        _, off, n = spec["wrapper"]
        axis = f"SUBSET({axis}, {off}, {n})"
    ne = "" if spec.get("dense") else "NON EMPTY "
    mdx = (f"{with_clause}SELECT {{{', '.join(cols)}}} ON COLUMNS, "
           f"{ne}{axis} ON ROWS FROM [Orders and Sales]")
    if spec["slicer"]:
        mdx += f" WHERE ({V_SLICERS[spec['slicer']][0]})"
    return mdx


def build_voracle(spec) -> str:
    atoms = [V_ATOMS[a] for a in spec["atoms"]]
    outs = [c for a in atoms for c in a["out"]]
    need = list(spec["measures"])
    if spec["calc"]:
        for r in ("Revenue", "Total Price"):
            if r not in need:
                need.append(r)
    sides = {V_MEASURES[m][2] for m in need}
    preds = {"s": [a["pred_s"] for a in atoms if a["pred_s"]],
             "o": [a["pred_o"] for a in atoms if a["pred_o"]]}
    if spec["slicer"]:
        ps, po = V_SLICERS[spec["slicer"]][1]
        preds["s"].append(ps)
        preds["o"].append(po)

    def side_sql(side: str) -> str:
        sel = [c for a in atoms
               for c in (a["sel_s"] if side == "s" else a["sel_o"])]
        meas = [f"{V_MEASURES[m][1]} AS {V_MEASURES[m][0]}"
                for m in need if V_MEASURES[m][2] == side]
        star = S_STAR_V if side == "s" else O_STAR_V
        where = (" WHERE " + " AND ".join(preds[side])
                 if preds[side] else "")
        return (f"SELECT {', '.join(sel + meas)} {star}{where} "
                f"GROUP BY {', '.join(outs)}")

    aliases = {m: V_MEASURES[m][0] for m in need}
    if sides == {"s", "o"}:
        s_alias = [aliases[m] for m in need if V_MEASURES[m][2] == "s"]
        o_alias = [aliases[m] for m in need if V_MEASURES[m][2] == "o"]
        join = " AND ".join(
            f"s.{k} IS NOT DISTINCT FROM o.{k}" for k in outs)
        body = (f"WITH s AS ({side_sql('s')}), o AS ({side_sql('o')}) "
                f"SELECT "
                + ", ".join(f"COALESCE(s.{k}, o.{k}) AS {k}"
                            for k in outs)
                + "".join(f", s.{a}" for a in s_alias)
                + "".join(f", o.{a}" for a in o_alias)
                + f" FROM s FULL OUTER JOIN o ON {join}")
    else:
        body = side_sql(sides.pop())
    if spec.get("dense"):
        # dense fill: cross-join the axis member frames (UNION member
        # sources for the degenerate Time atoms), LEFT JOIN the
        # nonempty drill-across body; the inline calc computes (to
        # null) on filled tuples too
        mems = []
        for i, akey in enumerate(spec["atoms"]):
            msql, conds = V_MEM[akey]
            conds = list(conds)
            sl = V_MEM_SLICER.get((spec["slicer"], akey))
            if sl:
                conds.append(sl)
            where = (" WHERE " + " AND ".join(conds)) if conds else ""
            mems.append(f"(SELECT * FROM ({msql}) m{i}{where}) mem{i}")
        mem_inner = " CROSS JOIN ".join(mems)
        final_d = [f"mem.{k} AS {k}" for k in outs] + \
                  [f"b.{aliases[m]} AS {aliases[m]}"
                   for m in spec["measures"]]
        if spec["calc"]:
            final_d.append("b.revenue / b.total_price AS cross_ratio")
        on = " AND ".join(f"mem.{k} = b.{k}" for k in outs)
        return (f"SELECT {', '.join(final_d)} FROM "
                f"(SELECT * FROM {mem_inner}) mem "
                f"LEFT JOIN ({body}) b ON {on}")
    final = [*outs] + [aliases[m] for m in spec["measures"]]
    if spec["calc"]:
        final.append("revenue / total_price AS cross_ratio")
    sql = f"SELECT {', '.join(final)} FROM ({body})"
    order_terms, limit, offset = [], None, 0
    if spec["wrapper"] and spec["wrapper"][0] == "filter":
        _, m, v = spec["wrapper"]
        sql += f" WHERE {aliases[m]} > {v}"
    elif spec["wrapper"] and spec["wrapper"][0] == "topcount":
        _, n, m = spec["wrapper"]
        order_terms = [f"{aliases[m]} DESC"] + list(outs)
        limit = n
    elif spec["wrapper"] and spec["wrapper"][0] == "order":
        # ORDER doesn't limit, so canon()'s row sort makes the compare
        # order-insensitive — the wrapper exercises the virtual ORDER
        # stage for 500s/row-set changes, not display order
        pass
    elif spec["wrapper"] and spec["wrapper"][0] == "subset":
        # SUBSET applies to the HIERARCHICAL total order (the engine's
        # default axis order = key aliases ascending)
        _, offset, n = spec["wrapper"]
        order_terms = list(outs)
        limit = n
    if order_terms:
        sql += " ORDER BY " + ", ".join(order_terms)
    if limit is not None:
        sql += f" LIMIT {limit} OFFSET {offset}"
    return sql


@settings(max_examples=60, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(spec=vmdx_specs())
def test_random_virtual_mdx_matches_drill_across_oracle(
        spark, sf_dir, duck, spec):
    mdx = build_vmdx(spec)
    got = execute_mdx(spark, sf_dir, tpch.CATALOG, mdx).toPandas()
    exp = duck.execute(build_voracle(spec)).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), \
        f"columns {sorted(got.columns)} != {sorted(exp.columns)}\n{mdx}"
    assert len(got) == len(exp), \
        f"rows {len(got)} != {len(exp)}\n{mdx}\n{build_voracle(spec)}"
    a, b = canon(got), canon(exp)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) |
                  ((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs()))
        else:
            ok = (av.isna() & bv.isna()) | (av.astype(object) ==
                                            bv.astype(object))
        assert bool(ok.all()), (
            f"col {c} mismatch at row {int((~ok).idxmax())}: "
            f"spark={av[(~ok).idxmax()]!r} duck={bv[(~ok).idxmax()]!r}\n"
            f"{mdx}\n{build_voracle(spec)}")

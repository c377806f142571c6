"""Property-based REST→oracle fuzzing (round-6 advice item 4).

Hypothesis generates random valid QueryModels over the Sales cube —
cuts × drilldowns × measures × HAVING/ORDER/LIMIT — and every case is
value-compared against an independently *generated* DuckDB SQL oracle
over the same star schema.  This hunts planner edge cases the fixed
70-query list can't (reference analog: the invariant-style specs in
api_spec.rb:312-425, which fuzz parameter combinations by hand).

The oracle generator is deliberately naive: one flat star join + plain
GROUP BY/HAVING/ORDER BY.  TPC-H foreign keys are complete, so inner
joins never change multiplicity, making the naive SQL semantically
exact for every generated query.

derandomize=True keeps the 200-case corpus stable run-to-run (CI
record, not a moving target); bump max_examples locally to hunt.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mondrian_rest_spark import tpch
from mondrian_rest_spark.planner import aggregate
from mondrian_rest_spark.query import QueryModel

# --- the generated surface -------------------------------------------------

# drillable levels: name -> (select exprs, output aliases, key alias)
STAR = """
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region cr  ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN region sr  ON sn.n_regionkey = sr.r_regionkey
    JOIN part p     ON l.l_partkey = p.p_partkey
"""

DRILLS = {
    "Customer.Region": (
        ["cr.r_regionkey AS cust_region_key", "cr.r_name AS cust_region"],
        ["cust_region_key", "cust_region"], "cust_region_key"),
    "Customer.Nation": (
        ["cn.n_nationkey AS cust_nation_key", "cn.n_name AS cust_nation"],
        ["cust_nation_key", "cust_nation"], "cust_nation_key"),
    "Supplier.Region": (
        ["sr.r_regionkey AS supp_region_key", "sr.r_name AS supp_region"],
        ["supp_region_key", "supp_region"], "supp_region_key"),
    "Part.Brand": (["p.p_brand AS p_brand"], ["p_brand"], "p_brand"),
    "Time.Year": (["year(l.l_shipdate) AS year"], ["year"], "year"),
    "Time.Month": (["month(l.l_shipdate) AS month"], ["month"], "month"),
    "Return Flag": (["l.l_returnflag AS l_returnflag"], ["l_returnflag"],
                    "l_returnflag"),
    "Line Status": (["l.l_linestatus AS l_linestatus"], ["l_linestatus"],
                    "l_linestatus"),
}

REV = "CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(25,6))) AS DOUBLE)"
QTY = "CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)"
PRICE = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)"
CNT = "COUNT(l_linenumber)"

# measure name -> (alias, aggregate SQL)
MEASURES = {
    "Revenue": ("revenue", REV),
    "Quantity": ("sum_qty", QTY),
    "Line Count": ("line_count", CNT),
    "Max Quantity": ("max_qty", "MAX(l_quantity)"),
    "Avg Discount": ("avg_disc", "AVG(l_discount)"),
    "Customer Count": ("customer_count", "COUNT(DISTINCT o_custkey)"),
    "Avg Price": ("avg_price", f"{PRICE} / {CNT}"),   # calc member
}
HAVING_MEASURES = ["Revenue", "Quantity", "Line Count", "Max Quantity"]

# cut string -> (SQL predicate, dimension, level index) — level index
# lets the generator drop cuts that would make a drilled level an
# ascendant of the cut (a documented 400, api_spec.rb:154-157)
CUTS = {
    "[Customer].[Region].[&2]": ("cr.r_regionkey = 2", "Customer", 0),
    "{[Customer].[Nation].[&3],[Customer].[Nation].[&7],"
    "[Customer].[Nation].[&21]}": (
        "cn.n_nationkey IN (3, 7, 21)", "Customer", 1),
    "([Time].[Year].[1994]:[Time].[Year].[1996])": (
        "year(l.l_shipdate) BETWEEN 1994 AND 1996", "Time", 0),
    "[Return Flag].[Return Flag].[&R]": ("l.l_returnflag = 'R'",
                                         "Return Flag", 0),
    "[Line Status].[Line Status].[&F]": ("l.l_linestatus = 'F'",
                                         "Line Status", 0),
}

DRILL_DIM_LEVEL = {  # drilldown -> (dimension, level index)
    "Customer.Region": ("Customer", 0), "Customer.Nation": ("Customer", 1),
    "Supplier.Region": ("Supplier", 0), "Part.Brand": ("Part", 0),
    "Time.Year": ("Time", 0), "Time.Month": ("Time", 2),
    "Return Flag": ("Return Flag", 0), "Line Status": ("Line Status", 0),
}


@st.composite
def query_models(draw):
    drills = draw(st.lists(st.sampled_from(sorted(DRILLS)),
                           min_size=0, max_size=3, unique=True))
    # one level per dimension keeps the naive oracle exact
    seen_dims = set()
    drills = [d for d in drills
              if not (DRILL_DIM_LEVEL[d][0] in seen_dims
                      or seen_dims.add(DRILL_DIM_LEVEL[d][0]))]
    measures = draw(st.lists(st.sampled_from(sorted(MEASURES)),
                             min_size=1, max_size=4, unique=True))
    cuts = draw(st.lists(st.sampled_from(sorted(CUTS)),
                         min_size=0, max_size=2, unique=True))
    # drop cuts whose level is BELOW a drilled level of the same
    # hierarchy (drilling an ascendant of the cut is a 400)
    cuts = [c for c in cuts
            if not any(dim == DRILL_DIM_LEVEL[d][0]
                       and DRILL_DIM_LEVEL[d][1] < lvl
                       for d in drills
                       for dim, lvl in [CUTS[c][1:]] )]
    # at most one cut per dimension (two cuts on one dim AND together
    # in both engines, but keep the space orthogonal)
    seen = set()
    cuts = [c for c in cuts
            if not (CUTS[c][1] in seen or seen.add(CUTS[c][1]))]

    having = None
    if draw(st.booleans()):
        having = (draw(st.sampled_from(HAVING_MEASURES)),
                  draw(st.sampled_from([">", ">=", "<", "<="])),
                  draw(st.sampled_from([0, 100, 10_000, 5_000_000])))
    order = None
    if draw(st.booleans()):
        candidates = list(MEASURES)
        candidates += [DRILLS[d][2] for d in drills]
        order = (draw(st.sampled_from(candidates)), draw(st.booleans()))
    limit = draw(st.sampled_from([None, 1, 3, 10]))
    offset = draw(st.sampled_from([0, 2])) if limit else 0
    # LIMIT/OFFSET without a total order is engine-dependent: the
    # planner's default orderBy(key aliases) is total, so only require
    # drills when limiting
    if limit is not None and not drills:
        limit, offset = None, 0
    return dict(drilldown=drills, measures=measures, cut=cuts,
                having=having, order=order, limit=limit, offset=offset)


def oracle_sql(spec) -> str:
    sel, aliases = [], []
    for d in spec["drilldown"]:
        exprs, outs, _ = DRILLS[d]
        sel += exprs
        aliases += outs
    msel = [f"{MEASURES[m][1]} AS {MEASURES[m][0]}" for m in spec["measures"]]
    sql = "SELECT " + ", ".join(sel + msel) + STAR
    if spec["cut"]:
        sql += " WHERE " + " AND ".join(CUTS[c][0] for c in spec["cut"])
    if sel:
        sql += " GROUP BY " + ", ".join(a for a in aliases)
    if spec["having"]:
        m, op, v = spec["having"]
        sql += f" HAVING {MEASURES[m][1]} {op} {v}"
    key_aliases = [DRILLS[d][2] for d in spec["drilldown"]]
    order_terms = []
    if spec["order"]:
        key, desc = spec["order"]
        expr = MEASURES[key][1] if key in MEASURES else key
        ocol = MEASURES[key][0] if key in MEASURES else key
        order_terms.append(expr + (" DESC" if desc else ""))
        order_terms += [a for a in key_aliases if a != ocol]
    elif key_aliases:
        order_terms = list(key_aliases)
    if order_terms:
        sql += " ORDER BY " + ", ".join(order_terms)
    if spec["limit"] is not None:
        sql += f" LIMIT {spec['limit']} OFFSET {spec['offset']}"
    return sql


def to_query_model(spec) -> QueryModel:
    kw = dict(cube="Sales", measures=list(spec["measures"]),
              drilldown=list(spec["drilldown"]), cut=list(spec["cut"]),
              nonempty=True)
    if spec["having"]:
        m, op, v = spec["having"]
        kw["filter"] = [f"{m} {op} {v}"]
    if spec["order"]:
        key, desc = spec["order"]
        kw["order"], kw["order_desc"] = key, desc
    if spec["limit"] is not None:
        kw["limit"], kw["offset"] = spec["limit"], spec["offset"]
    return QueryModel(**kw)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Row-align for comparison.  Sort by NON-float columns first (the
    group keys — unique per row), floats last: engines differ in the
    last ulp of averages, so a float-primary sort would misalign rows
    that are in fact equal."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "M":
            # DuckDB DATE -> datetime64[ns]; Spark DateType ->
            # datetime.date objects.  Normalize to date so equality
            # and sort order line up.
            df[c] = df[c].dt.date
    by = sorted(df.columns, key=lambda c: (df[c].dtype.kind == "f", c))
    return df.sort_values(by=by, ignore_index=True)


@settings(max_examples=200, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(spec=query_models())
def test_random_query_matches_generated_oracle(spark, sf_dir, duck, spec):
    got = aggregate(spark, sf_dir, tpch.CATALOG,
                    to_query_model(spec)).toPandas()
    exp = duck.execute(oracle_sql(spec)).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), \
        f"columns {sorted(got.columns)} != {sorted(exp.columns)}\n{spec}"
    assert len(got) == len(exp), \
        f"rows {len(got)} != {len(exp)}\n{spec}\n{oracle_sql(spec)}"
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
            f"{spec}\n{oracle_sql(spec)}")


def test_fuzz_corpus_is_large_enough():
    """The advice's done-bar: 200+ generated cases; settings above pin
    max_examples=200 (derandomized), so the corpus size is explicit."""
    s = test_random_query_matches_generated_oracle._hypothesis_internal_use_settings
    assert s.max_examples >= 200


# --- dense-axes fuzz (nonempty=false; the densify path) --------------------
# Fixed q17/q25 were the only dense coverage; this fuzzes member-frame
# cross-joins x cuts x sparse against a generated oracle.  Semantics
# mirrored (planner._densify): a cut at a DRILLED level restricts both
# the axis member frame and the facts; a cut on a non-drilled dim
# restricts facts only (the axis stays full, cells go null); sparse
# drops rows where every measure is null.

D_REGION_MEMBERS = ("SELECT DISTINCT r_regionkey AS {k}, r_name AS {c} "
                    "FROM {root} JOIN nation ON {fk} = n_nationkey "
                    "JOIN region ON n_regionkey = r_regionkey")

DENSE_ATOMS = {
    "cust_region": dict(
        dim="Customer", drill="Customer.Region",
        members=D_REGION_MEMBERS.format(
            k="cust_region_key", c="cust_region", root="customer",
            fk="c_nationkey"),
        sel="cr.r_regionkey AS cust_region_key",
        out=["cust_region_key", "cust_region"], key="cust_region_key"),
    "supp_region": dict(
        dim="Supplier", drill="Supplier.Region",
        members=D_REGION_MEMBERS.format(
            k="supp_region_key", c="supp_region", root="supplier",
            fk="s_nationkey"),
        sel="sr.r_regionkey AS supp_region_key",
        out=["supp_region_key", "supp_region"], key="supp_region_key"),
    "lstatus": dict(
        dim="Line Status", drill="Line Status",
        members="SELECT DISTINCT l_linestatus FROM lineitem",
        sel="l.l_linestatus AS l_linestatus",
        out=["l_linestatus"], key="l_linestatus"),
    "rflag": dict(
        dim="Return Flag", drill="Return Flag",
        members="SELECT DISTINCT l_returnflag FROM lineitem",
        sel="l.l_returnflag AS l_returnflag",
        out=["l_returnflag"], key="l_returnflag"),
    "year": dict(
        dim="Time", drill="Time.Year",
        members="SELECT DISTINCT year(l_shipdate) AS year FROM lineitem",
        sel="year(l.l_shipdate) AS year",
        out=["year"], key="year"),
}

# cut -> (REST cut string, SQL pred on the star, dim, member-frame pred)
DENSE_CUTS = {
    "cust_region2": ("[Customer].[Region].[&2]", "cr.r_regionkey = 2",
                     "Customer", "cust_region_key = 2"),
    "rflag_R": ("[Return Flag].[Return Flag].[&R]", "l.l_returnflag = 'R'",
                "Return Flag", "l_returnflag = 'R'"),
    "year_range": ("([Time].[Year].[1996]:[Time].[Year].[1998])",
                   "year(l.l_shipdate) BETWEEN 1996 AND 1998", "Time",
                   "year BETWEEN 1996 AND 1998"),
}

DENSE_MEASURES = ["Revenue", "Line Count", "Max Quantity"]


@st.composite
def dense_specs(draw):
    atoms = draw(st.lists(st.sampled_from(sorted(DENSE_ATOMS)),
                          min_size=1, max_size=2, unique=True))
    seen = set()
    atoms = [a for a in atoms
             if not (DENSE_ATOMS[a]["dim"] in seen
                     or seen.add(DENSE_ATOMS[a]["dim"]))]
    cuts = draw(st.lists(st.sampled_from(sorted(DENSE_CUTS)),
                         min_size=0, max_size=2, unique=True))
    seen_c = set()
    cuts = [c for c in cuts
            if not (DENSE_CUTS[c][2] in seen_c
                    or seen_c.add(DENSE_CUTS[c][2]))]
    measures = draw(st.lists(st.sampled_from(DENSE_MEASURES),
                             min_size=1, max_size=2, unique=True))
    return dict(atoms=atoms, cuts=cuts, measures=measures,
                sparse=draw(st.booleans()))


def dense_oracle_sql(spec) -> str:
    frames, out_cols, key_cols = [], [], []
    for i, a in enumerate(spec["atoms"]):
        atom = DENSE_ATOMS[a]
        mf = atom["members"]
        for c in spec["cuts"]:
            _, _, cdim, mpred = DENSE_CUTS[c]
            if cdim == atom["dim"]:
                mf = f"SELECT * FROM ({mf}) WHERE {mpred}"
        frames.append(f"m{i} AS ({mf})")
        out_cols += [f"m{i}.{c}" for c in atom["out"]]
        key_cols.append((f"m{i}.{atom['key']}", atom["key"]))
    msel = [f"{MEASURES[m][1]} AS {MEASURES[m][0]}"
            for m in spec["measures"]]
    sels = ", ".join(DENSE_ATOMS[a]["sel"] for a in spec["atoms"])
    keys = ", ".join(DENSE_ATOMS[a]["key"] for a in spec["atoms"])
    agg = ("SELECT " + sels + ", " + ", ".join(msel) + STAR
           + (" WHERE " + " AND ".join(DENSE_CUTS[c][1]
                                       for c in spec["cuts"])
              if spec["cuts"] else "")
           + " GROUP BY " + keys)
    cross = " CROSS JOIN ".join(f"m{i}" for i in range(len(frames)))
    on = " AND ".join(f"a.{k} = {mk}" for mk, k in key_cols)
    maliases = [MEASURES[m][0] for m in spec["measures"]]
    sql = (f"WITH {', '.join(frames)}, agg AS ({agg}) "
           f"SELECT {', '.join(out_cols)}, "
           f"{', '.join('a.' + m for m in maliases)} "
           f"FROM {cross} LEFT JOIN agg a ON {on}")
    if spec["sparse"]:
        sql = (f"SELECT * FROM ({sql}) WHERE NOT ("
               + " AND ".join(f"{m} IS NULL" for m in maliases) + ")")
    return sql


@settings(max_examples=100, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(spec=dense_specs())
def test_dense_axes_match_generated_oracle(spark, sf_dir, duck, spec):
    qm = QueryModel(cube="Sales", measures=list(spec["measures"]),
                    drilldown=[DENSE_ATOMS[a]["drill"]
                               for a in spec["atoms"]],
                    cut=[DENSE_CUTS[c][0] for c in spec["cuts"]],
                    nonempty=False, sparse=spec["sparse"])
    got = aggregate(spark, sf_dir, tpch.CATALOG, qm).toPandas()
    exp = duck.execute(dense_oracle_sql(spec)).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), \
        f"columns {sorted(got.columns)} != {sorted(exp.columns)}\n{spec}"
    assert len(got) == len(exp), \
        f"rows {len(got)} != {len(exp)}\n{spec}\n{dense_oracle_sql(spec)}"
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
            f"col {c} mismatch: {spec}\n{dense_oracle_sql(spec)}")

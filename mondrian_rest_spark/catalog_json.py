"""Declarative catalog loader: bind a Catalog from a JSON document.

The reference binds schemas from XML files at connection time
(reference api_helpers.rb:10-16 `catalog` / `catalog_definition`
connection params; spec/spec_helper.rb:41-47).  The Spark-native
analog (SURVEY §1.4) is a JSON catalog validated against the actual
parquet ``df.schema`` — same separation of logical model from code,
minus the XML.

The JSON shape mirrors the :mod:`catalog` dataclasses one-to-one;
every dataclass field is accepted by its name, and aliases default to
a slug of the name so hand-written catalogs stay terse.  Example::

    {"name": "corpus",
     "cubes": [{
       "name": "Documents", "fact": "documents",
       "dimensions": [
         {"name": "Language", "hierarchies": [{"name": "Language",
            "levels": [{"name": "Language", "key": "lang"}]}]}],
       "measures": [
         {"name": "Doc Count", "agg": "count", "expr": "doc_id"},
         {"name": "Total Chars", "agg": "sum",
          "expr": "CAST(n_chars AS DECIMAL(25,6))",
          "result_cast": "double"}]}]}

``validate_catalog`` analysis-checks every expression against the real
parquet schemas (Catalyst resolution on an empty slice — no job runs),
so a typo'd column fails at bind time with the table/level named, not
mid-query.
"""

from __future__ import annotations

import json
import re

from .catalog import (
    Bridge,
    CalculatedMember,
    Catalog,
    Cube,
    Dimension,
    Hierarchy,
    Level,
    Measure,
    NamedSet,
    Property,
    VirtualCube,
)


class CatalogError(ValueError):
    """Malformed or schema-inconsistent catalog definition."""


def _slug(name: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", name.lower()).strip("_")


def _take(d: dict, what: str, required: tuple[str, ...],
          optional: tuple[str, ...]) -> dict:
    if not isinstance(d, dict):
        raise CatalogError(f"{what} must be an object, got {type(d).__name__}")
    missing = [k for k in required if k not in d]
    if missing:
        raise CatalogError(f"{what} is missing required keys {missing}")
    unknown = [k for k in d if k not in required + optional]
    if unknown:
        raise CatalogError(f"{what} has unknown keys {unknown} "
                           f"(allowed: {sorted(required + optional)})")
    return d


def _property(d: dict, where: str) -> Property:
    d = _take(d, f"property in {where}", ("name", "column"), ("alias",))
    return Property(name=d["name"], column=d["column"],
                    alias=d.get("alias") or _slug(d["name"]))


def _level(d: dict, where: str) -> Level:
    d = _take(d, f"level in {where}", ("name", "key"),
              ("key_alias", "caption", "caption_alias", "ordinal",
               "properties", "hide_member_if", "annotations",
               "keys_globally_unique"))
    caption = d.get("caption")
    return Level(
        name=d["name"], key=d["key"],
        key_alias=d.get("key_alias") or _slug(d["name"]) + "_key",
        caption=caption,
        caption_alias=(d.get("caption_alias") or
                       (_slug(d["name"]) if caption else None)),
        ordinal=d.get("ordinal"),
        properties=tuple(_property(p, f"level {d['name']!r}")
                         for p in d.get("properties", [])),
        hide_member_if=d.get("hide_member_if"),
        annotations=d.get("annotations", {}),
        keys_globally_unique=d.get("keys_globally_unique"))


def _hierarchy(d: dict, where: str) -> Hierarchy:
    d = _take(d, f"hierarchy in {where}", ("name", "levels"),
              ("has_all", "all_member_name"))
    if not d["levels"]:
        raise CatalogError(f"hierarchy {d['name']!r} has no levels")
    return Hierarchy(
        name=d["name"],
        levels=tuple(_level(lv, f"hierarchy {d['name']!r}")
                     for lv in d["levels"]),
        has_all=d.get("has_all", True),
        all_member_name=d.get("all_member_name"))


def _dimension(d: dict, cube: str) -> Dimension:
    d = _take(d, f"dimension in cube {cube!r}", ("name", "hierarchies"),
              ("tables", "fact_fk", "dim_pk", "bridge", "broadcastable",
               "time_dimension", "annotations"))
    tables = tuple(tuple(t) if len(t) == 3 else (t[0], None, None)
                   for t in d.get("tables", []))
    for t in tables:
        if len(t) != 3:
            raise CatalogError(
                f"dimension {d['name']!r}: each tables entry is "
                "[table, left_key, right_key] (keys null for the first)")
    if tables and not (d.get("fact_fk") and d.get("dim_pk")):
        raise CatalogError(
            f"table dimension {d['name']!r} needs fact_fk and dim_pk")
    return Dimension(
        name=d["name"],
        hierarchies=tuple(_hierarchy(h, f"dimension {d['name']!r}")
                          for h in d["hierarchies"]),
        tables=tables, fact_fk=d.get("fact_fk"), dim_pk=d.get("dim_pk"),
        bridge=d.get("bridge"),
        broadcastable=d.get("broadcastable", False),
        time_dimension=d.get("time_dimension", False),
        annotations=d.get("annotations", {}))


def _measure(d: dict, cube: str) -> Measure:
    d = _take(d, f"measure in cube {cube!r}", ("name", "agg", "expr"),
              ("alias", "bridge", "format_string", "result_cast",
               "annotations"))
    if d.get("agg") == "hll_sketch":
        # internal-only aggregator (rollup layouts persist it next to
        # approx_count_distinct measures); a user-declared sketch
        # measure would put raw binary sketches in query results
        raise CatalogError(
            f"measure {d.get('name')!r}: 'hll_sketch' is internal; "
            "declare 'approx_count_distinct' and let rollup layouts "
            "manage the sketch columns")
    try:
        return Measure(
            name=d["name"], alias=d.get("alias") or _slug(d["name"]),
            agg=d["agg"], expr=d["expr"], bridge=d.get("bridge"),
            format_string=d.get("format_string"),
            result_cast=d.get("result_cast"),
            annotations=d.get("annotations", {}))
    except ValueError as e:   # bad aggregator -> bind-time error
        raise CatalogError(str(e))


def _calc_member(d: dict, cube: str) -> CalculatedMember:
    d = _take(d, f"calc_member in cube {cube!r}", ("name",),
              ("alias", "expr", "lag_of", "lag_dim", "lag_n", "lag_level"))
    if bool(d.get("expr")) == bool(d.get("lag_of")):
        raise CatalogError(
            f"calc_member {d['name']!r} needs exactly one of expr / "
            "lag_of(+lag_dim)")
    return CalculatedMember(
        name=d["name"], alias=d.get("alias") or _slug(d["name"]),
        expr=d.get("expr"), lag_of=d.get("lag_of"), lag_dim=d.get("lag_dim"),
        lag_n=d.get("lag_n", 1), lag_level=d.get("lag_level"))


def _formula_calc(d: dict, cube: str) -> tuple[str, str]:
    """A calc member declared as an MDX ``formula`` — the reference
    XML form (``<CalculatedMember formula="[Measures].[A] -
    [Measures].[B]">``, foodmart.xml:345-366).  Parsed and resolved
    against the finished cube (the grammar is exactly the WITH MEMBER
    body grammar); the member's alias is the name slug, like inline
    members."""
    d = _take(d, f"calc_member in cube {cube!r}", ("name", "formula"),
              ("annotations",))
    return d["name"], d["formula"]


def _named_set(d: dict, cube: str) -> NamedSet:
    d = _take(d, f"named_set in cube {cube!r}",
              ("name", "dimension", "level", "top_by", "k"),
              ("ascending", "annotations"))
    return NamedSet(name=d["name"], dimension=d["dimension"],
                    level=d["level"], top_by=d["top_by"], k=int(d["k"]),
                    ascending=d.get("ascending", False),
                    annotations=d.get("annotations", {}))


def _bridge(d: dict, cube: str) -> Bridge:
    d = _take(d, f"bridge in cube {cube!r}",
              ("name", "table", "fact_key", "bridge_key", "provides"), ())
    return Bridge(name=d["name"], table=d["table"], fact_key=d["fact_key"],
                  bridge_key=d["bridge_key"], provides=tuple(d["provides"]))


def _cube(d: dict) -> Cube:
    d = _take(d, "cube", ("name", "fact", "dimensions", "measures"),
              ("bridges", "calc_members", "named_sets", "annotations"))
    if not d["measures"]:
        raise CatalogError(f"cube {d['name']!r} has no measures")
    calc_defs = d.get("calc_members", [])
    plain = [x for x in calc_defs if "formula" not in x]
    formulas = [_formula_calc(x, d["name"])
                for x in calc_defs if "formula" in x]
    cube = Cube(
        name=d["name"], fact=d["fact"],
        dimensions=tuple(_dimension(x, d["name"]) for x in d["dimensions"]),
        measures=tuple(_measure(x, d["name"]) for x in d["measures"]),
        bridges=tuple(_bridge(x, d["name"]) for x in d.get("bridges", [])),
        calc_members=tuple(_calc_member(x, d["name"]) for x in plain),
        named_sets=tuple(_named_set(x, d["name"])
                         for x in d.get("named_sets", [])),
        annotations=d.get("annotations", {}))
    if formulas:
        # MDX formulas resolve against the finished cube through the
        # same machinery posted WITH MEMBER uses, so every form the
        # grammar accepts (arith/IIF, tuples, time shifts, set
        # aggregates, RANK) is declarable; bad formulas are bind-time
        # CatalogErrors, not query-time surprises
        from .mdx import formula_template
        from .parser import ParseError
        from .planner import _inline_calcs
        try:
            cube = _inline_calcs(
                cube, [(n, formula_template(f)) for n, f in formulas])
        except ParseError as e:
            raise CatalogError(
                f"cube {d['name']!r} calc_member formula: {e}") from e
    for dim in cube.dimensions:
        if dim.bridge:
            cube.bridge(dim.bridge)   # KeyError -> undefined bridge
    for ns in cube.named_sets:
        dim = cube.dimension(ns.dimension)
        dim.default_hierarchy().level(ns.level)
        cube.measure(ns.top_by)
    return cube


def _virtual_cube(d: dict, cubes: tuple[Cube, ...]) -> VirtualCube:
    d = _take(d, "virtual_cube",
              ("name", "cube_names", "conformed_dimensions"), ())
    names = {c.name for c in cubes}
    for n in d["cube_names"]:
        if n not in names:
            raise CatalogError(
                f"virtual_cube {d['name']!r} references unknown cube {n!r}")
    return VirtualCube(name=d["name"], cube_names=tuple(d["cube_names"]),
                       conformed_dimensions=tuple(d["conformed_dimensions"]))


def catalog_from_json(source) -> Catalog:
    """Build a :class:`Catalog` from a JSON file path, JSON string, or
    already-parsed dict.  Raises :class:`CatalogError` (a ValueError)
    on any structural problem — unknown keys, missing fields, bad
    aggregators, dangling bridge/measure references."""
    if isinstance(source, dict):
        doc = source
    else:
        s = str(source)
        if s.lstrip().startswith("{"):
            doc = json.loads(s)
        else:
            with open(s) as f:
                doc = json.load(f)
    doc = _take(doc, "catalog", ("name", "cubes"), ("virtual_cubes",))
    if not doc["cubes"]:
        raise CatalogError("catalog has no cubes")
    try:
        cubes = tuple(_cube(c) for c in doc["cubes"])
        vcubes = tuple(_virtual_cube(v, cubes)
                       for v in doc.get("virtual_cubes", []))
    except KeyError as e:   # dangling reference from a dataclass lookup
        raise CatalogError(str(e))
    return Catalog(name=doc["name"], cubes=cubes, virtual_cubes=vcubes)


def validate_catalog(spark, sf_dir: str, cat: Catalog) -> None:
    """Analysis-check every physical binding against the real parquet
    schemas: tables exist, join keys exist, every level/property/
    measure expression resolves.  Pure Catalyst analysis on a LIMIT 0
    slice — no job runs, so this is cheap enough for attach time."""
    from .sources.registry import load_table

    def frame(table: str, what: str):
        try:
            return load_table(spark, sf_dir, table).limit(0)
        except Exception as e:
            raise CatalogError(f"{what}: cannot read table {table!r}: {e}")

    def check_exprs(df, exprs: list[str], what: str):
        for e in exprs:
            try:
                df.selectExpr(e)
            except Exception as exc:
                raise CatalogError(
                    f"{what}: expression {e!r} does not resolve: "
                    f"{getattr(exc, 'desc', exc)}") from None

    for cube in cat.cubes:
        fact = frame(cube.fact, f"cube {cube.name!r}")
        for b in cube.bridges:
            bt = frame(b.table, f"bridge {b.name!r}")
            check_exprs(bt, [b.bridge_key, *b.provides],
                        f"bridge {b.name!r}")
            check_exprs(fact, [b.fact_key], f"bridge {b.name!r} fact key")
            fact = fact.join(bt.selectExpr(b.bridge_key, *b.provides),
                             fact[b.fact_key] == bt[b.bridge_key], "left")
        for dim in cube.dimensions:
            where = f"dimension {dim.name!r} of cube {cube.name!r}"
            if dim.is_degenerate:
                target = fact
            else:
                target = frame(dim.tables[0][0], where)
                for t, lk, rk in dim.tables[1:]:
                    nxt = frame(t, where)
                    check_exprs(target, [lk], where)
                    check_exprs(nxt, [rk], where)
                    target = target.join(nxt, target[lk] == nxt[rk], "left")
                check_exprs(target, [dim.dim_pk], where)
                check_exprs(fact, [dim.fact_fk], where + " fact_fk")
            for h in dim.hierarchies:
                for lv in h.levels:
                    exprs = [lv.key, lv.ordinal_expr]
                    if lv.caption:
                        exprs.append(lv.caption)
                    exprs += [p.column for p in lv.properties]
                    check_exprs(target, exprs,
                                f"{where} level {lv.name!r}")
        for m in cube.measures:
            check_exprs(fact, [m.expr], f"measure {m.name!r}")

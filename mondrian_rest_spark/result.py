"""Result shaping: tidy long-format rows and the aggregation-JSON
contract.

Analog of the reference's Result#to_h (mondrian_ext.rb:228-287) and
tidy() (api_formatters.rb:10-78).  Key inversion vs the reference: a
Spark aggregate is *already* tidy (one row per axis tuple), so tidy
output is a column relabeling, and the axes/values cell matrix is
*derived* from tidy rows at the driver — the reverse of Mondrian,
which produces a cell matrix first and tidies it after.
"""

from __future__ import annotations

from typing import Any

from .catalog import Catalog, Cube
from .parser import parse_drilldown
from .planner import (ResolvedDrill, _resolve_drill, _split_measures,
                      prop_group_aliases, resolved_props)
from .query import QueryModel


def resolved_drills(cube: Cube, qm: QueryModel) -> list[ResolvedDrill]:
    drills = []
    ns_names = {s.name for s in cube.named_sets}
    for d in qm.drilldown:
        parsed = parse_drilldown(d, ns_names)
        if isinstance(parsed, str):
            ns = cube.named_set(parsed)
            from .planner import _resolve_level
            dim, hier, level = _resolve_level(cube, ns.dimension, None, ns.level)
            idx = hier.level_index(level.name)
            gl = list(hier.levels[: idx + 1]) if qm.parents else [level]
            drills.append(ResolvedDrill(dim, hier, level, gl))
        else:
            drills.append(_resolve_drill(cube, parsed, qm.parents))
    return drills


def tidy_header(cat: Catalog, qm: QueryModel) -> list[str]:
    """Reference-layout header (api_formatters.rb:31-56; golden shapes
    api_spec.rb:208/214/235/241): per drill level `ID <Level>, <Level>`
    (ancestors first when parents=true), then properties, then measure
    display names."""
    cube = cat.cube(qm.cube)
    header: list[str] = []
    drills = resolved_drills(cube, qm)
    for rd in drills:
        for lv in rd.group_levels:
            header.append(f"ID {lv.name}")
            if lv.caption_alias and lv.caption_alias != lv.key_alias:
                header.append(lv.name)
    needed_props = resolved_props(cube, qm.properties)
    kept = set(prop_group_aliases(drills, needed_props))
    for plist in needed_props.values():
        for p in plist:
            if p.alias in kept:
                header.append(p.name)
                kept.discard(p.alias)  # planner emits each column once
    _, _, aliases = _split_measures(cube, list(qm.measures))
    alias_to_name = {m.alias: m.name for m in cube.measures}
    alias_to_name.update({c.alias: c.name for c in cube.calc_members})
    header += [alias_to_name.get(a, a) for a in aliases]
    return header


def tidy_rows(df_rows: list, header: list[str]) -> list[list]:
    """Collected Row objects -> plain lists (column order is already
    the tidy order by planner construction)."""
    return [list(r) for r in df_rows]


def to_aggregation_result(cat: Catalog, qm: QueryModel, rows: list) -> dict[str, Any]:
    """The axes/values contract (mondrian_ext.rb:228-287): measure axis
    first (axis 0), one axis per drilldown, values as a dense nested
    array indexed [i_axis1][i_axis2]...[i_measure], nulls for empty
    cells.

    NOTE: the reference lays cells out column-major with a tuple
    transpose (mondrian_ext.rb:250-256); we document row-major nesting
    (axis order = drilldown order) — same information, simpler
    contract, and the tidy/CSV surfaces are byte-compatible.
    """
    cube = cat.cube(qm.cube)
    drills = resolved_drills(cube, qm)
    _, _, aliases = _split_measures(cube, list(qm.measures))
    n_group_cols = sum(len(lv.out_cols()) for rd in drills for lv in rd.group_levels)
    # Count the property columns the planner actually EMITS (dedup of
    # aliases colliding with drill/caption columns or duplicate
    # requests) — len(qm.properties) over-counts in those cases and
    # shifts every measure in the values matrix (ADVICE r2).
    n_props = len(prop_group_aliases(drills, resolved_props(cube, qm.properties)))

    # per-axis distinct member tuples, ordered hierarchically by member
    # key (Mondrian orders axis tuples by member ordinal — SURVEY
    # §7.5.2; first-seen row order would be nondeterministic)
    axis_seen: list[set] = [set() for _ in drills]
    keyed_rows: dict[tuple, list] = {}
    for row in rows:
        vals = list(row)
        pos = 0
        key: list[tuple] = []
        for ai, rd in enumerate(drills):
            span = sum(len(lv.out_cols()) for lv in rd.group_levels)
            tup = tuple(vals[pos:pos + span])
            axis_seen[ai].add(tup)
            key.append(tup)
            pos += span
        keyed_rows[tuple(key)] = vals[pos + n_props:
                                      pos + n_props + len(aliases)]
    axis_captions: list[list] = [
        sorted(seen, key=lambda t: tuple((v is None, v) for v in t))
        for seen in axis_seen]

    def nest(prefix: tuple) -> Any:
        ai = len(prefix)
        if ai == len(drills):
            cells = keyed_rows.get(prefix)
            if cells is None:
                cells = [None] * len(aliases)
            return cells if len(aliases) > 1 else cells[0]
        return [nest(prefix + (tup,)) for tup in axis_captions[ai]]

    # cell_keys (mondrian_ext.rb:277-283): one entry per axis-tuple
    # combination in the same enumeration order as `values`, holding
    # the MEMBER_KEY of each drilldown's leaf-level member
    leaf_key_idx = []
    for rd in drills:
        pos = 0
        for lv in rd.group_levels[:-1]:
            pos += len(lv.out_cols())
        leaf_key_idx.append(pos)
    from itertools import product
    cell_keys = [
        [tups[ai][leaf_key_idx[ai]] for ai in range(len(drills))]
        for tups in product(*axis_captions)] if drills else []

    axes = [{"members": [
        {"name": cube.measure(m).name if cube.calc_member(m) is None else m,
         "caption": m} for m in (qm.measures or [cube.default_measure.name])]}]
    for ai, rd in enumerate(drills):
        axes.append({
            "dimension": rd.dimension.name,
            "hierarchy": rd.hierarchy.name,
            "level": rd.level.name,
            "members": [
                {"key": list(t), "caption": str(t[-1])} for t in axis_captions[ai]
            ],
        })
    return {
        "axes": axes,
        "cell_keys": cell_keys,
        "values": nest(()),
        "measure_aliases": aliases,
    }

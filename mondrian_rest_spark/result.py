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


def shaping_ctx(cat: Catalog, qm: QueryModel) -> tuple[Cube, list[str], dict]:
    """(cube-for-resolution, measure aliases, alias->display-name map)
    for result shaping.  For a virtual cube, drills/levels resolve
    against the FIRST base cube (dimensions are conformed by contract)
    and measures across all base cubes — previously every formatted
    surface 404'd on virtual cubes because shaping called cat.cube."""
    from .planner import _has_measure, _measure_alias

    vc = cat.virtual_cube(qm.cube)
    if vc is None:
        cube = cat.cube(qm.cube)
        _, _, aliases = _split_measures(cube, list(qm.measures))
        names = {m.alias: m.name for m in cube.measures}
        names.update({c.alias: c.name for c in cube.calc_members})
        return cube, aliases, names
    cubes = [cat.cube(n) for n in vc.cube_names]
    names = {}
    for cb in cubes:
        names.update({m.alias: m.name for m in cb.measures})
        names.update({c.alias: c.name for c in cb.calc_members})
    aliases = []
    for m in (list(qm.measures) or [cubes[0].default_measure.name]):
        for cb in cubes:
            if _has_measure(cb, m):
                aliases.append(_measure_alias(cb, m))
                break
        else:
            raise KeyError(f"measure {m!r} not in virtual cube {vc.name!r}")
    return cubes[0], aliases, names


def resolved_drills(cube: Cube, qm: QueryModel) -> list[ResolvedDrill]:
    """The axis drills the PLANNER will produce — including the levels
    the raw-MDX member idioms (.Children/.Siblings/.Parent/
    .FirstChild/OPENINGPERIOD/LASTPERIODS/.Lag) resolve to, in the
    planner's exact append order, so tidy headers and the aggregation
    JSON stay aligned with the DataFrame columns for every axis form
    (catalog-only level math; no member lookups here)."""
    from .parser import parse_segments
    from .planner import _resolve_level

    drills = []
    ns_names = {s.name for s in cube.named_sets}
    for d in qm.drilldown:
        parsed = parse_drilldown(d, ns_names)
        if isinstance(parsed, str):
            ns = cube.named_set(parsed)
            dim, hier, level = _resolve_level(cube, ns.dimension, None, ns.level)
            idx = hier.level_index(level.name)
            gl = list(hier.levels[: idx + 1]) if qm.parents else [level]
            drills.append(ResolvedDrill(dim, hier, level, gl))
        else:
            drills.append(_resolve_drill(cube, parsed, qm.parents))

    def _member_level(path: str):
        segs = parse_segments(path)
        hier_name = segs[1] if len(segs) == 4 else None
        return _resolve_level(cube, segs[0], hier_name, segs[-2])

    def _append(dim, hier, level, shift: int) -> None:
        idx = hier.level_index(level.name) + shift
        idx = max(0, min(idx, len(hier.levels) - 1))
        target = hier.levels[idx]
        gl = list(hier.levels[: idx + 1]) if qm.parents else [target]
        drills.append(ResolvedDrill(dim, hier, target, gl))

    # mirror _aggregate_cube's idiom order exactly: children ->
    # siblings -> edge-sibling -> edge-child/openingperiod -> parent ->
    # ancestor -> lastperiods -> periods-to-date -> lag/lead
    for ch in getattr(qm, "children_of", []):
        _append(*_member_level(ch), +1)
    for sb in getattr(qm, "siblings_of", []):
        _append(*_member_level(sb), 0)
    for sb_path, _last in getattr(qm, "edge_sibling_of", []):
        _append(*_member_level(sb_path), 0)
    for ec in getattr(qm, "edge_child_of", []):
        dim, hier, level = _member_level(ec[0])
        target_name = ec[2] if len(ec) > 2 else None
        if target_name is None:
            _append(dim, hier, level, +1)
        else:
            try:
                tgt_idx = hier.level_index(target_name)
            except KeyError:
                tgt_idx = hier.level_index(level.name) + 1
            _append(dim, hier, hier.levels[min(tgt_idx,
                                               len(hier.levels) - 1)], 0)
    for pp in getattr(qm, "parent_of", []):
        _append(*_member_level(pp), -1)
    for anc_path, target_name in getattr(qm, "ancestor_of", []):
        dim, hier, level = _member_level(anc_path)
        try:
            tgt_idx = hier.level_index(target_name)
        except (KeyError, ValueError):
            tgt_idx = hier.level_index(level.name)
        _append(dim, hier, hier.levels[tgt_idx], 0)
    for lp_path, _n in getattr(qm, "lastperiods", []):
        _append(*_member_level(lp_path), 0)
    for _anchor, m_path in getattr(qm, "periods_to_date", []):
        _append(*_member_level(m_path), 0)
    for lg_path, _n in getattr(qm, "member_lags", []):
        _append(*_member_level(lg_path), 0)
    if getattr(qm, "generate_top", None) is not None:
        # mirror the planner's GENERATE append (planner.py generate_top
        # block): the axis is the (parent, child) level pair — without
        # this, /mdx GENERATE shaped with zero drills and the cell
        # matrix collapsed to one scalar
        g_path = qm.generate_top[0]
        _, g_target = (getattr(qm, "generate_inner", None)
                       or ("measure", None))
        segs = g_path.split(".")
        hier_name = segs[1] if len(segs) == 3 else None
        dim, hier, level = _resolve_level(cube, segs[0], hier_name,
                                          segs[-1])
        idx = hier.level_index(level.name)
        try:                              # invalid targets 400 in the
            tgt_idx = (idx + 1 if g_target is None    # planner before
                       else hier.level_index(g_target))  # shaping
        except (KeyError, ValueError):
            tgt_idx = len(hier.levels)
        if idx < tgt_idx < len(hier.levels):
            child = hier.levels[tgt_idx]
            gl = (list(hier.levels[: tgt_idx + 1]) if qm.parents
                  else [level, child])
            drills.append(ResolvedDrill(dim, hier, child, gl))
    for ddl_spec, _ in getattr(qm, "gs_axes", []) or []:
        # mirror the planner's DRILLDOWNLEVEL/DRILLDOWNMEMBER append:
        # one (parent, child) grouping-sets pair per axis; parent
        # subtotal rows carry NULL child cells (trimmed in
        # _axis_member_hash)
        segs = ddl_spec.split(".")
        hier_name = segs[1] if len(segs) == 3 else None
        dim, hier, level = _resolve_level(cube, segs[0], hier_name,
                                          segs[-1])
        idx = hier.level_index(level.name)
        if idx + 1 < len(hier.levels):  # leaf 400s in the planner
            child = hier.levels[idx + 1]
            drills.append(ResolvedDrill(dim, hier, child,
                                        [level, child]))
    return drills


def tidy_header(cat: Catalog, qm: QueryModel) -> list[str]:
    """Reference-layout header (api_formatters.rb:31-56; golden shapes
    api_spec.rb:208/214/235/241): per drill level `ID <Level>, <Level>`
    (ancestors first when parents=true), then properties in request
    order (api_formatters.rb pnames), then measure display names."""
    cube, aliases, alias_to_name = shaping_ctx(cat, qm)
    header: list[str] = []
    drills = resolved_drills(cube, qm)
    for rd in drills:
        for lv in rd.group_levels:
            header.append(f"ID {lv.name}")
            if lv.caption_alias and lv.caption_alias != lv.key_alias:
                header.append(lv.name)
    prop_seq = resolved_props(cube, qm.properties)
    kept = set(prop_group_aliases(drills, prop_seq))
    for _, p in prop_seq:
        if p.alias in kept:
            header.append(p.name)
            kept.discard(p.alias)  # planner emits each column once
    header += [alias_to_name.get(a, a) for a in aliases]
    return header


def tidy_rows(df_rows: list, header: list[str]) -> list[list]:
    """Collected Row objects -> plain lists (column order is already
    the tidy order by planner construction)."""
    return [list(r) for r in df_rows]


def _axis_member_hash(rd: ResolvedDrill, tup: tuple,
                      prop_vals: dict | None,
                      level_props: dict | None,
                      trim_null_tail: bool = False) -> dict[str, Any]:
    """Reference axis-member hash (Member#to_h subset the aggregation
    JSON carries, mondrian_ext.rb:258-276): name/full_name/caption/key/
    level_name (+ ancestors when parents drilled them in, + properties
    when requested).  Properties attach to the hash of the LEVEL they
    belong to — an ancestor-level property appears inside that
    ancestor's hash, exactly like the reference walks
    ``member.ancestors`` in api_formatters.rb get_props."""
    parts = []       # (level, key, caption) along the drilled path
    pos = 0
    for lv in rd.group_levels:
        k = tup[pos]
        pos += 1
        if lv.caption and lv.caption_alias and lv.caption_alias != lv.key_alias:
            c = tup[pos]
            pos += 1
        else:
            c = k
        parts.append((lv, k, c))
    # a DRILLDOWNLEVEL parent-subtotal tuple carries NULL keys at the
    # drilled-down level: the member IS the deepest non-null ancestor
    # (Mondrian's mixed-depth axis hash).  Gated on the query actually
    # using DRILLDOWNLEVEL/DRILLDOWNMEMBER on THIS dimension (r10,
    # ADVICE r9) — a plain query whose deepest drilled level contains
    # a genuine NULL member key must NOT have that member silently
    # collapsed into its parent's hash.
    if trim_null_tail:
        while len(parts) > 1 and parts[-1][1] is None:
            parts.pop()

    def one(i: int) -> dict[str, Any]:
        lv, k, c = parts[i]
        names = [str(p[2]) for p in parts[: i + 1]]
        h = {
            "name": str(c),
            "full_name": ".".join(
                f"[{s}]" for s in [rd.dimension.name] + names),
            "caption": c,
            "key": k,
            "level_name": lv.name,
            "all_member?": False,
            "depth": rd.hierarchy.level_index(lv.name) +
                     (1 if rd.hierarchy.has_all else 0),
        }
        own = (level_props or {}).get(lv.name)
        if own and prop_vals is not None:
            h["properties"] = {name: prop_vals.get(alias)
                               for name, alias in own}
        return h

    m = one(len(parts) - 1)
    if len(parts) > 1:  # parents=true drilled the ancestors in
        m["ancestors"] = [one(i) for i in range(len(parts) - 2, -1, -1)]
    return m


def to_aggregation_result(cat: Catalog, qm: QueryModel, rows: list,
                          mdx: str | None = None,
                          source: str | None = None) -> dict[str, Any]:
    """The axes/values contract, reference layout (mondrian_ext.rb:
    228-287): measure axis first (axis 0), one axis per drilldown with
    unique members, then

    - ``values``: ONE FLAT LIST over the axis-tuple enumeration (the
      product of axis members, last drilldown varying fastest — the
      reference's single crossjoined ROWS axis), each cell a list of
      per-measure values, nulls for empty cells (golden
      api_spec.rb:128-132); with no drilldown, the bare measure list;
    - ``cell_keys``: the MEMBER_KEY tuple per cell, same enumeration
      (mondrian_ext.rb:277-283);
    - ``mdx``: the generated MDX when debug=true, else null
      (api.rb:39, api_spec.rb:183-203).

    Cells are extracted from collected rows BY COLUMN NAME, so property
    dedup or column reordering in the planner can never misalign the
    measure slice (the r1/r2 offset-arithmetic bug class).
    """
    cube, aliases, _names = shaping_ctx(cat, qm)
    drills = resolved_drills(cube, qm)
    # (dimension, level) -> [(display name, column alias)]: properties
    # attach to the member hash of THEIR level (leaf or ancestor)
    from .parser import parse_property
    from .planner import _resolve_level as _rl
    prop_by_level: dict = {}
    dim_prop_aliases: dict = {}
    for p_str in qm.properties:
        ref = parse_property(p_str)
        dimx, _, levelx = _rl(cube, ref.dimension, ref.hierarchy, ref.level)
        pr = levelx.find_property(ref.prop)
        lst = prop_by_level.setdefault(dimx.name, {}).setdefault(
            levelx.name, [])
        if (pr.name, pr.alias) not in lst:
            lst.append((pr.name, pr.alias))
        dim_prop_aliases.setdefault(dimx.name, set()).add(pr.alias)

    # per-axis distinct member tuples, ordered hierarchically by member
    # key (Mondrian orders axis tuples by member ordinal — SURVEY
    # §7.5.2; first-seen row order would be nondeterministic)
    axis_seen: list[set] = [set() for _ in drills]
    axis_props: list[dict] = [{} for _ in drills]
    keyed_rows: dict[tuple, list] = {}
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        key: list[tuple] = []
        for ai, rd in enumerate(drills):
            tup = tuple(d[a] for lv in rd.group_levels for _, a in lv.out_cols())
            axis_seen[ai].add(tup)
            key.append(tup)
            aliases_here = dim_prop_aliases.get(rd.dimension.name)
            if aliases_here:
                axis_props[ai][tup] = {a: d.get(a) for a in aliases_here}
        keyed_rows[tuple(key)] = [d[a] for a in aliases]
    axis_captions: list[list] = [
        sorted(seen, key=lambda t: tuple((v is None, v) for v in t))
        for seen in axis_seen]

    from itertools import product
    empty = [None] * len(aliases)
    if drills:
        tuples = list(product(*axis_captions))
        values = [keyed_rows.get(t, empty) for t in tuples]
    elif rows:
        values = keyed_rows[()]       # no drilldown: bare measure list
    else:
        values = empty

    # cell_keys (mondrian_ext.rb:277-283): one entry per axis-tuple
    # combination in the same enumeration order as `values`, holding
    # the MEMBER_KEY of each drilldown's leaf-level member
    leaf_key_idx = []
    for rd in drills:
        pos = 0
        for lv in rd.group_levels[:-1]:
            pos += len(lv.out_cols())
        leaf_key_idx.append(pos)
    cell_keys = [
        [t[ai][leaf_key_idx[ai]] for ai in range(len(drills))]
        for t in tuples] if drills else []

    axes: list[dict] = [{"members": [
        {"name": _names.get(a, m), "caption": m}
        for m, a in zip(qm.measures or [cube.default_measure.name], aliases)]}]
    ddl_dims = set()
    for ddl_spec, _ in getattr(qm, "gs_axes", []) or []:
        segs = ddl_spec.split(".")
        ddl_dims.add(_rl(cube, segs[0],
                         segs[1] if len(segs) == 3 else None,
                         segs[-1])[0].name)
    for ai, rd in enumerate(drills):
        axes.append({
            "dimension": rd.dimension.name,
            "hierarchy": rd.hierarchy.name,
            "level": rd.level.name,
            "members": [
                _axis_member_hash(rd, t, axis_props[ai].get(t),
                                  prop_by_level.get(rd.dimension.name),
                                  trim_null_tail=(
                                      rd.dimension.name in ddl_dims))
                for t in axis_captions[ai]
            ],
        })
    out = {
        "axes": axes,
        "cell_keys": cell_keys,
        "values": values,
        "mdx": mdx,
        "measure_aliases": aliases,
    }
    if source is not None:
        # debug=true with a rollup router: which materialization served
        # the query ('base' or a rollup name) — absent otherwise so the
        # envelope stays byte-identical for unrouted apps
        out["source"] = source
    return out

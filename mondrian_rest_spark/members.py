"""Metadata surface: cubes, dimensions, levels, members (SURVEY §2.9,
reference api.rb:72-235 + mondrian_ext.rb serialization).

Member enumeration is a distinct-select over the denormalized dimension
frame — the Spark analog of Mondrian's SELECT DISTINCT over the dim
table (reference mondrian_ext.rb:125-146); ancestors come from the same
denormalized row (no recursive walk needed).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog, Cube
from .planner import ResolvedDrill, _resolve_level, members_frame


def cube_names(cat: Catalog) -> list[str]:
    """GET /cubes (reference api.rb:72-80)."""
    return [c.name for c in cat.cubes] + [v.name for v in cat.virtual_cubes]


def cube_metadata(cat: Catalog, cube_name: str) -> dict:
    """GET /cubes/:name (reference api.rb:82-91; mondrian_ext.rb:35-82)."""
    cube = cat.cube(cube_name)
    return {
        "name": cube.name,
        "fact": cube.fact,
        "dimensions": [
            {
                "name": d.name,
                "type": "time" if d.time_dimension else "standard",
                "hierarchies": [
                    {
                        "name": h.name,
                        "has_all": h.has_all,
                        "levels": [
                            {
                                "name": lv.name,
                                "key": lv.key_alias,
                                "caption": lv.caption_alias or lv.key_alias,
                                "full_name": f"[{d.name}].[{h.name}].[{lv.name}]",
                                "properties": [p.name for p in lv.properties],
                            }
                            for lv in h.levels
                        ],
                    }
                    for h in d.hierarchies
                ],
            }
            for d in cube.dimensions
        ],
        "measures": [
            {"name": m.name, "alias": m.alias,
             "aggregator": m.agg.upper().replace("COUNT_DISTINCT", "DISTINCT_COUNT")}
            for m in cube.measures
        ],
        "calculated_members": [c.name for c in cube.calc_members],
        "named_sets": [s.name for s in cube.named_sets],
    }


def _drill_for(cube: Cube, dim_name: str, level_name: str | None,
               hierarchy: str | None = None, with_ancestors: bool = False) -> ResolvedDrill:
    dim, hier, level = _resolve_level(cube, dim_name, hierarchy, level_name)
    idx = hier.level_index(level.name)
    levels = list(hier.levels[: idx + 1]) if with_ancestors else [level]
    return ResolvedDrill(dim, hier, level, levels)


def _ragged_visible(df: DataFrame, rd: ResolvedDrill) -> DataFrame:
    """Drop members a ragged hierarchy hides (reference
    foodmart.xml:565-603: hideMemberIf= on Sales Ragged levels).  The
    frame must already carry the parent level's columns when the rule is
    if_parents_name (ensured by the callers)."""
    lv = rd.level
    cap = F.col(lv.caption_alias or lv.key_alias)
    if lv.hide_member_if == "if_blank_name":
        return df.filter(cap.isNotNull() & (F.trim(cap) != ""))
    if lv.hide_member_if == "if_parents_name":
        idx = rd.hierarchy.level_index(lv.name)
        if idx == 0:
            return df
        parent = rd.hierarchy.levels[idx - 1]
        pcap = F.col(parent.caption_alias or parent.key_alias)
        return df.filter(cap.isNull() | pcap.isNull() | (cap != pcap))
    return df


def level_members(spark: SparkSession, sf_dir: str, cat: Catalog, cube_name: str,
                  dim_name: str, level_name: str | None = None,
                  hierarchy: str | None = None,
                  with_ancestors: bool = False) -> DataFrame:
    """GET .../levels/:l/members (reference api.rb:174-205) — distinct
    member tuples, deduped by key (mondrian_ext.rb:139); ragged levels
    (hideMemberIf) have their hidden members filtered out."""
    cube = cat.cube(cube_name)
    rd = _drill_for(cube, dim_name, level_name, hierarchy, with_ancestors)
    need_parent = (rd.level.hide_member_if == "if_parents_name"
                   and not with_ancestors)
    if need_parent:
        rd = _drill_for(cube, dim_name, level_name, hierarchy, True)
    out = _ragged_visible(
        members_frame(spark, sf_dir, cube, rd), rd).dropDuplicates(
        [lv.key_alias for lv in rd.group_levels])
    if need_parent:
        return out.select(*[a for _, a in rd.level.out_cols()])
    return out


def member_children(spark: SparkSession, sf_dir: str, cat: Catalog, cube_name: str,
                    dim_name: str, parent_level: str, parent_key,
                    hierarchy: str | None = None) -> DataFrame:
    """children=true (reference mondrian_ext.rb:178; api_spec.rb:80-85):
    distinct members of the next level below, under the given parent."""
    cube = cat.cube(cube_name)
    dim, hier, plevel = _resolve_level(cube, dim_name, hierarchy, parent_level)
    pidx = hier.level_index(plevel.name)
    if pidx + 1 >= len(hier.levels):
        raise KeyError(f"level {parent_level!r} has no child level")
    child = hier.levels[pidx + 1]
    rd = ResolvedDrill(dim, hier, child, [plevel, child])
    mf = _ragged_visible(members_frame(spark, sf_dir, cube, rd), rd)
    out = mf.filter(F.col(plevel.key_alias) == F.lit(parent_key))
    child_cols = [a for _, a in child.out_cols()]
    return out.select(*child_cols).dropDuplicates([child.key_alias])


def member_lookup(spark: SparkSession, sf_dir: str, cat: Catalog, cube_name: str,
                  dim_name: str, level_name: str, key,
                  hierarchy: str | None = None) -> DataFrame:
    """GET .../members/:key (reference api.rb:207-230 — which does a
    linear scan; here it is an indexed filter on the dim frame) with
    ancestors from the same denormalized row."""
    cube = cat.cube(cube_name)
    rd = _drill_for(cube, dim_name, level_name, hierarchy, with_ancestors=True)
    mf = members_frame(spark, sf_dir, cube, rd)
    return mf.filter(F.col(rd.level.key_alias) == F.lit(key)).dropDuplicates(
        [rd.level.key_alias])

"""Rollup advisor: recommend covering aggregate-table grains from a
query log (VERDICT r7 #6).

The reference's AggName tables are hand-declared
(foodmart.xml:128-160) and so are this engine's RollupManager grains —
at 100 TB, picking the WRONG grains either burns storage on rollups
nobody routes to or leaves the hottest queries on base-fact scans.
This advisor closes the loop: feed it the QueryModels the API served
(frequency-weighted), and it returns the grains to register, scored by
routed-query weight x estimated base-scan savings.

Pure driver-side Python over the catalog — no Spark job.  Cardinality
estimates come from an optional ``level_cardinality`` map (production:
fill it from table stats / approx_count_distinct probes); without it
the advisor falls back to level-count as a monotone size proxy, which
preserves the greedy ordering for star schemas whose finer levels
dominate cardinality.

Algorithm: classic greedy weighted set cover over candidate grains.

1. Each routable query contributes its NEED — the (dimension, level)
   set its drilldowns and cuts touch (mirrors RollupManager._choose's
   covering test).  Queries the router can never route (calc members,
   non-re-aggregable measures, WITH forms) are dropped — recommending
   a grain for them would be dead storage.  Dense (nonempty=false)
   queries COUNT since r13: dense is Mondrian's default and the
   router serves them by dense-filling the routed nonempty aggregate.
2. Candidate grains = the distinct needs plus their closure under
   pairwise union (bounded): merged grains cost more rows but cover
   more queries — exactly the AggName trade-off.
3. Greedily pick the candidate maximizing
   ``covered_weight / est_rows`` until ``max_rollups`` grains are
   chosen or no uncovered routable weight remains.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..catalog import Cube
from ..parser import parse_cut, parse_drilldown
from ..planner import _resolve_cut, _resolve_drill
from ..query import QueryModel

#: re-aggregable aggregators (mirrors rollup._REAGG minus the sketch
#: companion, plus the sketch-routable approx distinct)
_ROUTABLE_AGGS = {"sum", "count", "min", "max", "approx_count_distinct"}


@dataclass
class Recommendation:
    """One advised rollup grain."""

    grain: tuple[str, ...]            # drilldown specs for register()
    covered_queries: int              # distinct log entries covered
    covered_weight: int               # frequency-weighted coverage
    est_rows: int | None              # grain cardinality estimate
    score: float                      # covered_weight / est cost
    sample: tuple = ()                # up to 3 covered need-sets
    # layout advice (r11, VERDICT r10 #7): the grain level the covered
    # queries CUT most often — partitioning the materialized rollup on
    # its key alias turns those cuts into partition pruning (and keeps
    # append() an O(affected-partitions) dynamic overwrite).  None
    # when no covered query cuts a grain level.
    partition_spec: str | None = None     # "Dim.Level"
    partition_col: str | None = None      # grain key alias
    partition_cut_weight: int = 0         # log weight cutting it


@dataclass
class BucketRecommendation:
    """Advised bucketed layout for the fact-grain join (r12, VERDICT
    r11 #4).  Rollups fix the AGGREGATION cost; this fixes the JOIN
    cost — the fact ⋈ bridge join (lineitem ⋈ orders) re-hashes both
    fact-grain tables across the cluster on every query that touches a
    bridged dimension or measure.  Writing both sides bucketed on the
    join key (sources/bucketing.py) removes that shuffle; the advisor's
    job is to pick THE key from the served log: the bridge FK of the
    most-joined bridge."""

    bridge: str                       # bridge name (cube.bridges)
    fact_table: str
    fact_key: str                     # bucket column on the fact
    bridge_table: str
    bridge_key: str                   # bucket column on the bridge
    join_weight: int                  # log entries inducing this join
    log_size: int                     # total log entries for the cube


def _bridges_touched(cube: Cube, qm: QueryModel) -> set:
    """Bridge names a served query joins through — via a bridged
    dimension it drills/cuts, or a bridged measure it aggregates.
    Unlike _query_need this counts EVERY query (rollup-unroutable
    queries still pay the bridge join on the base path — they are the
    strongest bucketing demand signal, not a reason to skip)."""
    dims: set = set()
    for d in qm.drilldown:
        try:
            rd = _resolve_drill(cube, parse_drilldown(d), False)
            dims.add(rd.dimension.name)
        except Exception:
            continue
    for c in qm.cut:
        try:
            dims.add(_resolve_cut(cube, parse_cut(c)).dimension.name)
        except Exception:
            continue
    for spec in ([qm.generate_top[0]] if getattr(qm, "generate_top",
                                                 None) else []):
        dims.add(spec.split(".")[0])
    names: set = set()
    for dn in dims:
        try:
            dim = cube.dimension(dn)
        except KeyError:
            continue
        if getattr(dim, "bridge", None):
            names.add(dim.bridge)
    for mn in (list(qm.measures)
               or [cube.default_measure.name]):
        try:
            m = cube.measure(mn)
        except KeyError:
            continue
        if getattr(m, "bridge", None):
            names.add(m.bridge)
    return names


def recommend_bucketing(cube: Cube, query_log: list[QueryModel],
                        ) -> BucketRecommendation | None:
    """The most-frequent fact-grain equi-join in the served log, as a
    bucket layout: (fact, fact_key) + (bridge table, bridge_key).
    None when the cube has no bridges or no logged query joins one."""
    if not cube.bridges:
        return None
    weight: dict[str, int] = {}
    total = 0
    for qm in query_log:
        if qm.cube != cube.name:
            continue
        total += 1
        for b in _bridges_touched(cube, qm):
            weight[b] = weight.get(b, 0) + 1
    if not weight:
        return None
    name = max(weight, key=lambda k: (weight[k], k))
    br = cube.bridge(name)
    return BucketRecommendation(
        bridge=name, fact_table=cube.fact, fact_key=br.fact_key,
        bridge_table=br.table, bridge_key=br.bridge_key,
        join_weight=weight[name], log_size=total)


def resolve_virtual_entries(cat, cube: Cube,
                            query_log: list[QueryModel],
                            ) -> list[QueryModel]:
    """Per-base-cube demand from VIRTUAL-cube log entries (r13,
    VERDICT r12 #3): since r11 the drill-across path threads
    RollupManagers into its per-cube sub-aggregates, so the hottest
    virtual workload ROUTES through base-cube rollups — but
    recommend_rollups only saw ``qm.cube == cube.name`` entries, so
    that workload never influenced which grains get built.  Maps each
    virtual entry to the sub-QueryModel _virtualize hands the router:
    measures the base cube owns, drilldown/cut/properties forwarded,
    nonempty=True, axis-global shaping (order/limit/filter) dropped —
    those apply post-join and never reach the router.  Grouping-sets
    axes FORWARD since r14 (the per-cube subs route their Expand from
    rollup rows); entries with WITH forms / GENERATE are skipped:
    their virtual rewrites reshape the axes before routing, so a
    naive forward would advise the wrong grain."""
    out: list[QueryModel] = []
    for qm in query_log:
        vc = cat.virtual_cube(qm.cube) if cat is not None else None
        if vc is None or cube.name not in vc.cube_names:
            continue
        if (qm.with_members or qm.with_sets
                or getattr(qm, "with_sets_ext", [])
                or getattr(qm, "gs_top", [])
                or getattr(qm, "generate_top", None) is not None
                or getattr(qm, "generate_more", [])
                or getattr(qm, "generate_nested", [])):
            continue
        own = []
        for m in qm.measures:
            try:
                cube.measure(m)
                own.append(m)
            except KeyError:
                continue
        if not own:
            continue
        out.append(QueryModel(
            cube=cube.name, measures=own,
            drilldown=list(qm.drilldown), cut=list(qm.cut),
            nonempty=True, parents=qm.parents,
            properties=list(qm.properties),
            caption=list(qm.caption),
            property_filters=list(getattr(qm, "property_filters", [])),
            gs_axes=list(getattr(qm, "gs_axes", []) or []),
            nav_filters=list(getattr(qm, "nav_filters", []) or [])))
    return out


@dataclass
class _Need:
    levels: frozenset
    weight: int
    specs: tuple[str, ...]
    cut_levels: frozenset = frozenset()   # subset of levels, from cuts


def _query_need(cube: Cube, qm: QueryModel) -> tuple[frozenset, tuple] | None:
    """(level-set, drilldown specs) a rollup must cover to answer qm,
    or None when the router would refuse it regardless of grain
    (mirrors RollupManager._choose)."""
    if qm.cube != cube.name:
        return None
    if (qm.properties or qm.caption
            or qm.parent_of or qm.with_members or qm.with_sets
            or getattr(qm, "with_sets_ext", [])
            or qm.edge_child_of or getattr(qm, "siblings_of", [])
            or getattr(qm, "ancestor_of", [])
            or getattr(qm, "edge_sibling_of", [])
            or getattr(qm, "empty_set", False)
            or getattr(qm, "empty_slicer", False)
            or getattr(qm, "property_filters", [])
            or getattr(qm, "nav_filters", [])
            or getattr(qm, "generate_inner", None) is not None
            or getattr(qm, "visual_totals", None)):
        return None
    if getattr(qm, "gs_axes", None) and (
            getattr(qm, "gs_top", []) or
            getattr(qm, "generate_top", None) is not None or qm.parents):
        # grouping-sets axes ROUTE since r14 (mirrors
        # RollupManager._choose) — but DDLTOP / parents / GENERATE
        # combinations stay on base, so counting them advises dead
        # storage
        return None
    if getattr(qm, "periods_to_date", []) and (
            not qm.nonempty or qm.parents):
        # PTD routes only nonempty/non-parents (mirrors
        # RollupManager._rewrite_ptd) — dense PTD stays base demand
        return None
    if (qm.lastperiods or qm.member_lags) and qm.parents:
        # the idiom rewrite routes non-parents only (mirrors
        # RollupManager._rewrite_ptd)
        return None
    # dense queries COUNT — dense is Mondrian's default (api.rb:137);
    # the router serves them (r13), dense GENERATE included (r14: the
    # dense fill runs before the rank, so the routed rank sees the
    # densified pair frame exactly like the base path)
    # routability must consider the HIDDEN measures HAVING/ORDER pull
    # in too (mirrors RollupManager._measure_names): a log entry whose
    # filter references a calc member routes to base no matter the
    # grain, so counting it would advise dead storage
    names = list(qm.measures) or [cube.default_measure.name]
    for tp in (qm.top_percent, getattr(qm, "top_sum", None)):
        # TOPPERCENT/TOPSUM route since r13; an APPROX ranking measure
        # keeps the base path (mirrors _choose)
        if tp is not None:
            try:
                if cube.measure(tp[1]).agg == "approx_count_distinct":
                    return None
            except KeyError:
                pass    # calc member: the names loop below refuses it
            names.append(tp[1])
    from ..parser import parse_measure_filter
    from ..planner import _tmpl_refs
    for fs in qm.filter:
        try:
            names.append(parse_measure_filter(fs).measure)
        except Exception:
            return None
    for tmpl in getattr(qm, "filter_exprs", []):
        names += _tmpl_refs(tmpl)
    if qm.order and "." not in qm.order:
        # an order key may also be an axis COLUMN (routable without
        # aggregation); only a resolvable measure/calc joins the check
        if cube.calc_member(qm.order) is not None:
            return None
        try:
            cube.measure(qm.order)
            names.append(qm.order)
        except KeyError:
            pass
    for n in names:
        if cube.calc_member(n) is not None:
            return None
        try:
            m = cube.measure(n)
        except KeyError:
            return None
        if m.agg not in _ROUTABLE_AGGS:
            return None
    levels: set = set()
    specs: list[str] = []
    try:
        if qm.parents and getattr(qm, "generate_top", None) is not None:
            return None      # mirrors RollupManager._choose (r12)
        ns_names = {s.name for s in cube.named_sets}
        for d in qm.drilldown:
            parsed = parse_drilldown(d, ns_names)
            if isinstance(parsed, str):
                # named-set drilldown shortcut routes since r13
                from ..planner import _resolve_level
                ns = cube.named_set(parsed)
                dim, _, level = _resolve_level(
                    cube, ns.dimension, None, ns.level)
                if (dim.name, level.name) not in levels:
                    levels.add((dim.name, level.name))
                    specs.append(f"{dim.name}.{level.name}")
                continue
            # parents=true routes since r12: the ancestor chain's
            # levels join the need, so the advised grain covers them
            rd = _resolve_drill(cube, parsed, qm.parents)
            for lv in rd.group_levels:
                if (rd.dimension.name, lv.name) not in levels:
                    levels.add((rd.dimension.name, lv.name))
                    specs.append(f"{rd.dimension.name}.{lv.name}")
        if getattr(qm, "generate_top", None) is not None:
            # GENERATE needs the (parent, child) level PAIR in the
            # grain (mirrors RollupManager._generate_levels) — without
            # them the advised grain would never route the query
            from ..planner import _resolve_level
            segs = qm.generate_top[0].split(".")
            dim, hier, level = _resolve_level(
                cube, segs[0], segs[1] if len(segs) == 3 else None,
                segs[-1])
            idx = hier.level_index(level.name)
            if idx + 1 >= len(hier.levels):
                return None
            for lv in (level, hier.levels[idx + 1]):
                if (dim.name, lv.name) not in levels:
                    levels.add((dim.name, lv.name))
                    specs.append(f"{dim.name}.{lv.name}")
        ptd_cut_levels: set = set()
        for path in ([p for p, _ in qm.lastperiods]
                     + [p for p, _ in qm.member_lags]):
            # LASTPERIODS / .Lag/.Lead route since r14 (drill + cut at
            # the member's own level — catalog-only need)
            from ..parser import parse_segments
            from ..planner import _resolve_level
            segs = parse_segments(path)
            if len(segs) < 3:
                return None
            dim, hier, level = _resolve_level(
                cube, segs[0], segs[1] if len(segs) == 4 else None,
                segs[-2])
            if (dim.name, level.name) not in levels:
                levels.add((dim.name, level.name))
                specs.append(f"{dim.name}.{level.name}")
            ptd_cut_levels.add((dim.name, level.name))
        for anchor_name, m_path in getattr(qm, "periods_to_date",
                                           []) or []:
            # PTD routes since r14 via the drilldown+cut rewrite: the
            # need is the member's level plus its ancestor CHAIN
            # through the anchor (catalog-only — the member lookup is
            # runtime, but grain coverage depends on levels alone);
            # the chain levels are CUT levels for partition advice
            from ..parser import parse_segments
            from ..planner import _resolve_level
            segs = parse_segments(m_path)
            if len(segs) < 3:
                return None
            dim, hier, level = _resolve_level(
                cube, segs[0], segs[1] if len(segs) == 4 else None,
                segs[-2])
            try:
                anchor_idx = hier.level_index(anchor_name)
            except (KeyError, ValueError):
                return None
            if anchor_idx >= hier.level_index(level.name):
                return None
            chain = list(hier.levels[: anchor_idx + 1])
            for lv in chain + [level]:
                if (dim.name, lv.name) not in levels:
                    levels.add((dim.name, lv.name))
                    specs.append(f"{dim.name}.{lv.name}")
            ptd_cut_levels.update(
                [(dim.name, lv.name) for lv in chain]
                + [(dim.name, level.name)])
        gs_dims: set = set()
        for ddl_spec, ddl_subset in getattr(qm, "gs_axes", []) or []:
            # grouping-sets axis routes since r14: the (parent, child)
            # level pair joins the need (mirrors RollupManager._choose)
            from ..planner import _resolve_level
            segs = ddl_spec.split(".")
            dim, hier, level = _resolve_level(
                cube, segs[0], segs[1] if len(segs) == 3 else None,
                segs[-1])
            idx = hier.level_index(level.name)
            if idx + 1 >= len(hier.levels) or dim.name in gs_dims:
                return None
            gs_dims.add(dim.name)
            for lv in (level, hier.levels[idx + 1]):
                if (dim.name, lv.name) not in levels:
                    levels.add((dim.name, lv.name))
                    specs.append(f"{dim.name}.{lv.name}")
        if gs_dims:
            for d in qm.drilldown:
                parsed = parse_drilldown(d)
                if not isinstance(parsed, str) \
                        and parsed.dimension in gs_dims:
                    return None   # same-dim drill: base 400
        cut_levels: set = set(ptd_cut_levels)
        for ch in qm.children_of:
            # <member>.Children routes since r13 — drill the child
            # level, cut the member's own level (mirrors _choose);
            # the member slice counts as a CUT for the partition-
            # column advice (it prunes like any member cut)
            from ..parser import parse_segments
            from ..planner import _resolve_level
            segs = parse_segments(ch)
            if len(segs) < 3:
                return None
            hier_name = segs[1] if len(segs) == 4 else None
            dim, hier, level = _resolve_level(
                cube, segs[0], hier_name, segs[-2])
            idx = hier.level_index(level.name)
            if idx + 1 >= len(hier.levels):
                return None
            gl = (list(hier.levels[: idx + 2]) if qm.parents
                  else [hier.levels[idx + 1]])
            for lv in gl + [level]:
                if (dim.name, lv.name) not in levels:
                    levels.add((dim.name, lv.name))
                    specs.append(f"{dim.name}.{lv.name}")
            cut_levels.add((dim.name, level.name))
        for c in qm.cut:
            rc = _resolve_cut(cube, parse_cut(c, ns_names))
            cut_levels.add((rc.dimension.name, rc.level.name))
            if (rc.dimension.name, rc.level.name) not in levels:
                levels.add((rc.dimension.name, rc.level.name))
                specs.append(f"{rc.dimension.name}.{rc.level.name}")
    except Exception:
        return None   # unresolvable log entry: base path 400s it
    if not levels:
        return None   # grand totals route to ANY rollup; no new grain
    return frozenset(levels), tuple(specs), frozenset(cut_levels)


def _est_rows(levels: frozenset,
              level_cardinality: dict | None) -> int | None:
    """Upper-bound grain cardinality: product of per-level member
    counts (the standard independence estimate; real co-occurrence is
    lower, which only makes a chosen grain cheaper than scored)."""
    if not level_cardinality:
        return None
    rows = 1
    for key in levels:
        if key not in level_cardinality:
            return None
        rows *= max(int(level_cardinality[key]), 1)
    return rows


def recommend_rollups(cube: Cube, query_log: list[QueryModel],
                      max_rollups: int = 3,
                      level_cardinality: dict | None = None,
                      max_grain_levels: int = 8,
                      base_rows: int | None = None,
                      ) -> list[Recommendation]:
    """Advise up to ``max_rollups`` grains for ``cube`` from a log of
    served QueryModels.

    ``level_cardinality``: optional {(dim_name, level_name): members}
    map for real row estimates; ``base_rows`` (fact row count) caps
    the usefulness score — a grain estimated near fact size saves
    nothing and is skipped.  Ties in score break toward FEWER levels
    (cheaper to maintain) then lexical grain order (deterministic).
    """
    # collapse identical needs, weighting by log frequency; tally the
    # per-level CUT weight alongside (the partition-column signal)
    by_need: dict[frozenset, _Need] = {}
    cut_weight: dict[tuple, int] = {}
    for qm in query_log:
        got = _query_need(cube, qm)
        if got is None:
            continue
        levels, specs, cut_levels = got
        for key in cut_levels:
            cut_weight[key] = cut_weight.get(key, 0) + 1
        n = by_need.get(levels)
        if n is None:
            by_need[levels] = _Need(levels, 1, specs, cut_levels)
        else:
            n.weight += 1
    if not by_need:
        return []

    # candidates: every distinct need + bounded pairwise unions
    cands: dict[frozenset, tuple[str, ...]] = {}
    needs = list(by_need.values())
    for n in needs:
        cands.setdefault(n.levels, n.specs)
    for i, a in enumerate(needs):
        for b in needs[i + 1:]:
            merged = a.levels | b.levels
            if len(merged) <= max_grain_levels and merged not in cands:
                extra = tuple(s for s in b.specs if s not in a.specs)
                cands[merged] = a.specs + extra

    uncovered = {n.levels: n for n in needs}
    out: list[Recommendation] = []
    while uncovered and len(out) < max_rollups:
        best = None
        for levels, specs in sorted(
                cands.items(), key=lambda kv: (len(kv[0]), kv[1])):
            covered = [n for n in uncovered.values() if n.levels <= levels]
            if not covered:
                continue
            weight = sum(n.weight for n in covered)
            rows = _est_rows(levels, level_cardinality)
            if rows is not None and base_rows is not None \
                    and rows >= base_rows:
                continue   # no scan saving: grain ~ fact size
            cost = rows if rows is not None else len(levels)
            score = weight / max(cost, 1)
            key = (score, -len(levels))
            if best is None or key > best[0]:
                best = (key, levels, specs, covered, weight, rows, score)
        if best is None:
            break
        _, levels, specs, covered, weight, rows, score = best
        # layout advice (r11): partition the materialized rollup on the
        # grain level the log CUTS most — those cuts become partition
        # pruning.  Resolved to the grain key alias register() checks.
        p_spec, p_col, p_w = None, None, 0
        for key in sorted(levels):
            w = cut_weight.get(key, 0)
            if w > p_w:
                spec = f"{key[0]}.{key[1]}"
                try:
                    rd = _resolve_drill(cube, parse_drilldown(spec),
                                        False)
                except Exception:
                    continue
                p_spec, p_col, p_w = spec, rd.level.key_alias, w
        out.append(Recommendation(
            grain=specs, covered_queries=len(covered),
            covered_weight=weight, est_rows=rows, score=score,
            sample=tuple(sorted(n.levels)[:3] for n in covered[:3]),
            partition_spec=p_spec, partition_col=p_col,
            partition_cut_weight=p_w))
        for n in covered:
            uncovered.pop(n.levels, None)
    return out

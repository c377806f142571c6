#!/usr/bin/env python
"""Plan audit: physical-plan characteristics of the headline queries.

Writes PLANS.md — per query: join strategies, shuffle count, pushed
filters and read schemas (column pruning evidence).  Run after planner
changes; a widened ReadSchema or a lost broadcast shows up as a diff.

    python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from mondrian_rest_spark.sources.registry import build_session  # noqa: E402

AUDIT = ["q02_region_revenue", "q03_crossjoin_3d", "q04_cut_member",
         "q09_having", "q12_distinct_count", "q15_lag_prev_period",
         "q16_named_set_topcount", "q17_dense_axes", "q18_virtual_cube",
         "q27_parent_child_closure", "q29_grouping_rollup",
         "q32_mdx_with_member", "q33_mdx_parallelperiod", "q34_mdx_with_set",
         "q35_mdx_virtual_with_member", "q36_mdx_topcount_crossjoin",
         "q38_mdx_member_parent", "q39_mdx_lastperiods",
         "q40_mdx_iif_member", "q41_mdx_member_lag",
         "t12_boilerplate_fraction", "w04_retention_cohorts", "w05_funnel",
         "c02_top_docs_per_lang", "x03_token_budget_pack",
         "w03_session_30m", "d03_neardup_minhash_lsh",
         "d04_neardup_simhash", "d06_embedding_neardup_lsh",
         "s03_ann_ivf_topk", "s04_ann_ivf_layout", "s05_ann_batch_lsh",
         "s06_ann_batch_ivf", "s07_ann_batch_layout",
         "s08_ann_ivf_trained",
         "q42_mdx_range_union", "q43_mdx_tail", "q44_mdx_last_child",
         "q45_mdx_virtual_children", "q46_mdx_ytd", "q47_mdx_toppercent",
         "s10_projected_topk", "t13_hashed_features",
         "q48_mdx_filter_expr", "q49_mdx_set_aggregate",
         "w06_funnel_any_touch", "m03_media_jpeg_dims",
         "q52_mdx_ancestor", "q54_mdx_periodstodate", "q55_mdx_topsum",
         "q56_mdx_mtd",
         "q60_mdx_rank", "q61_mdx_generate_top", "q62_mdx_set_avg",
         "q63_mdx_set_median_stdev", "q64_mdx_dimension_properties",
         "q65_mdx_property_filter", "q66_mdx_virtual_rank",
         "q67_mdx_virtual_set_aggregate",
         "q69_mdx_iif_case", "q70_mdx_filter_navigation",
         "q71_mdx_exists", "q72_mdx_generate_descendants",
         "q73_mdx_generate_head", "q74_mdx_drilldownlevel",
         "q75_mdx_drilldownmember",
         "d09_neardup_jaccard_prefix", "d10_neardup_jaccard_index",
         "x04_mixture_sample",
         "q78_pc_rest_drilldown", "q79_mdx_existing_dense",
         "q80_mdx_drilldownlevel_2d", "q81_mdx_crossjoin_fn",
         "q82_mdx_strtomember", "x06_chunk_token_windows",
         "q83_mdx_visualtotals_x_ddl", "q84_mdx_virtual_drilldownlevel",
         "q87_mdx_virtual_lastperiods", "q88_mdx_virtual_with_set",
         "q89_mdx_generate_2d", "q90_mdx_ddltop_x_members",
         "q91_mdx_filter_over_generate", "q92_mdx_virtual_generate",
         "q93_mdx_virtual_toppercent", "q94_mdx_virtual_ddltop",
         "q95_mdx_virtual_parallelperiod", "q96_mdx_virtual_ytd",
         "q97_mdx_virtual_tail", "q98_mdx_virtual_nav_filter",
         "d11_neardup_jaccard_spill", "r01_ragged_drilldown",
         "q100_mdx_dense_drilldownlevel", "q101_mdx_ddltop_x_topcount",
         "q102_mdx_nested_generate", "q103_mdx_generate_x_topcount",
         "q104_mdx_virtual_generate_x_topcount",
         "q105_mdx_toppercent_x_years",
         "q106_mdx_virtual_toppercent_x_years",
         "q107_mdx_prop_filter_x_years", "q108_mdx_subset_x_years",
         "q109_mdx_dense_ddltop", "q110_rollup_routed_dense",
         "q111_mdx_virtual_dense_ddl", "q112_mdx_virtual_dense_generate",
         "q113_mdx_virtual_dense_ddltop",
         "q114_mdx_virtual_day_alias_conformed",
         "q115_mdx_virtual_dense_day_union",
         "q116_rollup_routed_gs_dense",
         "q117_rollup_routed_dense_generate",
         "q118_rollup_routed_ptd",
         "d12_semantic_dedup", "d13_duplicate_spans",
         "d14_contaminated_spans", "d15_semantic_contamination",
         "t14_bigram_novelty", "t15_duplication_profile",
         "x07_trim_duplicate_spans", "x08_dsir_sample",
         "x09_decontaminate_corpus", "x10_mixture_temperature",
         "w07_rolling_active_users",
         "t16_fertility_by_language", "t17_self_perplexity",
         "t18_ccnet_lm_score", "w08_event_transitions",
         "w09_funnel_timing", "w10_props_stats", "x11_gopher_rules",
         "x12_perplexity_filter", "d16_cross_source_matrix",
         "w11_session_stats", "d17_contamination_by_benchmark", "t19_vocab_coverage", "m05_image_phash_pairs", "m06_audio_ahash_pairs", "w12_daily_anomalies"]

# per-query caveats the static plan can't show (r12, VERDICT r11 #2)
NOTES = {
    "q110_rollup_routed_dense": (
        "CAVEAT: the lineitem scans printed here are the CACHED "
        "rollup's build lineage below the InMemoryRelation boundary — "
        "execution reads the cache (plan-asserted in "
        "`test_dense_routes_through_covering_rollup`: nothing above "
        "the InMemoryRelation scans the fact).  The live work is the "
        "dim-side member frame left-joined to the routed aggregate."),
    "q111_mdx_virtual_dense_ddl": (
        "NOTE: dense grouping-sets on the VIRTUAL cube (r14) — the "
        "two Expand aggregates full-outer-join null-safely with their "
        "F.grouping() markers kept, then _densify_gs fills the joined "
        "frame; the fill join broadcasts (DENSE_BROADCAST_ROWS, "
        "measured cell count)."),
    "q114_mdx_virtual_day_alias_conformed": (
        "NOTE: alias-conformed Day (r14) — each cube aggregates at "
        "its OWN date column (ship_date / order_date), renamed to the "
        "first cube's alias pre-join; both day derivations push to "
        "their fact scans."),
    "d12_semantic_dedup": (
        "NOTE: SemDeDup (r14) — the within-cell pair join shuffles "
        "ONLY (cell_id, id); the wide embedding arrays hash-join back "
        "onto candidates by id afterwards (the d06 narrow-shuffle "
        "shape, plan-asserted in "
        "`test_semantic_dedup_pair_join_is_narrow`).  Cost is "
        "Σ cellᵢ², bounded loud by CellSkewError."),
    "x09_decontaminate_corpus": (
        "CAVEAT: the span lineage printed twice here is the "
        "request-persisted span frame's BUILD lineage — execution "
        "fills the cache once and both the fraction gate and the trim "
        "read it (InMemoryTableScan asserted in "
        "`test_decontaminate_spans_frame_stays_persisted`)."),
    "x08_dsir_sample": (
        "NOTE: DSIR (r14) — the bucket weight table is <= dim rows "
        "and broadcasts onto the per-doc bucket counts; the final "
        "orderBy+limit is a TakeOrdered, not a global sort."),
    "d11_neardup_jaccard_spill": (
        "CAVEAT: the static plan shows ~32 scans of the docs parquet, "
        "but the shingle/prefix/hot frames are request-persisted "
        "(`_tag_persisted`) — real execution fills each cache once and "
        "reuses it, which explain cannot show.  An unpersist regression "
        "is guarded by `test_operators.py::"
        "test_jaccard_spill_frames_stay_persisted` (every tagged frame "
        "must carry a storage level; executed plan must contain "
        "InMemoryTableScan)."),
}


def audit(name: str, plan: str) -> str:
    pushed = [m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]+)\]", plan)
              if m.group(1).strip()]
    schemas = [m.group(1).strip() for m in re.finditer(r"ReadSchema: ([^\n]+)", plan)]
    lines = [f"### {name}", "",
             f"- joins: {plan.count('BroadcastHashJoin')} broadcast, "
             f"{plan.count('SortMergeJoin')} sort-merge",
             f"- shuffles: {plan.count('Exchange hashpartitioning')}"
             f" | windows: {plan.count('Window')}"
             f" | expands: {plan.count('Expand')}"]
    if pushed:
        lines.append("- pushed filters: " + "; ".join(f"`{p}`" for p in pushed))
    lines.append("- read schemas (pruning): " +
                 "; ".join(f"`{s[:90]}`" for s in schemas))
    if name in NOTES:
        lines.append("- " + NOTES[name])
    return "\n".join(lines) + "\n"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="plan-audit", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = ["# PLANS — physical-plan audit (generated by "
           "scripts/explain_audit.py)", "",
           f"Scale dir: `{sf_dir}`.  Broadcasts are AQE/size-chosen (no "
           "force hints on unbounded dims); sort-merge joins appear only "
           "on fact-grain keys (lineitem⋈orders), which a real deployment "
           "buckets.  Pushed filters show cut predicates reaching the "
           "scans, including transitively inferred ones; ReadSchema shows "
           "column pruning.", ""]
    for name in AUDIT:
        plan = (qs[name](spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        out.append(audit(name, plan))

    # layout evidence: the bucketed fact⋈bridge join plans with zero
    # Exchange (sources/bucketing.py) — shown on a scratch materialization
    from mondrian_rest_spark.sources import bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP DATABASE IF EXISTS plans_audit CASCADE")
    bucketing.materialize_bucketed(spark, sf_dir, database="plans_audit",
                                   n_buckets=8)
    li = bucketing.load_bucketed(spark, "lineitem", "plans_audit")
    o = bucketing.load_bucketed(spark, "orders", "plans_audit")
    import pyspark.sql.functions as F
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
           .groupBy("l_orderkey").agg(F.sum("l_quantity")))
    plan = j._jdf.queryExecution().executedPlan().toString()
    out.append("### bucketed lineitem⋈orders (layout path)\n\n"
               f"- exchanges: {plan.count('Exchange')} (bucketed layout: "
               "join AND groupBy reuse the write-time hash partitioning)\n"
               f"- joins: {plan.count('SortMergeJoin')} sort-merge over "
               "SelectedBucketsCount scans\n")
    spark.sql("DROP DATABASE IF EXISTS plans_audit CASCADE")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()

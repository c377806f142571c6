"""Scale-path operators: bucketed co-located joins and skew salting.

These verify the *physical* claims, not just results: the bucketed
fact join must plan with zero Exchange, and salted aggregation must be
bit-identical to the plain groupBy it replaces.
"""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from mondrian_rest_spark.operators import skew
from mondrian_rest_spark.sources import bucketing
from mondrian_rest_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    db = "bucketed_test"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    bucketing.materialize_bucketed(spark, sf_dir, database=db, n_buckets=4)
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    local = wh.removeprefix("file:")
    if local and os.path.isdir(os.path.join(local, f"{db}.db")):
        shutil.rmtree(os.path.join(local, f"{db}.db"), ignore_errors=True)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    # at test scale AQE would broadcast the orders side, which is itself
    # an Exchange; disable so the plan is the one a 100 TB fact pair gets
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, bucketed_db, no_broadcast):
    li = bucketing.load_bucketed(spark, "lineitem", bucketed_db)
    orders = bucketing.load_bucketed(spark, "orders", bucketed_db)
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("qty")))
    plan = _physical_plan(j)
    # join reads co-located buckets: no shuffle anywhere before the agg
    # (the groupBy key == bucket key, so even the agg reuses the layout)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_unbucketed_same_join_does_exchange(spark, sf_dir, no_broadcast):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    # sanity: the thing bucketing removes is actually there without it
    assert "Exchange" in _physical_plan(j)


def test_bucketed_results_match_plain(spark, sf_dir, bucketed_db):
    li_b = bucketing.load_bucketed(spark, "lineitem", bucketed_db)
    o_b = bucketing.load_bucketed(spark, "orders", bucketed_db)
    got = (li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
               .agg(F.count("*").alias("n"),
                    F.sum(F.col("l_quantity").cast("decimal(25,6)"))
                     .alias("q")).collect()[0])
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = (li.join(o, li.l_orderkey == o.o_orderkey)
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("l_quantity").cast("decimal(25,6)"))
                    .alias("q")).collect()[0])
    assert got["n"] == want["n"] and got["q"] == want["q"]


def test_loader_prefers_bucketed(spark, sf_dir, bucketed_db):
    df = bucketing.load_table_preferring_bucketed(
        spark, sf_dir, "lineitem", database=bucketed_db)
    # catalog-backed read: logical plan names the table, not raw files
    assert "lineitem" in df._jdf.queryExecution().logical().toString()
    # non-fact tables fall through to the plain loader
    region = bucketing.load_table_preferring_bucketed(
        spark, sf_dir, "region", database=bucketed_db)
    assert region.count() == load_table(spark, sf_dir, "region").count()


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    aggs = {
        "qty": ("sum", F.col("l_quantity").cast("decimal(25,6)")),
        "n": ("count", F.lit(1)),
        "mn": ("min", F.col("l_extendedprice")),
        "mx": ("max", F.col("l_extendedprice")),
    }
    got = {r["l_returnflag"]: r for r in
           skew.salted_agg(li, ["l_returnflag"], aggs, salt=8).collect()}
    plain = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    want = {r["l_returnflag"]: r for r in
            li.groupBy("l_returnflag")
              .agg(*[plain[fn](c).alias(k)
                     for k, (fn, c) in aggs.items()]).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert (g["qty"], g["n"], g["mn"], g["mx"]) == \
               (w["qty"], w["n"], w["mn"], w["mx"])


def test_salted_agg_rejects_count_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="not salting-re-aggregable"):
        skew.salted_agg(li, ["l_returnflag"],
                        {"d": ("count_distinct", F.col("l_orderkey"))})


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus")
    got = (skew.salted_join(li, orders, "l_orderkey", "o_orderkey", salt=4)
           .groupBy("o_orderstatus")
           .agg(F.count(F.lit(1)).alias("n"))
           .collect())
    want = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .groupBy("o_orderstatus")
              .agg(F.count(F.lit(1)).alias("n")).collect())
    assert {r["o_orderstatus"]: r["n"] for r in got} == \
           {r["o_orderstatus"]: r["n"] for r in want}


def test_time_partitioned_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "li_by_month")
    bucketing.materialize_time_partitioned(spark, sf_dir, out)
    df = bucketing.load_time_partitioned(spark, out)
    pruned = df.filter(F.col("p_year") == 1995)
    plan = _physical_plan(pruned)
    # the year cut is a directory-level PartitionFilter, not a row filter
    assert "PartitionFilters" in plan
    assert "p_year" in plan.split("PartitionFilters")[1].split("]")[0]
    # and results match the un-partitioned derivation exactly
    li = load_table(spark, sf_dir, "lineitem")
    want = li.filter(F.year("l_shipdate") == 1995).count()
    assert pruned.count() == want


def test_env_routes_engine_loads_to_bucketed(spark, sf_dir, bucketed_db,
                                             monkeypatch):
    """The engine-wide switch: with MRS_BUCKETED_DB set, every
    load_table of a fact-grain table serves the bucketed catalog copy,
    so whole planner queries inherit the zero-shuffle join layout —
    and results are unchanged."""
    from mondrian_rest_spark.planner import aggregate
    from mondrian_rest_spark.query import QueryModel
    from mondrian_rest_spark.tpch import CATALOG

    qm = QueryModel(cube="Sales", measures=["Revenue"],
                    drilldown=["Customer.Nation"])
    plain = {r["cust_nation"]: r["revenue"]
             for r in aggregate(spark, sf_dir, CATALOG, qm).collect()}

    monkeypatch.setenv("MRS_BUCKETED_DB", bucketed_db)
    df = load_table(spark, sf_dir, "lineitem")
    assert "lineitem" in df._jdf.queryExecution().logical().toString()
    routed = {r["cust_nation"]: r["revenue"]
              for r in aggregate(spark, sf_dir, CATALOG, qm).collect()}
    assert routed == plain


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """With the time-partitioned layout, a filter that only exists on a
    joined dimension (so static pruning can't see it) still prunes the
    fact's partition directories at RUNTIME via Catalyst's dynamic
    partition pruning — the 100 TB behavior where 'filter the date dim'
    skips years of fact data without any engine code."""
    out = str(tmp_path / "li_dpp")
    bucketing.materialize_time_partitioned(spark, sf_dir, out)
    fact = bucketing.load_time_partitioned(spark, out)
    years = (fact.select("p_year").distinct()
             .withColumn("decade", (F.col("p_year") / 10).cast("int") * 10))
    dim = years.filter(F.col("decade") == 1990)
    j = fact.join(dim, "p_year").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty"))
    plan = _physical_plan(j)
    assert "dynamicpruning" in plan.lower(), plan
    # and the result equals the statically-filtered equivalent
    want = (fact.filter((F.col("p_year") >= 1990) & (F.col("p_year") < 2000))
            .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)"))
                 .alias("qty")).collect()[0]["qty"])
    assert j.collect()[0]["qty"] == want


def test_salted_join_left_outer_preserves_unmatched(spark):
    """Left-outer through the salted join: an unmatched skewed-side row
    must survive exactly once (not once per salt replica)."""
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "orphan")], "k int, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "rk int, rv string")
    got = skew.salted_join(left, right, "k", "rk", salt=4, how="left")
    rows = sorted((r["k"], r["v"], r["rv"]) for r in got.collect())
    assert rows == [(1, "a", "x"), (1, "b", "x"), (2, "c", "y"),
                    (99, "orphan", None)]


def test_recommended_n_buckets_sizing(tmp_path):
    """r12: bucket-count sizing — largest table bytes / target bucket
    size, rounded up to a power of two, clamped to [lo, hi], ONE count
    for the whole join group."""
    (tmp_path / "fact.parquet").write_bytes(b"x" * 5000)
    (tmp_path / "bridge.parquet").write_bytes(b"y" * 900)
    d = str(tmp_path)
    # 5000 / 1024 -> ceil 5 -> pow2 8; lo=1 keeps the raw rounding
    assert bucketing.recommended_n_buckets(
        d, ["fact", "bridge"], target_bytes=1024, lo=1) == 8
    # the LARGEST table drives the shared count
    assert bucketing.recommended_n_buckets(
        d, ["bridge"], target_bytes=1024, lo=1) == 1
    # default floor: tiny local data still gets a sane parallel count
    assert bucketing.recommended_n_buckets(
        d, ["fact", "bridge"]) == 8
    # hi clamp: a 100 TB table caps at 4096
    assert bucketing.recommended_n_buckets(
        d, ["fact"], target_bytes=1) == 4096
    # directory layouts (partitioned parquet) sum their files
    sub = tmp_path / "big.parquet"
    sub.mkdir()
    (sub / "part-0").write_bytes(b"z" * 3000)
    (sub / "part-1").write_bytes(b"z" * 3000)
    assert bucketing.recommended_n_buckets(
        d, ["big"], target_bytes=1024, lo=1) == 8

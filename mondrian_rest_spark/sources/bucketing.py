"""Bucketed fact-table materialization: the co-located-join scale path.

The reference's only physical-layout performance mechanism is aggregate
tables (reference: spec/fixtures/foodmart.xml:128-160 AggName); the
layout question "how do two fact-grain tables join without moving
100 TB?" never arises there because Mondrian pushes one SQL statement
into a single database.  On Spark it is THE question: every plan in
PLANS.md shows exactly one sort-merge join — lineitem⋈orders on
orderkey — and at 100 TB that join's two shuffles (re-hash both
children across the cluster) dominate the query.

Bucketing removes them.  Writing both tables with `bucketBy(N, key)`
+ `sortBy(key)` pins row placement by `hash(key) % N` at WRITE time,
so at READ time Spark proves both sides' partitioning matches the join
keys and plans a zero-shuffle (and with sortBy, zero-sort) merge join.
The cost is paid once at ingest, amortized over every query.

Cluster sizing guidance (100 TB lineitem ≈ 600 G rows):
  - buckets ≈ table_bytes / target_partition_bytes (~256 MB compressed)
    → ~4096 buckets; keep one bucket count across all fact-grain tables
    so every pair co-locates.
  - bucket column = the dominant join key (orderkey), which is also
    near-uniform — bucketing by a skewed key recreates the skew problem
    at write time (see operators/skew.py for that case).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .registry import load_table

# fact-grain tables and their dominant join key
BUCKET_SPECS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}


def materialize_bucketed(spark: SparkSession, sf_dir: str,
                         database: str = "bucketed",
                         n_buckets: int = 8,
                         specs: dict[str, str] | None = None) -> None:
    """One-time ingest: write each fact-grain table bucketed+sorted on
    its join key as a managed table `{database}.{name}`.

    `n_buckets` must be IDENTICAL across tables that join each other —
    Spark only elides the shuffle when both sides hash into the same
    bucket count.  8 suits the local test scale; see module docstring
    for 100 TB sizing.

    `specs` overrides the {table: bucket_key} map — the advisor derives
    one from the served-query log (plans/advisor.recommend_bucketing);
    the default covers the canonical TPC-H fact pair.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, key in (specs or BUCKET_SPECS).items():
        df = load_table(spark, sf_dir, name)
        (df.write
           .bucketBy(n_buckets, key)
           .sortBy(key)
           .mode("overwrite")
           .format("parquet")
           .saveAsTable(f"{database}.{name}"))


def recommended_n_buckets(sf_dir: str, tables: list[str] | tuple | dict,
                          target_bytes: int = 256 << 20,
                          lo: int = 8, hi: int = 4096) -> int:
    """Size the bucket count from the data instead of guessing (r12):
    on-disk bytes of the LARGEST table in the join group divided by
    the target per-bucket size (~256 MB compressed — the same
    granularity as `spark.sql.files.maxPartitionBytes`), rounded UP to
    a power of two (repartition-friendly splits/merges) and clamped to
    [lo, hi].  ONE count across the group so every pair co-locates.
    At 100 TB lineitem this lands at the hi clamp (4096); at local
    test scale it floors at `lo` — both are the right answer."""
    biggest = 0
    for name in tables:
        size = 0
        for ext in ("parquet", "csv", "json", "orc"):
            p = os.path.join(sf_dir, f"{name}.{ext}")
            if os.path.isfile(p):
                size = os.path.getsize(p)
                break
            if os.path.isdir(p):
                size = sum(os.path.getsize(os.path.join(root, f))
                           for root, _, files in os.walk(p)
                           for f in files)
                break
        biggest = max(biggest, size)
    n = max(1, -(-biggest // target_bytes))   # ceil division
    p2 = 1
    while p2 < n:
        p2 *= 2
    return max(lo, min(hi, p2))


def load_bucketed(spark: SparkSession, name: str,
                  database: str = "bucketed") -> DataFrame:
    """Read a previously materialized bucketed table.  The bucketing
    metadata lives in the catalog, so this MUST go through
    `spark.table` — `spark.read.parquet` on the same files would lose
    the layout and reintroduce the shuffle."""
    return spark.table(f"{database}.{name}")


def bucketed_available(spark: SparkSession, name: str,
                       database: str = "bucketed") -> bool:
    return (spark.catalog.databaseExists(database)
            and spark.catalog.tableExists(f"{database}.{name}"))


def load_table_preferring_bucketed(spark: SparkSession, sf_dir: str,
                                   name: str,
                                   database: str = "bucketed") -> DataFrame:
    """Registry-compatible loader that routes fact-grain reads to the
    bucketed copy when one has been materialized (the AggName-style
    routing decision, applied to layout instead of grain)."""
    if name in BUCKET_SPECS and bucketed_available(spark, name, database):
        return load_bucketed(spark, name, database)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Time-partitioned layout: partition pruning for time-dimension cuts
# ---------------------------------------------------------------------------

def materialize_time_partitioned(spark: SparkSession, sf_dir: str,
                                 out_path: str, table: str = "lineitem",
                                 ts_col: str = "l_shipdate") -> None:
    """One-time ingest: write a fact table hive-partitioned by derived
    (year, month) of its time column.

    Every time-dimension cut in this engine reduces to a predicate on
    year/month/... derivations of the fact timestamp (tpch._time_dim),
    so with this layout a `WHERE ([Time].[1995])` cut prunes to 12 of
    ~84 month directories before a single byte is read — the dominant
    cost saver at 100 TB, where a typical query touches one year of a
    seven-year table.  Directory count stays bounded (years x 12), well
    under the small-files cliff; do NOT partition by day at this row
    width (~2,500 dirs and tiny files).

    Bucketing (above) and time-partitioning compose: partitionBy for
    pruning + bucketBy for co-located joins on the same writer.
    """
    import pyspark.sql.functions as F
    df = load_table(spark, sf_dir, table)
    (df.withColumn("p_year", F.year(ts_col))
       .withColumn("p_month", F.month(ts_col))
       .write.partitionBy("p_year", "p_month")
       .mode("overwrite").parquet(out_path))


def load_time_partitioned(spark: SparkSession, out_path: str) -> DataFrame:
    """Read the partitioned copy; p_year/p_month surface as ordinary
    columns, and filters on them become PartitionFilters (directory
    pruning), not data filters."""
    return spark.read.parquet(out_path)

"""Structured Streaming surface over the events fact.

The reference has no streaming (SURVEY §2.11) — this is the engine
extension that makes the window operators (operators/windows.py)
incremental: the *same* expressions run under readStream with a
watermark, so batch and streaming stay semantically aligned
(tested via Trigger.availableNow into a memory sink).

Scale notes: state store size is bounded by the watermark horizon;
shuffle key for sessionization is user_id (skew -> AQE/salting);
sink should be an idempotent upsert keyed on (window_start[, user]).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import load_table


def stream_events(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int = 1) -> DataFrame:
    """readStream over the events parquet directory.  Schema is taken
    from a batch read (streaming parquet needs an explicit schema);
    nanosecond timestamps get the same micros conversion as the batch
    path so batch/stream results match."""
    batch = load_table(spark, sf_dir, "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        # streaming file sources need a directory; stage a symlink dir
        d = tempfile.mkdtemp(prefix="mrs_stream_")
        os.symlink(path, os.path.join(d, "events.parquet"))
        path = d
    stream = (spark.readStream
              .schema(raw_schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(path))
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream.select(*batch.columns)


def streaming_tumbling(events: DataFrame, duration: str = "1 day",
                       watermark: str = "2 days") -> DataFrame:
    """Watermarked tumbling-window aggregate — append-mode safe: a
    window finalizes once the watermark passes its end, bounding state."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", duration).alias("win"))
            .agg(F.sum(F.expr("CAST(value AS DECIMAL(25,6))")).cast("double")
                   .alias("sum_value"),
                 F.count("event_id").alias("event_count"),
                 F.approx_count_distinct("user_id").alias("approx_users"))
            .select(F.col("win.start").alias("win_start"),
                    "sum_value", "event_count", "approx_users"))


def run_available_now(stream_df: DataFrame, query_name: str = "events_agg"):
    """Drain the stream with Trigger.availableNow into a memory sink;
    returns the StreamingQuery (caller awaits + reads the table)."""
    return (stream_df.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start())

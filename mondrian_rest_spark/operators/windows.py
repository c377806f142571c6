"""Event-time window aggregations over the events fact table.

The reference has no streaming surface (SURVEY §2.11); these extend the
engine with the standard Structured-Streaming-compatible window
operators — the same expressions run unchanged under readStream (see
streaming/events.py).

Scale notes: tumbling/sliding windows are plain groupBy aggregations
(partial+final hash agg); session windows use Spark's native
``session_window`` which sort-merges within user partitions — the
shuffle key is user_id, so skewed users are the thing to watch (AQE
skew-join/salting applies).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _metrics():
    return [
        F.sum(F.expr("CAST(value AS DECIMAL(25,6))")).cast("double").alias("sum_value"),
        F.count("event_id").alias("event_count"),
        F.countDistinct("user_id").alias("user_count"),
    ]


def tumbling(df: DataFrame, duration: str = "1 day",
             ts_col: str = "ts") -> DataFrame:
    """Tumbling event-time windows (reference extension; F.window)."""
    return (df.groupBy(F.window(F.col(ts_col), duration).alias("win"))
              .agg(*_metrics())
              .select(F.col("win.start").alias("win_start"),
                      "sum_value", "event_count", "user_count"))


def sliding(df: DataFrame, duration: str = "2 days", slide: str = "1 day",
            ts_col: str = "ts") -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    return (df.groupBy(F.window(F.col(ts_col), duration, slide).alias("win"))
              .agg(*_metrics())
              .select(F.col("win.start").alias("win_start"),
                      "sum_value", "event_count", "user_count"))


def sessionized(df: DataFrame, gap: str = "30 minutes",
                ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Per-user session windows with an inactivity gap — Spark's native
    session_window (streaming-compatible stateful operator)."""
    return (df.groupBy(F.col(user_col),
                       F.session_window(F.col(ts_col), gap).alias("win"))
              .agg(F.sum(F.expr("CAST(value AS DECIMAL(25,6))")).cast("double")
                     .alias("sum_value"),
                   F.count("event_id").alias("event_count"))
              .select(user_col,
                      F.col("win.start").alias("session_start"),
                      "sum_value", "event_count"))


def retention_cohorts(events: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id") -> DataFrame:
    """Weekly retention cohorts (the classic event-analytics rollup):
    cohort = the Monday-truncated week of a user's FIRST activity;
    n_users = distinct users from that cohort active week_offset weeks
    later.  Two hash aggregates + one join, all keyed on user_id — at
    scale both aggregates combine map-side and the join co-locates if
    events are bucketed by user."""
    wk = F.date_trunc("week", F.col(ts_col))
    firsts = (events.groupBy(user_col)
              .agg(F.min(wk).alias("cohort_week")))
    active = events.select(F.col(user_col), wk.alias("__wk")).distinct()
    return (active.join(firsts, user_col)
            .groupBy("cohort_week",
                     F.floor(F.datediff(F.col("__wk"), F.col("cohort_week"))
                             / 7).alias("week_offset"))
            .agg(F.count_distinct(F.col(user_col)).alias("n_users")))

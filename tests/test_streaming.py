"""Structured Streaming parity: the streaming tumbling aggregate over
the events table must match the batch window operator when drained
with Trigger.availableNow."""

import pyspark.sql.functions as F

from mondrian_rest_spark.operators import windows
from mondrian_rest_spark.sources.registry import load_table
from mondrian_rest_spark.streaming.events import (
    run_available_now,
    stream_events,
    streaming_tumbling,
)


def test_streaming_matches_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    assert stream.isStreaming
    q = run_available_now(streaming_tumbling(stream, "1 day"), "t_events_agg")
    q.awaitTermination(120)
    got = {str(r.win_start): (r.sum_value, r.event_count)
           for r in spark.table("t_events_agg").collect()}
    batch = windows.tumbling(load_table(spark, sf_dir, "events"), "1 day")
    exp = {str(r.win_start): (r.sum_value, r.event_count)
           for r in batch.collect()}
    assert got == exp

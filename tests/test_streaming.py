"""Structured Streaming parity: the streaming tumbling aggregate over
the events table must match the batch window operator when drained
with Trigger.availableNow."""

import pyspark.sql.functions as F

from mondrian_rest_spark.operators import windows
from mondrian_rest_spark.sources.registry import load_table
from mondrian_rest_spark.streaming.events import (
    run_available_now,
    stream_events,
    streaming_sessionize,
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


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    """applyInPandasWithState sessionization: every emitted session must
    equal the batch session_window result for the same (user, start);
    append-mode emission covers the sessions closed by a later event or
    a fired timeout (open tail sessions legitimately stay in state)."""
    stream = stream_events(spark, sf_dir)
    q = run_available_now(streaming_sessionize(stream, "30 minutes"),
                          "t_sessions", output_mode="append")
    q.awaitTermination(180)
    got = {(r.user_id, str(r.session_start)): (round(r.sum_value, 6),
                                               r.event_count)
           for r in spark.table("t_sessions").collect()}
    batch = windows.sessionized(load_table(spark, sf_dir, "events"),
                                "30 minutes")
    exp = {(r.user_id, str(r.session_start)): (round(r.sum_value, 6),
                                               r.event_count)
           for r in batch.collect()}
    assert got, "no sessions emitted"
    assert set(got) <= set(exp)
    mismatches = {k for k in got if got[k] != exp[k]}
    assert not mismatches, f"{len(mismatches)} sessions disagree with batch"
    # in-batch closures alone must recover the vast majority of sessions
    assert len(got) >= 0.6 * len(exp)

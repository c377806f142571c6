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


def test_watermark_drops_late_data(spark, tmp_path):
    """The scale contract of the watermark: state is bounded because a
    window finalizes once the watermark passes it, and events arriving
    later than the horizon are DROPPED from the stream result (batch
    over the same files still sees them — the documented divergence)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "events.parquet"
    d.mkdir()

    def write(name, rows, mtime):
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 10**6 for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        })
        p = str(d / name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    day = 86400
    # the watermark a batch filters with is computed from data seen
    # through the PREVIOUS batch, so the late file must trail the
    # watermark-advancing file by a full batch:
    # batch 0: on-time day-0 events
    write("a.parquet", [(1, 0, 1, 1.0), (2, 3600, 1, 2.0)], mtime=1_000_000)
    # batch 1: day-9 event -> advances the event-time high mark
    write("b.parquet", [(3, 9 * day, 1, 4.0)], mtime=1_000_100)
    # batch 2: spacer; since Spark 3.4 the LATE-event filter uses the
    # previous batch's watermark (eviction uses the current one), so
    # the day-8 watermark only filters input from batch 3 on — and the
    # day-0 window's state is evicted+emitted at the end of this batch
    write("c.parquet", [(5, 9 * day + 60, 1, 16.0)], mtime=1_000_200)
    # batch 3: a LATE day-0 event, far behind the day-8 watermark
    write("d.parquet", [(4, 7200, 1, 8.0)], mtime=1_000_300)

    from mondrian_rest_spark.streaming.events import (run_available_now,
                                                      streaming_tumbling)
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d)))
    # append mode is where watermark semantics live: complete mode keeps
    # all state forever and would absorb the late row
    q = run_available_now(streaming_tumbling(stream, "1 day", "1 day"),
                          "t_late_agg", output_mode="append")
    q.awaitTermination(120)
    by_win = {str(r.win_start): r for r in
              spark.table("t_late_agg").collect()}
    day0 = next(v for k, v in by_win.items() if k.startswith("1970-01-01"))
    # finalized day-0 window holds only the two on-time events
    assert day0.event_count == 2 and day0.sum_value == 3.0
    # batch over the same directory sees the late event — 3 events
    batch = (spark.read.parquet(str(d))
             .filter(F.col("ts") < F.lit("1970-01-02"))
             .agg(F.count("*").alias("n")).collect()[0])
    assert batch["n"] == 3


def test_streaming_neardup_ingest_matches_batch(spark, tmp_path):
    """Ingest-time MinHash-LSH filtering: streaming survivors must
    equal the batch computation (same signature expressions via
    minhash_signature_frames), and the dropped set must equal the
    brute-force cross-corpus jaccard ground truth."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mondrian_rest_spark.operators import dedup
    from mondrian_rest_spark.streaming.events import streaming_neardup_ingest

    hist_rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "machine learning pipelines need careful data deduplication"),
        (3, "spark structured streaming handles late data with watermarks"),
        (4, "completely unrelated historical text about mountain weather"),
    ]
    arriving = [
        # near-dup of 1 (one word changed)
        (101, "the quick brown fox jumps over the lazy cat near the river"),
        # exact copy of 2
        (102, "machine learning pipelines need careful data deduplication"),
        # novel
        (103, "a fresh document with entirely new content and vocabulary"),
        # near-dup of 3 (one word changed)
        (104, "spark structured streaming handles late data with checkpoints"),
        # novel
        (105, "another genuinely novel arrival about cooking pasta properly"),
    ]
    hist = spark.createDataFrame(hist_rows, ["doc_id", "text"])
    arr = spark.createDataFrame(arriving, ["doc_id", "text"])

    index = dedup.build_neardup_index(hist)
    for f in index:
        f.persist().count()

    # ground truth: brute-force cross-corpus jaccard
    sa = dedup.with_shingles(arr).select(
        F.col("doc_id").alias("new_id"), F.col("shingles").alias("sa"))
    sb = dedup.with_shingles(hist).select(
        F.col("doc_id").alias("hist_id"), F.col("shingles").alias("sb"))
    brute = (sa.crossJoin(sb)
             .withColumn("j", F.size(F.array_intersect("sa", "sb")) /
                              F.size(F.array_union("sa", "sb")))
             .filter(F.col("j") >= 0.5))
    exp_dropped = {r.new_id for r in brute.collect()}
    assert exp_dropped == {101, 102, 104}

    # batch path
    batch_pairs = dedup.neardup_pairs_against(arr, *index, threshold=0.5)
    assert {r.new_id for r in batch_pairs.collect()} == exp_dropped

    # streaming path over one-file-per-trigger micro-batches
    d = tmp_path / "arrivals.parquet"
    d.mkdir()
    for i, row in enumerate(arriving):
        pq.write_table(pa.table({
            "doc_id": pa.array([row[0]], pa.int64()),
            "text": pa.array([row[1]], pa.string())}),
            str(d / f"f{i}.parquet"))
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d)))
    survived: list = []
    q = streaming_neardup_ingest(
        stream, index, threshold=0.5,
        on_batch=lambda df, _bid: survived.extend(
            r.doc_id for r in df.collect()))
    q.awaitTermination(180)
    assert sorted(survived) == [103, 105]
    for f in index:
        f.unpersist()


def test_streaming_neardup_incremental_index(spark, tmp_path):
    """Incremental ingest: a doc near-dupping an earlier ACCEPTED
    arrival (not in the seed corpus) is dropped, within-batch clusters
    collapse to the min id, and the parquet index grows with each
    batch's survivors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mondrian_rest_spark.streaming.events import (
        init_neardup_index, streaming_neardup_ingest_incremental)

    seed = spark.createDataFrame(
        [(1, "historical baseline text about harvesting wheat in autumn")],
        ["doc_id", "text"])
    idx = str(tmp_path / "ndidx")
    init_neardup_index(spark, idx, seed)

    batches = [
        # batch 0: novel + its within-batch near-dup (202 collapses)
        [(201, "streaming pipelines accept only genuinely novel documents"),
         (202, "streaming pipelines accept only genuinely novel texts")],
        # batch 1: near-dup of ACCEPTED 201 (jaccard 4/6) -> dropped
        # via the updated index
        [(203, "streaming pipelines accept only genuinely novel stories")],
        # batch 2: near-dup of the SEED -> dropped; plus a novel doc
        [(204, "historical baseline text about harvesting wheat in summer"),
         (205, "completely different content on deep sea navigation")],
    ]
    d = tmp_path / "arrivals.parquet"
    d.mkdir()
    import os
    for i, rows in enumerate(batches):
        p = str(d / f"f{i}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}), p)
        os.utime(p, (1000 + i, 1000 + i))
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d)))
    survived: list = []
    q = streaming_neardup_ingest_incremental(
        stream, spark, idx, threshold=0.5,
        on_batch=lambda df, _b: survived.extend(
            r.doc_id for r in df.collect()))
    q.awaitTermination(240)
    assert sorted(survived) == [201, 205]
    # index grew beyond the seed: survivors' ids are present
    sizes = spark.read.parquet(f"{idx}/sizes")
    assert {r.doc_id for r in sizes.collect()} == {1, 201, 205}


def test_streaming_neardup_incremental_no_driver_collect():
    """Scale guard: the incremental ingest batch path must not localize
    micro-batches through the driver — the survivor pin is a staging
    write + re-read, not a .collect()."""
    import inspect

    from mondrian_rest_spark.streaming import events

    src = inspect.getsource(events.streaming_neardup_ingest_incremental)
    assert ".collect()" not in src


def _capture_process(ingest_fn, *args, **kwargs):
    """Extract the foreachBatch closure from an ingest builder without
    starting a real StreamingQuery (tests drive it with explicit
    batch_ids — exactly how the streaming runtime calls it)."""
    captured = {}

    class _FakeWriter:
        def foreachBatch(self, fn):
            captured["fn"] = fn
            return self

        def trigger(self, **kw):
            return self

        def start(self):
            return None

    class _FakeStream:
        writeStream = _FakeWriter()

    ingest_fn(_FakeStream(), *args, **kwargs)
    return captured["fn"]


def test_streaming_neardup_incremental_replay_idempotent(spark, tmp_path):
    """Exactly-once index append: replaying a micro-batch (same
    batch_id, e.g. after a crash between sink write and index append)
    must leave the index row counts unchanged — each batch commits its
    signatures by overwriting its own batch= partition, and the
    candidate read excludes that partition."""
    from mondrian_rest_spark.streaming.events import (
        init_neardup_index, streaming_neardup_ingest_incremental)

    seed = spark.createDataFrame(
        [(1, "historical baseline text about harvesting wheat in autumn")],
        ["doc_id", "text"])
    idx = str(tmp_path / "ndidx")
    init_neardup_index(spark, idx, seed)

    batch = spark.createDataFrame(
        [(301, "replayed batches must not duplicate index rows"),
         (302, "a second novel doc rides along in the same batch")],
        ["doc_id", "text"])
    survived: list = []
    # capture _process (the exact fn foreachBatch would invoke) so we
    # can drive it twice with the SAME batch_id — a crash replay
    process = _capture_process(
        streaming_neardup_ingest_incremental, spark, idx, threshold=0.5,
        on_batch=lambda df, _b: survived.extend(
            r.doc_id for r in df.collect()))

    def counts():
        return tuple(spark.read.parquet(f"{idx}/{c}").count()
                     for c in ("bands", "shingles", "sizes"))

    process(batch, 7)
    first = counts()
    assert sorted(survived) == [301, 302]
    assert spark.read.parquet(f"{idx}/sizes").count() == 3  # seed + 2

    survived.clear()
    process(batch, 7)       # replay: same batch_id
    assert counts() == first, "replay changed index row counts"
    assert sorted(survived) == [301, 302], \
        "replay must re-accept the same survivors"


def test_streaming_neardup_incremental_large_batch(spark, tmp_path):
    """A micro-batch far larger than a trivial driver round-trip flows
    through the staging pin: 5k docs (mostly novel, with a planted
    near-dup pair) filter and index-append correctly."""
    import pyspark.sql.functions as F

    from mondrian_rest_spark.streaming.events import (
        init_neardup_index, streaming_neardup_ingest_incremental)

    idx = str(tmp_path / "ndidx_big")
    init_neardup_index(spark, idx)   # cold start

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "kappa", "sigma", "omega"]
    base = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.element_at(F.array(*[F.lit(w) for w in words]),
                           ((F.col("id") * (i + 3) + i * 7) % 10 + 1)
                           .cast("int"))
              for i in range(8)],
            F.col("id").cast("string")).alias("text"))
    out = {}
    process = _capture_process(
        streaming_neardup_ingest_incremental, spark, idx,
        threshold=0.5, within_batch=False,
        on_batch=lambda df, b: out.update(n=df.count()))
    process(base, 0)
    assert out["n"] == 5000          # all novel vs empty seed
    assert spark.read.parquet(f"{idx}/sizes").count() == 5000
    # second batch: exact replicas of first-batch docs -> all dropped
    # against the index grown by batch 0
    process(base.withColumn("doc_id", F.col("doc_id") + 10000), 1)
    assert out["n"] == 0
    assert spark.read.parquet(f"{idx}/sizes").count() == 5000


def test_streaming_dedup_bounded_state(spark, tmp_path):
    """Ingest-time exact dedup (training-data pipeline): duplicate
    content arriving within the watermark horizon is dropped; the
    surviving row set matches a batch dropDuplicates on the content
    hash; state is watermark-bounded by construction
    (dropDuplicatesWithinWatermark)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mondrian_rest_spark.streaming.events import (run_available_now,
                                                      streaming_dedup)

    d = tmp_path / "docs.parquet"
    d.mkdir()

    def write(name, rows, mtime):
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 10**6 for r in rows], pa.timestamp("us")),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })
        p = str(d / name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    hour = 3600
    write("a.parquet", [(1, 1 * hour, "alpha"), (2, 2 * hour, "beta")], 1000)
    write("b.parquet", [(3, 3 * hour, "alpha"),          # dup of doc 1
                        (4, 4 * hour, "gamma")], 2000)
    write("c.parquet", [(5, 5 * hour, "beta"),           # dup of doc 2
                        (6, 6 * hour, "alpha")], 3000)   # dup again
    stream = (spark.readStream
              .schema("doc_id bigint, ts timestamp, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d)))
    q = run_available_now(
        streaming_dedup(stream, content_col="text", watermark="1 day"),
        "t_dedup", output_mode="append")
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.table("t_dedup").collect())
    assert got == [1, 2, 4]            # one survivor per distinct content
    assert "text" in spark.table("t_dedup").columns
    assert "__content_hash" not in spark.table("t_dedup").columns


def test_streaming_rollup_maintenance(spark, sf_dir, tmp_path):
    """Streaming fact ingest keeps a time-partitioned rollup fresh:
    each micro-batch folds in via RollupManager.append (delta at the
    rollup grain, dynamic overwrite of only the touched partitions),
    routed queries then reflect every ingested row, and a replayed
    batch_id is a no-op at EVERY crash point (write-ahead staged merge
    + atomic marker — r6 VERDICT item 1)."""
    import pyspark.sql.functions as F
    import pytest

    from mondrian_rest_spark import tpch
    from mondrian_rest_spark.planner import aggregate
    from mondrian_rest_spark.plans.rollup import RollupManager
    from mondrian_rest_spark.query import QueryModel
    from mondrian_rest_spark.sources.registry import load_table
    from mondrian_rest_spark.streaming.events import streaming_rollup_ingest

    mgr = RollupManager(spark, sf_dir, tpch.CATALOG, "Sales")
    mgr.register("nation_year", ("Customer.Nation", "Time.Year"),
                 persist_path=str(tmp_path / "nation_year"),
                 partition_col="year")
    qm = QueryModel(cube="Sales", measures=["Revenue", "Line Count"],
                    drilldown=["Time.Year"])

    # two micro-batches of appended fact rows (real lineitem rows
    # shifted 40/50 years out -> distinct brand-new partitions), staged
    # as one parquet file each so maxFilesPerTrigger=1 -> one batch each
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    stage = tmp_path / "incoming"
    batches = []
    for i, shift in enumerate((40, 50)):
        b = li.withColumn(
            "l_shipdate", F.col("l_shipdate") + F.expr(f"INTERVAL {shift} YEARS"))
        b.coalesce(1).write.mode("overwrite").parquet(str(stage / f"b{i}"))
        batches.append(spark.read.parquet(str(stage / f"b{i}")))
    incoming = tmp_path / "stream_src"
    incoming.mkdir()
    import glob
    import shutil
    for i in range(2):
        src = glob.glob(str(stage / f"b{i}" / "*.parquet"))[0]
        shutil.copy(src, str(incoming / f"batch{i}.parquet"))

    stream = (spark.readStream
              .schema(batches[0].schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(incoming)))
    q = streaming_rollup_ingest(stream, mgr)
    q.awaitTermination(120)

    routed, src = mgr.route(qm)
    assert src == "nation_year"
    got = {r["year"]: (float(r.revenue), r.line_count)
           for r in routed.collect()}
    expected = {r["year"]: (float(r.revenue), r.line_count)
                for r in aggregate(spark, sf_dir, tpch.CATALOG, qm).collect()}
    for b in batches:
        for r in aggregate(spark, sf_dir, tpch.CATALOG, qm,
                           fact_df=b).collect():
            assert r["year"] not in expected
            expected[r["year"]] = (float(r.revenue), r.line_count)
    assert set(got) == set(expected)
    for y, (rev, cnt) in expected.items():
        assert got[y][0] == pytest.approx(rev, rel=1e-9) and got[y][1] == cnt

    # replaying an applied batch_id is a no-op (marker short-circuit)
    process = _capture_process(streaming_rollup_ingest, mgr)
    before = {r["year"]: tuple(r[1:]) for r in mgr.route(qm)[0].collect()}
    process(batches[0], 0)         # batch_id 0 was already applied
    after = {r["year"]: tuple(r[1:]) for r in mgr.route(qm)[0].collect()}
    assert after == before

    # crash window: kill between merge and commit — simulate by
    # deleting the marker AFTER a full apply (the layout already holds
    # the merged values, the staged write-ahead copy still exists) and
    # replaying the same batch_id.  The replay must re-apply the SAME
    # staged values (overwrite), never re-merge the delta on top.
    layout = str(tmp_path / "nation_year")
    marker = layout + "__applied_b0"
    staged = layout + "__batch_b0"
    import os
    assert os.path.exists(marker) and os.path.exists(staged)
    os.remove(marker)
    process(batches[0], 0)
    assert os.path.exists(marker)  # recommitted
    after2 = {r["year"]: tuple(r[1:]) for r in mgr.route(qm)[0].collect()}
    assert after2 == before        # values unchanged: no double-apply

    # gc reclaims staged copies only once their marker is durable
    assert mgr.gc_staging() == 2   # batches b0, b1
    assert not os.path.exists(staged) and os.path.exists(marker)
    assert mgr.gc_staging() == 0


def test_streaming_ann_ingest(spark, sf_dir, tmp_path):
    """Streaming IVF-PQ maintenance: micro-batches of new vectors
    append to the serving layout (stored codebook + centroids), become
    immediately retrievable, and a replayed batch_id is a no-op."""
    import glob
    import shutil

    import pyspark.sql.functions as F

    from mondrian_rest_spark.operators import similarity
    from mondrian_rest_spark.sources.registry import load_table
    from mondrian_rest_spark.streaming.events import streaming_ann_ingest

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    path = str(tmp_path / "pq")
    similarity.materialize_pq(base, path, iters=1)

    incoming = tmp_path / "vec_src"
    incoming.mkdir()
    stage = tmp_path / "vec_stage"
    batches = [emb.filter(F.col("vec_id") % 5 == 0)
                  .filter((F.col("vec_id") % 2 == i)) for i in range(2)]
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(str(stage / f"b{i}"))
        shutil.copy(glob.glob(str(stage / f"b{i}" / "*.parquet"))[0],
                    str(incoming / f"batch{i}.parquet"))

    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(incoming)))
    counts: list = []
    q = streaming_ann_ingest(stream, spark, path, kind="pq",
                             on_batch=lambda n, b: counts.append(n))
    q.awaitTermination(120)
    assert sum(counts) == emb.filter(F.col("vec_id") % 5 == 0).count()

    stored = spark.read.parquet(path)
    ids = [r.vec_id for r in stored.select("vec_id").collect()]
    assert len(ids) == emb.count() and len(set(ids)) == len(ids)

    # an appended vector is retrievable at cosine 1
    probe_id = emb.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id").first()[0]
    vec = list(emb.filter(F.col("vec_id") == probe_id)
               .select("embedding").first()[0])
    top = similarity.pq_topk_from_layout(
        spark, path, None, vec, k=1, n_probe=16, rerank=20).collect()
    assert top[0].vec_id == probe_id and top[0].cosine == 1.0

    # replaying an applied batch_id is a no-op — there is NO marker to
    # race with: the batch's rows live in its own batch=b0
    # sub-partitions and the replayed dynamic overwrite replaces
    # exactly those directories with identical content (r6 VERDICT
    # item 1: crash-at-any-point idempotence)
    before = sorted(r.vec_id for r in
                    spark.read.parquet(path).select("vec_id").collect())
    process = _capture_process(streaming_ann_ingest, spark, path,
                               kind="pq")
    process(batches[0], 0)
    after = sorted(r.vec_id for r in
                   spark.read.parquet(path).select("vec_id").collect())
    assert after == before


def test_streaming_jaccard_exact_incremental(spark, tmp_path):
    """EXACT prefix-index ingest: a doc near-dupping an earlier
    ACCEPTED arrival is dropped even when its shingles never appeared
    in the frozen frequency table (stale order is still a consistent
    order), within-batch clusters collapse, and replay with the same
    batch_id leaves the index row counts unchanged."""
    from mondrian_rest_spark.streaming.events import (
        init_jaccard_index, streaming_jaccard_ingest_incremental)

    seed = spark.createDataFrame(
        [(1, "historical baseline text about harvesting wheat in autumn")],
        ["doc_id", "text"])
    idx = str(tmp_path / "jidx")
    init_jaccard_index(spark, idx, seed, threshold=0.5)

    survived: list = []
    process = _capture_process(
        streaming_jaccard_ingest_incremental, spark, idx, threshold=0.5,
        on_batch=lambda df, _b: survived.extend(
            r.doc_id for r in df.collect()))

    # batch 0: novel doc + its within-batch near-dup (collapses to 401)
    # — every shingle here is UNSEEN by the seed's frozen freq table
    b0 = spark.createDataFrame(
        [(401, "streaming pipelines accept only genuinely novel documents"),
         (402, "streaming pipelines accept only genuinely novel texts")],
        ["doc_id", "text"])
    process(b0, 0)
    # batch 1: near-dup of ACCEPTED 401 -> dropped via the grown index;
    # near-dup of the SEED -> dropped; novel -> kept
    b1 = spark.createDataFrame(
        [(403, "streaming pipelines accept only genuinely novel stories"),
         (404, "historical baseline text about harvesting wheat in summer"),
         (405, "completely different content on deep sea navigation")],
        ["doc_id", "text"])
    process(b1, 1)
    assert sorted(survived) == [401, 405]
    prefixes = spark.read.parquet(f"{idx}/prefixes")
    assert {r.doc_id for r in prefixes.select("doc_id")
            .distinct().collect()} == {1, 401, 405}

    def counts():
        return tuple(spark.read.parquet(f"{idx}/{c}").count()
                     for c in ("prefixes", "shingles"))

    first = counts()
    survived.clear()
    process(b1, 1)          # crash replay: same batch_id
    assert counts() == first, "replay changed index row counts"
    assert sorted(survived) == [405]


def test_streaming_jaccard_incremental_no_driver_collect():
    import inspect

    from mondrian_rest_spark.streaming import events

    src = inspect.getsource(events.streaming_jaccard_ingest_incremental)
    assert ".collect()" not in src


def test_streaming_ingest_concurrent_with_rest_reads(spark, sf_dir,
                                                     tmp_path):
    """r13 (VERDICT r12 #8): the streaming rollup-ingest path shares
    the SparkSession, the routed RollupManager, and the REST result
    cache with concurrent /aggregate readers.  While two micro-batches
    fold into a partitioned rollup, concurrent reads must (a) never
    error, (b) never change values for the UNTOUCHED years (batches
    land in brand-new partitions), and (c) after the drain, serve
    exactly the post-ingest serial result — the append's invalidation
    hook must have flushed every stale cached body."""
    import glob
    import shutil
    import threading

    from mondrian_rest_spark import tpch
    from mondrian_rest_spark.api import create_app
    from mondrian_rest_spark.planner import aggregate
    from mondrian_rest_spark.plans.rollup import RollupManager
    from mondrian_rest_spark.query import QueryModel
    from mondrian_rest_spark.streaming.events import streaming_rollup_ingest

    mgr = RollupManager(spark, sf_dir, tpch.CATALOG, "Sales")
    mgr.register("nation_year", ("Customer.Nation", "Time.Year"),
                 persist_path=str(tmp_path / "nation_year"),
                 partition_col="year")
    app = create_app(tpch.CATALOG, sf_dir, spark=spark,
                     rollup_manager=mgr, flush_secret="s")
    app.config["TESTING"] = True
    url = ("/cubes/Sales/aggregate?drilldown[]=Time.Year"
           "&measures[]=Revenue&nonempty=true")
    def year_values(body):
        years = [m["key"] for m in body["axes"][1]["members"]]
        vals = [v[0] if isinstance(v, list) else v
                for v in body["values"]]
        return dict(zip(years, vals))

    c0 = app.test_client()
    r0 = c0.get(url)
    assert r0.status_code == 200
    base_rows = year_values(r0.get_json())
    base_years = set(base_rows)

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 100)
    stage = tmp_path / "incoming"
    incoming = tmp_path / "stream_src"
    incoming.mkdir()
    schema = None
    for i, shift in enumerate((40, 50)):
        b = li.withColumn("l_shipdate", F.col("l_shipdate")
                          + F.expr(f"INTERVAL {shift} YEARS"))
        b.coalesce(1).write.mode("overwrite").parquet(str(stage / f"b{i}"))
        schema = b.schema
    errors: list = []
    stop = threading.Event()

    def reader(i):
        c = app.test_client()
        while not stop.is_set():
            r = c.get(url)
            if r.status_code != 200:
                errors.append((i, r.status_code))
                return
            rows = year_values(r.get_json())
            for y in base_years:
                if rows.get(y) != base_rows[y]:
                    errors.append((i, y, rows.get(y), base_rows[y]))
                    return

    readers = [threading.Thread(target=reader, args=(i,))
               for i in range(6)]
    for t in readers:
        t.start()
    # feed the two batches mid-traffic, one file per trigger
    for i in range(2):
        src = glob.glob(str(stage / f"b{i}" / "*.parquet"))[0]
        shutil.copy(src, str(incoming / f"batch{i}.parquet"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(incoming)))
    q = streaming_rollup_ingest(stream, mgr)
    q.awaitTermination(180)
    stop.set()
    for t in readers:
        t.join(timeout=120)
    assert not any(t.is_alive() for t in readers), "reader hung"
    assert not errors, errors[:5]
    # post-drain: REST serves the post-ingest values (stale cache
    # flushed by the append invalidation hook), still routed
    r1 = c0.get(url + "&debug=true")
    assert r1.status_code == 200
    body = r1.get_json()
    assert body["source"] == "nation_year"
    got = year_values(body)
    qm = QueryModel(cube="Sales", measures=["Revenue"],
                    drilldown=["Time.Year"], nonempty=True)
    exp = {r["year"]: float(r["revenue"]) for r in
           aggregate(spark, sf_dir, tpch.CATALOG, qm).collect()}
    for i, shift in enumerate((40, 50)):
        b = spark.read.parquet(str(stage / f"b{i}"))
        for r in aggregate(spark, sf_dir, tpch.CATALOG, qm,
                           fact_df=b).collect():
            exp[r["year"]] = exp.get(r["year"], 0.0) + float(r["revenue"])
    assert set(got) == set(exp)
    for y, v in exp.items():
        assert abs(float(got[y]) - v) < 1e-6 * max(1.0, abs(v)), y


def test_streaming_decontaminate_ingest_matches_batch(spark, tmp_path):
    """Ingest-time span decontamination: streaming output must equal
    the batch policy run over the same arrivals — heavy contamination
    dropped, light hits trimmed, clean docs verbatim."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mondrian_rest_spark.operators import dedup, pipeline
    from mondrian_rest_spark.streaming.events import (
        streaming_decontaminate_ingest)

    eval_docs = spark.createDataFrame(
        [(100, "THE EVAL QUESTION TEXT HERE")], ["doc_id", "text"])
    arriving = [
        (201, "THE EVAL QUESTION TEXT HERE plus one extra"),   # drop
        (202, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 "
              "w16 w17 w18 w19 w20 THE EVAL QUESTION TEXT HERE"),  # trim
        (203, "completely clean arriving document body"),      # keep
    ]
    arr = spark.createDataFrame(arriving, ["doc_id", "text"])

    grams = dedup.build_eval_gram_index(eval_docs, n=3)
    grams.persist().count()

    batch = {r.doc_id: r for r in pipeline.decontaminate_corpus(
        arr, n=3, max_fraction=0.2, eval_grams=grams).collect()}
    assert set(batch) == {202, 203}

    d = tmp_path / "decontam_arrivals"
    d.mkdir()
    for i, row in enumerate(arriving):
        pq.write_table(pa.table({
            "doc_id": pa.array([row[0]], pa.int64()),
            "text": pa.array([row[1]], pa.string())}),
            str(d / f"f{i}.parquet"))
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d)))
    got: dict = {}
    q = streaming_decontaminate_ingest(
        stream, grams, n=3, max_fraction=0.2,
        on_batch=lambda df, _bid: got.update(
            {r.doc_id: r for r in df.collect()}))
    q.awaitTermination(180)
    assert set(got) == set(batch)
    for i in got:
        assert got[i].text == batch[i].clean_text
        assert got[i].removed_tokens == batch[i].removed_tokens
    assert got[202].removed_tokens == 5
    assert got[203].text == arriving[2][1]
    grams.unpersist()


def test_streaming_semantic_dedup_ingest(spark, tmp_path):
    """Ingest-time SemDeDup vs a materialized IVF layout: exact
    copies of stored vectors drop (same cell, cosine 1.0), a novel
    vector survives and appends, and within-batch twins collapse to
    the min id.  Survivors land in the layout (count grows by the
    survivor count)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mondrian_rest_spark.operators import similarity
    from mondrian_rest_spark.sources.registry import load_table
    from mondrian_rest_spark.streaming.events import (
        streaming_semantic_dedup_ingest)

    from conftest import SF_DIR
    emb = load_table(spark, SF_DIR, "embeddings")
    stored = emb.filter("vec_id % 2 = 0")
    path = str(tmp_path / "sem_layout/emb")
    similarity.materialize_ivf(stored, path)
    n_stored = spark.read.parquet(path).count()

    copies = [(10_000 + r.vec_id, list(r.embedding))
              for r in stored.limit(3).collect()]
    novel = [1.0 if i % 7 == 0 else -0.9 for i in range(64)]
    twins = [(20_001, novel), (20_002, novel)]
    arrivals = copies + twins
    # precondition: the novel vector is not a near-dup of anything
    # stored (if the synthetic data ever changes, fail HERE, not in
    # the survivor assertion)
    import math
    for r in stored.collect():
        v = list(r.embedding)
        dot = sum(a * b for a, b in zip(novel, v))
        cos = dot / (math.sqrt(sum(a * a for a in novel)) *
                     math.sqrt(sum(b * b for b in v)))
        assert cos < 0.95

    d = tmp_path / "sem_arrivals"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array([a[0] for a in arrivals], pa.int64()),
        "embedding": pa.array([a[1] for a in arrivals],
                              pa.list_(pa.float32()))}),
        str(d / "batch0.parquet"))
    stream = (spark.readStream
              .schema("vec_id bigint, embedding array<float>")
              .parquet(str(d)))
    seen: dict = {}
    q = streaming_semantic_dedup_ingest(
        stream, spark, path, threshold=0.95,
        on_batch=lambda df, n, bid: seen.update(
            {"ids": sorted(r.vec_id for r in df.collect()),
             "n": n, "bid": bid}))
    q.awaitTermination(180)
    assert seen["ids"] == [20_001]        # copies + the twin b dropped
    assert seen["n"] == 1
    assert spark.read.parquet(path).count() == n_stored + 1
    got = spark.read.parquet(path).filter("vec_id = 20001").count()
    assert got == 1


def test_streaming_quality_ingest_matches_batch(spark, tmp_path):
    """Ingest-time quality gate: rule failures and high-perplexity
    docs drop; survivors carry the same audit columns the batch
    composition produces over the same arrivals."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mondrian_rest_spark.operators import textstats
    from mondrian_rest_spark.streaming.events import (
        streaming_quality_ingest)

    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat and it was good here today "
             "for the whole long day it was good")],
        ["doc_id", "text"])
    lm = textstats.unigram_lm(ref)
    lm.persist().count()
    gk = dict(min_tokens=5, min_stopword_hits=1)
    arriving = [
        (201, "the cat sat on the mat and it was good here today"),
        (202, "two words"),                              # rule drop
        (203, "the zz qq xx vv kk jj ww pp mm nn"),      # ppl drop
    ]
    arr = spark.createDataFrame(arriving, ["doc_id", "text"])
    cutoff = 8.0
    batch_keep = set(
        r.doc_id
        for r in (textstats.gopher_rules(arr, **gk).filter("kept")
                  .join(textstats.score_against_lm(arr, lm)
                        .filter(F.col("bits_per_token") <= cutoff),
                        "doc_id"))
        .collect())
    assert batch_keep == {201}
    batch_audit = {r.doc_id: r for r in
                   textstats.score_against_lm(arr, lm).collect()}

    d = tmp_path / "quality_arrivals"
    d.mkdir()
    for i, row in enumerate(arriving):
        pq.write_table(pa.table({
            "doc_id": pa.array([row[0]], pa.int64()),
            "text": pa.array([row[1]], pa.string())}),
            str(d / f"f{i}.parquet"))
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d)))
    got: dict = {}
    q = streaming_quality_ingest(
        stream, lm, max_bits_per_token=cutoff, gate_kwargs=gk,
        on_batch=lambda df, _bid: got.update(
            {r.doc_id: r for r in df.collect()}))
    q.awaitTermination(180)
    assert set(got) == batch_keep
    r = got[201]
    assert r.bits_per_token == batch_audit[201].bits_per_token
    assert r.oov_tokens == batch_audit[201].oov_tokens
    assert r.text == arriving[0][1]
    lm.unpersist()


def test_streaming_image_dedup_ingest(spark, tmp_path):
    """Ingest-time perceptual dedup: an exact and a perturbed copy of
    a SEED image drop; a novel image survives and appends its hash so
    a LATER batch's copy of it drops too; a non-PNG passes through."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mondrian_rest_spark.operators import media_codec, multimodal
    from mondrian_rest_spark.streaming.events import (
        init_image_index, streaming_image_dedup_ingest)

    w, h = 32, 24
    base = bytes(((x * 8 + y * 3) % 256)
                 for y in range(h) for x in range(w) for _ in range(3))
    pert = bytearray(base)
    for i in range(0, 30, 3):
        pert[i] = (pert[i] + 6) % 256
    novel = bytes(((x * 37 + y * 91 + (x * y) % 7 * 40) % 256)
                  for y in range(h) for x in range(w) for _ in range(3))
    seed = spark.createDataFrame(
        [(1, "image", media_codec.png_encode(base, w, h, 3),
          "image/png")], multimodal.MEDIA_SCHEMA)
    ixp = str(tmp_path / "img_ix")
    init_image_index(spark, ixp, seed)

    enc = media_codec.png_encode
    batches = [
        # batch 0: copy of seed (drop), perturbed seed (drop),
        # novel (keep), non-PNG (pass through)
        [(10, "image", enc(base, w, h, 3)),
         (11, "image", enc(bytes(pert), w, h, 3)),
         (12, "image", enc(novel, w, h, 3)),
         (13, "video", b"\x99notpng")],
        # batch 1: copy of the batch-0 NOVEL survivor -> drop
        [(20, "image", enc(novel, w, h, 3))],
    ]
    d = tmp_path / "media_arrivals"
    d.mkdir()
    for bi, rows in enumerate(batches):
        pq.write_table(pa.table({
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
            "mime": pa.array(["x"] * len(rows), pa.string())}),
            str(d / f"f{bi}.parquet"))
    stream = (spark.readStream
              .schema(multimodal.MEDIA_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d)))
    got: dict = {}
    q = streaming_image_dedup_ingest(
        stream, spark, ixp,
        on_batch=lambda df, bid: got.setdefault(
            bid, sorted(r.media_id for r in df.collect())))
    q.awaitTermination(240)
    assert got[0] == [12, 13]
    assert got[1] == []
    # the index now holds seed + the one accepted image hash
    ix = spark.read.parquet(f"{ixp}/hashes")
    assert sorted(r.media_id for r in ix.collect()) == [1, 12]


def test_streaming_image_dedup_replay_idempotent(spark, tmp_path):
    """Crash-replay contract for the image index: re-driving a batch
    with the SAME batch_id leaves index row counts unchanged and
    re-accepts the same survivors (own-partition exclusion + partition
    overwrite, like the text near-dup index)."""
    from mondrian_rest_spark.operators import media_codec, multimodal
    from mondrian_rest_spark.streaming.events import (
        init_image_index, streaming_image_dedup_ingest)

    w, h = 32, 24
    base = bytes(((x * 8 + y * 3) % 256)
                 for y in range(h) for x in range(w) for _ in range(3))
    novel = bytes(((x * 37 + y * 91 + (x * y) % 7 * 40) % 256)
                  for y in range(h) for x in range(w) for _ in range(3))
    seed = spark.createDataFrame(
        [(1, "image", media_codec.png_encode(base, w, h, 3),
          "image/png")], multimodal.MEDIA_SCHEMA)
    ixp = str(tmp_path / "img_ix_replay")
    init_image_index(spark, ixp, seed)
    batch = spark.createDataFrame(
        [(10, "image", media_codec.png_encode(base, w, h, 3), "x"),
         (12, "image", media_codec.png_encode(novel, w, h, 3), "x")],
        multimodal.MEDIA_SCHEMA)
    survived: list = []
    process = _capture_process(
        streaming_image_dedup_ingest, spark, ixp,
        on_batch=lambda df, _b: survived.extend(
            r.media_id for r in df.collect()))
    process(batch, 7)
    first = spark.read.parquet(f"{ixp}/hashes").count()
    assert survived == [12] and first == 2      # seed + novel
    survived.clear()
    process(batch, 7)                            # crash replay
    assert spark.read.parquet(f"{ixp}/hashes").count() == first
    assert survived == [12]


def test_streaming_anomaly_monitor_matches_batch(spark, tmp_path):
    """The incremental monitor's flags after draining all batches
    equal the batch w12 operator over the union of events, a late
    event folds into its TRUE day, and a crash replay of a batch
    leaves the state totals unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    from mondrian_rest_spark.streaming.events import (
        streaming_anomaly_monitor)

    t0 = datetime(2024, 1, 1)
    view = [48, 50, 52, 48, 50, 52, 48, 50, 500]
    rows, eid = [], 0
    for day, n in enumerate(view):
        for j in range(n):
            eid += 1
            rows.append((eid, t0 + timedelta(days=day, seconds=j),
                         j % 5, "view", 1.0, "{}"))
    # batch 0: all but 60 events; batch 1: the rest, including LATE
    # events for earlier days
    cut = len(rows) - 60
    d = tmp_path / "anomaly_arrivals"
    d.mkdir()
    for bi, chunk in enumerate((rows[:cut], rows[cut:])):
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in chunk], pa.int64()),
            "ts": pa.array([r[1] for r in chunk],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in chunk], pa.int64()),
            "event_type": pa.array([r[3] for r in chunk], pa.string()),
            "value": pa.array([r[4] for r in chunk], pa.float64()),
            "props": pa.array([r[5] for r in chunk], pa.string())}),
            str(d / f"f{bi}.parquet"))
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    got: dict = {}
    sp = str(tmp_path / "anomaly_state")
    q = streaming_anomaly_monitor(
        stream, spark, sp,
        on_batch=lambda df, bid: got.update({bid: df.collect()}))
    q.awaitTermination(240)
    batch_df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        ["event_id", "ts", "user_id", "event_type"])
    expect = windows.daily_count_anomalies(batch_df, 7).collect()
    final = {(r.event_type, r.day): (r.n, r.mean_prev, r.z,
                                     r.is_anomaly) for r in got[1]}
    assert final == {(r.event_type, r.day): (r.n, r.mean_prev, r.z,
                                             r.is_anomaly)
                     for r in expect}
    spike_day = t0 + timedelta(days=8)
    assert final[("view", spike_day)][3] is True
    # replay idempotence: re-drive batch 1 with the same id
    from mondrian_rest_spark.operators import windows as _w
    before = (spark.read.parquet(f"{sp}/daily")
              .agg(F.sum("n")).collect()[0][0])
    replay: dict = {}
    process = _capture_process(
        streaming_anomaly_monitor, spark, sp,
        on_batch=lambda df, bid: replay.update({bid: df.collect()}))
    chunk = rows[cut:]
    bdf = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in chunk],
        schema)
    process(bdf, 1)
    after = (spark.read.parquet(f"{sp}/daily")
             .agg(F.sum("n")).collect()[0][0])
    assert after == before
    assert {(r.event_type, r.day): r.is_anomaly for r in replay[1]} == \
           {(r.event_type, r.day): r.is_anomaly for r in expect}

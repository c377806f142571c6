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
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        # withWatermark rejects NTZ event time; mirror the batch path's
        # NTZ->LTZ normalization (registry._ntz_to_ltz, UTC session) so
        # batch and streaming window boundaries stay identical
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
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


def streaming_sessionize(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with
    an inactivity gap, via ``applyInPandasWithState`` (Arrow-batched
    Python state machine — the escape hatch for semantics
    ``session_window`` can't express, e.g. per-session derived stats).

    Semantics match the batch ``operators.windows.sessionized``: a
    session closes when ``gap`` passes with no event.  Emission is
    append-mode: a closed session emits when a later event of the same
    user arrives past the gap, or when the event-time timeout fires
    (watermark passes last_ts + gap); open sessions at stream end stay
    in state unemitted — the price of correct late-data handling.

    State per user is O(1) (start, last, sum, count), bounded overall
    by the number of active users inside the watermark horizon.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _interval_micros(gap)
    out_schema = ("user_id bigint, session_start timestamp, "
                  "sum_value double, event_count bigint")
    state_schema = "start long, last long, s double, c long"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            start, last, sval, cnt = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start, unit="us")],
                "sum_value": [sval], "event_count": [cnt]})
            return
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        start = last = None
        sval, cnt = 0.0, 0
        if state.exists:
            start, last, sval, cnt = state.get
        closed = []
        for ts, value in zip(rows["ts"], rows["value"]):
            t_us = ts.value // 1000  # pandas ns -> us
            if last is not None and t_us - last > gap_us:
                closed.append((start, sval, cnt))
                start, sval, cnt = t_us, 0.0, 0
            if start is None:
                start = t_us
            last = t_us
            sval += float(value)
            cnt += 1
        state.update((start, last, sval, cnt))
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # millis
        if closed:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "sum_value": [s for _, s, _ in closed],
                "event_count": [c for _, _, c in closed]})

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                    GroupStateTimeout.EventTimeTimeout))


def streaming_dedup(stream: DataFrame, keys: list[str] | None = None,
                    content_col: str | None = None, ts_col: str = "ts",
                    watermark: str = "1 day") -> DataFrame:
    """Streaming exact dedup — the ingest-time analog of
    ``operators.dedup.deduplicate_exact`` for a training-data pipeline
    (drop re-crawled/replayed duplicates as they arrive).

    Uses ``dropDuplicatesWithinWatermark``: the dedup state for a key
    is evicted once the watermark passes its event time, so state is
    bounded by the watermark horizon × arrival rate — a plain
    streaming ``dropDuplicates`` would grow state forever at 100 TB.
    Dedup by explicit ``keys`` or by a 128-bit content hash of
    ``content_col`` (exact-dedup semantics).
    """
    if content_col is not None:
        stream = stream.withColumn("__content_hash", F.md5(F.col(content_col)))
        keys = ["__content_hash"]
    if not keys:
        raise ValueError("streaming_dedup needs keys or content_col")
    out = (stream
           .withWatermark(ts_col, watermark)
           .dropDuplicatesWithinWatermark(keys))
    return out.drop("__content_hash") if content_col is not None else out


def streaming_neardup_ingest(stream: DataFrame, index,
                             threshold: float = 0.5,
                             text_col: str = "text", id_col: str = "doc_id",
                             n: int = 3, num_hashes: int = 32,
                             bands: int = 16,
                             on_batch=None):
    """Ingest-time NEAR-duplicate filter — the streaming analog of the
    batch MinHash-LSH dedup (operators/dedup.neardup_minhash_lsh, d03):
    arriving documents whose exact shingle jaccard against the
    historical corpus is >= ``threshold`` are dropped; survivors are
    handed to ``on_batch(survivors_df, batch_id)``.

    Runs inside ``foreachBatch`` — the idiomatic Spark shape for this:
    each micro-batch is a plain DataFrame, so the window-based shingle
    hashing and the candidate band join against the static index reuse
    the BATCH operators verbatim (signature parity is structural, not
    re-implemented).  Candidates come from an equi-join on
    (band_idx, band_sig) against the index — never a scan of the
    corpus — and false positives are removed by the exact-jaccard
    verify before anything is dropped, so the only error mode is the
    documented S-curve miss.

    ``index`` is the (bands, shingles, sizes) triple from
    operators/dedup.build_neardup_index; persist its frames.  At
    100 TB the index lives as parquet bucketed on (band_idx,
    band_sig), and ``on_batch`` appends the survivors' signature rows
    back to it, making the filter incremental.

    Within-batch duplicates are NOT collapsed here (batch-vs-index
    only); compose with ``streaming_dedup`` for exact within-stream
    dups, or run the batch near-dup job over the accepted corpus
    periodically.
    """
    from ..operators.dedup import neardup_pairs_against

    index_bands, index_shingles, index_sizes = index

    def _process(batch_df, batch_id):
        dups = (neardup_pairs_against(
                    batch_df, index_bands, index_shingles, index_sizes,
                    threshold, text_col, id_col, n, num_hashes, bands)
                .select(F.col("new_id").alias(id_col))
                .dropDuplicates([id_col]))
        keep = batch_df.join(dups, on=id_col, how="left_anti")
        if on_batch is not None:
            on_batch(keep, batch_id)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def init_neardup_index(spark, index_path: str, docs: DataFrame | None = None,
                       text_col: str = "text", id_col: str = "doc_id",
                       n: int = 3, num_hashes: int = 32,
                       bands: int = 16) -> str:
    """Seed a parquet-backed near-dup signature index at ``index_path``
    (subdirs bands/ shingles/ sizes/) from an optional historical
    corpus.  Each component is laid out as ``batch=<label>`` partition
    directories (the seed is ``batch=seed``); the incremental ingest
    below commits one partition per micro-batch, which is what makes
    its index append idempotent under batch replay."""
    from ..operators.dedup import minhash_signature_frames

    if docs is None:   # cold start: empty index, correct schemas
        docs = spark.createDataFrame(
            [], f"{id_col} bigint, {text_col} string")
    ex, stats, bands_df = minhash_signature_frames(
        docs, text_col, id_col, n, num_hashes, bands)
    bands_df.write.mode("overwrite").parquet(f"{index_path}/bands/batch=seed")
    ex.write.mode("overwrite").parquet(f"{index_path}/shingles/batch=seed")
    stats.select(F.col(id_col), F.col("__sz")).write.mode(
        "overwrite").parquet(f"{index_path}/sizes/batch=seed")
    return index_path


def streaming_neardup_ingest_incremental(stream: DataFrame, spark,
                                         index_path: str,
                                         threshold: float = 0.5,
                                         text_col: str = "text",
                                         id_col: str = "doc_id",
                                         n: int = 3, num_hashes: int = 32,
                                         bands: int = 16,
                                         within_batch: bool = True,
                                         on_batch=None):
    """Fully incremental ingest-time near-dup filter: like
    :func:`streaming_neardup_ingest`, but the index lives as parquet
    under ``index_path`` (seeded by :func:`init_neardup_index`) and
    every batch's SURVIVORS append their signature rows back to it —
    so a document that near-dups an earlier *accepted arrival* (not
    just the seed corpus) is dropped too.  ``within_batch=True``
    additionally collapses near-dup clusters inside each micro-batch
    (min-id survivor), making the accepted corpus near-dup-free at
    every point in time.

    foreachBatch runs batches sequentially, so the read-then-append on
    the index is race-free; at 100 TB the appends would go to a
    bucketed table and the candidate join stays band-key-narrow either
    way.

    Exactly-once + scale posture (per-batch partition commit):

    * The index read excludes the CURRENT batch's own ``batch=b<id>``
      partition (a partition-pruned filter), and every index write is a
      ``mode("overwrite")`` of exactly that partition directory — so a
      batch replayed after a crash between sink write and index append
      recomputes the same survivor set against the same prior index
      state and overwrites its own partitions in place: index row
      counts are unchanged by replay (idempotent append).
    * The survivor set is PINNED by writing it to a staging partition
      and re-reading it (``keep``'s lineage reads the index parquet it
      is about to grow, and micro-batch plans re-evaluate, so without a
      pin the post-append re-evaluation would meet the batch's own
      signatures and drop every row as a self-dup).  The staging write
      is a distributed parquet write — no driver-side collect, so a
      micro-batch larger than driver memory (availableNow over a
      backlog) is fine.
    """
    from ..operators.dedup import (deduplicate_neardup,
                                   minhash_signature_frames,
                                   neardup_pairs_against,
                                   unpersist_request_frames)

    def _read_ix(component: str, own: str):
        # partition column `batch` (string) is discovery-only metadata;
        # the != filter prunes the current batch's directory on replay
        return (spark.read.parquet(f"{index_path}/{component}")
                .filter(F.col("batch") != own).drop("batch"))

    def _process(batch_df, batch_id):
        own = f"b{batch_id}"
        bands_ix = _read_ix("bands", own)
        shingles_ix = _read_ix("shingles", own)
        sizes_ix = _read_ix("sizes", own)
        dups = (neardup_pairs_against(
                    batch_df, bands_ix, shingles_ix, sizes_ix,
                    threshold, text_col, id_col, n, num_hashes, bands)
                .select(F.col("new_id").alias(id_col))
                .dropDuplicates([id_col]))
        keep = batch_df.join(dups, on=id_col, how="left_anti")
        if within_batch:
            keep = deduplicate_neardup(keep, threshold, text_col, id_col, n)
        # pin survivors: distributed staging write + re-read (see
        # docstring); overwrite makes the replayed batch land in the
        # same directory instead of duplicating
        staging = f"{index_path}/staging/batch={own}"
        keep.write.mode("overwrite").parquet(staging)
        # the write materialized the survivors, so the request pins
        # deduplicate_neardup tagged (cluster labels, edges, keeper
        # ids) can be freed — a long-lived stream otherwise pins one
        # label frame per micro-batch (r14 optimization round)
        unpersist_request_frames(keep)
        keep = spark.read.schema(batch_df.schema).parquet(staging)
        ex, stats, bands_df = minhash_signature_frames(
            keep, text_col, id_col, n, num_hashes, bands)
        bands_df.write.mode("overwrite").parquet(
            f"{index_path}/bands/batch={own}")
        ex.write.mode("overwrite").parquet(
            f"{index_path}/shingles/batch={own}")
        stats.select(F.col(id_col), F.col("__sz")).write.mode(
            "overwrite").parquet(f"{index_path}/sizes/batch={own}")
        if on_batch is not None:
            on_batch(keep, batch_id)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def streaming_rollup_ingest(stream: DataFrame, manager, on_batch=None):
    """Streaming fact ingest that keeps materialized rollups fresh:
    every micro-batch of appended fact rows folds into each registered
    rollup via ``RollupManager.append`` (plans/rollup.py) — the batch
    aggregated at each rollup's grain, merged by dynamic overwrite of
    ONLY the partitions the batch touches.  Cost per batch is
    O(batch + affected rollup partitions), never a base-fact rescan:
    the streaming analog of Mondrian's periodic aggregate-table refresh
    jobs, at micro-batch latency.

    foreachBatch runs batches sequentially, so rollup merges are
    race-free.  Exactly-once: the batch_id is passed through as
    ``RollupManager.append``'s ``batch_tag``, which commits each
    rollup's merge via a write-ahead staged copy + atomic marker (see
    its docstring) — a batch replayed after a crash at ANY point
    (before, during, or after the layout overwrite) lands idempotent.
    This closed the r6 crash window (merge-then-marker double-apply)
    without a transactional table format.
    """
    def _process(batch_df, batch_id):
        manager.append(batch_df, batch_tag=f"b{batch_id}")
        if on_batch is not None:
            on_batch(batch_df, batch_id)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def streaming_ann_ingest(stream: DataFrame, spark, path: str,
                         kind: str = "ivf",
                         on_batch=None,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding", dim: int = 64):
    """Streaming ANN-layout maintenance: each micro-batch of new
    vectors appends to a materialized IVF (:func:`append_to_ivf`) or
    IVF-PQ (:func:`append_to_pq`) serving layout — assignment/encoding
    always against the layout's STORED centroids/codebook, so vectors
    become searchable at micro-batch latency without a retrain (the
    standard index-serving split: queries hit the last published
    layout while this ingest keeps it fresh).

    Exactly-once without markers (closed the r6 crash window): each
    batch lands in its cells' ``batch=b<id>`` sub-partitions via
    dynamic partition overwrite, so a replayed batch — including one
    that crashed mid-write — recomputes the same deterministic
    assignment and overwrites exactly its own directories: layout row
    counts are invariant under replay, the same discipline as the
    near-dup index's per-batch partitions.
    """
    from ..operators.similarity import append_to_ivf, append_to_pq

    if kind not in ("ivf", "pq"):
        raise ValueError(f"kind must be 'ivf' or 'pq', got {kind!r}")

    def _process(batch_df, batch_id):
        fn = append_to_ivf if kind == "ivf" else append_to_pq
        n = fn(spark, path, batch_df, id_col, vec_col, dim,
               batch_tag=f"b{batch_id}")
        if on_batch is not None:
            on_batch(n, batch_id)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def _interval_micros(interval: str) -> int:
    n, unit = interval.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(n) * mult * 1_000_000


def run_available_now(stream_df: DataFrame, query_name: str = "events_agg",
                      output_mode: str = "complete"):
    """Drain the stream with Trigger.availableNow into a memory sink;
    returns the StreamingQuery (caller awaits + reads the table).
    ``output_mode='append'`` for watermark-append operators
    (streaming_sessionize)."""
    return (stream_df.writeStream
            .format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start())


def init_jaccard_index(spark, index_path: str, docs: DataFrame | None = None,
                       threshold: float = 0.5, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3) -> str:
    """Seed a parquet-backed EXACT-Jaccard prefix index at
    ``index_path`` (subdirs prefixes/ shingles/ + a frozen freq/
    table) — the exact counterpart of :func:`init_neardup_index`.
    The global (document frequency, shingle) order is computed ONCE
    here and frozen: prefix-filter correctness needs only a consistent
    total order (operators/dedup.py jaccard_prefix_rows), so ingest
    never has to rewrite history as frequencies drift."""
    from ..operators.dedup import build_jaccard_index

    if docs is None:   # cold start: empty index, correct schemas
        docs = spark.createDataFrame(
            [], f"{id_col} bigint, {text_col} string")
    pre, sh, freq = build_jaccard_index(docs, threshold, text_col, id_col, n)
    pre.write.mode("overwrite").parquet(f"{index_path}/prefixes/batch=seed")
    sh.write.mode("overwrite").parquet(f"{index_path}/shingles/batch=seed")
    freq.write.mode("overwrite").parquet(f"{index_path}/freq")
    return index_path


def streaming_jaccard_ingest_incremental(stream: DataFrame, spark,
                                         index_path: str,
                                         threshold: float = 0.5,
                                         text_col: str = "text",
                                         id_col: str = "doc_id",
                                         n: int = 3,
                                         within_batch: bool = True,
                                         on_batch=None,
                                         max_candidates_per_prefix=None):
    """Ingest-time EXACT near-dup filter: like
    :func:`streaming_neardup_ingest_incremental` but with the
    prefix-filter index — every kept document is guaranteed to have
    Jaccard < threshold against the whole accepted corpus (no LSH miss
    probability).  Same exactly-once posture: the index read excludes
    the current batch's own ``batch=b<id>`` partitions, every write
    overwrites exactly those partitions, and survivors are pinned via
    a staged write before their prefix/shingle rows are appended."""
    from ..operators.dedup import (deduplicate_jaccard_exact,
                                   has_min_tokens,
                                   jaccard_prefix_rows,
                                   neardup_pairs_against_jaccard_index,
                                   unpersist_request_frames,
                                   with_shingles)

    def _read_ix(component: str, own: str):
        return (spark.read.parquet(f"{index_path}/{component}")
                .filter(F.col("batch") != own).drop("batch"))

    def _process(batch_df, batch_id):
        own = f"b{batch_id}"
        pre_ix = _read_ix("prefixes", own)
        sh_ix = _read_ix("shingles", own)
        freq = spark.read.parquet(f"{index_path}/freq")
        dups = (neardup_pairs_against_jaccard_index(
                    batch_df, pre_ix, sh_ix, freq, threshold, threshold,
                    text_col, id_col, n,
                    max_candidates_per_prefix=max_candidates_per_prefix)
                .select(F.col("new_id").alias(id_col))
                .dropDuplicates([id_col]))
        keep = batch_df.join(dups, on=id_col, how="left_anti")
        if within_batch:
            keep = deduplicate_jaccard_exact(keep, threshold, text_col,
                                             id_col, n)
        staging = f"{index_path}/staging/batch={own}"
        keep.write.mode("overwrite").parquet(staging)
        # free the within-batch dedup pins once the write materialized
        # the survivors (r14 optimization round; same hygiene as the
        # minhash ingest above)
        unpersist_request_frames(keep)
        keep = spark.read.schema(batch_df.schema).parquet(staging)
        sh_new = (with_shingles(
                      keep.filter(has_min_tokens(text_col, n)),
                      text_col, n)
                  .select(F.col(id_col), F.col("shingles")))
        jaccard_prefix_rows(sh_new, freq, threshold, id_col).write.mode(
            "overwrite").parquet(f"{index_path}/prefixes/batch={own}")
        sh_new.write.mode("overwrite").parquet(
            f"{index_path}/shingles/batch={own}")
        if on_batch is not None:
            on_batch(keep, batch_id)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def streaming_decontaminate_ingest(stream: DataFrame, eval_grams,
                                   n: int = 5, max_fraction: float = 0.2,
                                   text_col: str = "text",
                                   id_col: str = "doc_id",
                                   on_batch=None):
    """Ingest-time benchmark decontamination — the streaming analog of
    the batch policy (operators/pipeline.decontaminate_corpus, x09):
    arriving documents are checked against a FROZEN eval gram index
    (``eval_grams`` from operators/dedup.build_eval_gram_index —
    persist it; benchmarks change rarely, refresh = rebuild the tiny
    index, never the stream).  Heavily contaminated docs (fraction >
    ``max_fraction``) drop; lighter hits arrive at ``on_batch`` with
    the eval spans already trimmed out of ``text_col`` (plus a
    ``removed_tokens`` audit column); clean docs pass through
    verbatim.

    Runs inside ``foreachBatch`` so each micro-batch reuses the BATCH
    operator verbatim (the structural-parity convention of the other
    ingest filters here) — the span join is batch-grams × broadcast
    eval index, so per-batch cost is linear in the batch and
    independent of corpus history.  Within-stream duplication is a
    different concern (streaming_dedup / the jaccard ingests)."""
    from ..operators.dedup import unpersist_request_frames
    from ..operators.pipeline import decontaminate_corpus

    def _process(batch_df, batch_id):
        cleaned = decontaminate_corpus(
            batch_df, n=n, max_fraction=max_fraction,
            text_col=text_col, id_col=id_col, eval_grams=eval_grams)
        out = (batch_df.drop(text_col)
               .join(cleaned
                     .withColumnRenamed("clean_text", text_col)
                     .select(id_col, text_col, "removed_tokens"),
                     on=id_col, how="inner"))
        if on_batch is not None:
            on_batch(out, batch_id)
        # free the per-batch request-persisted span frame — a
        # long-running stream otherwise accumulates one cache per
        # micro-batch
        unpersist_request_frames(cleaned)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def streaming_semantic_dedup_ingest(stream: DataFrame, spark, path: str,
                                    threshold: float = 0.9,
                                    on_batch=None,
                                    id_col: str = "vec_id",
                                    vec_col: str = "embedding",
                                    dim: int = 64):
    """Ingest-time SEMANTIC dedup at the indexing front door — the
    SemDeDup policy (d12) applied before vectors enter a serving
    layout: each arriving vector assigns to its cell against the
    layout's STORED centroids, compares by exact cosine ONLY against
    that cell's stored vectors (a partition-pruned read of the
    touched cells — the same probe shape as serving), and drops when
    any stored neighbor reaches ``threshold``; within-batch
    duplicates collapse greedily (min id, the d12 keep-one).
    Survivors append via :func:`append_to_ivf`, so the NEXT batch
    deduplicates against them too.

    Crash-replay idempotency (the incremental near-dup index's
    discipline): the stored-side read EXCLUDES this batch's own
    ``batch=b<id>`` partitions, so a replayed batch — even one that
    crashed after appending — never deduplicates arrivals against
    their own appended copies, and the append overwrites exactly its
    own (cell, batch) directories.  Cross-cell semantic dups are
    missed BY DESIGN (the SemDeDup recall/cost trade; d12's
    contract)."""
    from ..operators.similarity import (append_to_ivf,
                                        assign_against_centroids,
                                        with_cosine)

    def _process(batch_df, batch_id):
        tag = f"b{batch_id}"
        cents = spark.read.parquet(path + "_centroids")
        assigned = assign_against_centroids(batch_df, cents,
                                            id_col, vec_col, dim)
        stored = (spark.read.parquet(path)
                  .filter(F.col("batch") != tag)
                  .select(F.col("cell_id"),
                          F.col(vec_col).alias("__sv")))
        vs_index = (assigned.join(stored, "cell_id"))
        vs_index = with_cosine(vs_index, "__sv", vec_col)
        dropped = (vs_index
                   .filter(F.round(F.col("cosine"), 6) >= threshold)
                   .select(F.col(id_col)).distinct())
        alive = assigned.join(dropped, on=id_col, how="left_anti")
        # within-batch greedy collapse (min id wins), narrow pair join
        a = alive.select("cell_id", F.col(id_col).alias("a_id"))
        b = alive.select("cell_id", F.col(id_col).alias("b_id"))
        cand = (a.join(b, "cell_id")
                 .filter(F.col("a_id") < F.col("b_id")))
        va = alive.select(F.col(id_col).alias("a_id"),
                          F.col(vec_col).alias("va"))
        vb = alive.select(F.col(id_col).alias("b_id"),
                          F.col(vec_col).alias("vb"))
        cand = with_cosine(cand.join(va, "a_id").join(vb, "b_id"),
                           "vb", "va")
        intra = (cand.filter(F.round(F.col("cosine"), 6) >= threshold)
                     .select(F.col("b_id").alias(id_col)).distinct())
        survivors = (batch_df.join(
            alive.join(intra, on=id_col, how="left_anti")
                 .select(id_col), on=id_col, how="left_semi"))
        n = append_to_ivf(spark, path, survivors, id_col, vec_col, dim,
                          batch_tag=tag)
        if on_batch is not None:
            on_batch(survivors, n, batch_id)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def streaming_quality_ingest(stream: DataFrame, lm,
                             max_bits_per_token: float | None = None,
                             gate_kwargs: dict | None = None,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             on_batch=None):
    """Ingest-time quality gate: arriving documents pass the Gopher
    rule battery (operators/textstats.gopher_rules) and are scored
    against a FROZEN unigram LM (textstats.unigram_lm — persist it;
    the reference corpus changes rarely, refresh = retrain the tiny
    LM frame, never the stream).  Docs failing any rule drop; when
    ``max_bits_per_token`` is set, docs the LM finds too surprising
    drop too.  Survivors arrive at ``on_batch`` with the audit
    columns (per-rule flags, bits_per_token, oov_tokens) attached.

    Runs inside ``foreachBatch`` so each micro-batch reuses the BATCH
    operators verbatim (the structural-parity convention of the other
    ingest filters here).  The rule gate is a pure projection; the LM
    score is batch-tokens × the frozen LM frame — per-batch cost is
    linear in the batch and independent of stream history."""
    from ..operators.textstats import gopher_rules, score_against_lm

    def _process(batch_df, batch_id):
        gated = (gopher_rules(batch_df, text_col, id_col,
                              **(gate_kwargs or {}))
                 .filter(F.col("kept")).drop("kept"))
        scored = score_against_lm(batch_df, lm, text_col, id_col)
        if max_bits_per_token is not None:
            scored = scored.filter(
                F.col("bits_per_token") <= max_bits_per_token)
        out = (batch_df
               .join(gated.select(
                   id_col, "n_tokens", "mean_word_len", "symbol_ratio",
                   "alpha_word_ratio", "stopword_hits"), id_col)
               .join(scored.select(id_col, "oov_tokens",
                                   "bits_per_token", "ppl"), id_col))
        if on_batch is not None:
            on_batch(out, batch_id)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def init_image_index(spark, index_path: str, media: DataFrame | None = None,
                     hash_size: int = 8):
    """Seed the incremental perceptual-image index: one (media_id,
    dhash) parquet row per decodable PNG in ``media`` (empty layout
    when media is None).  Same partition-per-batch discipline as
    init_neardup_index — the seed lands in ``batch=seed``."""
    from ..operators.multimodal import image_dhash
    if media is not None:
        sh = image_dhash(media, hash_size).filter(
            F.col("dhash").isNotNull()).select("media_id", "dhash")
    else:
        from pyspark.sql.types import (LongType, StructField, StructType)
        sh = spark.createDataFrame(
            [], StructType([StructField("media_id", LongType()),
                            StructField("dhash", LongType())]))
    sh.write.mode("overwrite").parquet(f"{index_path}/hashes/batch=seed")


def streaming_image_dedup_ingest(stream: DataFrame, spark,
                                 index_path: str, max_hamming: int = 3,
                                 hash_size: int = 8,
                                 within_batch: bool = True,
                                 on_batch=None):
    """Ingest-time PERCEPTUAL image dedup: arriving media rows dHash
    (Python touches only the per-row PNG decode), band-join against
    the stored hash index JVM-side (4x16-bit chunks, pigeonhole-
    complete to hamming 3), matches drop, survivors append their
    (media_id, dhash) rows so later arrivals dedup against accepted
    images too — the image counterpart of
    :func:`streaming_neardup_ingest_incremental`, with the same
    replay-idempotence discipline (own-batch partition exclusion +
    partition overwrite; the index is (id, int64) rows, so no pin
    staging is needed for the MEDIA payload — only hashes are
    re-read).  Non-PNG arrivals pass through un-deduped (they hash
    to null; count them downstream, don't guess)."""
    from ..operators.multimodal import image_dhash

    chunk_expr = ("transform(sequence(0, 3), c -> "
                  "(dhash >> (c * 16)) & 65535)")
    if max_hamming > 3:
        raise ValueError("banding guarantees recall only to hamming 3")

    def _chunks(sh: DataFrame, idc: str) -> DataFrame:
        return sh.select(
            F.col("media_id").alias(idc), F.col("dhash").alias(f"h_{idc}"),
            F.posexplode(F.expr(chunk_expr)).alias("chunk_idx",
                                                   "chunk_val"))

    def _process(batch_df, batch_id):
        own = f"b{batch_id}"
        ix = (spark.read.parquet(f"{index_path}/hashes")
              .filter(F.col("batch") != own).drop("batch"))
        sh = image_dhash(batch_df, hash_size).persist()
        hashed = sh.filter(F.col("dhash").isNotNull()) \
                   .select("media_id", "dhash")
        vs_ix = (_chunks(hashed, "new_id")
                 .join(_chunks(ix, "ix_id"),
                       on=["chunk_idx", "chunk_val"])
                 .withColumn("hamming",
                             F.expr("bit_count(h_new_id ^ h_ix_id)"))
                 .filter(F.col("hamming") <= max_hamming)
                 .select(F.col("new_id").alias("media_id"))
                 .dropDuplicates(["media_id"]))
        keep_h = hashed.join(vs_ix, "media_id", "left_anti")
        if within_batch:
            wb = (_chunks(keep_h, "a_id")
                  .join(_chunks(keep_h, "b_id"),
                        on=["chunk_idx", "chunk_val"])
                  .filter(F.col("a_id") > F.col("b_id"))
                  .withColumn("hamming",
                              F.expr("bit_count(h_a_id ^ h_b_id)"))
                  .filter(F.col("hamming") <= max_hamming)
                  .select(F.col("a_id").alias("media_id"))
                  .dropDuplicates(["media_id"]))
            keep_h = keep_h.join(wb, "media_id", "left_anti")
        keep_h.write.mode("overwrite").parquet(
            f"{index_path}/hashes/batch={own}")
        kept_ids = spark.read.parquet(
            f"{index_path}/hashes/batch={own}").select("media_id")
        undedupable = (sh.filter(F.col("dhash").isNull())
                       .select("media_id"))
        out = batch_df.join(
            kept_ids.unionByName(undedupable), "media_id", "left_semi")
        if on_batch is not None:
            on_batch(out, batch_id)
        sh.unpersist()

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())


def streaming_anomaly_monitor(stream: DataFrame, spark, state_path: str,
                              window_days: int = 7,
                              z_threshold: float = 3.0,
                              on_batch=None):
    """Incremental volume-anomaly monitor: each micro-batch folds its
    per-(type, day) event counts into a parquet state table (one
    ``batch=bN`` partition per batch — the rollup-ingest discipline,
    so a crash replay overwrites its own partition and the state's
    totals are replay-idempotent), then recomputes
    ``anomaly_flags_from_daily`` over the SUMMED state — the exact
    batch semantics (w12) at a cost proportional to |types| x |days|,
    not to history.  ``on_batch`` receives the full current flag
    frame; in production that frame is the alert feed.

    Late events are handled by construction: a late row lands in its
    TRUE day's count on the next fold, and the flags recompute from
    totals — no watermark-bounded state to age out (the state table
    IS the aggregate, parquet-persisted)."""
    from ..operators.windows import anomaly_flags_from_daily

    def _process(batch_df, batch_id):
        own = f"b{batch_id}"
        (batch_df.groupBy(F.col("event_type"),
                          F.date_trunc("day", F.col("ts")).alias("day"))
         .agg(F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite")
         .parquet(f"{state_path}/daily/batch={own}"))
        daily = (spark.read.parquet(f"{state_path}/daily")
                 .groupBy("event_type", "day")
                 .agg(F.sum("n").alias("n")))
        flags = anomaly_flags_from_daily(daily, window_days, z_threshold)
        if on_batch is not None:
            on_batch(flags, batch_id)

    return (stream.writeStream
            .foreachBatch(_process)
            .trigger(availableNow=True)
            .start())

"""Composed training-data cleaning pipeline over a documents table.

The end-to-end use case the extension operators exist for (SURVEY
north star): exact dedup -> near-dup keep-one -> quality gate ->
language gate, all as one declarative DataFrame chain so Catalyst
plans the whole thing (shared scans, pushed filters) — not a
collect-and-reload between stages.

Scale shape: two narrow shuffles for dedup (content hash; MinHash
band buckets), one for the near-dup components, then broadcast-size
joins of the per-doc score frames back onto the kept set.  Everything
else is per-row JVM codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import dedup, textstats


def top_docs_per_stratum(docs: DataFrame, k: int = 50,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Per-language top-k documents by quality score — the curation
    step that picks the best examples from each stratum for a training
    mix.  One shuffle on the language key, then a bounded per-group
    sort (k rows survive per group, never a global sort).
    Deterministic tie-break on the doc id."""
    from pyspark.sql import Window
    # one scan: quality + language are per-row projections stacked on
    # the same frame (r14; see clean_corpus) — the id re-join form
    # scanned the corpus twice and shuffled it once for no reason
    scored = textstats.with_language_columns(
        textstats.with_quality_columns(docs, text_col), text_col
    ).select(id_col, "quality", "predicted_lang")
    w = (Window.partitionBy("predicted_lang")
         .orderBy(F.desc("quality"), F.asc(id_col)))
    return (scored
            .withColumn("lang_rank", F.row_number().over(w))
            .filter(F.col("lang_rank") <= k)
            .select(id_col, "predicted_lang", "quality", "lang_rank"))


def pack_token_budget(docs: DataFrame, budget_tokens: int,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Fill a per-language token budget with the best documents first:
    rank by quality within each language, take documents while the
    running token total stays under ``budget_tokens`` (the first doc
    that crosses the budget is included, so the budget is always
    reached when enough data exists — the standard greedy mix fill).

    This is how a "N-billion-token training mix" is actually
    assembled; the cumulative sum is a bounded per-language window,
    not a global sort, and the whole thing is deterministic so the
    DuckDB oracle replays the exact selected set."""
    from pyspark.sql import Window
    # one scan, no id re-join (r14; see clean_corpus)
    scored = textstats.with_language_columns(
        textstats.with_quality_columns(docs, text_col), text_col
    ).select(id_col, "n_tokens", "quality", "predicted_lang")
    w = (Window.partitionBy("predicted_lang")
         .orderBy(F.desc("quality"), F.asc(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (scored
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") - F.col("n_tokens")
                    < budget_tokens)
            .select(id_col, "predicted_lang", "quality", "n_tokens",
                    "cum_tokens"))


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", neardup_threshold: float = 0.5,
                 min_quality: float = 0.75,
                 languages: tuple[str, ...] = ("en",)) -> DataFrame:
    """Survivor set of the standard cleaning pipeline:

    1. exact dedup (md5 content hash, min id wins);
    2. near-dup dedup on the survivors (MinHash-LSH pairs -> connected
       components -> min-id keeper per cluster);
    3. quality gate: heuristic score >= ``min_quality``
       (textstats.quality_score);
    4. language gate: stopword-hit language id in ``languages``.

    Returns (id_col, quality, predicted_lang) for the surviving
    documents — deterministic, so the DuckDB oracle replays it
    exactly.
    """
    kept_exact = dedup.deduplicate_exact(docs, text_col, id_col)
    kept = dedup.deduplicate_neardup(kept_exact, neardup_threshold,
                                     text_col, id_col)
    # quality + language are per-row projections, so they stack on ONE
    # pass over the survivor set (r14 optimization round): the previous
    # shape joined each operator's (id, score) select back to `kept` by
    # id, which re-executed the whole dedup lineage 3x and paid two id
    # shuffles — measured 16.6 s -> ~7 s for c01_clean_corpus at sf0.1.
    # Row set and values are identical (same expressions, same filter).
    enriched = textstats.with_language_columns(
        textstats.with_quality_columns(kept, text_col), text_col)
    # re-tag the request pins on the RETURNED handle (r14): the tag
    # lives on the exact Python DataFrame object, so deriving
    # filter/select off `kept` silently dropped the cluster-label and
    # keeper-ID pins — every c01 request leaked its cached blocks
    return dedup._tag_persisted(
        enriched
        .filter((F.col("quality") >= min_quality) &
                F.col("predicted_lang").isin(list(languages)))
        .select(id_col, "quality", "predicted_lang"),
        *getattr(kept, "_mrs_request_persisted", []))


def chunk_windows(docs: DataFrame, window: int = 64, stride: int = 48,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    fixed-size word windows — the standard step that turns long
    documents into context-window-sized training examples (r9; no
    reference analog — mondrian-rest has no text path).

    One row per chunk: ``(id, chunk_idx, chunk_text, n_words)``.
    Chunk i covers words ``[i*stride, i*stride + window)``; offsets
    advance by ``stride`` while they stay inside the document, so the
    tail chunk may be shorter than ``window`` (never empty) and with
    ``stride < window`` consecutive chunks overlap by
    ``window - stride`` words.

    Plan shape at 100 TB: pure per-row JVM codegen (split +
    ``transform(sequence(...))`` + ``posexplode``) — zero shuffles,
    row counts fan out by ~n_words/stride, so repartition AFTER
    chunking if a downstream stage groups; whole-stage codegen keeps
    the string slicing vectorized (no Python)."""
    if window < 1 or stride < 1:
        raise ValueError(
            f"window and stride must be >= 1, got {window}/{stride}")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    chunks = F.expr(
        f"transform(sequence(0, cast(floor((size(__words) - 1) / "
        f"{stride}) as int)), i -> struct("
        f"array_join(slice(__words, i * {stride} + 1, {window}), ' ') "
        f"as chunk_text, "
        f"size(slice(__words, i * {stride} + 1, {window})) as n_words))")
    return (docs
            .filter(F.trim(F.col(text_col)) != "")  # split('') == ['']
            .withColumn("__words", words)
            .select(F.col(id_col), F.posexplode(chunks)
                    .alias("chunk_idx", "__c"))
            .select(id_col, "chunk_idx",
                    F.col("__c.chunk_text").alias("chunk_text"),
                    F.col("__c.n_words").alias("n_words")))


def chunk_token_windows(docs: DataFrame, window: int = 64,
                        stride: int = 48, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Sliding-window chunking with ``window``/``stride`` measured in
    TOKENS (r10, VERDICT r9 #8): real pipelines budget chunks by the
    tokenizer, not whitespace words.  Composes :func:`chunk_windows`'
    fan-out shape with the same BPE-ish subword tokenizer
    ``token_stats`` uses (``textstats.token_stats`` n_subword_pieces:
    alphanumeric runs, punctuation/whitespace discarded), so a
    document's total chunk token count reconciles with its
    token-stats row.

    One row per chunk: ``(id, chunk_idx, chunk_text, n_tokens)``;
    ``chunk_text`` is the space-joined token pieces — the
    model-input normalization, deterministic and oracle-replayable.
    Chunk i covers tokens ``[i*stride, i*stride + window)``; the tail
    chunk may be shorter, never empty.

    Plan shape at 100 TB: identical to chunk_windows — pure per-row
    JVM codegen (split + filter + ``transform(sequence(...))`` +
    ``posexplode``), zero shuffles; repartition AFTER the fan-out if
    a downstream stage groups."""
    if window < 1 or stride < 1:
        raise ValueError(
            f"window and stride must be >= 1, got {window}/{stride}")
    pieces = F.expr(
        f"filter(split({text_col}, '[^A-Za-z0-9]+'), x -> x <> '')")
    chunks = F.expr(
        f"transform(sequence(0, cast(floor((size(__pieces) - 1) / "
        f"{stride}) as int)), i -> struct("
        f"array_join(slice(__pieces, i * {stride} + 1, {window}), ' ') "
        f"as chunk_text, "
        f"size(slice(__pieces, i * {stride} + 1, {window})) "
        f"as n_tokens))")
    # raw-column predicate instead of size(__pieces) > 0 (r14; see
    # dedup.has_min_tokens): pieces are non-alnum-split runs, so the
    # row set is exactly "text has at least one alphanumeric char" —
    # the derived-column form made Catalyst push a full copy of the
    # split+filter expression into the scan-stage filter
    return (docs
            .filter(F.col(text_col).rlike("[A-Za-z0-9]"))
            .withColumn("__pieces", pieces)
            .select(F.col(id_col), F.posexplode(chunks)
                    .alias("chunk_idx", "__c"))
            .select(id_col, "chunk_idx",
                    F.col("__c.chunk_text").alias("chunk_text"),
                    F.col("__c.n_tokens").alias("n_tokens")))


def trim_duplicate_spans(docs: DataFrame, n: int = 5, min_docs: int = 2,
                         min_occurrences: int | None = None,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Cut duplicated spans OUT of the text — the dedup action of Lee
    et al.'s ExactSubstr (remove the repeated passage, keep the rest
    of the document), composed from :func:`dedup.duplicate_spans`.

    Tokens posexplode against the doc's span list (a doc-keyed join —
    spans are window-merged and disjoint, so each token matches at
    most one span), kept tokens reassemble in position order via
    ``array_sort(collect_list(struct(pos, token)))`` — deterministic,
    no string-order dependence on shuffle layout.  Docs with no
    duplicated span pass through verbatim (left join against the doc
    spine), and a doc that is ENTIRELY duplicated text comes out with
    ``clean_text = ''`` rather than disappearing — dropping is a
    separate policy decision (filter on removed_tokens afterwards).

    Returns ``(id, clean_text, n_tokens_kept, removed_tokens)``.
    Scale shape: the span join shuffles (doc, pos, token) rows keyed
    by doc — linear, co-partitioned with the collect_list aggregate
    that follows; the wide original text never enters either shuffle."""
    spans = dedup.duplicate_spans(docs, n=n, min_docs=min_docs,
                                  min_occurrences=min_occurrences,
                                  text_col=text_col, id_col=id_col)
    return dedup._tag_persisted(
        _trim_spans(docs, spans, text_col, id_col),
        *getattr(spans, "_mrs_request_persisted", []))


def _trim_spans(docs: DataFrame, spans: DataFrame, text_col: str,
                id_col: str) -> DataFrame:
    """Cut a span frame (d13 schema: id, span_start, span_end) out of
    each doc's token stream; shared by the self-dedup trim and the
    decontamination trim.

    SINGLE-pass shape: the exploded tokens join the span frame once
    (doc-keyed range condition — merged spans are disjoint, so each
    token matches at most one span and the join never multiplies
    rows), then ONE per-doc aggregate computes the total, the kept
    count, and the reassembled text together (``collect_list`` skips
    the nulls the CASE leaves on covered tokens).  An earlier draft
    derived the token explode three times (coverage, keep, totals) —
    three corpus scans the optimizer would not fuse."""
    sp = spans.select(F.col(id_col).alias("__sid"),
                      "span_start", "span_end")
    toks = (docs
            .withColumn("__tokens",
                        F.split(F.trim(F.col(text_col)), r"\s+"))
            .select(F.col(id_col),
                    F.posexplode("__tokens").alias("__pos", "__tok")))
    j = toks.join(
        sp, (toks[id_col] == sp["__sid"]) &
            (F.col("__pos") >= F.col("span_start")) &
            (F.col("__pos") <= F.col("span_end")),
        "left")
    per = (j.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("__total"),
                F.sum(F.when(F.col("span_start").isNull(), 1)
                       .otherwise(0).cast("long")).alias("n_tokens_kept"),
                F.expr("array_join(transform(array_sort(collect_list("
                       "case when span_start is null "
                       "then struct(__pos, __tok) end)), "
                       "x -> x.__tok), ' ')").alias("clean_text")))
    return (docs.select(id_col)
            .join(per, id_col, "left")
            .select(
                id_col,
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                F.coalesce("n_tokens_kept", F.lit(0).cast("long"))
                 .alias("n_tokens_kept"),
                (F.coalesce("__total", F.lit(0).cast("long")) -
                 F.coalesce("n_tokens_kept", F.lit(0).cast("long")))
                 .alias("removed_tokens")))


def decontaminate_corpus(train: DataFrame, eval_docs: DataFrame | None = None,
                         n: int = 5, max_fraction: float = 0.2,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         eval_grams: DataFrame | None = None) -> DataFrame:
    """The operational decontamination policy over
    :func:`dedup.contaminated_spans` (what the Dolma/RedPajama-class
    pipelines run): documents whose contaminated-token fraction
    exceeds ``max_fraction`` DROP entirely (a page that is mostly a
    benchmark dump is unsalvageable and its surrounding text is
    suspect); lighter hits get the eval spans TRIMMED out; clean docs
    pass through.  One span computation feeds both the fraction gate
    and the trim: the span frame (one row per contaminated passage —
    tiny next to the corpus) is request-PERSISTED so the gate's
    anti-join and the trim's coverage join read the same cache
    instead of re-running the gram explode per reference (the
    unpersisted draft planned the span lineage 4x — four corpus
    scans).  Free it after materializing via
    ``dedup.unpersist_request_frames`` (the /corpus route convention).

    Returns ``(id, clean_text, n_tokens_kept, removed_tokens)`` for
    the SURVIVORS only (dropped docs are absent — unlike the x07 trim,
    disappearance here is the policy).  ``removed_tokens > 0`` rows
    are the trimmed ones, so the output doubles as the audit frame."""
    spans = dedup.contaminated_spans(train, eval_docs, n=n,
                                     text_col=text_col, id_col=id_col,
                                     eval_grams=eval_grams).persist()
    per_doc = (spans.groupBy(id_col)
               .agg(F.sum("span_tokens").alias("__contam")))
    totals = (train
              .select(F.col(id_col),
                      F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
                       .alias("__nt")))
    dropped = (totals.join(per_doc, id_col)
               .filter(F.col("__contam") >
                       F.col("__nt") * F.lit(max_fraction))
               .select(id_col))
    survivors = train.join(dropped, on=id_col, how="left_anti")
    return dedup._tag_persisted(
        _trim_spans(survivors, spans, text_col, id_col), spans)


def write_curated_corpus(docs: DataFrame, path: str,
                         partition_by: tuple = ("lang",),
                         sort_by: str = "doc_id",
                         max_records_per_file: int = 0,
                         mode: str = "overwrite") -> None:
    """The pipeline's SINK: write a curated corpus as Hive-partitioned
    parquet — the layout a 100 TB training run actually reads.

    Layout contract:
      * one directory per partition value (``lang=en/…``) so a
        downstream mixture read prunes partitions instead of
        filtering rows;
      * ``repartition(partition_by)`` routes each partition value to
        one task (AQE coalesces the small ones), so a partition's
        rows land in that task's files instead of being smeared
        across every task — the small-files problem at the source;
      * rows sorted by ``sort_by`` within files: better column
        compression and range-readable id lookups;
      * ``max_records_per_file`` caps file size so one giant language
        still splits into parallel-readable files.

    Deliberately returns nothing — read the layout back with
    ``corpus_manifest`` (counts come from the FILES, so the manifest
    is evidence the write landed, not an echo of the input)."""
    w = (docs.repartition(*[F.col(c) for c in partition_by])
         .sortWithinPartitions(*partition_by, sort_by)
         .write.mode(mode))
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_by).parquet(path)


def corpus_manifest(spark, path: str, partition_by: tuple = ("lang",),
                    text_col: str = "text") -> DataFrame:
    """Per-partition manifest of a written corpus layout: file count,
    document count, and character volume — read from the WRITTEN
    files (``input_file_name``), so it audits the layout itself.
    One pruned scan + a |partitions|-row agg."""
    df = spark.read.parquet(path)
    return (df.select(*partition_by,
                      F.input_file_name().alias("__f"),
                      F.length(text_col).alias("__chars"))
            .groupBy(*partition_by)
            .agg(F.countDistinct("__f").alias("n_files"),
                 F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__chars").alias("n_chars"))
            .orderBy(*partition_by))

"""Deterministic sampling / splitting for training-data pipelines.

Splits must be REPRODUCIBLE (same doc -> same split on every run,
every engine, any partitioning) and ORDER-FREE (no global sort or
row_number).  Both come from hashing the stable document id with a
named salt: bucket = first 8 md5 hex digits of "<salt>:<id>" mod
10_000.  md5-hex arithmetic is the same engine-portable trick the
SimHash operator uses, so the DuckDB oracle replays splits exactly.

At 100 TB: a pure per-row projection — no shuffle, no state; split
assignment composes with any downstream write (e.g.
``.write.partitionBy("split")`` for physically separated train/val).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: bucket resolution: fractions are exact multiples of 0.01%
SPLIT_BUCKETS = 10_000


def _bucket(id_col: str, salt: str) -> F.Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): 32-bit value from
    the md5 of salt:id, reduced mod SPLIT_BUCKETS.  conv() parses 8 hex
    digits (32 bits — no BIGINT overflow, ANSI-safe)."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % SPLIT_BUCKETS)


def with_split(df: DataFrame, id_col: str = "doc_id",
               val_frac: float = 0.1, test_frac: float = 0.0,
               salt: str = "split-v1") -> DataFrame:
    """Assign each row a reproducible 'train' / 'val' / 'test' label.

    Fractions are approximate (hash buckets), exact in expectation;
    changing ``salt`` re-draws the split, changing fractions only
    moves the boundaries (a doc can move between val and train, but
    two runs with identical params always agree)."""
    val_b = int(round(val_frac * SPLIT_BUCKETS))
    test_b = int(round(test_frac * SPLIT_BUCKETS))
    b = _bucket(id_col, salt)
    split = (F.when(b < val_b, F.lit("val"))
              .when(b < val_b + test_b, F.lit("test"))
              .otherwise(F.lit("train")))
    return df.withColumn("split", split)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, default_frac: float = 0.0,
                      id_col: str = "doc_id",
                      salt: str = "sample-v1") -> DataFrame:
    """Deterministic stratified sampling: keep a per-stratum fraction
    of rows, chosen by the same salted md5 bucket as ``with_split`` —
    so unlike ``DataFrame.sampleBy`` (partition-order-dependent rand),
    the same row is kept on every run, engine, and partitioning, and
    the DuckDB oracle replays it exactly.

    The training-pipeline use case: downsample over-represented strata
    (e.g. languages or sources) to a target mix — a pure per-row
    projection + filter, no shuffle, composable with any downstream
    write."""
    b = _bucket(id_col, salt)
    keep = F.lit(int(round(default_frac * SPLIT_BUCKETS)))
    for value, frac in sorted(fractions.items()):
        keep = F.when(F.col(strata_col) == value,
                      F.lit(int(round(frac * SPLIT_BUCKETS)))).otherwise(keep)
    return df.filter(b < keep)


def split_counts(df: DataFrame, id_col: str = "doc_id",
                 val_frac: float = 0.1, test_frac: float = 0.0,
                 salt: str = "split-v1") -> DataFrame:
    """Per-split document counts — the sanity report run after every
    re-split (one narrow aggregate)."""
    return (with_split(df, id_col, val_frac, test_frac, salt)
            .groupBy("split")
            .agg(F.count(id_col).alias("n_docs"),
                 F.min(id_col).alias("min_id"),
                 F.max(id_col).alias("max_id")))


def mixture_fractions(df: DataFrame, strata_col: str, weights: dict,
                      id_col: str = "doc_id") -> dict:
    """Per-stratum keep fractions realizing a target MIXTURE with
    maximum data retention: normalize ``weights``, find the binding
    stratum (smallest count-to-weight ratio — it keeps everything),
    and downsample every other stratum so the KEPT corpus has exactly
    the target proportions (in hash-bucket expectation).  The classic
    training-mix operation ("make the corpus 50% en / 25% de / 25%
    fr").  One strata-sized groupBy + collect — strata counts are
    human-scale metadata, never fact-scale."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {s: w / total_w for s, w in weights.items() if w > 0}
    counts = {r[0]: r[1] for r in
              (df.filter(F.col(strata_col).isin(list(norm)))
                 .groupBy(strata_col)
                 .agg(F.count(F.lit(1)).alias("__n"))).collect()}
    missing = sorted(set(norm) - set(counts))
    if missing:
        raise ValueError(
            f"strata with target weight but no rows: {missing}")
    t = min(counts[s] / w for s, w in norm.items())
    return {s: min(1.0, w * t / counts[s]) for s, w in norm.items()}


def mixture_sample(df: DataFrame, strata_col: str, weights: dict,
                   id_col: str = "doc_id",
                   salt: str = "mix-v1") -> DataFrame:
    """Deterministically downsample to a target stratum mixture:
    :func:`mixture_fractions` to derive the per-stratum keep rates,
    then the same salted md5-bucket filter as
    :func:`stratified_sample` — reproducible on any engine or
    partitioning, replayed exactly by the DuckDB oracle.  Strata
    without a target weight are dropped (fraction 0)."""
    fracs = mixture_fractions(df, strata_col, weights, id_col)
    return stratified_sample(df, strata_col, fracs, 0.0, id_col, salt)


def dsir_scores(df: DataFrame, target_filter: str, dim: int = 128,
                n: int = 2, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """DSIR-style data selection scores (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): rank raw-corpus documents by how much their
    hashed n-gram profile looks like a TARGET subset (``target_filter``
    — a boolean SQL predicate over the input columns, e.g.
    ``"lang = 'en'"``) relative to the raw corpus itself.

    The paper's importance weight is
    ``log p_target(doc) - log p_raw(doc)`` under hashed bag-of-ngram
    bucket models.  Two deliberate departures keep the score
    engine-portable (the module's determinism contract — ln() is not
    bit-stable across libm builds, integer ops are):

    - the per-bucket log-ratio uses the INTEGER log2 proxy
      ``bitlen(n_target(b)+1) - bitlen(n_raw(b)+1)`` where bitlen =
      floor(log2(x))+1 = length(bin(x)) — monotone in the true count
      ratio at ~1-bit resolution, exact BIGINT arithmetic;
    - documents are ranked by the MEAN bucket weight over their grams
      (``raw_score / n_grams``).  The dropped normalization constant
      ``log N_raw - log N_target`` shifts every doc's mean equally, so
      the RANKING is invariant to it — per-doc totals would instead
      bias toward long documents.

    Returns ``(id, n_grams, raw_score, mean_weight)``.  Plan shape:
    one gram explode, two bucket-level hash aggs (raw + target — the
    target agg reuses the same exploded frame, Catalyst shares the
    scan), a broadcast-size join of the <= ``dim`` bucket weights onto
    the per-doc bucket counts, one per-doc agg.  All linear; the
    weight table is ``dim`` rows no matter the corpus size."""
    gram_expr = (
        f"case when size(__tokens) < {n} then array() "
        f"else transform(sequence(1, size(__tokens) - {n - 1}), "
        f"i -> array_join(slice(__tokens, i, {n}), ' ')) end")
    bucket = (F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10)
              .cast("long") % dim)
    # the bucketed gram frame feeds THREE aggregates (raw buckets,
    # target buckets, per-doc buckets) and Spark re-runs the whole
    # tokenize+gram+md5 pass per consumer (r14 optimization round,
    # guide §5) — persist the narrow (id, tgt, bucket) projection
    # request-scoped (tagged; the API layer frees it after
    # materialization).  The gram STRING is dropped before the pin:
    # only its md5 bucket survives.
    from .dedup import _tag_persisted
    grams = (df.withColumn("__tokens",
                           F.split(F.trim(F.col(text_col)), r"\s+"))
               .withColumn("__tgt", F.expr(f"({target_filter})"))
               .select(F.col(id_col), "__tgt",
                       F.explode(F.expr(gram_expr)).alias("__g"))
               .withColumn("__b", bucket)
               .select(F.col(id_col), "__tgt", "__b")).persist()
    raw_b = grams.groupBy("__b").agg(F.count(F.lit(1)).alias("__nr"))
    tgt_b = (grams.filter(F.col("__tgt"))
             .groupBy("__b").agg(F.count(F.lit(1)).alias("__nt")))
    weights = (raw_b.join(tgt_b, "__b", "left")
               .select("__b",
                       (F.length(F.expr("bin(coalesce(__nt, 0L) + 1)")) -
                        F.length(F.expr("bin(__nr + 1)")))
                       .cast("long").alias("__w")))
    per_doc = (grams.groupBy(id_col, "__b")
               .agg(F.count(F.lit(1)).alias("__c"))
               .join(F.broadcast(weights), "__b")
               .groupBy(id_col)
               .agg(F.sum("__c").alias("n_grams"),
                    F.sum(F.col("__c") * F.col("__w")).alias("raw_score")))
    return _tag_persisted(
        (df.select(id_col)
            .join(per_doc, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("n_grams", F.lit(0).cast("long"))
                 .alias("n_grams"),
                F.coalesce("raw_score", F.lit(0).cast("long"))
                 .alias("raw_score"),
                F.round(F.coalesce("raw_score", F.lit(0).cast("long")) /
                        F.greatest(F.coalesce("n_grams",
                                              F.lit(0).cast("long")),
                                   F.lit(1)), 6).alias("mean_weight"))),
        grams)


def dsir_sample(df: DataFrame, target_filter: str, frac: float = 0.25,
                dim: int = 128, n: int = 2, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Select the top ``floor(frac * corpus)`` documents by DSIR
    mean weight (deterministic id tie-break) — the resampling step of
    the paper collapsed to its top-quantile deterministic variant
    (Gumbel noise would break the replay contract; rank-selection is
    what production pipelines run anyway when they want
    reproducibility).  ``orderBy + limit`` plans as a TakeOrdered —
    no global sort at scale."""
    from .dedup import _tag_persisted
    k = int(frac * df.count())
    scores = dsir_scores(df, target_filter, dim=dim, n=n,
                         text_col=text_col, id_col=id_col)
    return _tag_persisted(
        scores.orderBy(F.desc("mean_weight"), F.asc(id_col)).limit(k),
        *getattr(scores, "_mrs_request_persisted", []))


def mixture_weights_temperature(df: DataFrame, alpha: float = 0.5,
                                group_col: str = "lang",
                                text_col: str = "text",
                                id_col: str = "doc_id") -> DataFrame:
    """Temperature-scaled multinomial mixing weights (the
    mBERT/XLM-R/mT5 scheme: sample source i with probability
    p_i ∝ n_i^alpha, alpha < 1 upweighting low-resource strata):
    per-stratum token counts -> p_i -> the per-document repetition
    factor ``p_i * N_total / n_i`` that a sampler would apply (how
    many times a doc from stratum i is seen per epoch at the mixed
    rate; > 1 = oversampled stratum).

    ``alpha=0.5`` (the common setting) computes via ``sqrt`` — an
    IEEE-correctly-rounded op, identical in every engine, so the
    weights replay exactly (general ``pow`` is NOT correctly rounded
    and would break the oracle contract; other alphas are accepted
    but documented engine-dependent in the last ulp).

    One projection + one hash agg on the stratum key + a broadcast
    of the <= |strata| weight rows back onto nothing — the output IS
    stratum-level (callers join it to docs when sampling).  Returns
    ``(group_col, n_docs, n_tokens, p, repetition_factor)``."""
    tokens = (df.select(F.col(group_col),
                        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
                         .cast("long").alias("__nt")))
    per = (tokens.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("__nt").alias("n_tokens")))
    if alpha == 0.5:
        scaled = F.sqrt(F.col("n_tokens").cast("double"))
    else:
        scaled = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    # quantize BEFORE the total: the denominator is a float SUM over
    # strata, and float addition is order-dependent — the module's
    # money-sum trick (round to 6dp, sum as DECIMAL) makes the total
    # identical under any partitioning and in any engine
    per = per.withColumn("__s", F.round(scaled, 6)
                                 .cast("decimal(25,6)"))
    tot = per.agg(F.sum("__s").alias("__ts"),
                  F.sum("n_tokens").alias("__tn"))
    out = per.crossJoin(F.broadcast(tot))
    ratio = F.col("__s").cast("double") / F.col("__ts").cast("double")
    return out.select(
        group_col, "n_docs", "n_tokens",
        F.round(ratio, 6).alias("p"),
        F.round(ratio * F.col("__tn") /
                F.greatest("n_tokens", F.lit(1)), 6)
         .alias("repetition_factor"))

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

"""Deduplication operators over a documents table.

Everything here is pure DataFrame API — shingling, MinHash, SimHash and
banding are all Spark SQL higher-order functions (transform/aggregate),
so the hot path never leaves the JVM and whole-stage codegen applies.

Scale design:
- Exact dedup: one hash-groupBy shuffle on a 128-bit content hash.
- MinHash-LSH: O(n) signature computation, then a band-bucket
  self-join — shuffle is on (band_idx, band_signature), so only
  near-duplicate candidates ever meet; no O(n^2) anywhere.  With
  num_hashes=32 / bands=16 (r=2), a pair at jaccard 0.8 is missed with
  probability (1-0.8^2)^16 ≈ 8e-8 — effectively exact for the
  verify-threshold regime, and false positives are removed by an exact
  jaccard verification on the candidate pairs only.
- SimHash: 60-bit signature from engine-portable md5-digit token
  hashes (so the DuckDB oracle replays it exactly); candidates via
  4x15-bit chunk banding (pigeonhole: hamming distance <= 3 implies an
  equal chunk).
- Brute-force variants exist as correctness oracles only — quadratic,
  never the scale path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _tag_persisted(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Attach the request-scoped persisted frames feeding ``result``'s
    lineage so the consumer can free their cached blocks once the
    result is materialized (ADVICE r10: on a long-running
    /corpus/dedup server every request otherwise accumulates blocks —
    disk blocks are only freed on unpersist).  The tag lives on the
    Python DataFrame object, so only the exact returned handle carries
    it; derive-then-unpersist via :func:`unpersist_request_frames`."""
    existing = list(getattr(result, "_mrs_request_persisted", []) or [])
    result._mrs_request_persisted = existing + list(frames)
    return result


def unpersist_request_frames(df: DataFrame) -> None:
    """Free the persisted frames tagged on ``df`` by
    :func:`_tag_persisted`.  Call AFTER materializing ``df`` (collect/
    write) — the frames are inputs to its lineage, and unpersisting
    early just forfeits the self-join reuse they exist for.  Safe to
    call on untagged frames and idempotent."""
    for f in getattr(df, "_mrs_request_persisted", []) or []:
        try:
            f.unpersist()
        except Exception:
            pass
    df._mrs_request_persisted = []


def has_min_tokens(text_col: str, n: int):
    """Raw-text predicate equivalent to ``size(shingles) > 0`` after
    :func:`with_shingles` (r14 optimization round, guide §7.2
    "duplicated subtrees"): a filter on the DERIVED shingles column
    gets pushed by Catalyst below any exchange as a copy of the whole
    tokenize+shingle+distinct expression — on the rebalanced scans
    that copy ran per-row on ONE core (measured 8.5 s per corpus pass
    at sf0.1, twice in d10).  ``size(split(text, '\\s+', -1)) >= n``
    is the same row set (split size = whitespace-run count + 1;
    shingles are empty iff token count < n; array_distinct never
    empties a non-empty array), and ``rlike`` expresses it as one
    regex scan of the raw column, so the pushed-down filter is cheap
    and nothing is recomputed above the exchange.  NULL text drops
    under both forms."""
    if n <= 1:
        return F.col(text_col).isNotNull()
    # >= n-1 whitespace runs: '\s+' then (n-2) x ('[^\s]+\s+') —
    # consecutive maximal runs always have non-space between them
    return F.col(text_col).rlike(r"\s+" + r"[^\s]+\s+" * (n - 2))


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles per document (JVM-side).

    Tokenizes once into a column first — inlining split() into the
    transform lambda would re-split the text per array element
    (O(tokens^2) per doc; measured 8x slower at sf0.1)."""
    d = df.withColumn("__toks", F.split(F.col(text_col), r"\s+"))
    shingle_expr = (
        f"array_distinct(transform(sequence(1, greatest(size(__toks) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', " +
        ", ".join(f"element_at(__toks, i + {k})" for k in range(n)) +
        ")))"
    )
    return d.withColumn(out_col, F.expr(shingle_expr)).drop("__toks")


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one hash-groupBy.  Returns one row
    per distinct content with the canonical keeper (min id) and the
    duplicate count."""
    return (df
            .groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("dup_count")))


def deduplicate_exact(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (min id wins): semi-join the
    keeper set back — no wide row shuffles beyond the group keys.

    The keeper-ID frame is persisted request-scoped (r14 optimization
    round, guide §5): the survivor set feeds several downstream passes
    in every composer (clean_corpus: the minhash signature build, the
    shingle verify frames, the cluster-label init, the final keep
    join), and without the pin EACH pass re-ran the md5-of-full-text
    groupBy — the most expensive per-row hash in the pipeline —
    measured ~3.4 s per extra pass at sf0.1.  The pin is the NARROW
    (id) projection, never the corpus: at 100 TB it is O(docs) ids,
    storage-evictable, and each consumer pays one corpus scan + a
    semi-join against materialized ids instead of re-hashing every
    byte of text."""
    keep = (exact_duplicate_groups(df, text_col, id_col)
            .select(F.col("keep_id").alias(id_col)).persist())
    return _tag_persisted(df.join(keep, on=id_col, how="left_semi"),
                          keep)


def _jaccard(a: str, b: str):
    return (F.size(F.array_intersect(F.col(a), F.col(b))) /
            F.size(F.array_union(F.col(a), F.col(b))))


def neardup_bruteforce(df: DataFrame, threshold: float = 0.5,
                       text_col: str = "text", id_col: str = "doc_id",
                       n: int = 3) -> DataFrame:
    """O(n^2) shingle-jaccard pairs — the correctness oracle for the LSH
    path.  Quadratic: never use beyond ~10^4 docs."""
    sh = with_shingles(df.filter(has_min_tokens(text_col, n)),
                       text_col, n).select(F.col(id_col), F.col("shingles"))
    # spread the STREAM side of the nested-loop join (r14 optimization
    # round, guide §2.5): the broadcast cross join streams the left
    # side at scan parallelism, so on a single-row-group layout ALL
    # n²/2 jaccard evaluations ran on ONE core (measured 425 s at
    # sf0.1 vs 28 s spread).  Same layout guard as every other
    # spread — no-op off the small-layout case, and the brute lane is
    # documented never to run beyond ~10^4 docs anyway.
    from ..sources.registry import maybe_spread_compute
    a = maybe_spread_compute(sh, df).select(
        F.col(id_col).alias("a_id"), F.col("shingles").alias("sa"))
    b = sh.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("sb"))
    pairs = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    return (pairs
            .withColumn("jaccard", F.round(_jaccard("sa", "sb"), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("a_id", "b_id", "jaccard"))


def shingle_hash_rows(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct (id, shingle_hash) rows — the long-format shingle set.

    Built with posexplode + window lead instead of array higher-order
    functions: array lambdas are interpreted per element (measured 3.5x
    slower at sf0.1), while explode/window/hash stay JVM-side.  The
    window, the dedup, and every downstream per-doc aggregate all
    cluster on ``id_col``, so Spark reuses one shuffle for the chain.
    """
    ex = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("__pos", "__tok"))
    # hash tokens to longs BEFORE the window so the partition sort moves
    # (id, pos, int64) instead of strings; the shingle identity is the
    # hash of the n token hashes (same set semantics, modulo xxhash64
    # collisions)
    ex = ex.select(F.col(id_col), F.col("__pos"),
                   F.xxhash64("__tok").alias("__th"))
    w = Window.partitionBy(id_col).orderBy("__pos")
    parts = [F.col("__th")] + [F.lead("__th", k).over(w) for k in range(1, n)]
    return (ex.select(F.col(id_col), F.xxhash64(*parts).alias("__h"),
                      parts[-1].isNotNull().alias("__full"))
            .filter("__full")
            .drop("__full")
            .dropDuplicates([id_col, "__h"]))


def minhash_signature_frames(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", n: int = 3,
                             num_hashes: int = 32, bands: int = 16):
    """The shared MinHash signature stage: returns
    ``(shingle_rows, stats, band_rows)`` where shingle_rows is the
    long-format (id, __h) shingle set, stats carries per-doc set size
    ``__sz`` plus the ``num_hashes`` salted minhashes, and band_rows is
    (id, band_idx, band_sig).  Used by the self-join pair finder
    (:func:`neardup_minhash_lsh`), the cross-corpus finder
    (:func:`neardup_pairs_against`) and the streaming ingest index —
    all three MUST share these exact expressions or signatures won't
    collide across them."""
    rows = num_hashes // bands
    ex = shingle_hash_rows(df, text_col, id_col, n)
    # SQL-string expressions, one py4j round trip each, instead of
    # nested Column constructors (~4 round trips per minhash): the
    # num_hashes=32 aggregate was ~0.4 s of pure plan-build latency
    # per query (r14 optimization round).  Literal salts stay INT in
    # both forms, so xxhash64 output is bit-identical (pinned by the
    # d03 oracle and test_minhash_lsh_*).
    stats = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__sz"),
        *[F.expr(f"min(xxhash64(__h, {j}))").alias(f"mh{j}")
          for j in range(num_hashes)])
    band_sigs = F.expr("array(" + ", ".join(
        "xxhash64({}, {})".format(
            ", ".join(f"mh{b * rows + r}" for r in range(rows)), b)
        for b in range(bands)) + ")")
    bands_df = stats.select(
        F.col(id_col),
        F.posexplode(band_sigs).alias("band_idx", "band_sig"))
    return ex, stats, bands_df


def build_neardup_index(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        num_hashes: int = 32, bands: int = 16):
    """Historical signature index for ingest-time near-dup filtering:
    ``(bands, shingles, sizes)`` DataFrames keyed by the corpus doc id.

    In a 100 TB deployment these are parquet tables maintained by the
    ingest job itself (accepted docs append their rows), with ``bands``
    bucketed on (band_idx, band_sig) so the per-batch candidate lookup
    is a co-located join; here they are returned as frames the caller
    persists."""
    ex, stats, bands_df = minhash_signature_frames(
        df, text_col, id_col, n, num_hashes, bands)
    return (bands_df,
            ex,
            stats.select(F.col(id_col), F.col("__sz")))


def neardup_pairs_against(new_docs: DataFrame, index_bands: DataFrame,
                          index_shingles: DataFrame,
                          index_sizes: DataFrame,
                          threshold: float = 0.5,
                          text_col: str = "text", id_col: str = "doc_id",
                          n: int = 3, num_hashes: int = 32,
                          bands: int = 16) -> DataFrame:
    """Cross-corpus near-dup pairs: (new_id, hist_id, jaccard) between a
    new document batch and a historical index built by
    :func:`build_neardup_index` — the ingest-time analog of
    :func:`neardup_minhash_lsh` (same S-curve, same exact-jaccard
    verify, but candidates come from a band join AGAINST THE INDEX
    instead of a self-join, so the batch never meets itself)."""
    ex_new, stats_new, bands_new = minhash_signature_frames(
        new_docs, text_col, id_col, n, num_hashes, bands)
    cand = (bands_new.select(F.col(id_col).alias("new_id"),
                             "band_idx", "band_sig")
            .join(index_bands.select(F.col(id_col).alias("hist_id"),
                                     "band_idx", "band_sig"),
                  on=["band_idx", "band_sig"], how="inner")
            .select("new_id", "hist_id")
            .dropDuplicates(["new_id", "hist_id"]))
    ea = ex_new.select(F.col(id_col).alias("new_id"), "__h")
    eb = index_shingles.select(F.col(id_col).alias("hist_id"), "__h")
    inter = (cand.join(ea, "new_id").join(eb, ["hist_id", "__h"])
                 .groupBy("new_id", "hist_id")
                 .agg(F.count(F.lit(1)).alias("__i")))
    return (inter
            .join(stats_new.select(F.col(id_col).alias("new_id"),
                                   F.col("__sz").alias("__sa")), "new_id")
            .join(index_sizes.select(F.col(id_col).alias("hist_id"),
                                     F.col("__sz").alias("__sb")), "hist_id")
            .withColumn("jaccard", F.round(
                F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("new_id", "hist_id", "jaccard"))


def contamination_pairs(train: DataFrame, eval_docs: DataFrame,
                        threshold: float = 0.5, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        num_hashes: int = 32, bands: int = 16) -> DataFrame:
    """Benchmark-decontamination report: (train_id, eval_id, jaccard)
    for every training document that near-duplicates an eval-set
    document — the check every training pipeline runs before shipping
    a mix.  Candidates come from the band join against the eval-set
    signature index (eval sets are small, so the index side is tiny),
    verified with exact jaccard; never an all-pairs scan."""
    bands_ix, shingles_ix, sizes_ix = build_neardup_index(
        eval_docs, text_col, id_col, n, num_hashes, bands)
    return (neardup_pairs_against(train, bands_ix, shingles_ix, sizes_ix,
                                  threshold, text_col, id_col, n,
                                  num_hashes, bands)
            .select(F.col("new_id").alias("train_id"),
                    F.col("hist_id").alias("eval_id"), "jaccard"))


def decontaminate(train: DataFrame, eval_docs: DataFrame,
                  threshold: float = 0.5, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3,
                  num_hashes: int = 32, bands: int = 16) -> DataFrame:
    """Drop training documents contaminated by the eval set (any
    near-dup hit above ``threshold``); returns the clean training
    rows."""
    hits = (contamination_pairs(train, eval_docs, threshold, text_col,
                                id_col, n, num_hashes, bands)
            .select(F.col("train_id").alias(id_col))
            .dropDuplicates([id_col]))
    return train.join(hits, on=id_col, how="left_anti")


def recommended_minhash_config(threshold: float = 0.5,
                               target_recall: float = 0.95,
                               max_hashes: int = 256) -> tuple[int, int]:
    """Size (num_hashes, bands) for :func:`neardup_minhash_lsh` from
    the similarity threshold — the MinHash analog of
    ``similarity.recommended_lsh_config``.

    For r rows/band and b bands, recall at similarity s is
    1-(1-s^r)^b.  The helper picks the LARGEST r whose minimal-b
    configuration (b = smallest integer meeting ``target_recall`` at
    ``threshold``) fits ``max_hashes`` = r·b: larger r sharpens the
    S-curve (fewer false candidates — candidate volume is what rows
    buy, bands buy recall back, exactly the planes/tables split of the
    hyperplane path), and higher thresholds afford much larger r
    (s^r decays slower), e.g. 0.5 → r=2, 0.9 → r=8 at the default
    budget.  Returns (num_hashes, bands) with num_hashes divisible by
    bands, as the signature stage requires."""
    import math
    if not 0 < threshold < 1 or not 0 < target_recall < 1:
        raise ValueError("threshold and target_recall must be in (0, 1)")
    best = None
    for r in range(1, 65):
        p = threshold ** r
        if p <= 0.0:
            break
        b = max(1, math.ceil(math.log(1.0 - target_recall) /
                             math.log(1.0 - p)))
        if r * b <= max_hashes:
            best = (r * b, b)       # feasible: keep the largest r
        elif best is not None:
            break                   # b only grows from here
    if best is None:
        raise ValueError(
            f"no (rows, bands) meets recall {target_recall} at "
            f"threshold {threshold} within {max_hashes} hashes")
    return best


def neardup_minhash_lsh(df: DataFrame, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, num_hashes: int = 32,
                        bands: int = 16, auto: bool = False,
                        target_recall: float = 0.95,
                        touching: DataFrame | None = None) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, verified with exact
    jaccard on candidates only.

    Decision boundary (the banding S-curve): with the default
    num_hashes=32 / bands=16 (r=2 rows/band), a pair at jaccard s
    becomes a candidate with probability 1-(1-s^2)^16; the exact-verify
    pass then removes every false positive, so the only error mode is a
    *miss*:

        s     P(miss) = (1-s^2)^16
        0.50  1.0e-2
        0.60  7.9e-4
        0.70  2.1e-5
        0.80  7.9e-8
        0.90  2.8e-12

    i.e. at the default threshold 0.5 the curve's steep section sits
    just below the threshold: borderline pairs (s in [0.5, 0.6)) can be
    missed with up to ~1% probability, anything >= threshold+0.1 is
    effectively never missed (pinned by the S-curve property test).
    Raise ``bands`` (more, narrower bands) to push recall up at the
    cost of more candidate pairs, or raise ``num_hashes`` with
    ``rows`` >= 3 for high thresholds.

    Long-format throughout — shingle sets live as (id, hash64) rows,
    never as arrays:
    - signatures: one groupBy(id) computing |set| and the k salted
      minhashes (min over duplicate occurrences is the same min, so no
      pre-dedup pass is needed beyond the shared one);
    - candidates: band-bucket self-join moving only (id, band, sig);
    - verification: candidate ⋈ shingle-rows ⋈ shingle-rows hash-equi
      join counts the intersection, |A∪B| = |A|+|B|-|A∩B| — exact
      jaccard with no array_intersect over wide payloads.
    Jaccard over 64-bit shingle hashes equals string jaccard up to hash
    collisions (~1e-9 at 10^6 distinct shingles).

    ``auto=True`` sizes num_hashes/bands from the threshold via
    :func:`recommended_minhash_config` (ignoring the explicit args);
    the registered d03 query keeps explicit params so its oracle
    replays bit-for-bit.
    """
    if auto:
        num_hashes, bands = recommended_minhash_config(
            threshold, target_recall=target_recall)
    ex, stats, bands_df = minhash_signature_frames(
        df, text_col, id_col, n, num_hashes, bands)
    # consumed three times (signature + both verify sides): persist the
    # narrow (id, hash) projection, ~16 bytes/shingle
    ex = ex.persist()
    # the band frame feeds BOTH sides of the self-join, and Spark does
    # not reuse the signature aggregate across the branches — without
    # the pin each side re-ran the 32-minhash groupBy (r10, measured
    # 2x: sf1 13.2s -> 6.4s, identical pairs).  docs x bands rows of
    # (id, band, sig) — tiny and storage-evictable.
    bands_df = bands_df.persist()
    left = bands_df.select(F.col(id_col).alias("a_id"), "band_idx", "band_sig")
    right = bands_df.select(F.col(id_col).alias("b_id"), "band_idx", "band_sig")
    cand = (left.join(right, on=["band_idx", "band_sig"], how="inner")
                .filter(F.col("a_id") < F.col("b_id"))
                .select("a_id", "b_id")
                .dropDuplicates(["a_id", "b_id"]))
    if touching is not None:
        # spill-path restriction (r11): keep only candidate pairs with
        # >= 1 side in ``touching`` BEFORE the exact-verify joins —
        # pairs wholly outside the set were already verified on the
        # exact PPJoin path, so verifying them here is pure re-work.
        # Filtering candidates commutes with verification (both key on
        # the pair ids), so the surviving pairs are bit-identical.
        ta = touching.select(F.col(id_col).alias("a_id"),
                             F.lit(True).alias("__ta"))
        tb = touching.select(F.col(id_col).alias("b_id"),
                             F.lit(True).alias("__tb"))
        cand = (cand.join(ta, on="a_id", how="left")
                    .join(tb, on="b_id", how="left")
                    .filter(F.col("__ta").isNotNull()
                            | F.col("__tb").isNotNull())
                    .select("a_id", "b_id"))
    ea = ex.select(F.col(id_col).alias("a_id"), "__h")
    eb = ex.select(F.col(id_col).alias("b_id"), "__h")
    inter = (cand.join(ea, "a_id").join(eb, ["b_id", "__h"])
                 .groupBy("a_id", "b_id").agg(F.count(F.lit(1)).alias("__i")))
    sizes = stats.select(F.col(id_col), F.col("__sz"))
    return _tag_persisted(
        (inter
         .join(sizes.select(F.col(id_col).alias("a_id"),
                            F.col("__sz").alias("__sa")), "a_id")
         .join(sizes.select(F.col(id_col).alias("b_id"),
                            F.col("__sz").alias("__sb")), "b_id")
         .withColumn("jaccard", F.round(
             F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i")), 6))
         .filter(F.col("jaccard") >= threshold)
         .select("a_id", "b_id", "jaccard")),
        ex, bands_df)


#: SimHash width: 60 bits — every bit comes from one hex digit slice of
#: md5(token), so an independent engine (the DuckDB oracle) can re-derive
#: the identical signature with plain integer arithmetic; xxhash64 would
#: be Spark-only.  md5 is a JVM built-in inside codegen, and the hash is
#: computed once per *distinct* token per doc.
SIMHASH_BITS = 60
SIMHASH_CHUNK_BITS = 15  # 4 banding chunks of 15 bits


def _portable_token_hash(col: str) -> F.Column:
    """60-bit integer from the first 15 hex digits of md5(token) —
    engine-portable (any SQL engine can fold hex digits) and well below
    BIGINT overflow (16^15 = 2^60), so ANSI-safe."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def with_simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 out_col: str = "simhash") -> DataFrame:
    """60-bit SimHash from portable md5-derived token hashes.

    Computed as explode -> 60 per-bit vote aggregates -> bitwise OR
    pack.  Array-lambda formulations are interpreted per element;
    this stays in whole-stage codegen end to end (~6x faster at
    sf0.1).  Returns one row per id: (id_col, simhash)."""
    ex = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            F.split(F.trim(F.col(text_col)), r"\s+"))).alias("__t"))
    ex = (ex.filter(F.col("__t") != "")
            .select(F.col(id_col), _portable_token_hash("__t").alias("__h")))
    # Bit-vote counting packed 4 lanes/long: long j accumulates the
    # ones-counts of bits 4j..4j+3 in four 16-bit lanes, so the group
    # aggregate is 15 plain sums + a count instead of 60 conditional
    # sums (the 60-agg buffer blew past codegen method limits and fell
    # back to interpreted eval — measured 4x slower at sf0.1).  16-bit
    # lanes cap a document at 65,535 *distinct* tokens; beyond that,
    # shard the token stream and OR the per-shard simhashes.
    lane = lambda j, l: f"(((__h >> {4 * j + l}) & 1) << {16 * l})"
    votes = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.expr(" | ".join(lane(j, l) for l in range(4))))
           .alias(f"__s{j}") for j in range(SIMHASH_BITS // 4)])
    # bit i=4j+l set iff ones > zeros: 2 * lane_count > n
    bit = lambda j, l: (f"(case when 2 * ((__s{j} >> {16 * l}) & 65535) > __n "
                        f"then shiftleft(1L, {4 * j + l}) else 0L end)")
    packed = " | ".join(
        bit(j, l) for j in range(SIMHASH_BITS // 4) for l in range(4))
    return votes.select(F.col(id_col), F.expr(packed).alias(out_col))


def _propagate_labels(pairs: DataFrame) -> tuple:
    """Min-label propagation over the pair graph's INDUCED SUBGRAPH
    (r14 optimization round, guide §2.3 "shuffle fewer bytes"): a node
    outside every pair can never change its label (min of itself), so
    the old corpus-wide loop paid R full groupBy shuffles for rows
    that were constant by construction — at 100 TB that is R passes
    over 10^12 ids to relabel the ~10^9 that touch a pair.  Returns
    (labels, pins) where labels holds (id, cluster) for PAIR NODES
    ONLY (the callers compose the singleton identity rows in one
    corpus pass) and pins are the request-scoped persisted frames
    feeding it (hand them to :func:`_tag_persisted`).

    Round structure (r15 optimization round, VERDICT r14 #4 — each
    round is one join+groupBy+aggregate JOB, ~0.8-2 s of fixed
    scheduler/AQE overhead at sf0.1 and one O(pair nodes) shuffle at
    any scale, so the round count is the cost driver):

    - round 1 is FOLDED into the label init: L1(v) = min(v, min of
      v's neighbors) is one aggregate over the edge list (both
      directions are present), replacing the old identity-label
      distinct plus a full union-join round — algebraically the same
      L1 the old loop produced.
    - convergence is detected by a changed-row count carried through
      the SAME per-round aggregate (each node's previous label rides
      the union as ``__old``; min() ignores the neighbors' nulls), so
      the loop stops the round it converges — the old checksum
      comparison needed one extra full confirm round to observe
      equality.
    - each round also propagates label-of-label (pointer doubling:
      ``L(v) := min(L(v), L(L(v)), min over neighbors)``), so reach
      doubles per round and a diameter-d chain converges in
      O(log2 d) rounds instead of d — same fixpoint (the min id of
      the component; L(v) is always a node of v's component, so the
      shortcut never crosses components).

    Labels are persisted per round, lineage and state stay O(1)
    across rounds.  Frees the PAIR frames' request pins once the
    rounds have materialized them, so every composer inherits the
    hygiene."""
    # persist the edge list: every propagation round joins it, and
    # without the pin each round re-executed the ENTIRE pair pipeline
    # upstream (for LSH pairs that is the candidate self-join + the
    # exact-verify shingle joins — measured 26 s for c01_clean_corpus
    # at sf0.1, dominated by 3-4 redundant verify passes; 9 s after).
    edges = (pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
             .unionByName(pairs.select(F.col("b_id").alias("src"),
                                       F.col("a_id").alias("dst")))
             .persist())
    # L1 directly from the edges (both directions present, so
    # groupBy(dst) covers every pair node and min(src) is the min
    # neighbor)
    labels = (edges.groupBy(F.col("dst").alias("id"))
              .agg(F.min("src").alias("__m"))
              .select("id", F.least(F.col("id"), F.col("__m"))
                      .alias("cluster"))
              .persist())
    id_type = dict(pairs.dtypes)["a_id"]
    for _ in range(32):  # log2(diameter) guard; real clusters need <4
        neigh = (labels.join(edges, labels["id"] == edges["src"])
                 .select(F.col("dst").alias("id"), "cluster"))
        hop2 = (labels.alias("l1")
                .join(labels.alias("l2"),
                      F.col("l1.cluster") == F.col("l2.id"))
                .select(F.col("l1.id").alias("id"),
                        F.col("l2.cluster").alias("cluster")))
        own = labels.select("id", "cluster",
                            F.col("cluster").alias("__old"))
        nullc = F.lit(None).cast(id_type).alias("__old")
        nxt = (own.unionByName(neigh.select("id", "cluster", nullc))
               .unionByName(hop2.select("id", "cluster", nullc))
               .groupBy("id").agg(F.min("cluster").alias("cluster"),
                                  F.min("__old").alias("__old"))
               .persist())
        # ONE action per round materializes the new labels into the
        # cache and reports whether any node's label moved
        changed = nxt.agg(F.max(
            (F.col("cluster") != F.col("__old")).cast("int"))
        ).collect()[0][0]
        labels.unpersist()
        labels = nxt
        if not changed:   # None (empty graph) or 0 — converged
            break
    # the propagation rounds materialized the pair pipeline's lineage
    # into the pinned labels frame, so the PAIR frames' request pins
    # (LSH signature frames, PPJoin sh/prefix) are dead weight from
    # here (r14)
    unpersist_request_frames(pairs)
    return labels.select("id", "cluster"), [labels, edges]


def neardup_clusters(df: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Connected components over a near-dup pair graph -> (id, cluster)
    where cluster = the minimum id reachable from the node (singletons
    label themselves).  This is the keep/drop decision a dedup pipeline
    actually needs: keep ``id == cluster``, drop the rest.

    The propagation loop runs over the pair nodes only
    (:func:`_propagate_labels`); singletons join back in ONE final
    pass — left join + coalesce on the distinct corpus ids, the same
    dedup-by-id the old per-round groupBy applied — so the output
    frame is row-identical to the corpus-wide loop.

    The final compose pays ONE corpus scan + distinct at each action
    on the returned handle (the labels side is cached; the corpus
    side is not — persisting the corpus per request is exactly the
    O(corpus) pin the induced-subgraph shape exists to avoid).
    Consumers that take several actions should materialize once
    (collect/write) and then free the pins via
    :func:`unpersist_request_frames`, the API-layer convention."""
    labels, pins = _propagate_labels(pairs)
    out = (df.select(F.col(id_col).alias("id")).distinct()
           .join(labels.select("id", F.col("cluster").alias("__cl")),
                 on="id", how="left")
           .select(F.col("id").alias(id_col),
                   F.coalesce("__cl", F.col("id")).alias("cluster")))
    return _tag_persisted(out, *pins)


def deduplicate_neardup(df: DataFrame, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3) -> DataFrame:
    """Keep one document per near-duplicate cluster (min id wins):
    MinHash-LSH pairs -> connected components -> anti-join the drop
    set (pair nodes whose cluster label is another id) back onto the
    corpus: everything else keeps itself, so the row set is identical
    to the old keep-semi-join over corpus-wide labels while touching
    the corpus exactly once (r14 optimization round)."""
    pairs = neardup_minhash_lsh(df, threshold, text_col, id_col, n)
    labels, pins = _propagate_labels(pairs)
    drop = (labels.filter(F.col("id") != F.col("cluster"))
            .select(F.col("id").alias(id_col)))
    # carry the INPUT frame's request pins too (r14): deduplicate_exact
    # now tags its keeper-ID pin on the frame composers hand us, and
    # dropping it here would leak the pin on the composed paths.
    # NULL-id note (ADVICE r14): rows with a NULL id are KEPT by this
    # anti-join (null never matches the drop set) — the r13 keep-set
    # semi-join dropped them; the engine's corpora have non-null ids,
    # so the declared row sets are identical, but callers feeding
    # nullable ids should filter first.
    return _tag_persisted(
        df.join(drop, on=id_col, how="left_anti"),
        *pins,
        *getattr(df, "_mrs_request_persisted", []))


def neardup_simhash(df: DataFrame, max_hamming: int = 3,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash near-dup pairs: 4x15-bit chunk banding (pigeonhole
    guarantees recall for hamming <= 3), then exact hamming verify via
    bit_count(xor) on candidates only.

    The simhash frame is persisted before the band self-join (r10):
    Spark does not reuse the aggregate across the two join branches
    (each side re-ran the full token explode + 15-lane vote aggregate —
    measured 2x the whole signature cost, the dominant term at sf1:
    15.0s -> 8.4s for identical pairs).  The cached frame is
    O(docs) x 16 bytes and storage-evictable, so pinning it is the
    right trade at any corpus size."""
    # layout-adaptive spread (r14 optimization round, guide §2.5): the
    # signature build (token explode + 15-lane vote aggregate) is
    # per-row compute that otherwise runs at the scan's row-group
    # parallelism; no-op at scale (maybe_spread_compute's byte guard)
    from ..sources.registry import maybe_spread_compute
    sh = with_simhash(maybe_spread_compute(df, df),
                      text_col, id_col).persist()
    chunks = sh.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(F.expr(
            f"transform(sequence(0, 3), c -> "
            f"(simhash >> (c * {SIMHASH_CHUNK_BITS})) & "
            f"{(1 << SIMHASH_CHUNK_BITS) - 1})"
        )).alias("chunk_idx", "chunk_val"))
    left = chunks.select(F.col(id_col).alias("a_id"), "chunk_idx", "chunk_val",
                         F.col("simhash").alias("ha"))
    right = chunks.select(F.col(id_col).alias("b_id"), "chunk_idx", "chunk_val",
                          F.col("simhash").alias("hb"))
    # hamming BEFORE the pair dedup: bit_count(xor) is free inside the
    # join's codegen stage, while dropDuplicates is a full shuffle of
    # every candidate row — filtering first shrinks that shuffle to
    # only true pairs (measured 3x on sf0.1: 2.9M candidate rows ->
    # 0.6M passing; identical output, hamming is deterministic per
    # pair so any surviving duplicate row carries the same value)
    return _tag_persisted(
        (left.join(right, on=["chunk_idx", "chunk_val"], how="inner")
             .filter(F.col("a_id") < F.col("b_id"))
             .withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("int"))
             .filter(F.col("hamming") <= max_hamming)
             .dropDuplicates(["a_id", "b_id"])
             .select("a_id", "b_id", "hamming")),
        sh)


class PrefixSkewError(RuntimeError):
    """Raised by neardup_jaccard_prefix when a prefix bucket exceeds
    max_candidates_per_prefix (r10, VERDICT r9 #2): the exact-Jaccard
    verify stage is output-bound, so a pathologically shared prefix
    shingle (a template header every doc starts with, a corpus whose
    vocabulary stalls while docs grow) makes the TRUE pair count — and
    the verify join — quadratic.  Failing loud with the offending
    shingles beats an unbounded job; the caller can drop the template
    shingles, raise the threshold, or switch to the approximate
    MinHash-LSH path (neardup_minhash_lsh)."""

    def __init__(self, buckets: list, cap: int):
        self.buckets = buckets     # [(shingle, prefix_bucket_size)]
        self.cap = cap
        detail = ", ".join(f"{s!r}×{c:,}" for s, c in buckets)
        super().__init__(
            f"exact-Jaccard prefix skew: {len(buckets)} prefix "
            f"bucket(s) exceed max_candidates_per_prefix={cap:,} "
            f"(worst: {detail}); the candidate join would be "
            "quadratic in the bucket size — drop the template "
            "shingles, raise the threshold, or use the approximate "
            "MinHash-LSH path")


def jaccard_prefix_bucket_stats(df: DataFrame, threshold: float = 0.5,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                n: int = 3, top: int = 20) -> DataFrame:
    """Per-prefix-shingle candidate telemetry (r10, VERDICT r9 #2):
    how many documents carry each shingle in their PREFIX, and the
    candidate pairs that bucket alone would emit (k·(k-1)/2).  The
    operational dashboard for sizing max_candidates_per_prefix — one
    shingle-keyed groupBy over the prefix frame, nothing quadratic."""
    prefix = _jaccard_prefix_frame(df, threshold, text_col, id_col, n)
    return (prefix.groupBy("__g")
                  .agg(F.count(F.lit(1)).alias("bucket_size"))
                  .withColumn("candidate_pairs",
                              (F.col("bucket_size")
                               * (F.col("bucket_size") - 1) / 2)
                              .cast("long"))
                  .orderBy(F.desc("bucket_size"))
                  .limit(top)
                  .select(F.col("__g").alias("shingle"), "bucket_size",
                          "candidate_pairs"))


def _jaccard_prefix_frame(df: DataFrame, threshold: float,
                          text_col: str, id_col: str, n: int) -> DataFrame:
    """Shared prefix construction for neardup_jaccard_prefix and its
    telemetry: per (doc, prefix shingle) rows with __g/__sz/__rn."""
    sh = (with_shingles(df.filter(has_min_tokens(text_col, n)),
                        text_col, n)
          .select(F.col(id_col), F.col("shingles")))
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("__g"))
    freq = ex.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    w_doc = Window.partitionBy(id_col)
    ordered = (ex.join(freq, on="__g")
                 .withColumn("__rn", F.row_number().over(
                     w_doc.orderBy(F.asc("__df"), F.asc("__g"))))
                 .withColumn("__sz", F.count(F.lit(1)).over(w_doc)))
    # epsilon guards: binary float t*sz can overshoot an exact integer
    # product (0.1*30 -> 3.0000000000000004), and ceil/comparisons on
    # the overshoot would shorten the prefix / tighten the length
    # bound — each a silent RECALL bug.  1e-9 << 1/|S| for any real
    # document, so the guards never admit a genuinely failing size.
    return ordered.filter(
        F.col("__rn") <= F.col("__sz")
        - F.ceil(F.lit(threshold) * F.col("__sz") - F.lit(1e-9)) + 1)


def neardup_jaccard_prefix(df: DataFrame, threshold: float = 0.5,
                           text_col: str = "text", id_col: str = "doc_id",
                           n: int = 3,
                           max_candidates_per_prefix: int | None = None
                           ) -> DataFrame:
    """EXACT shingle-Jaccard near-dup pairs via prefix filtering
    (PPJoin / AllPairs family) — identical output to
    neardup_bruteforce, but linear-ish: no cross join anywhere.

    Two documents with Jaccard >= t must (a) share at least one
    shingle among each one's first ``|S| - ceil(t*|S|) + 1`` shingles
    in any GLOBAL canonical order (prefix filter), and (b) satisfy
    ``t*|A| <= |B| <= |A|/t`` (length filter).  Ordering shingles
    rarest-first (global document frequency, ties by value) makes the
    prefixes the rarest shingles in the corpus, so the candidate
    equi-join buckets stay small by construction — the frequent
    shingles that would blow up an inverted-index join are exactly the
    ones prefix filtering excludes.  Candidates are then verified with
    the exact set Jaccard, so the result equals the brute-force pairs
    bit-for-bit (same round(6)).

    Shuffles: shingle document-frequency groupBy + join-back (shared
    key __g), one per-doc window, the candidate equi-join on the
    prefix shingle, and two id-keyed verify joins.  Every key is
    either the shingle value or the doc id — nothing quadratic IN THE
    PLAN; the one quadratic risk is in the DATA (r10, VERDICT r9 #2):
    a template shingle shared corpus-wide lands in every prefix and
    its bucket alone emits k²/2 true candidates.
    ``max_candidates_per_prefix`` bounds that: any prefix bucket
    larger than the cap raises :class:`PrefixSkewError` naming the
    offending shingles (size it from
    :func:`jaccard_prefix_bucket_stats`); ``None`` (default) keeps
    the unguarded bit-identical behavior."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # both frames feed TWO join branches each (prefix -> a/b candidate
    # sides, shingles -> both verify sides) and Spark does not reuse
    # the underlying aggregates/windows across self-join branches —
    # persist the narrow frames instead of paying the document-
    # frequency join + per-doc window (prefix) and the shingle build
    # (sh) twice (r10, same fix as d03/d04; bit-identical output)
    sh = (with_shingles(df.filter(has_min_tokens(text_col, n)),
                        text_col, n)
          .select(F.col(id_col), F.col("shingles"))).persist()
    prefix = _jaccard_prefix_frame(df, threshold, text_col, id_col,
                                   n).persist()
    if max_candidates_per_prefix is not None:
        # skew guard (r10, VERDICT r9 #2): a prefix bucket of k docs
        # emits ~k²/2 candidates — under adversarial frequency skew
        # (a template shingle shared corpus-wide) the verify stage is
        # output-bound and quadratic BY CONSTRUCTION, not by plan
        # defect.  Fail loud with the offending shingles instead of
        # running an unbounded join.  One shingle-keyed groupBy over
        # the prefix frame; no action when the guard is off, so the
        # default path stays bit-identical.
        try:
            hot = (prefix.groupBy("__g")
                         .agg(F.count(F.lit(1)).alias("__b"))
                         .filter(F.col("__b") > max_candidates_per_prefix)
                         .orderBy(F.desc("__b"), F.asc("__g"))
                         .limit(5).collect())
            if hot:
                raise PrefixSkewError(
                    [(r["__g"], r["__b"]) for r in hot],
                    max_candidates_per_prefix)
        except BaseException:
            # the raise path would otherwise leak the two frames just
            # persisted (ADVICE r10) — nothing downstream consumes
            # them once the guard fires
            sh.unpersist()
            prefix.unpersist()
            raise
    return _tag_persisted(
        _jaccard_pairs_from_prefix(sh, prefix, threshold, id_col),
        sh, prefix)


def _jaccard_pairs_from_prefix(sh: DataFrame, prefix: DataFrame,
                               threshold: float, id_col: str) -> DataFrame:
    """Candidate equi-join + exact verify shared by the plain PPJoin
    path and the MinHash spill path (r11).

    Positional filter (PPJoin proper, r9): a pair matched on a prefix
    shingle at ranks (i, j) can share at most 1 + min(|A|-i, |B|-j)
    shingles, and Jaccard >= t needs overlap >= t(|A|+|B|)/(1+t).
    Exactness: every true pair's FIRST shared shingle (global order)
    passes the bound — all common shingles rank at or after it on both
    sides — and a pair is kept when ANY match passes.  The epsilon only
    ever ADMITS borderline pairs."""
    a = prefix.select(F.col(id_col).alias("a_id"), F.col("__g"),
                      F.col("__sz").alias("__sza"),
                      F.col("__rn").alias("__rna"))
    b = prefix.select(F.col(id_col).alias("b_id"), F.col("__g"),
                      F.col("__sz").alias("__szb"),
                      F.col("__rn").alias("__rnb"))
    ubound = 1 + F.least(F.col("__sza") - F.col("__rna"),
                         F.col("__szb") - F.col("__rnb"))
    alpha = (F.lit(threshold) / F.lit(1.0 + threshold)
             * (F.col("__sza") + F.col("__szb")))
    cand = (a.join(b, on="__g")
             .filter((F.col("a_id") < F.col("b_id"))
                     & (F.col("__szb")
                        >= F.lit(threshold) * F.col("__sza") - F.lit(1e-9))
                     & (F.col("__szb") * F.lit(threshold)
                        <= F.col("__sza") + F.lit(1e-9))
                     & (ubound >= alpha - F.lit(1e-9)))
             .select("a_id", "b_id")
             .distinct())
    fa = sh.select(F.col(id_col).alias("a_id"), F.col("shingles").alias("sa"))
    fb = sh.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("sb"))
    return (cand.join(fa, on="a_id").join(fb, on="b_id")
                .withColumn("jaccard", F.round(_jaccard("sa", "sb"), 6))
                .filter(F.col("jaccard") >= threshold)
                .select("a_id", "b_id", "jaccard"))


def neardup_jaccard_spill_minhash(df: DataFrame, threshold: float = 0.5,
                                  text_col: str = "text",
                                  id_col: str = "doc_id", n: int = 3,
                                  max_candidates_per_prefix: int = 100_000,
                                  num_hashes: int = 32,
                                  bands: int = 8, auto: bool = False,
                                  target_recall: float = 0.95
                                  ) -> DataFrame:
    """Exact-Jaccard pairs with a DEGRADED-MODE spill for prefix-bucket
    skew (r11, VERDICT r10 #4): instead of failing the whole job when a
    template shingle's prefix bucket exceeds the cap
    (:class:`PrefixSkewError`), the documents CARRYING a hot prefix
    shingle are routed through the MinHash-LSH pre-filter while every
    other pair keeps the exact PPJoin path.

    Output adds an ``approximate`` flag:

    - ``approximate = false`` — both docs are outside every hot bucket.
      Their prefixes contain no hot shingle, so excluding the hot docs
      from the candidate join removes no prefix ROW of theirs — the
      PPJoin exactness argument is untouched and these pairs are
      bit-identical to the unguarded run.
    - ``approximate = true`` — at least one doc carries a hot prefix
      shingle.  Candidates come from banded MinHash (linear-ish, never
      the k²/2 hot-bucket join); VALUES are still exact (the verify
      stage computes true set Jaccard) — only recall is probabilistic
      (the LSH S-curve, see :func:`neardup_minhash_lsh`).

    Scale: the spill bounds the adversarial failure mode — a
    corpus-wide template shingle costs one extra LSH pass instead of an
    unbounded quadratic join, and the exact path's candidate buckets
    stay under the cap by construction.  The hot shingle set and the
    hot doc set both stay DataFrames end-to-end (left-semi joins, no
    driver collect): adversarial skew can make either one huge.

    Sizing ``bands`` for recall on the HOT set (the only pairs that
    inherit the LSH S-curve): a hot-hot pair at jaccard s is a
    candidate with probability ``1-(1-s^r)^bands`` where
    ``r = num_hashes // bands``.  With the spill default 32/8 (r=4), a
    pair at exactly s=0.5 is found with ~0.40 probability but s=0.8
    with ~0.98 — tune for borderline pairs by passing ``auto=True``
    with a ``target_recall``: the same planner as
    :func:`neardup_minhash_lsh` picks (num_hashes, bands) so recall AT
    the threshold is >= target (e.g. threshold 0.5, target 0.95 →
    finer bands, r<=2)."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = (with_shingles(df.filter(has_min_tokens(text_col, n)),
                        text_col, n)
          .select(F.col(id_col), F.col("shingles"))).persist()
    prefix = _jaccard_prefix_frame(df, threshold, text_col, id_col,
                                   n).persist()
    # hot shingles stay a DATAFRAME (ADVICE r11): a driver-side
    # isin() literal is unbounded under exactly the adversarial skew
    # this spill exists to bound.  The one driver action is a
    # bounded limit(1) existence probe; unpersist-on-raise mirrors
    # the neardup_jaccard_prefix guard above.
    hot_g = (prefix.groupBy("__g")
                   .agg(F.count(F.lit(1)).alias("__b"))
                   .filter(F.col("__b") > max_candidates_per_prefix)
                   .select("__g").persist())
    try:
        has_hot = bool(hot_g.limit(1).take(1))
    except BaseException:
        hot_g.unpersist()
        sh.unpersist()
        prefix.unpersist()
        raise
    if not has_hot:
        hot_g.unpersist()
        return _tag_persisted(
            _jaccard_pairs_from_prefix(sh, prefix, threshold, id_col)
            .withColumn("approximate", F.lit(False)),
            sh, prefix)
    hot_docs = (prefix.join(hot_g, on="__g", how="left_semi")
                      .select(id_col).distinct().persist())
    clean_prefix = prefix.join(hot_docs, on=id_col, how="left_anti")
    exact = (_jaccard_pairs_from_prefix(sh, clean_prefix, threshold,
                                        id_col)
             .withColumn("approximate", F.lit(False)))
    # pairs touching a hot doc: LSH candidates pruned to >= 1 hot side
    # BEFORE the exact verify (the wholly-non-hot pairs were already
    # verified on the exact path — re-verifying them here would be
    # pure re-work), then the SAME exact set-Jaccard verify.  No
    # forced broadcast on the hot set: adversarial skew can put EVERY
    # doc in it — AQE picks the strategy from the real size.
    lsh = neardup_minhash_lsh(df, threshold, text_col, id_col, n,
                              num_hashes=num_hashes, bands=bands,
                              auto=auto, target_recall=target_recall,
                              touching=hot_docs)
    spill = lsh.withColumn("approximate", F.lit(True))
    return _tag_persisted(
        exact.unionByName(spill), sh, prefix, hot_g, hot_docs,
        *getattr(lsh, "_mrs_request_persisted", []))


def build_jaccard_index(df: DataFrame, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3):
    """EXACT-Jaccard corpus index for ingest-time dedup:
    ``(prefixes, shingles, freq)`` frames keyed by the corpus doc id —
    the prefix-filter analog of :func:`build_neardup_index` (which is
    approximate MinHash).  In a deployment these persist as parquet,
    ``prefixes`` bucketed on the shingle so the per-batch candidate
    lookup is a co-located join; accepted docs append their rows.

    The global shingle order (document frequency at BUILD time, ties
    by value) is frozen into the index.  Prefix-filter correctness
    needs only a CONSISTENT total order on shingles — frequency drift
    after the build affects pruning power, never recall — so queries
    against a stale index stay exact."""
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = (with_shingles(df.filter(has_min_tokens(text_col, n)),
                        text_col, n)
          .select(F.col(id_col), F.col("shingles")))
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("__g"))
    freq = ex.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    w_doc = Window.partitionBy(id_col)
    ordered = (ex.join(freq, on="__g")
                 .withColumn("__rn", F.row_number().over(
                     w_doc.orderBy(F.asc("__df"), F.asc("__g"))))
                 .withColumn("__sz", F.count(F.lit(1)).over(w_doc)))
    prefixes = (ordered.filter(
        F.col("__rn") <= F.col("__sz")
        - F.ceil(F.lit(threshold) * F.col("__sz") - F.lit(1e-9)) + 1)
        .select(F.col(id_col), "__g", "__sz", "__rn"))
    return prefixes, sh, freq


def neardup_pairs_against_jaccard_index(
        new_docs: DataFrame, index_prefixes: DataFrame,
        index_shingles: DataFrame, index_freq: DataFrame,
        threshold: float = 0.5, index_threshold: float | None = None,
        text_col: str = "text", id_col: str = "doc_id",
        n: int = 3,
        max_candidates_per_prefix: int | None = None) -> DataFrame:
    """EXACT cross-corpus Jaccard pairs ``(new_id, hist_id, jaccard)``
    between a new batch and a :func:`build_jaccard_index` corpus — the
    exact analog of :func:`neardup_pairs_against`.  The batch's
    prefixes are ordered by the INDEX's frozen (df, shingle) order
    (unseen shingles get df=0: they sort first, i.e. rarest — the
    conservative choice), so the prefix-filter theorem applies to the
    pair as long as ``threshold >= index_threshold`` (the index's
    prefixes are at least as long as the threshold requires).

    ``max_candidates_per_prefix`` (r12 — the index-path analog of the
    self-join guard): a template shingle shared by much of the INDEX
    costs O(|batch| x |index bucket|) candidate rows per batch.  When
    set, batch prefix rows touching an index shingle whose corpus
    document frequency exceeds the cap raise :class:`PrefixSkewError`
    naming the shingles (df is a free upper bound on the prefix bucket
    — the freq frame is already part of the index, so the check adds
    no index-sized work).  The degraded alternative for such corpora
    is the MinHash ingest index
    (streaming_neardup_ingest_incremental), which bounds candidates by
    banding instead of prefixes."""
    if index_threshold is not None and threshold < index_threshold:
        raise ValueError(
            f"query threshold {threshold} is below the index build "
            f"threshold {index_threshold}: the stored prefixes are too "
            "short to guarantee recall — rebuild the index")
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh_new = (with_shingles(new_docs.filter(has_min_tokens(text_col, n)),
                          text_col, n)
              .select(F.col(id_col), F.col("shingles")))
    prefix_new = jaccard_prefix_rows(sh_new, index_freq, threshold, id_col)
    if max_candidates_per_prefix is not None:
        hot = (index_freq
               .filter(F.col("__df") > max_candidates_per_prefix)
               .select("__g", "__df"))
        touched = (prefix_new.join(hot, on="__g")
                   .groupBy("__g").agg(F.max("__df").alias("__df"))
                   .orderBy(F.desc("__df"))
                   .limit(5).collect())
        if touched:
            raise PrefixSkewError(
                [(r["__g"], int(r["__df"])) for r in touched],
                max_candidates_per_prefix)
    a = prefix_new.select(F.col(id_col).alias("new_id"), F.col("__g"),
                          F.col("__sz").alias("__sza"),
                          F.col("__rn").alias("__rna"))
    b = index_prefixes.select(F.col(id_col).alias("hist_id"),
                              F.col("__g"), F.col("__sz").alias("__szb"),
                              F.col("__rn").alias("__rnb"))
    # positional filter (PPJoin, r9 — see neardup_jaccard_prefix):
    # valid across the frozen order because common shingles are all
    # index-seen, so both sides rank them identically; batch-only
    # (df=0) shingles merely shift positions, which only tightens the
    # bound for non-common shingles, never for a true pair's first
    # common match
    ubound = 1 + F.least(F.col("__sza") - F.col("__rna"),
                         F.col("__szb") - F.col("__rnb"))
    alpha = (F.lit(threshold) / F.lit(1.0 + threshold)
             * (F.col("__sza") + F.col("__szb")))
    cand = (a.join(b, on="__g")
             .filter((F.col("__szb")
                      >= F.lit(threshold) * F.col("__sza") - F.lit(1e-9))
                     & (F.col("__szb") * F.lit(threshold)
                        <= F.col("__sza") + F.lit(1e-9))
                     & (ubound >= alpha - F.lit(1e-9)))
             .select("new_id", "hist_id")
             .distinct())
    fa = sh_new.select(F.col(id_col).alias("new_id"),
                       F.col("shingles").alias("sa"))
    fb = index_shingles.select(F.col(id_col).alias("hist_id"),
                               F.col("shingles").alias("sb"))
    return (cand.join(fa, on="new_id").join(fb, on="hist_id")
                .withColumn("jaccard", F.round(_jaccard("sa", "sb"), 6))
                .filter(F.col("jaccard") >= threshold)
                .select("new_id", "hist_id", "jaccard"))


def jaccard_prefix_rows(sh: DataFrame, freq: DataFrame, threshold: float,
                        id_col: str = "doc_id") -> DataFrame:
    """``(id, __g, __sz)`` prefix rows of pre-shingled docs under a
    FROZEN global (df, shingle) order — shingles the frequency table
    has never seen get df=0 (they sort first, i.e. rarest: the
    conservative choice).  Shared by the index query path and the
    streaming ingest append, which MUST use the same order for the
    prefix-filter theorem to apply across them."""
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("__g"))
    w_doc = Window.partitionBy(id_col)
    ordered = (ex.join(freq, on="__g", how="left")
                 .na.fill({"__df": 0})
                 .withColumn("__rn", F.row_number().over(
                     w_doc.orderBy(F.asc("__df"), F.asc("__g"))))
                 .withColumn("__sz", F.count(F.lit(1)).over(w_doc)))
    return (ordered.filter(
        F.col("__rn") <= F.col("__sz")
        - F.ceil(F.lit(threshold) * F.col("__sz") - F.lit(1e-9)) + 1)
        .select(F.col(id_col), "__g", "__sz", "__rn"))


def deduplicate_jaccard_exact(df: DataFrame, threshold: float = 0.5,
                              text_col: str = "text",
                              id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Keep one document per EXACT near-dup cluster (min id wins):
    prefix-filter pairs -> connected components -> anti-join the drop
    set — the exact counterpart of :func:`deduplicate_neardup` (one
    corpus pass, pair-node-only propagation; same row set as the old
    keep-semi-join, r14 optimization round)."""
    pairs = neardup_jaccard_prefix(df, threshold, text_col, id_col, n)
    labels, pins = _propagate_labels(pairs)
    drop = (labels.filter(F.col("id") != F.col("cluster"))
            .select(F.col("id").alias(id_col)))
    # NULL-id rows are kept by the anti-join (see deduplicate_neardup)
    return _tag_persisted(
        df.join(drop, on=id_col, how="left_anti"),
        *pins,
        *getattr(df, "_mrs_request_persisted", []))


# ---------------------------------------------------------------------------
# duplicated n-gram spans (ExactSubstr dedup at n-gram granularity)
# ---------------------------------------------------------------------------

def duplicate_spans(df: DataFrame, n: int = 5, min_docs: int = 2,
                    min_occurrences: int | None = None,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Duplicated-text SPAN detection: the ExactSubstr dedup of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499) re-expressed at token n-gram
    granularity for a DataFrame engine.  The suffix-array formulation
    is inherently sequential; n-gram granularity gives the same
    "which exact passages repeat across the corpus" answer to within
    n-1 tokens of span-boundary slack, and every stage is a scan,
    hash aggregate, or bounded window:

    1. every token position emits its length-``n`` gram (md5 key —
       engine-portable), so gram volume is one row per token;
    2. one hash aggregate counts distinct docs (and total occurrences)
       per gram — a gram is DUPLICATED when it appears in
       >= ``min_docs`` docs (or >= ``min_occurrences`` times in total,
       if set — catches within-doc boilerplate repeats);
    3. duplicated-gram positions join back by gram key (shuffle moves
       only (gram, doc, pos) rows — linear in corpus tokens, never
       pairwise: unlike the pair-join dedups there is NO quadratic
       candidate stage anywhere, which is why ExactSubstr scales to
       the biggest corpora in the paper);
    4. per doc, overlapping-or-adjacent gram intervals
       [pos, pos+n-1] merge into maximal spans (gaps-and-islands: a
       running max(end) window over positions, islands split where
       start > prev_max_end + 1) — the window partitions by doc and
       sorts only that doc's duplicated positions.

    Returns ``(doc_id, span_start, span_end, span_tokens, n_grams)``
    — 0-based inclusive token positions, ``n_grams`` = duplicated
    gram occurrences merged into the span.  Feed to
    :func:`mondrian_rest_spark.operators.pipeline.trim_duplicate_spans`
    to cut the spans out of the text (the paper's dedup action), or
    aggregate per doc for a duplication-fraction quality signal."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # the gram-position frame feeds BOTH the frequency aggregate and
    # the duplicated-position join-back, and Spark re-runs the whole
    # tokenize+md5-gram pass per consumer (r14 optimization round,
    # guide §5: reused + expensive to recompute) — persist the narrow
    # (id, pos, gram-key) frame request-scoped, tagged on the result
    # like every dedup pin.  At 100 TB this is the paper's own
    # materialize-the-gram-table step; storage-evictable either way.
    pos = _gram_positions(df, n, text_col, id_col).persist()
    freq = (pos.groupBy("__g")
               .agg(F.countDistinct(id_col).alias("__nd"),
                    F.count(F.lit(1)).alias("__no")))
    cond = F.col("__nd") >= min_docs
    if min_occurrences is not None:
        cond = cond | (F.col("__no") >= min_occurrences)
    dup = freq.filter(cond).select("__g")
    occ = (pos.join(dup, "__g")
              .select(id_col, F.col("__pos").alias("__start"),
                      (F.col("__pos") + F.lit(n - 1)).alias("__end")))
    return _tag_persisted(_merge_islands(occ, id_col), pos)


def _gram_positions(df: DataFrame, n: int, text_col: str,
                    id_col: str) -> DataFrame:
    """(id, __pos, __g) — the md5 key of the length-``n`` token gram
    starting at each 0-based token position (empty for docs shorter
    than ``n`` tokens)."""
    gram_expr = (
        f"case when size(__tokens) < {n} then array() "
        f"else transform(sequence(1, size(__tokens) - {n - 1}), "
        f"i -> md5(array_join(slice(__tokens, i, {n}), ' '))) end")
    return (df.withColumn("__tokens",
                          F.split(F.trim(F.col(text_col)), r"\s+"))
              .select(F.col(id_col),
                      F.posexplode(F.expr(gram_expr)).alias("__pos", "__g")))


def _merge_islands(occ: DataFrame, id_col: str) -> DataFrame:
    """Merge overlapping-or-adjacent [__start, __end] intervals per
    doc into maximal spans (gaps-and-islands: running max(end) window,
    islands split where start > prev_max_end + 1).  The window
    partitions by doc and sorts only that doc's flagged positions."""
    from pyspark.sql import Window
    w_prev = (Window.partitionBy(id_col).orderBy("__start")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy(id_col).orderBy("__start")
             .rowsBetween(Window.unboundedPreceding, 0))
    spans = (occ
             .withColumn("__prev_end", F.max("__end").over(w_prev))
             .withColumn("__new", F.when(
                 F.col("__prev_end").isNull() |
                 (F.col("__start") > F.col("__prev_end") + 1),
                 F.lit(1)).otherwise(F.lit(0)))
             .withColumn("__island", F.sum("__new").over(w_run))
             .groupBy(id_col, "__island")
             .agg(F.min("__start").alias("span_start"),
                  F.max("__end").alias("span_end"),
                  F.count(F.lit(1)).alias("n_grams")))
    return spans.select(
        id_col, "span_start", "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        "n_grams")


def build_eval_gram_index(eval_docs: DataFrame, n: int = 5,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """The frozen span-decontamination index: the eval set's DISTINCT
    gram-key frame.  Benchmarks are small and change rarely — build
    once, ``persist()``, and share across batch jobs and the streaming
    ingest filter (refresh = rebuild this tiny frame, not the corpus
    side).  One row per distinct gram, ~32 bytes each."""
    return (_gram_positions(eval_docs, n, text_col, id_col)
            .select("__g").distinct())


def contaminated_spans(train: DataFrame, eval_docs: DataFrame | None = None,
                       n: int = 5, text_col: str = "text",
                       id_col: str = "doc_id",
                       eval_grams: DataFrame | None = None) -> DataFrame:
    """SPAN-level benchmark decontamination: the maximal passages of
    each TRAINING document that appear verbatim (at n-gram
    granularity) anywhere in the EVAL set — the exact-overlap
    counterpart of :func:`contamination_pairs` (which flags whole
    near-dup docs and misses a benchmark question quoted inside an
    otherwise-clean page; span granularity is how the GPT-3/PaLM
    reports measured contamination).

    The eval side reduces to its DISTINCT gram-key set before the
    join — benchmarks are thousands of docs, so at 100 TB that set
    broadcasts and the train side never shuffles: one gram explode
    over train, a broadcast hash join, and the per-doc island merge.
    Returns d13's span schema on train ids; compose with
    ``pipeline.trim_duplicate_spans``-style trimming or drop docs by
    contamination fraction (``span_tokens`` summed per doc / doc
    tokens).

    Pass either ``eval_docs`` (the gram index is built inline) or a
    prebuilt/persisted ``eval_grams`` from
    :func:`build_eval_gram_index` (the streaming ingest filter and
    any job that reuses one benchmark set across many corpora)."""
    if eval_grams is None:
        if eval_docs is None:
            raise ValueError(
                "contaminated_spans needs eval_docs or eval_grams")
        eval_grams = build_eval_gram_index(eval_docs, n, text_col, id_col)
    train_pos = _gram_positions(train, n, text_col, id_col)
    occ = (train_pos.join(F.broadcast(eval_grams), "__g")
           .select(id_col, F.col("__pos").alias("__start"),
                   (F.col("__pos") + F.lit(n - 1)).alias("__end")))
    return _merge_islands(occ, id_col)


def duplication_profile(df: DataFrame, n: int = 5, min_docs: int = 2,
                        group_col: str = "source",
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The corpus duplication report (the headline statistic of the
    ExactSubstr paper — "what fraction of tokens sit inside duplicated
    passages", per source/domain): d13's spans aggregated per doc,
    joined back to the doc spine, rolled up by ``group_col``.

    Returns ``(group_col, n_docs, docs_with_dups, total_tokens,
    duplicated_tokens, dup_token_fraction)`` — the frame a curation
    run reads before deciding per-source trim/drop policy.  Cost is
    d13 plus one doc-keyed aggregate and one group rollup."""
    spans = duplicate_spans(df, n=n, min_docs=min_docs,
                            text_col=text_col, id_col=id_col)
    per_doc = (spans.groupBy(id_col)
               .agg(F.sum("span_tokens").alias("__dup")))
    _carry = getattr(spans, "_mrs_request_persisted", [])
    base = (df.select(F.col(id_col), F.col(group_col),
                      F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
                       .cast("long").alias("__nt"))
            .join(per_doc, id_col, "left"))
    return _tag_persisted((base.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("__dup").isNotNull(), 1)
                        .otherwise(0).cast("long")).alias("docs_with_dups"),
                 F.sum("__nt").alias("total_tokens"),
                 F.coalesce(F.sum("__dup"), F.lit(0).cast("long"))
                  .alias("duplicated_tokens"))
            .select(group_col, "n_docs", "docs_with_dups", "total_tokens",
                    F.coalesce("duplicated_tokens", F.lit(0).cast("long"))
                     .alias("duplicated_tokens"),
                    F.round(F.coalesce("duplicated_tokens",
                                       F.lit(0).cast("long")) /
                            F.greatest("total_tokens", F.lit(1)), 6)
                     .alias("dup_token_fraction"))), *_carry)


def cross_source_matrix(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        source_col: str = "source") -> DataFrame:
    """Which sources duplicate WHICH: the exact-duplicate pair count
    between every source pair (and within each source), computed
    WITHOUT materializing document pairs — the provenance report that
    decides crawl-overlap and licensing questions at corpus scale.

    Per content hash the frame holds one row per (hash, source) with a
    count; the self-join on the hash key then fans out to at most
    |sources|² rows per duplicated hash, and the pair count is
    combinatorial arithmetic on the counts (n_a·n_b across sources,
    C(n,2) within one source) — no document text moves, no O(group²)
    pair rows even when one hash covers millions of documents.
    Returns ``(source_a, source_b, n_groups, n_pairs)`` with
    source_a <= source_b; ``n_groups`` counts the distinct duplicated
    contents shared by the pair."""
    per = (df.select(F.md5(F.col(text_col)).alias("__h"),
                     F.col(source_col))
           .groupBy("__h", source_col)
           .agg(F.count(F.lit(1)).alias("__c")))
    a = per.select(F.col("__h"), F.col(source_col).alias("source_a"),
                   F.col("__c").alias("__ca"))
    b = per.select(F.col("__h"), F.col(source_col).alias("source_b"),
                   F.col("__c").alias("__cb"))
    pairs = (a.join(b, "__h")
             .filter(F.col("source_a") <= F.col("source_b"))
             .withColumn("__n", F.when(
                 F.col("source_a") == F.col("source_b"),
                 (F.col("__ca") * (F.col("__ca") - 1) / 2).cast("long"))
                 .otherwise(F.col("__ca") * F.col("__cb")))
             .filter(F.col("__n") > 0))
    return (pairs.groupBy("source_a", "source_b")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.sum("__n").alias("n_pairs"))
            .orderBy("source_a", "source_b"))


def cross_source_neardup_matrix(df: DataFrame, threshold: float = 0.5,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                source_col: str = "source",
                                n: int = 3) -> DataFrame:
    """NEAR-duplicate provenance matrix: ``cross_source_matrix`` for
    content that was edited between crawls, where exact hashing sees
    nothing.  Pairs come from the banded MinHash-LSH path (exact
    Jaccard verify on candidates only — same scale posture as d03);
    each pair then just looks up its two sources (two broadcast-sized
    joins against the (id, source) projection) and the matrix is a
    |sources|²-bounded hash-agg.  Returns ``(source_a, source_b,
    n_pairs)`` with source_a <= source_b."""
    pairs = neardup_minhash_lsh(df, threshold, text_col, id_col, n)
    src = df.select(F.col(id_col), F.col(source_col))
    sa = src.select(F.col(id_col).alias("a_id"),
                    F.col(source_col).alias("__sa"))
    sb = src.select(F.col(id_col).alias("b_id"),
                    F.col(source_col).alias("__sb"))
    out = (pairs.join(sa, "a_id").join(sb, "b_id")
           .select(F.least("__sa", "__sb").alias("source_a"),
                   F.greatest("__sa", "__sb").alias("source_b"))
           .groupBy("source_a", "source_b")
           .agg(F.count(F.lit(1)).alias("n_pairs"))
           .orderBy("source_a", "source_b"))
    return _tag_persisted(
        out, *getattr(pairs, "_mrs_request_persisted", []))


def contamination_by_benchmark(train: DataFrame, eval_docs: DataFrame,
                               n: int = 5, text_col: str = "text",
                               id_col: str = "doc_id",
                               eval_group_col: str = "source") -> DataFrame:
    """WHICH benchmark leaked: d14's span-level contamination scan
    attributed per eval GROUP (benchmark/source) — the table a data
    card's contamination section reports, and the first question asked
    when an eval number looks too good.

    The eval side reduces to its distinct ``(gram, benchmark)`` pairs
    (still broadcast-sized — benchmarks are small; a gram shared by
    two benchmarks is attributed to both), the train side explodes
    once and joins that broadcast, and islands merge per
    ``(train doc, benchmark)`` so overlapping hits from DIFFERENT
    benchmarks never fuse.  Returns ``(benchmark, n_train_docs,
    n_spans, contaminated_tokens)`` ordered by benchmark."""
    grams = (_gram_positions(eval_docs, n, text_col, id_col)
             .join(eval_docs.select(F.col(id_col),
                                    F.col(eval_group_col)
                                    .alias("benchmark")), id_col)
             .select("__g", "benchmark").distinct())
    occ = (_gram_positions(train, n, text_col, id_col)
           .join(F.broadcast(grams), "__g")
           .select(F.struct(F.col(id_col), F.col("benchmark"))
                   .alias("__key"),
                   F.col("__pos").alias("__start"),
                   (F.col("__pos") + F.lit(n - 1)).alias("__end")))
    spans = _merge_islands(occ, "__key")
    return (spans.select(F.col("__key.benchmark").alias("benchmark"),
                         F.col(f"__key.{id_col}").alias(id_col),
                         "span_tokens")
            .groupBy("benchmark")
            .agg(F.countDistinct(id_col).alias("n_train_docs"),
                 F.count(F.lit(1)).alias("n_spans"),
                 F.sum("span_tokens").alias("contaminated_tokens"))
            .orderBy("benchmark"))

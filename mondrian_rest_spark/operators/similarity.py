"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; the scale path is
random-hyperplane LSH bucketing (sign-bit signatures) so the probe only
scans one bucket.  Dot products use zip_with/aggregate over
double-cast arrays — sequential left-fold, so results are bit-stable
and reproducible across engines.

At 100 TB: bucket the corpus by signature (write partitioned/bucketed
parquet), broadcast the query vector(s), and scan only matching
buckets; for batched query sets, join on signature instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _as_double(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def with_cosine(df: DataFrame, query_col: str, vec_col: str = "embedding",
                out_col: str = "cosine") -> DataFrame:
    """cosine(vec_col, query_col) via JVM higher-order functions."""
    dot = (f"aggregate(zip_with({_as_double(vec_col)}, {_as_double(query_col)}, "
           f"(x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    na = (f"sqrt(aggregate({_as_double(vec_col)}, 0D, (acc, x) -> acc + x * x))")
    nb = (f"sqrt(aggregate({_as_double(query_col)}, 0D, (acc, x) -> acc + x * x))")
    return df.withColumn(out_col, F.expr(f"({dot}) / (({na}) * ({nb}))"))


def cosine_topk(df: DataFrame, query_vec_id: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force exact top-k by cosine against one stored vector.
    The single-row query side is broadcast; orderBy+limit lets Spark run
    a TakeOrdered (no full sort).  Deterministic tie-break on id."""
    q = df.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__query_vec"))
    scored = (df.filter(F.col(id_col) != query_vec_id)
                .crossJoin(F.broadcast(q)))
    scored = with_cosine(scored, "__query_vec", vec_col)
    return (scored
            .select(id_col, F.round(F.col("cosine"), 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def with_lsh_signature(df: DataFrame, vec_col: str = "embedding",
                       num_planes: int = 8, dim: int = 64,
                       out_col: str = "bucket") -> DataFrame:
    """Random-hyperplane LSH signature: sign bits of dot products with
    ``num_planes`` pseudo-random hyperplanes.  Plane components are
    derived deterministically from xxhash64 so the signature is stable
    across runs/engines — no RNG state to ship to executors."""
    plane = (lambda p: f"transform(sequence(0, {dim - 1}), "
             f"i -> cast(xxhash64(concat('plane{p}_', i)) as double) / 9.3e18)")
    bits = ", ".join(
        f"case when aggregate(zip_with({_as_double(vec_col)}, {plane(p)}, "
        f"(x, y) -> x * y), 0D, (acc, v) -> acc + v) > 0 then 1L else 0L end"
        for p in range(num_planes))
    return df.withColumn(out_col, F.expr(
        f"aggregate(array({bits}), 0L, (acc, b) -> acc * 2 + b)"))


def ann_topk_lsh(df: DataFrame, query_vec_id: int, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 num_planes: int = 8, dim: int = 64) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket,
    then exact cosine within it.  Recall < 1 by construction (that is
    the approximation); at scale the bucket is a partition-pruned read
    instead of a full scan."""
    sig = with_lsh_signature(df, vec_col, num_planes, dim)
    qrow = sig.filter(F.col(id_col) == query_vec_id).select(
        F.col("bucket").alias("__qbucket"), F.col(vec_col).alias("__query_vec"))
    cand = (sig.crossJoin(F.broadcast(qrow))
               .filter((F.col("bucket") == F.col("__qbucket")) &
                       (F.col(id_col) != query_vec_id)))
    cand = with_cosine(cand, "__query_vec", vec_col)
    return (cand
            .select(id_col, F.round(F.col("cosine"), 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def ann_topk_ivf(df: DataFrame, query_vec_id: int, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_cells: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is assigned to
    coarse centroid cells; a probe scans only the ``n_probe`` cells
    whose centroids are nearest the query, then ranks by exact cosine.

    Centroids here are a deterministic sample — the ``n_cells`` vectors
    with the smallest id hashes stand in for a k-means train step (no
    RNG state, stable across engines).  At scale: centroids come from a
    periodic training job, the corpus is written partitioned by
    ``cell_id``, and a probe becomes a partition-pruned read of
    n_probe/n_cells of the data instead of a full scan.
    """
    from pyspark.sql import Window

    cents = (df.orderBy(F.xxhash64(F.col(id_col).cast("string")))
               .limit(n_cells)
               .select(F.row_number().over(
                   Window.orderBy(id_col)).alias("cell_id"),
                   F.col(vec_col).alias("__cvec")))
    # assign every vector to its nearest centroid (argmax cosine)
    scored = with_cosine(df.crossJoin(F.broadcast(cents)), "__cvec", vec_col,
                         out_col="__ccos")
    assigned = (scored
                .withColumn("__rn", F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.desc("__ccos"), F.asc("cell_id"))))
                .filter(F.col("__rn") == 1)
                .select(id_col, vec_col, "cell_id"))
    qrow = df.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__query_vec"))
    probe_cells = (with_cosine(cents.crossJoin(F.broadcast(qrow)),
                               "__query_vec", "__cvec", out_col="__qcos")
                   .orderBy(F.desc("__qcos"), F.asc("cell_id"))
                   .limit(n_probe)
                   .select("cell_id"))
    cand = (assigned.join(F.broadcast(probe_cells), "cell_id")
                    .filter(F.col(id_col) != query_vec_id)
                    .crossJoin(F.broadcast(qrow)))
    cand = with_cosine(cand, "__query_vec", vec_col)
    return (cand
            .select(id_col, F.round(F.col("cosine"), 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def embedding_neardup_lsh(df: DataFrame, threshold: float = 0.45,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          num_planes: int = 3, num_tables: int = 8,
                          dim: int = 64) -> DataFrame:
    """Scale path for embedding near-dup: candidates from ``num_tables``
    independent hyperplane-LSH tables (a pair collides in table t if all
    ``num_planes`` sign bits match), exact cosine verified on candidates
    only.  The self-join shuffles on (table, bucket) so only colliding
    vectors ever meet — no O(n²) stage.

    Per-plane collision prob for a pair at angle θ is 1-θ/π, so recall
    ≈ 1-(1-p^planes)^tables.  Defaults (3x8) give ~0.9 recall down to
    cosine ≈ 0.4; tighten with MORE planes (sharper buckets, fewer
    candidates) when the threshold is high, e.g. 8x4 for cosine ≥ 0.9."""
    planes = ", ".join(
        f"cast(aggregate(zip_with({_as_double(vec_col)}, "
        f"transform(sequence(0, {dim - 1}), "
        f"i -> cast(xxhash64(concat('t', {t}, '_p', {p}, '_', i)) as double) "
        f"/ 9.3e18), (x, y) -> x * y), 0D, (acc, v) -> acc + v) > 0 as int)"
        for t in range(num_tables) for p in range(num_planes))
    n_sig = num_tables
    sigs = df.withColumn("__bits", F.expr(f"array({planes})"))
    buckets = sigs.select(
        F.col(id_col), F.col(vec_col),
        F.posexplode(F.expr(
            f"transform(sequence(0, {n_sig - 1}), t -> "
            f"aggregate(slice(__bits, t * {num_planes} + 1, {num_planes}), "
            f"0L, (acc, b) -> acc * 2 + b))")).alias("__table", "__bucket"))
    a = buckets.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"),
                       "__table", "__bucket")
    b = buckets.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"),
                       "__table", "__bucket")
    cand = (a.join(b, ["__table", "__bucket"])
             .filter(F.col("a_id") < F.col("b_id"))
             .dropDuplicates(["a_id", "b_id"]))
    cand = with_cosine(cand, "vb", "va")
    return (cand
            .withColumn("cosine", F.round(F.col("cosine"), 6))
            .filter(F.col("cosine") >= threshold)
            .select("a_id", "b_id", "cosine"))


def embedding_neardup(df: DataFrame, threshold: float = 0.45,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs above a cosine threshold.  Brute force (the correctness
    oracle / small-n path); ``embedding_neardup_lsh`` is the scale
    path."""
    a = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    pairs = with_cosine(pairs, "vb", "va")
    return (pairs
            .withColumn("cosine", F.round(F.col("cosine"), 6))
            .filter(F.col("cosine") >= threshold)
            .select("a_id", "b_id", "cosine"))

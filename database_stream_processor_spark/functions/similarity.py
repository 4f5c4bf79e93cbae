"""Similarity search over embedding columns (`array<float>`).

Baseline: brute-force cosine top-k — a crossJoin with JVM-side higher-order
functions (`zip_with` + `aggregate`), fully codegen'd, no Python.  Scale
path: LSH (random-hyperplane) bucketing turns the crossJoin into an
equi-join on bucket signature; an IVF variant would cluster first and probe
nearest centroids — same plan shape (equi-join on cluster id).

The dot products fold left-to-right over the array in double precision, so
scores are deterministic and reproducible across engines (the DuckDB
oracle computes the identical fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from database_stream_processor_spark.functions.dedup import hash32, spread


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


#: accumulator type for order-independent float folds — per-element double
#: products are IEEE-deterministic; accumulating them as decimals makes the
#: SUM independent of evaluation order across engines/partitionings.
#: precision ≤ 17 keeps Spark's Decimal long-backed (no BigDecimal allocs in
#: the fold hot loop — ~10× faster); the 1e-13 per-element quantization is
#: 7 orders of magnitude below the round-6 output precision.
ACC = "decimal(17,13)"


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i with exact decimal accumulation (order-independent)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast(ACC),
                       lambda acc, v: (acc + v.cast(ACC)).cast(ACC)).cast("double")


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0).cast(ACC),
                              lambda acc, v: (acc + v.cast(ACC)).cast(ACC)).cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: every query row against the full corpus.

    Plan: broadcast(queries) crossJoin corpus → per-pair cosine (codegen) →
    per-query top-k via window rank.  On a cluster this is
    embarrassingly parallel over corpus partitions; the broadcast keeps it
    shuffle-free until the final (tiny) top-k aggregation.

    Output: (query_id, neighbor_id, cosine_sim), excluding self-matches.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("__qv"))
    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"),
                              _as_double(F.col(vec_col)).alias("__cv"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def hyperplane_component(plane: int, dim_index: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    hash-derived so any engine reproduces it (no RNG state)."""
    h = hash32(F.concat(F.lit(f"plane{plane}_"), dim_index.cast("string")))
    return (h % 2001 - 1000) / F.lit(1000.0)


def lsh_signature(vec_col: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH signature: bit p = sign(v · plane_p).
    Packed into an int — cosine-similar vectors collide with high
    probability."""
    v = _as_double(vec_col)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(v, F.sequence(F.lit(0), F.size(v) - 1),
                       lambda x, i: x * hyperplane_component(p, i)),
            F.lit(0).cast(ACC), lambda acc, x: (acc + x.cast(ACC)).cast(ACC)).cast("double")
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("long")


def cosine_near_dup_pairs(df: DataFrame, threshold: float,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine_sim ≥
    threshold), restricted to pairs colliding in a random-hyperplane LSH
    bucket — the all-pairs O(n²) product becomes an equi-join on the
    signature, the same shape MinHash-LSH gives text dedup.

    Recall trades against bucket count: cosine-similar vectors collide on
    all ``n_planes`` sign bits with probability (1 − θ/π)^planes.  At
    corpus scale, run multiple independent plane sets (band OR) to raise
    recall; one set keeps the oracle tractable here.
    """
    sig = spread(df).withColumn("__bucket",
                                lsh_signature(F.col(vec_col), n_planes))
    a = sig.select(F.col(id_col).alias("id_a"),
                   _as_double(F.col(vec_col)).alias("__va"), "__bucket")
    b = sig.select(F.col(id_col).alias("id_b"),
                   _as_double(F.col(vec_col)).alias("__vb"), "__bucket")
    pairs = a.join(b, on="__bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b",
        F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cosine_sim"))
    return scored.filter(F.col("cosine_sim") >= threshold)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned
    to their nearest centroid's posting list; each query probes only the
    ``n_probe`` nearest lists.  The scoring join is an equi-join on the
    list id — shuffle ∝ corpus + probed candidates, never the crossJoin.

    Centroid "training" is deterministic here — the ``n_centroids``
    lowest-id vectors serve as centroids (a k-means step would slot in
    unchanged: both produce a small centroid table that is broadcast).
    Assignment and probing rank by round-6 cosine with centroid-id
    tie-break, so any engine reproduces the partition exactly.
    """
    cents = (corpus.filter(F.col(id_col) < n_centroids)
             .select(F.col(id_col).alias("__cent_id"),
                     _as_double(F.col(vec_col)).alias("__cent")))

    def nearest(df: DataFrame, out_id: str, n: int) -> DataFrame:
        scored = (spread(df)
                  .select(F.col(id_col).alias(out_id),
                          _as_double(F.col(vec_col)).alias("__v"))
                  .crossJoin(F.broadcast(cents))
                  .select(out_id, "__v", "__cent_id",
                          F.round(cosine(F.col("__v"), F.col("__cent")), 6)
                          .alias("__cs")))
        w = Window.partitionBy(out_id).orderBy(
            F.col("__cs").desc(), F.col("__cent_id").asc())
        return (scored.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= n)
                .select(out_id, "__v", "__cent_id"))

    assigned = nearest(corpus, "neighbor_id", 1)
    probes = nearest(queries, "query_id", n_probe)
    pairs = (probes.withColumnRenamed("__v", "__qv")
             .join(assigned.withColumnRenamed("__v", "__cv"), on="__cent_id")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    # each corpus vector lives in exactly one posting list, so (query,
    # neighbor) pairs are already unique — no dedup shuffle needed
    return (scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = 8) -> DataFrame:
    """Approximate top-k: only score pairs whose LSH signatures match —
    the crossJoin becomes an equi-join on the bucket id, which shuffles on
    bucket and scales linearly in corpus size.  Recall < 1.0 by design;
    multi-probe (flipping one bit) would raise it at 9× candidate cost.

    Output: (query_id, neighbor_id, cosine_sim) — top-k *within bucket*.
    """
    sig = lambda df, n: spread(df).withColumn(
        "__bucket", lsh_signature(F.col(vec_col), n))
    q = sig(queries, n_planes).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"), "__bucket")
    c = sig(corpus, n_planes).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"), "__bucket")
    pairs = q.join(c, on="__bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def quantize_embeddings(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the ANN memory
    lever at corpus scale: 4× smaller than float32, so 4× more vectors
    per executor and per shuffle block, with dot products computable on
    the codes (rescale by scale_a·scale_b/127²).

    ``codes[i] = floor(x_i / scale · 127 + 0.5)`` with ``scale = max|x|``
    (zero vector → zero codes, scale 0).  floor(+0.5) rather than a
    round() builtin so any engine reproduces the identical codes from
    the identical doubles — the assignments are portable/deterministic
    by construction (same discipline as functions/sampling).  Output:
    (id, scale, codes array<int>).  Pure column expressions — zero
    shuffle, fully codegen'd."""
    absmax = F.array_max(F.transform(F.col(vec_col),
                                     lambda x: F.abs(x.cast("double"))))
    code = (lambda x: F.when(absmax == 0, F.lit(0)).otherwise(
        F.floor(x.cast("double") / absmax * 127 + F.lit(0.5)))
        .cast("int"))
    return df.select(F.col(id_col), absmax.alias("scale"),
                     F.transform(F.col(vec_col), code).alias("codes"))

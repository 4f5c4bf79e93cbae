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

import hashlib
import os
from functools import lru_cache

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

    Each side's norm is projected per ROW before the pair product —
    ``cosine()`` inline would re-fold both norms per PAIR (n·m extra
    array folds); dot/(qn·cn) is the identical IEEE computation.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("__qv"))
    q = q.withColumn("__qn", norm(F.col("__qv")))
    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"),
                              _as_double(F.col(vec_col)).alias("__cv"))
    c = c.withColumn("__cn", norm(F.col("__cv")))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")), 6).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def hyperplane_component(plane: int, dim_index: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    hash-derived so any engine reproduces it (no RNG state)."""
    h = hash32(F.concat(F.lit(f"plane{plane}_"), dim_index.cast("string")))
    return (h % 2001 - 1000) / F.lit(1000.0)


#: dims covered by the precomputed literal plane arrays; vectors longer
#: than this fall back to the per-element md5 expression (identical
#: values).  Env-tunable: higher-dim production embeddings trade a bigger
#: constant-folded plan for removing the md5-per-element work.
_PLANE_LIT_DIMS = int(os.environ.get("SPARK_GRAFT_PLANE_LIT_DIMS", "256"))


def _lit_double_array(vals) -> Column:
    """Constant ``array<double>`` built in ONE py4j round trip.

    ``F.lit(list)`` decomposes into one ``F.lit`` py4j call PER ELEMENT
    (~0.4 ms each — a 1024-component centroid table cost ~0.5 s of
    driver time per query build, measured r12); parsing a single SQL
    array literal string is one round trip regardless of length.
    ``repr(float)`` is the shortest decimal that round-trips, so
    ``Double.parseDouble`` reconstructs bit-identical values.  Non-finite
    and NULL components (possible in corpus embeddings) render as casts
    — ``repr()`` would emit ``nanD``/``infD``/``NoneD``, which fail SQL
    parsing (ADVICE r12)."""
    import math

    def fmt(v) -> str:
        if v is None:
            return "CAST(NULL AS DOUBLE)"
        v = float(v)
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return ("CAST('Infinity' AS DOUBLE)" if v > 0
                    else "CAST('-Infinity' AS DOUBLE)")
        return f"{v!r}D"

    return F.expr("array(" + ",".join(fmt(v) for v in vals) + ")")


@lru_cache(maxsize=None)
def _plane_literals(plane: int, dims: int) -> tuple[float, ...]:
    """The first ``dims`` components of hyperplane ``plane``, computed in
    Python with bit-identical arithmetic to :func:`hyperplane_component`
    (md5 hex → int → % 2001 − 1000 → /1000.0 — all exact in double)."""
    out = []
    for i in range(dims):
        h = int(hashlib.md5(f"plane{plane}_{i}".encode()).hexdigest()[:8], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return tuple(out)


@lru_cache(maxsize=None)
def _planes_flat_col(n_planes: int, dims: int) -> Column:
    """ALL planes' components concatenated as ONE flat literal Column
    (``array<double>``, plane p at offset p·dims).  A single flat
    ``F.lit(list)`` py4j call — ``F.lit`` on a NESTED list decomposes
    into one py4j array call per sub-list (~1.4 s for 16×64, measured
    r12), and building plane columns element-wise costs ~dims round
    trips per plane per call site (~38 s for one query).  Cached per
    process: Columns are unbound expression trees, safe to reuse across
    DataFrames within the session."""
    flat: list[float] = []
    for p in range(n_planes):
        flat.extend(_plane_literals(p, dims))
    return _lit_double_array(flat)


def lsh_signature(vec_col: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH signature: bit p = sign(v · plane_p).
    Packed into an int — cosine-similar vectors collide with high
    probability.

    The plane components depend only on (plane, dim index), so for
    vectors up to :data:`_PLANE_LIT_DIMS` dims they are baked in as
    constant-folded literal arrays — the md5-per-element-per-plane
    expression work (8 planes × dim md5+conv calls PER ROW) disappears
    from the hot loop.  Longer vectors take the original expression
    path; both branches produce identical doubles.

    The plane loop runs INSIDE one JVM ``aggregate`` over
    ``sequence(0, n_planes-1)`` rather than as n_planes separate Python-
    built projection trees: per-plane arithmetic is unchanged (same fold,
    same literals, ascending-p exact integer bit sum), but the expression
    tree is built once — ~8× fewer py4j round trips and an ~8× smaller
    tree for Catalyst to analyze (measured r12: the per-plane form cost
    ~2.5 s of driver-side build per query at n_planes=8)."""
    v = _as_double(vec_col)
    fold = lambda arr: F.aggregate(
        arr, F.lit(0).cast(ACC),
        lambda acc, x: (acc + x.cast(ACC)).cast(ACC)).cast("double")
    planes = _planes_flat_col(n_planes, _PLANE_LIT_DIMS)
    powers = F.lit([1 << q for q in range(n_planes)])  # exact bit values

    def bit(p: Column) -> Column:
        # plane p's first size(v) components = flat[p·dims+1 .. +size(v)]
        fast = fold(F.zip_with(
            v, F.slice(planes, p.cast("int") * _PLANE_LIT_DIMS + 1,
                       F.size(v)),
            lambda x, c: x * c))
        # slow path (vectors longer than the literal planes): identical
        # md5-derived component, plane index now a column
        comp = lambda i: (
            (hash32(F.concat(F.lit("plane"), p.cast("string"), F.lit("_"),
                             i.cast("string"))) % 2001 - 1000)
            / F.lit(1000.0))
        slow = fold(F.zip_with(v, F.sequence(F.lit(0), F.size(v) - 1),
                               lambda x, i: x * comp(i)))
        proj = F.when(F.size(v) <= _PLANE_LIT_DIMS, fast).otherwise(slow)
        return F.when(proj > 0,
                      F.element_at(powers, (p + 1).cast("int")).cast("long")
                      ).otherwise(F.lit(0).cast("long"))

    return F.aggregate(F.sequence(F.lit(0), F.lit(n_planes - 1)),
                       F.lit(0).cast("long"),
                       lambda acc, p: acc + bit(p)).cast("long")


@lru_cache(maxsize=None)
def _bucket_col(vec_col_name: str, n_planes: int) -> Column:
    """The LSH bucket expression for a named vector column, memoized per
    process (Columns are unbound trees — safe to reuse across DataFrames,
    same discipline as :func:`_planes_flat_col`; building the signature
    tree costs ~0.13 s of py4j round trips per call, measured r13).

    Wrapped in a NON-NULLABLE coalesce: the signature can never BE null
    (a null/empty vector folds to bucket 0 — every per-plane bit is
    ``when(proj > 0, …).otherwise(0)``, so a null proj contributes 0),
    but the aggregate's output is *typed* nullable, so an equi-join on
    the bucket would infer an ``IsNotNull(__bucket)`` filter and push it
    beneath the projection, SUBSTITUTING the whole interpreted signature
    expression into the Filter — the signature then ran twice per row,
    once single-threaded below the spread exchange (the q46 r12 lesson;
    the r13 plan audit found q31/q47 still carried it: 0.8 s of the
    1.6 s wall was the substituted Filter stage).  A non-nullable key
    infers no filter: one evaluation, in the Project."""
    return F.coalesce(lsh_signature(F.col(vec_col_name), n_planes),
                      F.lit(0).cast("long"))


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
    sig = spread(df).withColumn("__bucket", _bucket_col(vec_col, n_planes))
    a = sig.select(F.col(id_col).alias("id_a"),
                   _as_double(F.col(vec_col)).alias("__va"), "__bucket")
    a = a.withColumn("__na", norm(F.col("__va")))
    b = sig.select(F.col(id_col).alias("id_b"),
                   _as_double(F.col(vec_col)).alias("__vb"), "__bucket")
    b = b.withColumn("__nb", norm(F.col("__vb")))
    pairs = a.join(b, on="__bucket").filter(F.col("id_a") < F.col("id_b"))
    # per-row norms hoisted ahead of the bucket join (identical doubles;
    # inline cosine() would re-fold both norms per surviving pair)
    scored = pairs.select(
        "id_a", "id_b",
        F.round(dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")), 6).alias("cosine_sim"))
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

    Assignment/probing are pure per-row PROJECTIONS against the collected
    centroid literals: the previous crossJoin→window formulation shuffled
    the whole corpus by row id and sorted it just to rank 16 candidate
    rows generated from the same input row (2 corpus-wide Exchanges + 2
    Sorts + 2 Windows in the plan).  The collect is O(n_centroids) rows
    regardless of corpus size — the standard broadcast-centroid IVF
    shape — and each centroid's norm is computed IN that job by the same
    decimal-fold expression used everywhere, so scores stay bit-identical
    to the join formulation.  The scoring join broadcasts the (queries ×
    n_probe)-row probe side, so the corpus is never shuffled at all; the
    only remaining Exchange is the per-query top-k.
    """
    cent_rows = (corpus.filter(F.col(id_col) < n_centroids)
                 .select(F.col(id_col).cast("long"),
                         _as_double(F.col(vec_col)),
                         norm(_as_double(F.col(vec_col))))
                 .collect())
    # norms/components may be NULL (NaN/NULL embeddings cast to decimal →
    # NULL) — keep them as None; the literal builder renders NULL casts
    cents = sorted((int(r[0]), list(r[1] or []),
                    None if r[2] is None else float(r[2]))
                   for r in cent_rows)
    if not cents:
        # empty centroid set (empty corpus / no ids < n_centroids): the
        # literal-offset probing below would build F.sequence(1, 0) =
        # [1, 0] (negative default step) and throw at runtime — degrade
        # to an empty result like the old join formulation did (ADVICE
        # r12)
        q0 = queries.select(F.col(id_col).alias("query_id")).limit(0)
        c0 = corpus.select(F.col(id_col).alias("neighbor_id")).limit(0)
        return (q0.crossJoin(c0)
                .withColumn("cosine_sim", F.lit(None).cast("double")))

    # the centroid table as FLAT literal columns (ids, concatenated
    # vectors + offsets/lengths, norms) — one F.lit py4j call each (a
    # NESTED F.lit decomposes into one py4j call per sub-list, ~1.4 s
    # for 16×64, measured r12).  The per-centroid formulation built
    # n_centroids separate dot-fold trees TWICE per side (~16k py4j round
    # trips, ~3 s of driver-side build per query); the score loop now
    # runs inside one JVM `transform` over the centroid indices with
    # per-pair arithmetic unchanged (same fold, same literal doubles,
    # same round-6 + (-cid) tie-break).
    flat: list[float] = []
    offs: list[int] = []
    lens: list[int] = []
    for _, cvec, _ in cents:
        offs.append(len(flat))
        lens.append(len(cvec))
        flat.extend(cvec)
    ids_lit = F.lit([c[0] for c in cents])          # array<long>, cid asc
    flat_lit = _lit_double_array(flat)              # array<double>
    offs_lit = F.lit(offs)
    lens_lit = F.lit(lens)
    norms_lit = _lit_double_array([c[2] for c in cents])  # array<double>
    n_cents = len(cents)

    def scores_arr(v: Column, vn: Column) -> Column:
        """array<struct<cs,ncid>> of all centroid scores for one row."""
        def cvec_at(i: Column) -> Column:
            return F.slice(flat_lit, F.element_at(offs_lit, i) + 1,
                           F.element_at(lens_lit, i))
        return F.transform(
            F.sequence(F.lit(1), F.lit(n_cents)),
            lambda i: F.struct(
                F.round(dot(v, cvec_at(i.cast("int")))
                        / (vn * F.element_at(norms_lit, i.cast("int"))), 6)
                .alias("cs"),
                (-F.element_at(ids_lit, i.cast("int"))).alias("ncid")))

    # top-1 via struct-max: (cs, -cent_id) max ⇔ cs desc, cent_id asc —
    # exactly the old window's (cs desc, cent_id asc) row_number()=1
    def best1(v: Column, vn: Column) -> Column:
        return F.array_max(scores_arr(v, vn))

    c = (spread(corpus)
         .select(F.col(id_col).alias("neighbor_id"),
                 _as_double(F.col(vec_col)).alias("__cv")))
    c = c.withColumn("__cn", norm(F.col("__cv")))
    # coalesce to a non-nullable type: the assignment can never BE null
    # (16 literal centroids), but array_max's nullable output would make
    # the inner join below infer an IsNotNull(__cent_id) filter and push
    # it beneath this projection, substituting the whole 16-centroid
    # score expression into the Filter — the interpreted (CodegenFallback)
    # higher-order-function dots would then run TWICE per corpus row.
    # A non-nullable key infers no filter: one evaluation, in this Project.
    assigned = c.select(
        "neighbor_id", "__cv", "__cn",
        F.coalesce(-best1(F.col("__cv"), F.col("__cn")).getField("ncid"),
                   F.lit(-1)).alias("__cent_id"))

    # top-n_probe via sort_array desc on (cs, -cent_id) structs: orders
    # cs desc then cent_id asc — the old window order — then slice+explode
    def topn(v: Column, vn: Column, n: int) -> Column:
        return F.slice(F.sort_array(scores_arr(v, vn), asc=False), 1, n)

    q = (queries.select(F.col(id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("__qv")))
    q = q.withColumn("__qn", norm(F.col("__qv")))
    probes = (q.select("query_id", "__qv", "__qn",
                       F.explode(topn(F.col("__qv"), F.col("__qn"), n_probe))
                       .alias("__p"))
              .select("query_id", "__qv", "__qn",
                      (-F.col("__p.ncid")).alias("__cent_id")))

    pairs = (assigned.join(F.broadcast(probes), on="__cent_id")
             .filter(F.col("query_id") != F.col("neighbor_id")))
    # per-row norms hoisted (identical doubles; inline cosine() would
    # re-fold both norms per candidate pair)
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")), 6).alias("cosine_sim"))
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
    sig = lambda df, n: spread(df).withColumn("__bucket",
                                              _bucket_col(vec_col, n))
    # per-row norms hoisted ahead of the bucket join (identical doubles;
    # inline cosine() would re-fold both norms per surviving pair)
    q = sig(queries, n_planes).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"), "__bucket")
    q = q.withColumn("__qn", norm(F.col("__qv")))
    c = sig(corpus, n_planes).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"), "__bucket")
    c = c.withColumn("__cn", norm(F.col("__cv")))
    pairs = q.join(c, on="__bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")), 6).alias("cosine_sim"))
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

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hashing is built from ``md5`` + integer arithmetic so the pipelines are
(a) engine-portable — the DuckDB oracle reproduces them bit-for-bit — and
(b) JVM-side (no Python UDFs): md5 / conv / array ops are codegen'd
expressions, and every stage is a plain groupBy/join, so the shuffles are
the only cost and they scale horizontally.

Scale shape (100 TB corpus):
- signatures: one scan + one groupBy(doc) — shuffle ∝ #shingles, heavily
  combinable map-side (min() partial agg).
- LSH: explode k/r band keys per doc (constant factor), groupBy band key;
  candidate pairs come from within-bucket self-joins only — never an
  all-pairs product.  Skewed buckets (boilerplate docs) are the classic
  hazard: cap bucket size before pairing (``max_bucket`` arg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Mersenne prime 2^31 − 1 — all minhash arithmetic stays < 2^62, no overflow
MERSENNE = 2_147_483_647


def spread(df: DataFrame) -> DataFrame:
    """Fan a single-partition/underpartitioned input out to all cores before
    CPU-heavy per-row expressions (md5/shingling).  Small tables arrive as
    one parquet split, which would serialize the whole stage on one task.

    CONDITIONAL: only repartitions when the input has fewer than half the
    default parallelism in partitions.  At cluster scale inputs are already
    well-partitioned and an unconditional round-robin repartition would be
    a full shuffle of the corpus — the dominant cost at 100 TB.

    The partition count is derived from the plan's LEAF bytes (a pure
    driver-side stats read) instead of ``df.rdd.getNumPartitions()``:
    the RDD probe pays full physical planning per call, a fixed driver
    cost on every signature/similarity pipeline build.  A parquet scan
    splits at ``spark.sql.files.maxPartitionBytes`` (128 MB default), so
    leaf bytes bound the scan's task count; unknown stats fall back to
    the exact RDD probe."""
    sc = df.sparkSession.sparkContext
    parallelism = sc.defaultParallelism
    from database_stream_processor_spark import tuning
    nbytes = tuning.leaf_bytes(df)
    if nbytes < tuning._UNKNOWN:
        try:
            split = int(df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes").rstrip("b"))
        except Exception:
            split = 128 * 2 ** 20
        est_parts = max(1, (nbytes + split - 1) // split)
        if est_parts >= max(1, parallelism // 2):
            return df
        return df.repartition(parallelism)
    if df.rdd.getNumPartitions() >= max(1, parallelism // 2):
        return df
    return df.repartition(parallelism)


def hash32(col: Column) -> Column:
    """Portable 32-bit string hash: first 8 hex digits of md5 as an integer.
    DuckDB equivalent: ``('0x' || substr(md5(s), 1, 8))::bigint``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash functions
    h_i(x) = (a_i·x + b_i) mod MERSENNE."""
    return [((2 * i + 1) * 104_729 % MERSENNE, i * 97 + 1) for i in range(k)]


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from a *materialized* token-array column.

    ``toks`` must be a plain column reference (not an inline ``split``):
    the transform lambda reads it ~3·len times, and an inlined expression
    would be recomputed on every read — a silent quadratic blow-up."""
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(0), F.size(toks) - n)
                 ).otherwise(F.expr("array()").cast("array<int>"))
    parts = lambda i: [F.element_at(toks, i + j + 1) for j in range(n)]
    return F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", *parts(i))))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column (array<string>).
    Prefer tokenizing into a separate projection + :func:`shingles_from_tokens`
    in hot paths (see note there)."""
    return shingles_from_tokens(F.split(F.trim(col), r"\s+"), n)


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) rows with the token array materialized in its own
    projection so it's computed once per document."""
    toked = spread(df).select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"))
    return toked.select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("__sh"))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint: keeps the lowest-id doc
    per identical text.  One groupBy + one semi-join — the hash-groupBy
    pattern."""
    from database_stream_processor_spark.functions.text import doc_fingerprint
    fp = df.withColumn("__fp", doc_fingerprint(F.col(text_col)))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return (fp.join(keep, on=[id_col, "__fp"], how="left_semi").drop("__fp"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       k: int = 16, shingle_n: int = 3) -> DataFrame:
    """MinHash signature per document: k universal hashes over 32-bit
    word-shingle hashes.  Output: (id, h0..h{k-1}).

    Pure per-row PROJECTION: the shingle set stays an array column, each
    shingle is md5-hashed once into a parallel array, and each signature
    component is an ``array_min`` over a cheap arithmetic ``transform`` —
    no explode, no groupBy, NO SHUFFLE anywhere.  (The previous
    explode + k·min() groupBy shuffled one partial row per doc per map
    partition — a corpus-wide exchange that pure row-local work never
    needed.)  Documents with no shingles produce no signature row,
    exactly as the explode path's empty groups did."""
    toked = spread(df).select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"))
    # "has at least one shingle" ⇔ "has at least n tokens": filter at the
    # TOKEN level, not on size(__shs) — a filter on the shingle array gets
    # pushed below the projections and Catalyst substitutes the whole
    # shingle pipeline into the condition, re-evaluating the split per
    # sequence element (O(tokens²) per row; the r12 plan audit caught
    # exactly this).  size(split(...)) inlines the split once.
    toked = toked.filter(F.size("__toks") >= shingle_n)
    withsh = toked.select(
        F.col(id_col),
        shingles_from_tokens(F.col("__toks"), shingle_n).alias("__shs"))
    withx = withsh.select(F.col(id_col),
                          F.transform(F.col("__shs"),
                                      lambda s: hash32(s) % MERSENNE)
                          .alias("__xs"))
    sigs = [F.array_min(F.transform(
                F.col("__xs"),
                lambda x: (F.lit(a) * x + F.lit(b)) % MERSENNE))
            .alias(f"h{i}")
            for i, (a, b) in enumerate(_minhash_coeffs(k))]
    return withx.select(id_col, *sigs)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str,
                        k: int = 16, bands: int = 4,
                        max_bucket: int = 1000) -> DataFrame:
    """LSH banding over minhash signatures → candidate near-dup pairs
    (id_a < id_b).  Docs agreeing on all rows of any band collide.

    ``max_bucket`` drops degenerate buckets (e.g. empty-text docs) before
    the within-bucket self-join — the skew guard that keeps the pair stage
    from going quadratic on boilerplate at scale.

    The signature plan (typically a shingle-explode + md5 + groupBy over
    the full corpus) is materialized ONCE via ``localCheckpoint``: the
    banded frame is referenced four times downstream (bucket counts +
    both self-join sides), and without the cut Catalyst re-executes the
    signature pipeline per reference — 4 corpus scans and 4× the md5
    work (the r12 plan audit showed exactly that).  The checkpointed
    frame is one row of k ints per doc — tiny next to the corpus at any
    scale."""
    from database_stream_processor_spark.tuning import checkpoint_small
    signatures = checkpoint_small(signatures, eager=True, aqe_off=False)
    r = k // bands
    band_structs = [
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("-", *[F.col(f"h{b * r + j}") for j in range(r)])
                 .alias("bkey"))
        for b in range(bands)
    ]
    banded = (signatures
              .select(id_col, F.explode(F.array(*band_structs)).alias("bb"))
              .select(id_col, F.col("bb.band").alias("band"),
                      F.col("bb.bkey").alias("bkey")))
    counts = banded.groupBy("band", "bkey").count()
    banded = (banded.join(counts.filter(F.col("count") <= max_bucket),
                          on=["band", "bkey"], how="left_semi"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bkey")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bkey")
    return (a.join(b, on=["band", "bkey"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").dropDuplicates())


def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = 16) -> DataFrame:
    """SimHash fingerprint per document over token 32-bit hashes: for each
    bit position, sum ±1 contributions across tokens (with multiplicity);
    the sign vector packs into an integer.  Hamming-near fingerprints =
    near-dup texts.  Output: (id, simhash).

    Pure per-row PROJECTION like :func:`minhash_signatures`: token hashes
    land in an array column (hashed once), each bit's ±1 sum is an
    ``aggregate`` fold over it, and the sign vector packs in the same
    projection — the explode + groupBy formulation shuffled every (doc,
    token) partial for what is row-local arithmetic.  Docs whose token
    array is empty produced no group before and produce no row now."""
    toked = spread(df).select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"))
    withx = (toked.filter(F.size("__toks") > 0)
             .select(F.col(id_col),
                     F.transform(F.col("__toks"),
                                 lambda t: hash32(t)).alias("__xs")))
    bit_sums = [
        F.aggregate(
            F.col("__xs"), F.lit(0).cast("long"),
            lambda acc, x: acc
            + (2 * (F.shiftright(x, j).bitwiseAND(F.lit(1))) - 1))
        .alias(f"b{j}")
        for j in range(bits)
    ]
    agg = withx.select(id_col, *bit_sums)
    packed = sum(
        (F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
         for j in range(bits)),
        F.lit(0),
    )
    return agg.select(id_col, packed.cast("long").alias("simhash"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity: |A∩B| / |A∪B| ≥ threshold.
    Output: (id_a, id_b, jaccard).

    With ``candidates`` (an (id_a, id_b) DataFrame, e.g. from
    :func:`lsh_candidate_pairs`), only those pairs are verified — the
    production shape at corpus scale.  Each doc's distinct shingle set is
    kept as an array column (a pure projection — no explode, no shuffle)
    and joined onto the pair list twice; the intersection is a JVM-side
    ``array_intersect`` per pair.  The (expensive) candidate plan is
    referenced exactly once, and cost ∝ |candidates|, not
    ∝ pairs-sharing-a-shingle (which goes quadratic on a dense
    vocabulary).  Without ``candidates``, all pairs sharing ≥1 shingle are
    scored via the exploded shared-shingle self-join."""
    if candidates is not None:
        toked = spread(df).select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"))
        # materialize the per-doc shingle sets once: they are joined onto
        # the pair list twice (id_a and id_b sides), and without the cut
        # the tokenize+shingle pipeline runs twice over the corpus
        sets = toked.select(
            F.col(id_col),
            shingles_from_tokens(F.col("__toks"), n).alias("__set")
        )
        from database_stream_processor_spark.tuning import checkpoint_small
        sets = checkpoint_small(sets, eager=True, aqe_off=False)
        sa = sets.select(F.col(id_col).alias("id_a"),
                         F.col("__set").alias("__seta"))
        sb = sets.select(F.col(id_col).alias("id_b"),
                         F.col("__set").alias("__setb"))
        inter = F.size(F.array_intersect(F.col("__seta"), F.col("__setb")))
        return (candidates.join(sa, "id_a").join(sb, "id_b")
                .withColumn("__shared", inter)
                .withColumn(
                    "jaccard",
                    F.round(F.col("__shared") /
                            (F.size(F.col("__seta")) + F.size(F.col("__setb"))
                             - F.col("__shared")), 6))
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))
    sh = _shingle_rows(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("__sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "__sh")
    b = sh.select(F.col(id_col).alias("id_b"), "__sh")
    shared = (a.join(b, on="__sh")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b").agg(F.count("*").alias("__shared")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb"))
    return (shared.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("__shared") /
                                (F.col("__sza") + F.col("__szb") - F.col("__shared")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         nodes: DataFrame | None = None,
                         id_col: str = "id",
                         max_iter: int = 50) -> DataFrame:
    """Connected components over an undirected edge list — the cluster
    step of near-dup corpus dedup (LSH pairs → duplicate clusters →
    one canonical doc per cluster).  Output: (``id_col``, component)
    with component = the smallest node id in the component; every node
    of ``nodes`` (if given) appears, singletons labeled by themselves.

    The reference computes components with its recursive operator basis
    (recursive.rs:255, transitive-closure family); materializing full
    reachability is quadratic in component size, so here each round
    alternates the two O(|E|)-shaped steps of the classic MapReduce CC
    algorithm instead:

    - *propagate*: every node takes the min label over itself and its
      neighbors (one equi-join on the symmetrized edges + one combinable
      min-groupBy — both shuffle on node id);
    - *pointer-jump*: every node replaces its label with its label's
      label (one self-join of the label table), halving label-chain
      depth so convergence is ~O(log diameter) rounds, not O(diameter).

    Labels only ever decrease, so the sum of labels is a strictly
    decreasing convergence measure — the loop exits on the first round
    with an unchanged sum.  Each round's label table is delta-small state
    checkpointed LAZILY and materialized by the same job that computes the
    convergence sum (one scheduled job per round, not two), and every join
    key is the node id — at 100 TB the rounds are plain co-partitioned
    shuffles with no all-pairs stage."""
    from database_stream_processor_spark.tuning import (leaf_bytes,
                                                        small_tick_conf)
    # symmetrize with a single reference to the (possibly expensive)
    # edges plan: explode both orientations per row instead of a UNION
    # whose two branches each recompute the upstream pipeline
    sym = (edges.select(F.explode(F.array(
        F.struct(F.col(src).alias("__a"), F.col(dst).alias("__b")),
        F.struct(F.col(dst).alias("__a"), F.col(src).alias("__b"))))
        .alias("__e"))
        .select("__e.__a", "__e.__b")
        .dropDuplicates())
    from database_stream_processor_spark.tuning import checkpoint_small
    sym = checkpoint_small(sym, eager=True, aqe_off=False)
    # the loop's working set is bounded by |sym| + |labels| ≈ 2·|sym|:
    # size-gate the rounds on the MATERIALIZED edge bytes (driver-side
    # block-manager metadata, no job) — small graphs run each round as
    # one exactly-sized job, big graphs keep AQE
    with small_tick_conf(edges.sparkSession, 4 * leaf_bytes(sym),
                         aqe_off=True):
        verts = sym.select(F.col("__a").alias(id_col))
        if nodes is not None:
            verts = verts.union(nodes.select(F.col(nodes.columns[0])
                                             .alias(id_col)))
        labels = (verts.dropDuplicates()
                  .select(id_col, F.col(id_col).alias("component"))
                  .localCheckpoint(eager=False))
        # one job: materializes the lazy checkpoint and returns the sum
        prev_sum = labels.agg(F.sum("component")).collect()[0][0]
        converged = False
        for _ in range(max_iter):
            nbr = (sym.join(labels, sym["__a"] == labels[id_col])
                   .select(F.col("__b").alias(id_col), "component"))
            new = (labels.unionByName(nbr)
                   .groupBy(id_col).agg(F.min("component").alias("component")))
            l2 = new.select(F.col(id_col).alias("__cid"),
                            F.col("component").alias("__cc"))
            new = (new.join(l2, new["component"] == l2["__cid"], "left")
                   .select(F.col(id_col),
                           F.coalesce(F.col("__cc"), F.col("component"))
                           .alias("component"))
                   .localCheckpoint(eager=False))
            cur_sum = new.agg(F.sum("component")).collect()[0][0]
            labels = new
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
    if not converged:
        # same contract as fixpoint/iterate_until elsewhere in the repo:
        # never hand back possibly-wrong labels silently
        raise RuntimeError(
            f"connected_components: label sum still decreasing after "
            f"max_iter={max_iter} pointer-jumping rounds; raise max_iter "
            f"(rounds needed ~ log2(graph diameter))")
    return labels


def dedup_clusters(df: DataFrame, id_col: str, text_col: str,
                   k: int = 16, bands: int = 4,
                   shingle_n: int = 3) -> DataFrame:
    """Near-dup cluster assignment for a document corpus: MinHash →
    LSH banding → connected components over the candidate-pair graph.
    Output: (``id_col``, component); docs sharing a component are
    near-dup candidates of each other (transitively), and
    ``component`` doubles as the canonical (lowest) doc id to keep."""
    sig = minhash_signatures(df, id_col, text_col, k=k,
                             shingle_n=shingle_n)
    cand = lsh_candidate_pairs(sig, id_col, k=k, bands=bands)
    return connected_components(cand, "id_a", "id_b",
                                nodes=df.select(id_col), id_col=id_col)

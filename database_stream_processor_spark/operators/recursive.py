"""Recursion to fixpoint — the reference's ``recursive(f)`` operator
(src/operator/recursive.rs:255: feedback z1 + distinct + iterate-to-fixpoint
+ export; scheduler fixedpoint circuit_builder.rs:334).

Spark has no native fixpoint primitive, so this is a driver loop over
DataFrames: seed → iterate ``distinct(f(acc))`` until no new rows.  The
``distinct`` in the loop is what guarantees termination on monotone ``f``
(recursive.rs:14-21) — we enforce set semantics every iteration.

Scale notes: each iteration is a distributed join/union plan; we
``localCheckpoint`` per iteration to cut lineage (the Spark analog of the
reference's per-iteration trace consolidation).  Semi-naive evaluation is
used for transitive closure: only the frontier (new paths) joins the edge
set each round, so per-iteration cost ∝ |new facts| — the same cost claim
DBSP makes for its nested-clock recursion.
"""

from __future__ import annotations

import contextlib
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: target rows per shuffle partition inside fixpoint loops
_ROWS_PER_PARTITION = 50_000

#: below this per-round working set, AQE's per-exchange re-planning jobs
#: cost more than its coalescing saves (resize() already picks the exact
#: partition count); above it, keep AQE for skew-splitting at scale
_AQE_MIN_ROWS = 2_000_000


@contextlib.contextmanager
def _loop_shuffle_partitions(df: DataFrame):
    """Size shuffle partitions to a fixpoint loop's working set.

    ``localCheckpoint`` materializes through ``.rdd``, which bypasses AQE's
    partition coalescing — so without this, every round of a fixpoint over
    a few thousand rows pays full-width (e.g. 32-task) shuffles, and the
    per-round fixed cost dominates.  Yields ``resize(n_rows)``: call it
    with the current accumulator size each round.  Scale-adaptive: a
    billion-row closure keeps its parallelism (capped at the session's
    configured width), a small one runs 1-task rounds.

    AQE is gated by the same size signal: adaptive execution materializes
    every exchange as its own job (driver re-plans between stages), which
    on a small round turns a 2-shuffle query into 6+ scheduled jobs — the
    r9 profile of the q39 closure showed 32 jobs/run under AQE vs 8
    without, a 2.7× wall-clock difference, with ALL the time in job
    scheduling latency (255-edge input).  Small rounds (≤ ``_AQE_MIN_ROWS``
    per round) therefore run with AQE off — their partition count is
    already exact via ``resize`` — while big rounds keep AQE's coalescing
    and skew-splitting (at 100 TB a closure join wants both).  Both confs
    are restored on exit.
    """
    sess = df.sparkSession
    old = sess.conf.get("spark.sql.shuffle.partitions")
    old_aqe = sess.conf.get("spark.sql.adaptive.enabled")
    cap = int(old) if old.isdigit() else 2 ** 30

    def resize(n_rows: int) -> None:
        want = max(1, n_rows // _ROWS_PER_PARTITION + 1)
        sess.conf.set("spark.sql.shuffle.partitions", str(min(cap, want)))
        sess.conf.set("spark.sql.adaptive.enabled",
                      "true" if n_rows > _AQE_MIN_ROWS else "false")

    try:
        yield resize
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", old)
        sess.conf.set("spark.sql.adaptive.enabled", old_aqe)


class Delta0:
    """``delta0`` (src/operator/delta0.rs:21): import a parent-scope
    stream into a child (nested-clock) scope — the imported value appears
    on the child clock's FIRST tick and is empty on every later tick, so
    the inner fixpoint sees the outer delta exactly once per outer tick.

    Our fixpoint loops (:func:`fixpoint`,
    :class:`IncrementalTransitiveClosureOp`) seed implicitly, which is
    why this stayed cosmetic; ``Delta0`` makes the import point explicit
    for user-built nested iterations (:func:`iterate_until` bodies that
    consume an outer delta)::

        d0 = Delta0(outer_delta)
        acc = seed
        while ...:
            acc = step(acc, d0.tick())   # outer delta only on tick 0

    ``reset()`` rearms it for the next outer tick (the child clock
    restarting, time/mod.rs:20-48).
    """

    def __init__(self, value: "object"):
        from database_stream_processor_spark.zset import ZSetFrame
        self._value = value
        self._empty = (ZSetFrame(value.df.limit(0))
                       if isinstance(value, ZSetFrame)
                       else value.limit(0))
        self._ticked = False

    def tick(self) -> "object":
        if self._ticked:
            return self._empty
        self._ticked = True
        return self._value

    def reset(self, value: "object" | None = None) -> None:
        """Rearm for the next outer tick; optionally swap the imported
        value (the next outer delta)."""
        if value is not None:
            self._value = value
        self._ticked = False


def fixpoint(seed: DataFrame, step: Callable[[DataFrame], DataFrame],
             max_iterations: int = 100) -> DataFrame:
    """Iterate ``acc ∪ distinct(step(acc))`` until fixpoint.

    ``step`` maps the accumulated relation to newly derivable rows (it need
    not dedup against ``acc``; we do).  Naive evaluation — prefer a
    semi-naive formulation (pass only the frontier) for deep recursions,
    as :func:`transitive_closure` does.
    """
    acc = seed.dropDuplicates().localCheckpoint(eager=True)
    for _ in range(max_iterations):
        new = step(acc).dropDuplicates().exceptAll(acc)
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            return acc
        acc = acc.unionByName(new).localCheckpoint(eager=True)
    raise RuntimeError(f"fixpoint did not converge in {max_iterations} iterations")


def transitive_closure(edges: DataFrame, src: str = "src", dst: str = "dst",
                       max_iterations: int = 100,
                       method: str = "doubling") -> DataFrame:
    """All (src, dst) pairs connected by a directed path — the reference's
    canonical recursion workload (benches/path.rs transitive closure;
    examples/degrees.rs).

    Two iteration schemes (both distributed joins, never driver-side):

    - ``doubling`` (default): acc ← acc ∪ acc∘acc — **log₂(diameter)**
      rounds.  Each Spark round carries fixed scheduling/shuffle overhead,
      so on high-diameter graphs halving the round count dominates; the
      per-round join is |acc|⋈|acc| on the midpoint.
    - ``seminaive``: frontier ∘ edges per round — **diameter** rounds,
      but per-round cost ∝ |new paths| only (the reference's nested-clock
      cost claim, recursive.rs:14-21).  Prefer it when the closure is
      huge and the diameter is small.
    """
    from database_stream_processor_spark.tuning import (leaf_bytes,
                                                        small_tick_conf)
    # size-gate the WHOLE fixpoint (not just the loop rounds): on a small
    # edge set the pre-loop dedup/count and the final exceptAll schedule
    # one job each instead of one per exchange under AQE; at scale the
    # gate never fires
    with small_tick_conf(edges.sparkSession, leaf_bytes(edges),
                         aqe_off=True):
        return _transitive_closure_gated(edges, src, dst,
                                         max_iterations, method)


def _transitive_closure_gated(edges: DataFrame, src: str, dst: str,
                              max_iterations: int,
                              method: str) -> DataFrame:
    # lazy checkpoint: the count below materializes it in the same job
    edges = edges.select(src, dst).dropDuplicates().localCheckpoint(eager=False)
    acc = edges

    def compose(left: DataFrame, right: DataFrame,
                dedup: bool = True) -> DataFrame:
        out = (left.withColumnRenamed(dst, "__mid")
               .join(right.withColumnRenamed(src, "__mid"), on="__mid")
               .select(src, dst))
        return out.dropDuplicates() if dedup else out

    if method == "doubling":
        # one materialization per round; termination by |acc| growth (a
        # count on just-checkpointed data is nearly free) — 2 jobs/round,
        # log₂(diameter) rounds
        n = acc.count()
        with _loop_shuffle_partitions(edges) as resize:
            for _ in range(max_iterations):
                resize(n)
                # lazy checkpoint: the count materializes it in the
                # same job (one Spark job per round, not two).  The
                # compose leg skips its own dedup — the round-level
                # dropDuplicates right here already collapses it, and
                # one shuffle per round is the difference between 2 and
                # 3 exchanges on the loop's critical path.
                acc2 = (compose(acc, acc, dedup=False).unionByName(acc)
                        .dropDuplicates()
                        .localCheckpoint(eager=False))
                n2 = acc2.count()
                if n2 == n:
                    return acc
                acc, n = acc2, n2
        raise RuntimeError(
            f"transitive_closure did not converge in {max_iterations} rounds")

    frontier = edges
    n = edges.count()
    with _loop_shuffle_partitions(edges) as resize:
        for _ in range(max_iterations):
            resize(n)
            stepped = compose(frontier, edges)
            frontier = stepped.exceptAll(acc).localCheckpoint(eager=True)
            if frontier.isEmpty():
                return acc
            acc = acc.unionByName(frontier).localCheckpoint(eager=True)
            n += frontier.count()
    raise RuntimeError(f"transitive_closure did not converge in {max_iterations} iterations")


class _PartitionedPairStore:
    """A (src, dst) pair set persisted as parquet partitioned by the
    hash-bucket of ONE endpoint column — the Spark analog of the
    reference's indexed Z-set trace sharded by key
    (src/operator/communication/shard.rs:89).

    ``read_buckets`` is pruned *by construction*: the reader is handed the
    explicit partition subdirectories, so unrelated buckets are never
    listed, opened, or scanned.  ``overwrite_buckets`` replaces only the
    target buckets (delete dir + append) — a delta tick rewrites ∝
    affected buckets, not ∝ store size.  All filesystem access goes
    through the Hadoop FS API so the path may be S3/HDFS, not just local.

    Bucket ids are ``pmod(hash(col), n)`` — Murmur3, deterministic across
    sessions, so partition layout is stable for the store's lifetime.
    """

    def __init__(self, spark, path: str, key: str, columns: list[str],
                 schema: str, n_buckets: int):
        self.spark = spark
        self.path = path.rstrip("/")
        self.key = key                 # the endpoint column bucketed on
        self.columns = list(columns)   # data columns, in declared order
        self.schema = schema
        self.n = n_buckets
        #: cumulative buckets handed to readers — the test/stats hook that
        #: proves deletion ticks scan « n_buckets partitions
        self.scanned_buckets = 0

    def _fs(self):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        return jpath.getFileSystem(
            self.spark._jsc.hadoopConfiguration()), jvm

    def bucket_expr(self, col: str):
        return F.pmod(F.hash(F.col(col)), F.lit(self.n)).cast("int")

    def buckets_of(self, df: DataFrame, col: str) -> list[int]:
        """Distinct bucket ids of ``df[col]`` — partition-*selection*
        metadata (≤ n_buckets small ints), the one place a driver collect
        is the right tool: it chooses which directories to read, it never
        moves data."""
        rows = (df.select(self.bucket_expr(col).alias("__b"))
                .distinct().collect())
        return sorted(r["__b"] for r in rows)

    @staticmethod
    def buckets_of_both(store_a: "_PartitionedPairStore", col_a: str,
                        store_b: "_PartitionedPairStore", col_b: str,
                        df: DataFrame) -> tuple[list[int], list[int]]:
        """Both endpoints' bucket ids in ONE job (the per-tick write-back
        needs src- and dst-store buckets of the same delta; two separate
        distinct+collect jobs double the fixed cost)."""
        rows = (df.select(store_a.bucket_expr(col_a).alias("__ba"),
                          store_b.bucket_expr(col_b).alias("__bb"))
                .distinct().collect())
        return (sorted({r["__ba"] for r in rows}),
                sorted({r["__bb"] for r in rows}))

    def _existing(self, buckets: list[int]) -> list[int]:
        fs, jvm = self._fs()
        P = jvm.org.apache.hadoop.fs.Path
        return [b for b in buckets
                if fs.exists(P(f"{self.path}/__b={b}"))]

    def total_bytes(self) -> int:
        """On-disk size of the store — driver-side FS metadata (no job);
        the size signal for the per-tick AQE/partition gate."""
        fs, jvm = self._fs()
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        if not fs.exists(p):
            return 0
        return int(fs.getContentSummary(p).getLength())

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], self.schema)

    def read_buckets(self, buckets: list[int]) -> DataFrame:
        live = self._existing(buckets)
        self.scanned_buckets += len(live)
        if not live:
            return self._empty()
        return (self.spark.read.option("basePath", self.path)
                .parquet(*[f"{self.path}/__b={b}" for b in live])
                .select(*self.columns))

    def read_all(self) -> DataFrame:
        fs, jvm = self._fs()
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(self.path)):
            return self._empty()
        return (self.spark.read.option("basePath", self.path)
                .parquet(self.path).select(*self.columns))

    def write_full(self, df: DataFrame) -> None:
        # cluster by bucket before the partitioned write: one task (and
        # one file) per bucket instead of every input partition spraying
        # a sliver into every bucket dir — fewer tiny files on disk and
        # fewer write tasks per tick; at real scale raise the multiplier
        # so each bucket still gets size-bounded files
        (df.withColumn("__b", self.bucket_expr(self.key))
         .repartition(self.n, F.col("__b"))
         .write.mode("overwrite").partitionBy("__b").parquet(self.path))

    def overwrite_buckets(self, df: DataFrame, buckets: list[int]) -> None:
        """Replace exactly ``buckets`` with ``df`` (which must contain the
        buckets' full new content, and ONLY rows belonging to them).

        The write lands in a sibling temp directory first, then the bucket
        directories are swapped in via FS rename — so ``df`` may read this
        store's LIVE files (they survive until the write job finishes) and
        the caller no longer pays a separate materialization job before
        the rewrite: one write job per store per tick, half the previous
        job count and half the data movement."""
        fs, jvm = self._fs()
        P = jvm.org.apache.hadoop.fs.Path
        tmp = f"{self.path}__tmp"
        fs.delete(P(tmp), True)
        (df.withColumn("__b", self.bucket_expr(self.key))
         .repartition(max(1, len(buckets)), F.col("__b"))
         .write.mode("overwrite").partitionBy("__b").parquet(tmp))
        for b in buckets:
            fs.delete(P(f"{self.path}/__b={b}"), True)
        for st in fs.listStatus(P(tmp)):
            name = st.getPath().getName()
            if name.startswith("__b="):
                fs.rename(st.getPath(), P(f"{self.path}/{name}"))
        fs.delete(P(tmp), True)


class IncrementalTransitiveClosureOp:
    """Maintain a transitive closure under edge *deltas* — the reference's
    incremental recursion (recursive.rs:255 exports the recursive view for
    incremental maintenance under input deltas; nested clock
    src/time/mod.rs:20-48 runs the inner fixpoint per outer input tick).

    Edge insertions use the frontier algorithm: new paths must route
    through at least one inserted edge, so the seed is
    ``(I ∪ TC_old) ∘ ΔE ∘ (I ∪ TC_old)`` and the semi-naive loop closes it
    against the growing closure — per-tick cost ∝ |new paths|, never a
    full recompute.

    Edge deletions use **DRed** (delete-and-rederive — the bounded
    deletion strategy the reference gets from nested clocks,
    recursive.rs:255 + src/time/mod.rs:20-48):

    1. *over-delete*: the suspect set ``D = (I ∪ TC) ∘ ΔE⁻ ∘ (I ∪ TC)`` —
       exactly the pairs with some path through a deleted edge (the
       mirror image of the insertion seed; one shot, no iteration,
       because TC already holds all prefix/suffix connectivity);
    2. *re-derive*: semi-naive right-linear fixpoint restricted to ``D``
       over the surviving edges — suspects with an alternate path come
       back;
    3. retract ``D − rederived``.

    Per-tick deletion cost ∝ |D| (paths actually affected), never the
    closure size.  ``last_delete_stats`` exposes (suspects, rounds) so
    tests can assert the bound.

    ``step`` takes a Z-set edge delta (weights +1 insert / −1 delete) and
    returns the Z-set delta of closure pairs.  State (edge set + closure
    set) lives in DataFrames materialized per tick, never on the driver.
    A tick carrying both signs applies deletions (DRed) first, then
    insertions (frontier) against the post-deletion closure.
    """

    def __init__(self, spark, src: str = "src", dst: str = "dst",
                 max_iterations: int = 100, method: str = "doubling",
                 n_buckets: int | None = None, path: str | None = None):
        self.src, self.dst = src, dst
        self.max_iterations = max_iterations
        #: 'doubling' (log-diameter rounds, acc∘acc per round — wins when
        #: Spark's per-round overhead dominates) or 'seminaive' (diameter
        #: rounds, per-round cost ∝ new paths — wins on huge closures).
        self.method = method
        self.spark = spark
        schema = f"{src} long, {dst} long"
        self._schema = schema
        self._edges = spark.createDataFrame([], schema)
        self._tc = spark.createDataFrame([], schema)
        #: True until the first step() — the initial in-memory empty
        #: frames have unknowable leaf stats but hold nothing, so the
        #: first tick's size gate scores them 0
        self._virgin = True
        self._n = 0  # last known |closure|, sizes the loop's shuffles
        #: (suspects, rederive_rounds[, *_buckets_scanned, n_buckets]) of
        #: the latest deletion tick — lets tests assert deletion cost ∝
        #: affected paths/partitions, not closure size
        self.last_delete_stats: dict | None = None
        #: bucketed backend: the closure is persisted as TWO parquet
        #: copies, partitioned by hash-bucket of src and of dst (the
        #: reference keeps its recursive trace as indexed Z-sets sharded
        #: by key, shard.rs:89 + recursive.rs:255).  Every per-tick read —
        #: suspect generation, keep-split, frontier closure — is pruned to
        #: the buckets adjacent to the delta's endpoints, so a deletion
        #: tick on a 10⁹-pair closure touches only the affected
        #: partitions.  Insertion in this mode is always semi-naive
        #: (doubling's acc∘acc needs the whole closure by definition).
        self._bucketed = n_buckets is not None
        if self._bucketed:
            if not path:
                raise ValueError("bucketed closure needs a state path")
            cols = [src, dst]
            self._s_src = _PartitionedPairStore(
                spark, path.rstrip("/") + "/by_src", src, cols, schema,
                n_buckets)
            self._s_dst = _PartitionedPairStore(
                spark, path.rstrip("/") + "/by_dst", dst, cols, schema,
                n_buckets)
            self._initialized = False

    def _compose(self, left: DataFrame, right: DataFrame) -> DataFrame:
        src, dst = self.src, self.dst
        return (left.withColumnRenamed(dst, "__mid")
                .join(right.withColumnRenamed(src, "__mid"), on="__mid")
                .select(src, dst).dropDuplicates())

    def step(self, edge_delta) -> "object":
        from database_stream_processor_spark.tuning import (leaf_bytes,
                                                            small_tick_conf)
        d = edge_delta.consolidate()
        # Tick-wide size gate (the r9 loop-AQE gate generalized): when the
        # delta + maintained state are provably small, the WHOLE tick runs
        # with AQE off and exact shuffle sizing — every materialization/
        # probe schedules as one job instead of one per exchange.  State
        # size is FS metadata for the bucketed stores (no job) and the
        # checkpointed plan's leaf bytes otherwise; anything unknown
        # saturates to huge, so at scale the gate never fires and AQE
        # keeps its coalescing/skew handling.
        if self._bucketed:
            state_bytes = (self._s_src.total_bytes()
                           + self._s_dst.total_bytes())
            # pre-init the edge set is empty by construction; afterwards
            # it is a checkpoint whose actual bytes leaf_bytes resolves
            edges_bytes = (leaf_bytes(self._edges) if self._initialized
                           else 0)
        else:
            state_bytes = 0 if self._virgin else leaf_bytes(self._tc)
            edges_bytes = 0 if self._virgin else leaf_bytes(self._edges)
        size = leaf_bytes(d.df) + edges_bytes + state_bytes
        self._virgin = False
        with small_tick_conf(self.spark, size, aqe_off=True):
            return self._step_gated(d)

    def _bucket_set(self, col: str):
        """collect_set aggregate of a column's bucket id — both stores
        share the bucket function, so one set serves either store."""
        return F.collect_set(self._s_src.bucket_expr(col))

    def _step_gated(self, d) -> "object":
        from database_stream_processor_spark.zset import (WEIGHT_COL,
                                                          ZSetFrame)
        src, dst = self.src, self.dst
        # one LAZY materialization whose first consumer is the sign probe:
        # the agg job materializes the checkpoint as it runs — one job,
        # where the old eager-checkpoint + agg pair was two
        dd = d.df.localCheckpoint(eager=False)
        sign = dd.agg(F.max(WEIGHT_COL).alias("mx"),
                      F.min(WEIGHT_COL).alias("mn")).collect()[0]
        out = None
        if (sign["mn"] or 0) < 0:
            deletes = (dd.filter(F.col(WEIGHT_COL) < 0).select(src, dst)
                       .intersect(self._edges)
                       .localCheckpoint(eager=False))
            # Retracting never-inserted edges leaves deletes∩edges empty:
            # gate the whole DRed suspect machinery on one probe job that
            # ALSO materializes the checkpoint and (bucketed mode) returns
            # the deleted srcs' bucket ids — emptiness test, bucket
            # selection and materialization fused into a single job.
            # An empty intersect also keeps a delete-bearing FIRST tick
            # away from the bucketed stores before _insert_bucketed has
            # bootstrapped them (ADVICE r6 #4).
            if self._bucketed:
                row = deletes.agg(F.count(F.lit(1)).alias("n"),
                                  self._bucket_set(src).alias("bs")
                                  ).collect()[0]
                if row["n"]:
                    out = self._delete_bucketed(deletes, sorted(row["bs"]))
            elif deletes.count():
                out = self._delete(deletes)
        if (sign["mx"] or 0) > 0:
            # exceptAll against post-deletion edges: a same-tick ±pair
            # cancelled in consolidate(), so the sets are equivalent
            inserts = (dd.filter(F.col(WEIGHT_COL) > 0).select(src, dst)
                       .exceptAll(self._edges).dropDuplicates()
                       .localCheckpoint(eager=False))
            if self._bucketed and self._initialized:
                # same fused probe on the insert side
                row = inserts.agg(F.count(F.lit(1)).alias("n"),
                                  self._bucket_set(src).alias("bs")
                                  ).collect()[0]
                ins = (self._insert_bucketed(inserts, sorted(row["bs"]))
                       if row["n"] else None)
            else:
                ins = self._insert(inserts)
            if ins is not None:
                out = ins if out is None else out.plus(ins)
        if out is None:
            return ZSetFrame.from_df(
                self.spark.createDataFrame([], self._schema), 1)
        return out.consolidate()

    def _insert(self, added: DataFrame) -> "object":
        """Frontier insertion: close the seed of one-new-edge paths
        against the (post-deletion) closure."""
        from database_stream_processor_spark.zset import ZSetFrame
        if self._bucketed:
            return self._insert_bucketed(added)
        self._edges = (self._edges.unionByName(added)
                       .localCheckpoint(eager=True))
        # seed: every path using exactly one new edge (old-path prefix/
        # suffix); multi-new-edge paths emerge from the closure loop
        # (I ∪ TC_old) ∘ ΔE — prefix reaches a new edge's source
        pre = self._compose(self._tc, added).unionByName(added)
        # … ∘ (I ∪ TC_old) — suffix continues from the new edge's dst
        seed = self._compose(pre, self._tc).unionByName(pre)
        tc_old = self._tc
        with _loop_shuffle_partitions(added) as resize:
            if self.method == "doubling":
                # acc ← acc ∪ acc∘acc until |acc| stops growing: one
                # materialization + one cheap count per round, log
                # rounds; the emitted delta is one exceptAll at the end
                resize(self._n + 1)
                acc = (tc_old.unionByName(seed).dropDuplicates()
                       .localCheckpoint(eager=True))
                n = acc.count()
                for _ in range(self.max_iterations):
                    resize(n)
                    acc2 = (self._compose(acc, acc).unionByName(acc)
                            .dropDuplicates()
                            .localCheckpoint(eager=True))
                    n2 = acc2.count()
                    if n2 == n:
                        break
                    acc, n = acc2, n2
                else:
                    raise RuntimeError(
                        "incremental TC did not converge")
            else:
                frontier = (seed.dropDuplicates().exceptAll(tc_old)
                            .localCheckpoint(eager=True))
                acc = tc_old
                for _ in range(self.max_iterations):
                    if frontier.isEmpty():
                        break
                    acc = (acc.unionByName(frontier)
                           .localCheckpoint(eager=True))
                    stepped = (self._compose(frontier, acc)
                               .unionByName(
                                   self._compose(acc, frontier))
                               .dropDuplicates())
                    frontier = (stepped.exceptAll(acc)
                                .localCheckpoint(eager=True))
                else:
                    raise RuntimeError(
                        "incremental TC did not converge")
        new_pairs = acc.exceptAll(tc_old)
        self._tc = acc
        self._n = n if self.method == "doubling" else self._n
        return ZSetFrame.from_df(new_pairs.dropDuplicates(), 1)

    def _delete(self, deleted: DataFrame) -> "object":
        """DRed deletion: over-delete the suspect set, re-derive within
        it over the surviving edges, retract what stays dead.  Cost ∝
        |suspects|, never |closure| — the bound the reference gets from
        nested-clock incremental recursion (time/mod.rs:20-48)."""
        from database_stream_processor_spark.zset import ZSetFrame
        if self._bucketed:
            return self._delete_bucketed(deleted)
        tc_old = self._tc
        e_new = self._edges.exceptAll(deleted).localCheckpoint(eager=True)
        self._edges = e_new

        # 1. over-delete (one shot): pairs with some path through a
        # deleted edge = (I ∪ TC) ∘ ΔE⁻ ∘ (I ∪ TC) — TC_old already holds
        # every prefix/suffix, so no iteration is needed here
        pre = self._compose(tc_old, deleted).unionByName(deleted)
        suspects = (self._compose(pre, tc_old).unionByName(pre)
                    .dropDuplicates().localCheckpoint(eager=True))
        n_d = suspects.count()
        # split the closure on suspect *sources* with broadcast semi/anti
        # joins (the suspect-src set is tiny and broadcastable): the
        # unaffected slice passes through untouched, and the pair-level
        # exceptAll — the only shuffle — runs over the affected slice
        # only, never the whole closure
        src = self.src
        s_srcs = F.broadcast(suspects.select(src).dropDuplicates())
        unaffected = tc_old.join(s_srcs, on=src, how="left_anti")
        affected = (tc_old.join(s_srcs, on=src, how="left_semi")
                    .select(src, self.dst))
        keep = (affected.exceptAll(suspects)
                .localCheckpoint(eager=True))

        # 2. re-derive: right-linear semi-naive fixpoint restricted to the
        # suspect set.  Every surviving path decomposes into prefixes; a
        # suspect prefix re-derives either from a kept prefix + one edge
        # (the base) or from an earlier re-derived prefix + one edge (the
        # frontier rounds) — so this finds exactly the suspects with an
        # alternate path, in ≤ diameter rounds over ≤ |suspects| rows.
        rounds = 0
        src, dst = self.src, self.dst
        with _loop_shuffle_partitions(deleted) as resize:
            resize(n_d)
            # restrict the re-derivation join inputs to rows that can even
            # produce a suspect (shared src / dst endpoints) — keeps the
            # kept-closure and edge scans ∝ |suspects|-adjacent data, not
            # ∝ |closure|
            keep_r = (keep.join(suspects.select(src).dropDuplicates(),
                                on=src, how="left_semi")
                      .select(src, dst))  # join(on=) reorders columns
            e_r = (e_new.join(suspects.select(dst).dropDuplicates(),
                              on=dst, how="left_semi")
                   .select(src, dst)
                   .localCheckpoint(eager=True))
            base = (e_r.intersect(suspects)
                    .unionByName(
                        self._compose(keep_r, e_r).intersect(suspects))
                    .dropDuplicates().localCheckpoint(eager=True))
            rederived = base
            frontier = base
            for _ in range(self.max_iterations):
                if frontier.isEmpty():
                    break
                rounds += 1
                stepped = self._compose(frontier, e_r).intersect(suspects)
                frontier = (stepped.exceptAll(rederived)
                            .localCheckpoint(eager=True))
                rederived = (rederived.unionByName(frontier)
                             .localCheckpoint(eager=True))
            else:
                raise RuntimeError("DRed re-derivation did not converge")

        # 3. retract suspects that stayed dead
        dead = suspects.exceptAll(rederived).localCheckpoint(eager=True)
        self._tc = (unaffected.unionByName(keep).unionByName(rederived)
                    .localCheckpoint(eager=True))
        self._n = max(1, self._n - dead.count())
        self.last_delete_stats = {"suspects": n_d, "rounds": rounds}
        return ZSetFrame.from_df(dead, -1)

    # ------------------------------------------------------------- #
    # bucketed backend: every read pruned to delta-adjacent buckets
    # ------------------------------------------------------------- #

    def _insert_bucketed(self, added: DataFrame,
                         src_buckets: list[int] | None = None) -> "object":
        """Frontier insertion over the partitioned stores: all closure
        reads are pruned to the buckets adjacent to the new edges /
        current frontier; only the buckets receiving new pairs are
        rewritten.  ``src_buckets`` (the new edges' src bucket ids) comes
        precomputed from step()'s fused probe on post-init ticks."""
        from database_stream_processor_spark.zset import ZSetFrame
        src, dst = self.src, self.dst
        self._edges = (self._edges.unionByName(added)
                       .localCheckpoint(eager=True))
        # `added` is a lazy checkpoint: the edges-union job above (or the
        # fused probe in step()) materializes it

        if not self._initialized:
            # first tick: full fixpoint (everything is new), write both
            # partitioned copies once
            tc = transitive_closure(self._edges, src, dst,
                                    self.max_iterations, method="doubling")
            self._s_src.write_full(tc)
            self._s_dst.write_full(tc)
            self._initialized = True
            self._n = tc.count()
            return ZSetFrame.from_df(tc, 1)

        if src_buckets is None:
            if added.isEmpty():
                return ZSetFrame.from_df(
                    self.spark.createDataFrame([], self._schema), 1)
            src_buckets = self._s_dst.buckets_of(added, src)

        # seed = (I ∪ TC) ∘ ΔE ∘ (I ∪ TC), with each TC read pruned:
        # prefixes end at a new edge's source (dst-store buckets of
        # added.src), suffixes start at a new edge's dst (src-store
        # buckets of added.dst)
        tc_pre = self._s_dst.read_buckets(src_buckets)
        pre = (self._compose(tc_pre, added).unionByName(added)
               .dropDuplicates().localCheckpoint(eager=False))
        # one probe job: materializes `pre` and returns its dst buckets
        prow = pre.agg(self._bucket_set(dst).alias("bs")).collect()[0]
        tc_mid = self._s_src.read_buckets(sorted(prow["bs"]))
        seed = (self._compose(pre, tc_mid).unionByName(pre)
                .dropDuplicates().localCheckpoint(eager=False))

        # Close the seed by doubling over the seed set ALONE — no TC reads
        # inside the loop.  Sound because every new path factors into seed
        # paths: split it at its new edges into (old* new old*) segments,
        # each of which is a seed element (seed = (I ∪ TC)∘ΔE∘(I ∪ TC)
        # covers every maximal-old-prefix/suffix single-new-edge segment),
        # so ⌈log₂(new edges per path)⌉ rounds of acc∘acc reach them all.
        acc = seed
        # each round's probe job materializes the lazy checkpoint, counts
        # it, AND collects its src buckets — when the loop converges the
        # final round's bucket set feeds the `have` read with no extra job
        arow = acc.agg(F.count(F.lit(1)).alias("n"),
                       self._bucket_set(src).alias("bs")).collect()[0]
        n = int(arow["n"])
        with _loop_shuffle_partitions(added) as resize:
            for _ in range(self.max_iterations):
                resize(n)
                acc2 = (self._compose(acc, acc).unionByName(acc)
                        .dropDuplicates().localCheckpoint(eager=False))
                arow2 = acc2.agg(F.count(F.lit(1)).alias("n"),
                                 self._bucket_set(src).alias("bs")
                                 ).collect()[0]
                n2 = int(arow2["n"])
                if n2 == n:
                    break
                acc, n, arow = acc2, n2, arow2
            else:
                raise RuntimeError("incremental TC did not converge")
        # pairs already reachable through old edges are not new — one
        # pruned exceptAll against the src-store buckets acc touches
        have = self._s_src.read_buckets(sorted(arow["bs"]))
        new = acc.exceptAll(have).localCheckpoint(eager=False)
        # one probe job: materializes `new`, the emptiness gate, and both
        # stores' rewrite bucket sets
        nrow = new.agg(F.count(F.lit(1)).alias("n"),
                       self._bucket_set(src).alias("sb"),
                       self._bucket_set(dst).alias("db")).collect()[0]
        n_new = int(nrow["n"])
        if n_new == 0:
            return ZSetFrame.from_df(
                self.spark.createDataFrame([], self._schema), 1)

        # rewrite only the buckets that received new pairs, in each copy;
        # overwrite_buckets reads the live dirs inside its own write job
        # (temp-dir swap), so no caller-side materialization is needed
        sb, db = sorted(nrow["sb"]), sorted(nrow["db"])
        self._s_src.overwrite_buckets(
            self._s_src.read_buckets(sb).unionByName(new), sb)
        self._s_dst.overwrite_buckets(
            self._s_dst.read_buckets(db).unionByName(new), db)
        self._n += n_new
        return ZSetFrame.from_df(new, 1)

    def _delete_bucketed(self, deleted: DataFrame,
                         src_buckets: list[int] | None = None) -> "object":
        """DRed over the partitioned stores: suspect generation, the
        keep-split, and re-derivation all read ONLY the buckets adjacent
        to the deleted edges' endpoints — the closure-wide scan + shuffle
        of the in-memory path disappears entirely (the reference's
        deletion cost ∝ affected derivations, time/mod.rs:20-48).
        ``src_buckets`` (deleted srcs' bucket ids) comes precomputed from
        step()'s fused probe."""
        from database_stream_processor_spark.zset import ZSetFrame
        src, dst = self.src, self.dst
        if not self._initialized:
            # Defensive bootstrap: step() can't reach here before the
            # first insert (deletes∩empty-edges is empty), but any
            # future direct caller must find readable stores.
            self._s_src.write_full(self.spark.createDataFrame(
                [], self._schema))
            self._s_dst.write_full(self.spark.createDataFrame(
                [], self._schema))
            self._initialized = True
        scanned0 = (self._s_src.scanned_buckets,
                    self._s_dst.scanned_buckets)
        # lazy: the first re-derivation round's probe job materializes it
        e_new = self._edges.exceptAll(deleted).localCheckpoint(eager=False)
        self._edges = e_new

        # 1. over-delete: (I ∪ TC) ∘ ΔE⁻ ∘ (I ∪ TC); prefixes live in the
        # dst-store buckets of the deleted srcs, the mid-compose reads the
        # src-store buckets of the deleted dsts
        if src_buckets is None:
            src_buckets = self._s_dst.buckets_of(deleted, src)
        tc_pre = self._s_dst.read_buckets(src_buckets)
        pre = (self._compose(tc_pre, deleted).unionByName(deleted)
               .dropDuplicates().localCheckpoint(eager=False))
        # one probe job: materializes `pre` and returns its dst buckets
        prow = pre.agg(self._bucket_set(dst).alias("bs")).collect()[0]
        tc_mid = self._s_src.read_buckets(sorted(prow["bs"]))
        suspects = (self._compose(pre, tc_mid).unionByName(pre)
                    .dropDuplicates().localCheckpoint(eager=False))
        # one probe job: materializes `suspects`, counts it, and returns
        # its src buckets (the keep-split scan set)
        srow = suspects.agg(F.count(F.lit(1)).alias("n"),
                            self._bucket_set(src).alias("bs")).collect()[0]
        n_d = int(srow["n"])

        # 2. keep-split + re-derivation, all inside the suspects' src
        # buckets: unaffected buckets are never read, let alone shuffled
        sb = sorted(srow["bs"])
        affected = self._s_src.read_buckets(sb)
        # keep/e_r/base checkpoint LAZILY: they all feed the first
        # re-derivation round, whose single probe job materializes the
        # whole chain at once (3 fewer scheduled jobs per deletion tick)
        keep = affected.exceptAll(suspects).localCheckpoint(eager=False)
        rounds = 0
        with _loop_shuffle_partitions(deleted) as resize:
            resize(n_d)
            keep_r = (keep.join(suspects.select(src).dropDuplicates(),
                                on=src, how="left_semi")
                      .select(src, dst))
            e_r = (e_new.join(suspects.select(dst).dropDuplicates(),
                              on=dst, how="left_semi")
                   .select(src, dst).localCheckpoint(eager=False))
            base = (e_r.intersect(suspects)
                    .unionByName(
                        self._compose(keep_r, e_r).intersect(suspects))
                    .dropDuplicates().localCheckpoint(eager=False))
            rederived = base
            frontier, n_f = base, 1   # materialized by round 1's probe
            for _ in range(self.max_iterations):
                if n_f == 0:
                    break
                rounds += 1
                stepped = self._compose(frontier, e_r).intersect(suspects)
                # one job per round: lazy checkpoint materialized by the
                # convergence count; `rederived` stays a lazy union of
                # the (already-materialized) per-round frontiers
                frontier = (stepped.exceptAll(rederived)
                            .localCheckpoint(eager=False))
                n_f = frontier.count()
                rederived = rederived.unionByName(frontier)
            else:
                raise RuntimeError("DRed re-derivation did not converge")

        # 3. retract the still-dead suspects; rewrite only the affected
        # buckets of each copy (keep ∪ rederived all live in sb; the dead
        # pairs' dst buckets bound the dst-store rewrite)
        dead = suspects.exceptAll(rederived).localCheckpoint(eager=False)
        # one probe job: materializes `dead`, counts it, and returns its
        # dst-bucket selection
        drow = dead.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(self._s_dst.bucket_expr(dst)).alias("bs")
        ).collect()[0]
        # keep/rederived are checkpointed pieces, and overwrite_buckets
        # writes through a temp-dir swap — no caller-side materialization
        new_affected = keep.unionByName(rederived)
        self._s_src.overwrite_buckets(new_affected, sb)
        db = sorted(drow["bs"])
        self._s_dst.overwrite_buckets(
            self._s_dst.read_buckets(db).exceptAll(dead), db)
        self._n = max(1, self._n - int(drow["n"]))
        self.last_delete_stats = {
            "suspects": n_d, "rounds": rounds,
            "src_buckets_scanned":
                self._s_src.scanned_buckets - scanned0[0],
            "dst_buckets_scanned":
                self._s_dst.scanned_buckets - scanned0[1],
            "n_buckets": self._s_src.n,
        }
        return ZSetFrame.from_df(dead, -1)

    @property
    def current(self) -> DataFrame:
        """The maintained closure (set semantics)."""
        if self._bucketed:
            return self._s_src.read_all() if self._initialized \
                else self.spark.createDataFrame([], self._schema)
        return self._tc


class IncrementalFixpointOp:
    """Generic incremental maintenance of a monotone recursive view
    ``fix(base(I) ∪ step(I, acc))`` under input deltas (the reference
    exports any recursive view for incremental maintenance,
    recursive.rs:255; nested clocks time/mod.rs:20-48 make the tick cost
    ∝ affected derivations).

    Two execution paths per tick:

    - **Semi-naive insert** (when the tick is insert-only and the caller
      supplied the delta rules): the classic Datalog delta evaluation —

          F₀  = (Δbase(I', ΔI) ∪ Δstep(I', ΔI, O_old)) − O_old
          F_k = step(I', F_{k-1}) − (O_old ∪ F_<k)        until empty

      Only derivations that involve a new input atom (round 0) or a new
      output row (later rounds) are ever computed — the reference's
      nested-clock cost bound, without re-deriving anything already
      known.  ``delta_base(I', ΔI)`` / ``delta_step(I', ΔI, O_old)``
      must return every derivation using ≥1 atom of ΔI (over-approximating
      is fine — dedup removes the rest); they are the rule's manual delta
      form, e.g. for a body with two input atoms,
      ``join(ΔI, …, I') ∪ join(I', …, ΔI)``.  The per-round dedup joins
      the (small) frontier against the accumulated output — at scale,
      keep the output bucketed on the dedup keys (the
      :class:`IncrementalTransitiveClosureOp` pattern) so the anti-join
      prunes.

    - **Recompute-and-diff fallback** (deletions, or no delta rules):
      re-run the fixpoint over the integrated input and diff against the
      previous output — correct for any monotone ``step``, cost ∝ a full
      fixpoint per tick.

    ``last_stats`` records ``{"mode", "rounds", "new_rows"}`` of the last
    tick so tests can assert an insert tick's work was ∝ Δ.

    ``step(input_rows, acc) -> DataFrame`` derives new rows from the
    current input relation and the accumulated view; ``base(input_rows)``
    produces the seed (default: the input itself, matching the
    seed-with-input convention of :func:`fixpoint`).

    **Multi-input mode** (the reference maintains recursion over
    arbitrary nested circuits with several imported streams,
    recursive.rs:255 + delta0.rs): pass ``empty_input`` as a dict
    ``{name: empty ZSetFrame}``; then ``step(delta)`` takes a dict of
    per-input deltas (missing/None = unchanged) and every callback
    receives ``{name: DataFrame}`` maps in the input positions —
    ``base(rows_map)``, ``step(rows_map, acc)``,
    ``delta_base(full_map, d_map)``, ``delta_step(full_map, d_map,
    acc)``, ``delta_step_out(full_map, s, acc)``.  ``base`` and the
    delta rules are then required (no defaults).  Delta rules must
    return every derivation using ≥1 delta atom of ANY input
    (over-approximating is fine — the set fixpoint dedups).
    """

    def __init__(self, empty_input, step, base=None, delta_base=None,
                 delta_step=None, delta_step_out=None,
                 max_iterations: int = 100):
        from database_stream_processor_spark.plans.incremental import (
            StateTable)
        self._multi = isinstance(empty_input, dict)
        if not self._multi:
            # normalize the classic single-input surface onto the
            # dict-mode internals: one anonymous input "__in"
            empty_input = {"__in": empty_input}
            u1 = lambda f: f and (lambda m, *a: f(m["__in"], *a))
            u2 = lambda f: f and (
                lambda fm, dm, *a: f(fm["__in"], dm["__in"], *a))
            if base is None:
                base = lambda rows: rows
                if delta_base is None:
                    delta_base = lambda full, d: d
            step, base = u1(step), u1(base)
            delta_base = u2(delta_base)
            delta_step = u2(delta_step)
            if delta_step_out is not None:
                dso = delta_step_out
                delta_step_out = lambda fm, s, acc: dso(fm["__in"], s,
                                                        acc)
        else:
            if base is None:
                raise ValueError("multi-input mode requires base")
        self.step_fn = step
        self.base_fn = base
        self.delta_base = delta_base
        self.delta_step = delta_step
        #: ``delta_step_out(full, s, acc)`` = every derivation using ≥1
        #: acc-atom from ``s``, with the rule's remaining acc-atoms drawn
        #: from ``acc`` (over-approximating is fine) — drives BOTH DRed
        #: suspect propagation and DRed re-derivation.  The default,
        #: ``step(full, s)``, is exact for LINEAR recursion (one acc atom
        #: per rule body — transitive closure, same-generation, most
        #: Datalog); a non-linear rule (acc joined with itself) must
        #: supply its own, e.g. ``step(full, s) ∪ step'(full, acc, s)``,
        #: or deletions will both under-suspect and over-retract.
        self.delta_step_out = delta_step_out if delta_step_out is not None \
            else (lambda full, s, acc: self.step_fn(full, s))
        self.max_iterations = max_iterations
        self.inputs = list(empty_input)
        self._integrals = {k: StateTable(z, name=f"fixpoint_input_{k}")
                           for k, z in empty_input.items()}
        #: single-input mode keeps the classic attribute: THE input's
        #: StateTable (tests and callers read ``op.integral.current``)
        self.integral = (self._integrals if self._multi
                         else self._integrals["__in"])
        self._prev: DataFrame | None = None
        self.last_stats: dict | None = None

    def _currents(self):
        """{input: integrated rows} checkpointed — the callbacks' full
        bindings."""
        return {k: st.current.consolidate().rows()
                .localCheckpoint(eager=True)
                for k, st in self._integrals.items()}

    def step(self, delta, force_recompute: bool = False) -> "object":
        """One input tick.  ``force_recompute`` bypasses the semi-naive
        and DRed paths and re-runs the full fixpoint against the updated
        integrals (diffed against the previous output) — callers use it
        for ticks that touch an input whose role in the rules is not
        delta-linear (e.g. inside a NOT EXISTS / scalar subquery), where
        rebinding that input to its delta would be semantically wrong."""
        from database_stream_processor_spark.zset import ZSetFrame
        if not self._multi:
            delta = {"__in": delta}
        d = {k: z.consolidate() for k, z in delta.items()
             if z is not None}
        empties = {k: ZSetFrame(self._integrals[k].current.df.limit(0))
                   for k in self.inputs if k not in d}
        d.update(empties)
        insert_only = all(z.df.filter(z.weight < 0).isEmpty()
                          for z in d.values())
        have_rules = (not force_recompute
                      and self.delta_step is not None
                      and self.delta_base is not None)
        if insert_only and self._prev is not None and have_rules:
            return self._step_seminaive(d)
        if not insert_only and self._prev is not None and have_rules:
            neg = {k: ZSetFrame(z.df.filter(z.weight < 0)).consolidate()
                   for k, z in d.items()}
            pos = {k: ZSetFrame(z.df.filter(z.weight > 0)).consolidate()
                   for k, z in d.items()}
            out = self._step_dred(neg)
            if any(not z.df.isEmpty() for z in pos.values()):
                out = out.plus(self._step_seminaive(pos))
            return out.consolidate()
        for k, z in d.items():
            self._integrals[k].update(z)
        rows = self._currents()
        out = fixpoint(self.base_fn(rows),
                       lambda acc: self.step_fn(rows, acc),
                       max_iterations=self.max_iterations)
        if self._prev is None:
            diff = ZSetFrame.from_df(out, 1)
        else:
            diff = (ZSetFrame.from_df(out.exceptAll(self._prev), 1)
                    .plus(ZSetFrame.from_df(self._prev.exceptAll(out), -1)))
        self._prev = out.localCheckpoint(eager=True)
        self.last_stats = {"mode": "recompute", "rounds": None,
                           "new_rows": None}
        return diff.consolidate()

    def _step_dred(self, dneg) -> "object":
        """Delete-and-rederive for the generic fixpoint (the nested-clock
        deletion bound, time/mod.rs:20-48, without the TC
        specialization):

        1. *suspects*: close the deleted atoms' direct derivations
           (``delta_base``/``delta_step`` over the OLD input/output)
           under ``delta_step_out`` — every output row with some
           derivation path through a deleted atom;
        2. *re-derive*: semi-naive fixpoint restricted to the suspect
           set over the NEW input, seeded from base + the kept rows;
        3. retract ``suspects − rederived``.

        Work ∝ |suspects| plus one accumulated-output anti-join for the
        keep-split (the TC op's bucketed stores avoid even that; here the
        output lives in memory, so the scan is one partition-local pass).
        """
        from database_stream_processor_spark.zset import ZSetFrame
        d_rows = {k: z.neg().rows().localCheckpoint(eager=True)
                  for k, z in dneg.items()}
        i_old = self._currents()
        for k, z in dneg.items():
            self._integrals[k].update(z)
        full = self._currents()
        acc = self._prev
        s = (self.delta_base(i_old, d_rows)
             .unionByName(self.delta_step(i_old, d_rows, acc))
             .dropDuplicates().intersect(acc)
             .localCheckpoint(eager=True))
        suspects = s
        s_rounds = 0
        with _loop_shuffle_partitions(next(iter(d_rows.values()))) \
                as resize:
            for _ in range(self.max_iterations):
                if s.isEmpty():
                    break
                s_rounds += 1
                resize(s.count())
                stepped = (self.delta_step_out(i_old, s, acc)
                           .dropDuplicates().intersect(acc))
                s = stepped.exceptAll(suspects).localCheckpoint(eager=True)
                suspects = (suspects.unionByName(s)
                            .localCheckpoint(eager=True))
            else:
                raise RuntimeError("DRed suspect closure did not converge")
            n_s = suspects.count()
            keep = acc.exceptAll(suspects).localCheckpoint(eager=True)

            red = (self.base_fn(full).intersect(suspects)
                   .unionByName(self.step_fn(full, keep)
                                .intersect(suspects))
                   .dropDuplicates().localCheckpoint(eager=True))
            frontier = red
            r_rounds = 0
            for _ in range(self.max_iterations):
                if frontier.isEmpty():
                    break
                r_rounds += 1
                resize(n_s)
                # delta-complete step: every derivation using ≥1 frontier
                # atom, remaining atoms drawn from keep ∪ red — via the
                # same delta_step_out hook as the suspect closure, so a
                # NON-LINEAR rule's keep×frontier cross-derivations are
                # found (the default hook reduces to step(full, frontier),
                # exact for linear recursion).
                ctx = keep.unionByName(red)
                stepped = (self.delta_step_out(full, frontier, ctx)
                           .dropDuplicates().intersect(suspects))
                frontier = (stepped.exceptAll(red)
                            .localCheckpoint(eager=True))
                red = red.unionByName(frontier).localCheckpoint(eager=True)
            else:
                raise RuntimeError("DRed re-derivation did not converge")
        dead = suspects.exceptAll(red).localCheckpoint(eager=True)
        self._prev = keep.unionByName(red).localCheckpoint(eager=True)
        self.last_stats = {"mode": "dred", "suspects": n_s,
                           "rounds": s_rounds + r_rounds,
                           "new_rows": None}
        return ZSetFrame.from_df(dead, -1).consolidate()

    def _step_seminaive(self, d) -> "object":
        from database_stream_processor_spark.zset import ZSetFrame
        d_rows = {k: z.rows().localCheckpoint(eager=True)
                  for k, z in d.items()}
        for k, z in d.items():
            self._integrals[k].update(z)
        full = self._currents()
        acc = self._prev
        seed = (self.delta_base(full, d_rows)
                .unionByName(self.delta_step(full, d_rows, acc))
                .dropDuplicates())
        frontier = seed.exceptAll(acc).localCheckpoint(eager=True)
        new = frontier
        rounds = 0
        with _loop_shuffle_partitions(next(iter(d_rows.values()))) \
                as resize:
            for _ in range(self.max_iterations):
                if frontier.isEmpty():
                    break
                rounds += 1
                acc = acc.unionByName(frontier).localCheckpoint(eager=True)
                resize(frontier.count())
                # delta-complete round: derivations using ≥1 frontier
                # atom, remaining acc-atoms from the accumulated output
                # (which already includes the frontier) — the default
                # hook reduces to step(full, frontier), exact for linear
                # recursion; non-linear rules supply delta_step_out.
                stepped = (self.delta_step_out(full, frontier, acc)
                           .dropDuplicates())
                frontier = (stepped.exceptAll(acc)
                            .localCheckpoint(eager=True))
                new = new.unionByName(frontier)
            else:
                raise RuntimeError(
                    "semi-naive fixpoint did not converge")
        new = new.localCheckpoint(eager=True)
        self._prev = acc
        self.last_stats = {"mode": "seminaive", "rounds": rounds,
                           "new_rows": new.count()}
        return ZSetFrame.from_df(new, 1).consolidate()

    @property
    def current(self) -> DataFrame | None:
        return self._prev


class MutualFixpointOp:
    """Vector fixpoint: incremental maintenance of SEVERAL mutually
    recursive monotone views ``R_n = base_n(I) ∪ step_n(I, R_1…R_k)``
    under input deltas — the reference maintains arbitrary nested
    circuits, where a recursive scope may export several mutually
    referencing streams (recursive.rs:255; the galen Datalog bench,
    crates/dbsp/benches/galen.rs, is mutually recursive rules).  This
    is :class:`IncrementalFixpointOp` with the accumulator, frontier,
    suspect and re-derivation sets each lifted to a dict keyed by view
    name; the three execution paths (semi-naive insert, DRed delete,
    recompute-and-diff fallback) round over ALL rules until every
    per-name frontier is empty.

    Callbacks all take/return ``{name: DataFrame}`` dicts:

    - ``base(full)`` — per-name seeds (must not read any recursive
      view);
    - ``step(full, acc)`` — per-name full step bodies over the current
      accumulator vector;
    - ``delta_base(full, d)`` / ``delta_step(full, d, acc)`` — every
      derivation using ≥1 delta atom of any INPUT (recursive atoms
      bound to ``acc``);
    - ``delta_step_out(full, s, acc)`` — every derivation using ≥1
      frontier atom of ANY recursive view from ``s``, remaining
      recursive atoms drawn from ``acc`` (for a rule body with one
      atom of view *m*, that's the body with *m* bound to ``s[m]``;
      a body with several atoms of the same view needs one variant
      per occurrence, exactly the non-linear contract of
      :class:`IncrementalFixpointOp`).

    Over-approximation is fine everywhere — the set fixpoint dedups."""

    def __init__(self, empty_input: dict, names: list[str],
                 empty_out: dict, base, step, delta_base, delta_step,
                 delta_step_out, max_iterations: int = 100):
        from database_stream_processor_spark.plans.incremental import (
            StateTable)
        self.names = list(names)
        self.base_fn, self.step_fn = base, step
        self.delta_base, self.delta_step = delta_base, delta_step
        self.delta_step_out = delta_step_out
        self.max_iterations = max_iterations
        self.inputs = list(empty_input)
        self._integrals = {k: StateTable(z, name=f"mutual_input_{k}")
                           for k, z in empty_input.items()}
        self._empty_out = empty_out          # {name: empty DataFrame}
        self._prev: dict | None = None       # {name: DataFrame}
        self.last_stats: dict | None = None

    def _currents(self):
        return {k: st.current.consolidate().rows()
                .localCheckpoint(eager=True)
                for k, st in self._integrals.items()}

    # ---- dict-of-DataFrame helpers (names of self.names) ----
    def _map(self, fn, *dicts):
        return {n: fn(*(d[n] for d in dicts)) for n in self.names}

    def _ckpt(self, m):
        return {n: df.localCheckpoint(eager=True) for n, df in m.items()}

    def _all_empty(self, m):
        return all(df.isEmpty() for df in m.values())

    def _total_count(self, m):
        return sum(df.count() for df in m.values())

    def step(self, delta, force_recompute: bool = False) -> "dict":
        """``{input: ZSetFrame | None}`` in, ``{name: ZSetFrame}``
        output deltas out.  ``force_recompute`` bypasses the semi-naive
        and DRed paths (same contract as
        :meth:`IncrementalFixpointOp.step` — for ticks touching an
        input whose role in the rules is not delta-linear)."""
        from database_stream_processor_spark.zset import ZSetFrame
        d = {k: z.consolidate() for k, z in delta.items()
             if z is not None}
        empties = {k: ZSetFrame(self._integrals[k].current.df.limit(0))
                   for k in self.inputs if k not in d}
        d.update(empties)
        insert_only = all(z.df.filter(z.weight < 0).isEmpty()
                          for z in d.values())
        if force_recompute:
            insert_only = False          # fall through to recompute
        if insert_only and self._prev is not None:
            return self._step_seminaive(d)
        if not insert_only and not force_recompute \
                and self._prev is not None:
            neg = {k: ZSetFrame(z.df.filter(z.weight < 0)).consolidate()
                   for k, z in d.items()}
            pos = {k: ZSetFrame(z.df.filter(z.weight > 0)).consolidate()
                   for k, z in d.items()}
            out = self._step_dred(neg)
            if any(not z.df.isEmpty() for z in pos.values()):
                pout = self._step_seminaive(pos)
                out = {n: out[n].plus(pout[n]).consolidate()
                       for n in self.names}
            return out
        for k, z in d.items():
            self._integrals[k].update(z)
        rows = self._currents()
        acc = self._ckpt(self._map(
            lambda df: df.dropDuplicates(), self.base_fn(rows)))
        for _ in range(self.max_iterations):
            stepped = self.step_fn(rows, acc)
            frontier = self._ckpt(self._map(
                lambda s, a: s.dropDuplicates().exceptAll(a),
                stepped, acc))
            if self._all_empty(frontier):
                break
            acc = self._ckpt(self._map(
                lambda a, f: a.unionByName(f), acc, frontier))
        else:
            raise RuntimeError("mutual fixpoint did not converge")
        if self._prev is None:
            diff = {n: ZSetFrame.from_df(acc[n], 1).consolidate()
                    for n in self.names}
        else:
            diff = {n: ZSetFrame.from_df(acc[n]
                                         .exceptAll(self._prev[n]), 1)
                    .plus(ZSetFrame.from_df(
                        self._prev[n].exceptAll(acc[n]), -1))
                    .consolidate()
                    for n in self.names}
        self._prev = acc
        self.last_stats = {"mode": "recompute", "rounds": None,
                           "new_rows": None}
        return diff

    def _step_seminaive(self, d) -> "dict":
        from database_stream_processor_spark.zset import ZSetFrame
        d_rows = {k: z.rows().localCheckpoint(eager=True)
                  for k, z in d.items()}
        for k, z in d.items():
            self._integrals[k].update(z)
        full = self._currents()
        acc = self._prev
        db = self.delta_base(full, d_rows)
        ds = self.delta_step(full, d_rows, acc)
        frontier = self._ckpt(self._map(
            lambda b, s, a: b.unionByName(s).dropDuplicates()
            .exceptAll(a), db, ds, acc))
        new = dict(frontier)
        rounds = 0
        with _loop_shuffle_partitions(next(iter(d_rows.values()))) \
                as resize:
            for _ in range(self.max_iterations):
                if self._all_empty(frontier):
                    break
                rounds += 1
                acc = self._ckpt(self._map(
                    lambda a, f: a.unionByName(f), acc, frontier))
                resize(self._total_count(frontier))
                stepped = self.delta_step_out(full, frontier, acc)
                frontier = self._ckpt(self._map(
                    lambda s, a: s.dropDuplicates().exceptAll(a),
                    stepped, acc))
                new = self._map(lambda a, f: a.unionByName(f),
                                new, frontier)
            else:
                raise RuntimeError(
                    "mutual semi-naive fixpoint did not converge")
        new = self._ckpt(new)
        self._prev = acc
        self.last_stats = {"mode": "seminaive", "rounds": rounds,
                           "new_rows": self._total_count(new)}
        return {n: ZSetFrame.from_df(new[n], 1).consolidate()
                for n in self.names}

    def _step_dred(self, dneg) -> "dict":
        """Vector delete-and-rederive — the scalar
        :meth:`IncrementalFixpointOp._step_dred` with suspects /
        keep / re-derivation sets per view name; both closures round
        until every per-name frontier is empty."""
        from database_stream_processor_spark.zset import ZSetFrame
        d_rows = {k: z.neg().rows().localCheckpoint(eager=True)
                  for k, z in dneg.items()}
        i_old = self._currents()
        for k, z in dneg.items():
            self._integrals[k].update(z)
        full = self._currents()
        acc = self._prev
        db = self.delta_base(i_old, d_rows)
        ds = self.delta_step(i_old, d_rows, acc)
        s = self._ckpt(self._map(
            lambda b, t, a: b.unionByName(t).dropDuplicates()
            .intersect(a), db, ds, acc))
        suspects = dict(s)
        s_rounds = 0
        with _loop_shuffle_partitions(next(iter(d_rows.values()))) \
                as resize:
            for _ in range(self.max_iterations):
                if self._all_empty(s):
                    break
                s_rounds += 1
                resize(self._total_count(s))
                stepped = self.delta_step_out(i_old, s, acc)
                s = self._ckpt(self._map(
                    lambda t, a, su: t.dropDuplicates().intersect(a)
                    .exceptAll(su), stepped, acc, suspects))
                suspects = self._ckpt(self._map(
                    lambda su, t: su.unionByName(t), suspects, s))
            else:
                raise RuntimeError(
                    "mutual DRed suspect closure did not converge")
            n_s = self._total_count(suspects)
            keep = self._ckpt(self._map(
                lambda a, su: a.exceptAll(su), acc, suspects))
            bn = self.base_fn(full)
            sk = self.step_fn(full, keep)
            red = self._ckpt(self._map(
                lambda b, t, su: b.intersect(su)
                .unionByName(t.intersect(su)).dropDuplicates(),
                bn, sk, suspects))
            frontier = dict(red)
            r_rounds = 0
            for _ in range(self.max_iterations):
                if self._all_empty(frontier):
                    break
                r_rounds += 1
                resize(n_s)
                ctx = self._map(lambda k_, r: k_.unionByName(r),
                                keep, red)
                stepped = self.delta_step_out(full, frontier, ctx)
                frontier = self._ckpt(self._map(
                    lambda t, su, r: t.dropDuplicates().intersect(su)
                    .exceptAll(r), stepped, suspects, red))
                red = self._ckpt(self._map(
                    lambda r, f: r.unionByName(f), red, frontier))
            else:
                raise RuntimeError(
                    "mutual DRed re-derivation did not converge")
        dead = self._ckpt(self._map(
            lambda su, r: su.exceptAll(r), suspects, red))
        self._prev = self._ckpt(self._map(
            lambda k_, r: k_.unionByName(r), keep, red))
        self.last_stats = {"mode": "dred", "suspects": n_s,
                           "rounds": s_rounds + r_rounds,
                           "new_rows": None}
        return {n: ZSetFrame.from_df(dead[n], -1).consolidate()
                for n in self.names}

    @property
    def current(self) -> "dict | None":
        return self._prev


class ZSetBagFixpointOp:
    """UNION ALL (bag) recursion as a Z-set LINEAR fixpoint: the output
    solves ``R = base(I) ⊎ step(I, R)`` with multiplicities = number of
    derivation paths — the reference's weighted recursion (Z-set
    weights ARE derivation counts; recursive.rs:255, vldb23 §5), which
    is exactly standard SQL's ``WITH RECURSIVE … UNION ALL`` working-
    table semantics: ``R = Σ_k step^k(base)``.

    ``z_base(ΔI) -> ZSetFrame`` must be linear in I, ``z_step(I, R) ->
    ZSetFrame`` bilinear in (I, R) — weighted relational algebra with
    no distinct/aggregation.  Because everything is linear over the
    weight ring, the per-tick delta solves the SAME equation restricted
    to deltas:

        ΔR = Σ_k  S(I_new)^k ( Δbase(ΔI) ⊎ step(ΔI, R_old) )

    evaluated semi-naively (seed, then rounds ``f ← step(I_new, f)``
    until ``f`` consolidates to ∅).  Inserts AND deletes flow through
    the same path — negative weights propagate and cancel; **no DRed is
    needed**, the ring does the retraction arithmetic.  This is the
    capability the set-semantics fixpoint cannot express (multiplicity
    = path count) and the reason DBSP computes over Z-sets at all.

    ``z_step_delta(ΔI, R_old)`` must return exactly the derivations
    using the ΔI atom (default: ``z_step`` itself — correct when the
    step branch references the input; pass an empty-returning callback
    when it does not, or the seed would double-count).

    **Multi-input mode** (the reference's weighted recursion imports
    several parent streams, delta0.rs:21 + recursive.rs:255): pass
    ``empty_input`` as a dict ``{name: empty ZSetFrame}`` plus
    ``base_tbls`` / ``step_tbls`` — the ORDERED lists of input
    OCCURRENCES each branch references.  An occurrence is either a
    plain input name (referenced once, bound under its own name) or a
    ``(binding_name, input_name)`` pair — the same input referenced at
    several atom positions in one branch appears once PER POSITION,
    each under a DISTINCT binding name (the caller splices the branch
    text accordingly).  Callbacks then take binding maps keyed by
    binding names: ``z_base({bind: DataFrame})``, ``z_step({bind:
    DataFrame}, R)``; ``step(delta)`` takes ``{input: ZSetFrame |
    None}`` (None = unchanged).  The per-tick seed expands
    multilinearly over each branch's occurrences — leg *i* binds
    occurrences before *i* to their input's NEW integral, occurrence
    *i* to its input's delta, occurrences after *i* to the OLD integral
    (the telescoping sum Δ(A⊗B) = ΔA⊗B_old + A_new⊗ΔB, the bilinear
    Z-set join delta of join.rs:226 iterated; a repeated input mixes
    old and new of the SAME relation across its positions — that is
    why the bindings must be distinct, r11 verdict ask #2b) — so
    inserts and deletes still flow through ONE linear path with ring
    cancellation, no DRed, and the expansion stays EXACT (each
    derivation counted once).  A branch with an empty ``base_tbls``
    (constant base) contributes once, on the first tick.

    Termination requires finitely many derivation paths per fact
    (acyclic derivations): on a cyclic graph standard UNION ALL
    recursion itself diverges, and this op faithfully raises instead of
    silently converging to the wrong (set) answer."""

    def __init__(self, empty_input, empty_output, z_base, z_step,
                 z_step_delta=None, base_tbls=None, step_tbls=None,
                 max_iterations: int = 100):
        from database_stream_processor_spark.plans.incremental import (
            StateTable)
        self._multi = isinstance(empty_input, dict)
        self.z_base, self.z_step = z_base, z_step
        self.z_step_delta = (z_step_delta if z_step_delta is not None
                             else z_step)
        self.max_iterations = max_iterations
        if self._multi:
            self.inputs = list(empty_input)
            self._integrals = {
                k: StateTable(z, name=f"bag_fixpoint_input_{k}")
                for k, z in empty_input.items()}
            self.integral = self._integrals
            occ = lambda e: (e, e) if isinstance(e, str) else tuple(e)
            self._base_occs = [occ(e) for e in (base_tbls or [])]
            self._step_occs = [occ(e) for e in (step_tbls or [])]
            self._base_done = False
        else:
            self.integral = StateTable(empty_input,
                                       name="bag_fixpoint_input")
        self._empty_out = empty_output
        self._acc = None
        self.last_stats: dict | None = None

    def _seed_multi(self, delta) -> "object":
        """Multilinear delta seed: one leg per (branch, input
        OCCURRENCE), old/new mixing per the telescoping expansion;
        untouched inputs (delta None) contribute nothing and schedule
        no jobs.  A repeated input's positions carry distinct binding
        names, so leg *i* can bind position *i* to the delta while
        earlier/later positions of the SAME input read its new/old
        integral — the exact expansion, no double counting."""
        from database_stream_processor_spark.zset import ZSetFrame
        d = {k: (delta.get(k).consolidate()
                 if delta.get(k) is not None else None)
             for k in self.inputs}
        old = {k: st.current.consolidate().df
               for k, st in self._integrals.items()}
        new = {}
        for k in self.inputs:
            if d[k] is not None:
                self._integrals[k].update(d[k])
            new[k] = self._integrals[k].current.consolidate().df
        newb = {b: new[t] for b, t in self._base_occs + self._step_occs}
        # inputs with no occurrence binding (subquery-role atoms —
        # referenced only inside (NOT) EXISTS / IN spans) stay bound
        # under their OWN name to the NEW integral: legs only run on
        # ticks that leave them untouched (new == old), their changes
        # route through _step_recompute
        newb.update({t: new[t] for t in self.inputs})

        def leg(occs, i):
            b = dict(newb)
            for j, (bn, t) in enumerate(occs):
                b[bn] = new[t] if j < i else (d[t].df if j == i
                                              else old[t])
            return b

        first = self._acc is None
        acc_old = self._empty_out if first else self._acc
        seed = ZSetFrame(self._empty_out.df)
        if self._base_occs:
            for i, (bn, t) in enumerate(self._base_occs):
                if d[t] is None:
                    continue
                seed = seed.plus(self.z_base(leg(self._base_occs, i)))
        elif not self._base_done:
            # constant base: contributes once, on the first tick
            seed = seed.plus(self.z_base(dict(newb)))
        self._base_done = True
        for i, (bn, t) in enumerate(self._step_occs):
            if d[t] is None:
                continue
            seed = seed.plus(
                self.z_step(leg(self._step_occs, i), acc_old))
        return seed.consolidate(), newb

    def _step_recompute(self, delta) -> "object":
        """Full weighted fixpoint from the updated integrals, diffed
        against the previous accumulator IN THE RING (new ⊕ old⁻¹) —
        for ticks touching an input whose role in the rules is not
        delta-linear (a subquery-role atom: rebinding it to a delta
        would evaluate the subquery against the delta).  Multi-input
        mode only; the diff is exact because Z-set subtraction is."""
        from database_stream_processor_spark.zset import ZSetFrame
        d = {k: (delta.get(k).consolidate()
                 if delta.get(k) is not None else None)
             for k in self.inputs}
        for k in self.inputs:
            if d[k] is not None:
                self._integrals[k].update(d[k])
        new = {k: st.current.consolidate().df
               for k, st in self._integrals.items()}
        newb = {b: new[t]
                for b, t in self._base_occs + self._step_occs}
        newb.update({t: new[t] for t in self.inputs})
        acc_old = self._empty_out if self._acc is None else self._acc
        f = self.z_base(dict(newb)).consolidate()
        f = ZSetFrame(f.df.localCheckpoint(eager=True))
        total = f
        rounds = 0
        with _loop_shuffle_partitions(f.df) as resize:
            for _ in range(self.max_iterations):
                if f.df.isEmpty():
                    break
                rounds += 1
                resize(f.df.count())
                f = self.z_step(dict(newb), f).consolidate()
                f = ZSetFrame(f.df.localCheckpoint(eager=True))
                total = total.plus(f)
            else:
                raise RuntimeError(
                    "bag fixpoint did not converge in "
                    f"{self.max_iterations} rounds (cyclic derivations "
                    "make UNION ALL recursion itself infinite)")
        total = total.consolidate()
        total = ZSetFrame(total.df.localCheckpoint(eager=True))
        self._base_done = True
        diff = total.plus(acc_old.neg()).consolidate()
        self._acc = total
        self.last_stats = {"mode": "bag-recompute", "rounds": rounds}
        return diff

    def step(self, delta, force_recompute: bool = False) -> "object":
        from database_stream_processor_spark.zset import ZSetFrame
        if force_recompute:
            assert self._multi, "recompute path is multi-input only"
            return self._step_recompute(delta)
        acc_old = self._empty_out if self._acc is None else self._acc
        if self._multi:
            seed, i_new = self._seed_multi(delta)
        else:
            d = delta.consolidate()
            i_new = self.integral.update(d).consolidate()
            seed = (self.z_base(d).plus(self.z_step_delta(d, acc_old))
                    .consolidate())
        f = ZSetFrame(seed.df.localCheckpoint(eager=True))
        total = f
        rounds = 0
        with _loop_shuffle_partitions(f.df) as resize:
            for _ in range(self.max_iterations):
                if f.df.isEmpty():
                    break
                rounds += 1
                resize(f.df.count())
                f = self.z_step(i_new, f).consolidate()
                f = ZSetFrame(f.df.localCheckpoint(eager=True))
                total = total.plus(f)
            else:
                raise RuntimeError(
                    "bag fixpoint did not converge in "
                    f"{self.max_iterations} rounds (cyclic derivations "
                    "make UNION ALL recursion itself infinite)")
        total = total.consolidate()
        total = ZSetFrame(total.df.localCheckpoint(eager=True))
        self._acc = ZSetFrame(acc_old.plus(total).consolidate()
                              .df.localCheckpoint(eager=True))
        self.last_stats = {"mode": "bag-linear", "rounds": rounds}
        return total

    @property
    def current(self) -> "object | None":
        return self._acc


class VectorBagFixpointOp:
    """MUTUAL (vector) UNION ALL recursion over Z-sets: members
    ``R_1..R_k`` jointly solve ``R_m = Σ_b branch_b(I, R)`` with
    multiplicities = derivation paths — the bag analog of
    :class:`MutualFixpointOp` (the reference maintains nested circuits
    exporting several mutually referencing weighted streams,
    recursive.rs:255; vldb23 §5).  Because the weight ring does the
    retraction arithmetic, this is STRICTLY simpler than the set
    vector fixpoint: no DRed, no suspects — inserts and deletes flow
    through the one linear path and cancel.

    ``branches`` is a flat list of rules, each a dict:

    - ``member``: which R_m the rule feeds;
    - ``eval``: ``callable({bind: DataFrame}) -> ZSetFrame`` — the
      weighted branch body over its bindings;
    - ``occs``: ordered ``[(binding_name, input_name)]`` input atom
      occurrences (a repeated input appears once per position, distinct
      binding names — the caller splices);
    - ``rec``: ``(binding_name, member_name)`` for the ONE member atom
      of a step rule, ``None`` for a base rule.  Rules must be LINEAR
      in the member vector (at most one member atom): the per-round
      frontier propagation ``f'_m = Σ_b b(I_new, f_{j(b)})`` is then
      exact, and the tick delta solves ``Δ = Σ_k T^k(seed)`` for the
      linear member-matrix ``T`` — the vector telescoping identity.

    Per tick: input integrals update; the seed expands multilinearly
    over each rule's input occurrences (earlier positions new, position
    *i* the delta, later positions old; the member atom — the LAST
    conceptual occurrence — stays on the OLD accumulator, matching the
    single-member :class:`ZSetBagFixpointOp`); rounds then propagate
    member frontiers until every member's frontier consolidates to ∅.
    Termination requires finitely many derivation paths (acyclic
    derivations) — cyclic derivation graphs make UNION ALL recursion
    itself infinite, and the op raises rather than silently converging
    to the wrong (set) answer."""

    def __init__(self, empty_inputs: dict, members: list[str],
                 empty_out: dict, branches: list[dict],
                 max_iterations: int = 100):
        from database_stream_processor_spark.plans.incremental import (
            StateTable)
        self.members = list(members)
        self.inputs = list(empty_inputs)
        self._integrals = {
            k: StateTable(z, name=f"vbag_fixpoint_input_{k}")
            for k, z in empty_inputs.items()}
        self.integral = self._integrals
        self._branches = list(branches)
        self._empty_out = dict(empty_out)
        self.max_iterations = max_iterations
        self._acc: dict | None = None
        self._base_done = False
        self.last_stats: dict | None = None

    def step(self, delta: dict) -> dict:
        from database_stream_processor_spark.zset import ZSetFrame
        d = {k: (delta.get(k).consolidate()
                 if delta.get(k) is not None else None)
             for k in self.inputs}
        old = {k: st.current.consolidate().df
               for k, st in self._integrals.items()}
        new = {}
        for k in self.inputs:
            if d[k] is not None:
                self._integrals[k].update(d[k])
            new[k] = self._integrals[k].current.consolidate().df
        first = self._acc is None
        acc_old = (self._empty_out if first else self._acc)
        seed = {m: ZSetFrame(self._empty_out[m].df)
                for m in self.members}
        for br in self._branches:
            occs, rec = br["occs"], br["rec"]
            if not occs:
                # constant base rule: contributes once, on the first
                # tick; an input-less STEP rule changes only through
                # its member atom — the rounds propagate it, no seed leg
                if rec is None and not self._base_done:
                    seed[br["member"]] = seed[br["member"]].plus(
                        br["eval"]({}))
                continue
            for i, (bn, t) in enumerate(occs):
                if d[t] is None:
                    continue
                b = {b2: new[t2] for b2, t2 in occs}
                for j, (bj, tj) in enumerate(occs):
                    b[bj] = new[tj] if j < i else (d[tj].df if j == i
                                                   else old[tj])
                if rec is not None:
                    b[rec[0]] = acc_old[rec[1]].df
                seed[br["member"]] = seed[br["member"]].plus(
                    br["eval"](b))
        self._base_done = True
        f, total = {}, {}
        for m in self.members:
            f[m] = ZSetFrame(seed[m].consolidate()
                             .df.localCheckpoint(eager=True))
            total[m] = f[m]
        rounds = 0
        with _loop_shuffle_partitions(f[self.members[0]].df) as resize:
            for _ in range(self.max_iterations):
                counts = {m: f[m].df.count() for m in self.members}
                if not any(counts.values()):
                    break
                rounds += 1
                resize(sum(counts.values()))
                nxt = {m: ZSetFrame(self._empty_out[m].df)
                       for m in self.members}
                for br in self._branches:
                    if br["rec"] is None:
                        continue
                    bn, mj = br["rec"]
                    if not counts[mj]:
                        continue
                    b = {b2: new[t2] for b2, t2 in br["occs"]}
                    b[bn] = f[mj].df
                    nxt[br["member"]] = nxt[br["member"]].plus(
                        br["eval"](b))
                for m in self.members:
                    nxt[m] = ZSetFrame(nxt[m].consolidate()
                                       .df.localCheckpoint(eager=True))
                    total[m] = total[m].plus(nxt[m])
                f = nxt
            else:
                raise RuntimeError(
                    "mutual bag fixpoint did not converge in "
                    f"{self.max_iterations} rounds (cyclic derivations "
                    "make UNION ALL recursion itself infinite)")
        out = {}
        acc_new = {}
        for m in self.members:
            out[m] = ZSetFrame(total[m].consolidate()
                               .df.localCheckpoint(eager=True))
            acc_new[m] = ZSetFrame(
                acc_old[m].plus(out[m]).consolidate()
                .df.localCheckpoint(eager=True))
        self._acc = acc_new
        self.last_stats = {"mode": "bag-linear", "rounds": rounds}
        return out

    @property
    def current(self) -> "dict | None":
        return self._acc


def iterate_until(seed: DataFrame, step: Callable[[DataFrame], DataFrame],
                  condition: Callable[[DataFrame], bool],
                  max_iterations: int = 100) -> DataFrame:
    """``iterate_with_condition`` (src/operator/condition.rs:22-100): apply
    ``step`` repeatedly until ``condition(current)`` holds.  The general
    form of :func:`fixpoint` for non-monotone iterations (e.g. numeric
    convergence); the caller's condition is responsible for termination."""
    acc = seed.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        if condition(acc):
            return acc
        acc = step(acc).localCheckpoint(eager=True)
    raise RuntimeError(f"iterate_until did not converge in {max_iterations} iterations")

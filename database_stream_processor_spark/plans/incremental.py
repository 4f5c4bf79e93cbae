"""Incremental operator forms — the DBSP calculus on Spark state tables.

The reference engine makes every operator *incremental*: given a stream of
input deltas it emits the stream of output deltas, with cost proportional to
the delta, not the accumulated database (reference README.md:65-68).  The
building blocks (SURVEY.md §2.8):

- ``integrate`` — running sum of deltas = the current relation
  (src/operator/integrate.rs:67);
- ``differentiate`` — snapshots → deltas (src/operator/differentiate.rs:24);
- ``z1``/``delay`` — previous step's value (src/operator/z1.rs);
- traces — accumulated indexed state queried by joins/aggregates
  (src/operator/trace.rs:173-238).

Spark re-expression: each stateful operator owns one or more
:class:`StateTable` objects (DataFrames materialized per step; at cluster
scale these are partitioned Parquet/Delta tables MERGE'd by key so a step
touches only the partitions its delta hits).  A "clock tick" = one call to
``step()`` = one micro-batch.  The same operator objects are driven either
by a batch loop (tests) or by Structured Streaming ``foreachBatch``
(streaming/driver.py).

Scale notes (100 TB design):

- State is only ever accessed via *joins on the delta's keys* — with state
  partitioned/bucketed by those keys this is a partition-pruned, shuffle-free
  lookup of the touched partitions, never a full state scan.
- All deltas and state are DataFrames; nothing collects to the driver.
- ``StateTable.update`` consolidates (hash agg) — map-side partial
  aggregation keeps shuffle volume ∝ |delta|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from database_stream_processor_spark.zset import WEIGHT_COL, ZSetFrame


def _ns_semi(df: DataFrame, touched: DataFrame, keys: Sequence[str],
             how: str = "left_semi") -> DataFrame:
    """Null-safe left-semi (or anti) join of ``df`` on ``touched``'s keys.

    SQL GROUP BY (and outer joins) treat NULL as a real key value; Spark's
    column-list equi-join drops NULL matches, so touched-group restriction
    through a plain semi-join would silently never maintain the NULL group.
    """
    probe = touched.select(*[F.col(c).alias(f"__t_{c}") for c in keys])
    cond = None
    for c in keys:
        e = df[c].eqNullSafe(F.col(f"__t_{c}"))
        cond = e if cond is None else (cond & e)
    return df.join(probe, on=cond, how=how)


class StateTable:
    """Materialized Z-set state for one operator (DBSP trace / Spine analog,
    src/trace/spine_fueled.rs:1-60).

    Two backends:

    - ``memory`` (default): keeps a cached DataFrame, re-materialized with
      ``localCheckpoint`` each update so lineage doesn't grow unboundedly
      across steps (the Spark analog of the Spine's background merge).
    - ``parquet``: persists to a directory, alternating between two
      subdirectories (read from one, write the other).  This is the
      cluster-scale backend — state survives the session, reads are
      partition-pruned when ``partition_by`` is set.
    """

    def __init__(self, empty: ZSetFrame, name: str = "state",
                 path: str | None = None,
                 partition_by: Sequence[str] | None = None,
                 materialize_every: int = 1,
                 consolidate_every: int = 1,
                 recover: bool = False):
        self.name = name
        self.path = path
        self.partition_by = list(partition_by or [])
        self.materialize_every = materialize_every
        #: Spine-style fueled merge (spine_fueled.rs:1-60): appended deltas
        #: are NOT hash-consolidated on every update — weights are additive,
        #: so readers (joins/linear aggregates/distinct) are correct on the
        #: unmerged union; we pay the groupBy only every Nth update.
        self.consolidate_every = consolidate_every
        self._epoch = 0
        self._spark = empty.df.sparkSession
        self._schema = empty.df.schema
        self._current: ZSetFrame = ZSetFrame(empty.df.limit(0))
        #: deltas queued by :meth:`defer_update`, not yet folded into the
        #: materialized state; and the count of deltas ever folded (the
        #: read-tracking bookkeeping for pre-tick snapshot marks)
        self._deferred: list[ZSetFrame] = []
        self._seq = 0
        if path:
            # namespace by table name: one operator owns several tables and
            # may pass them all the same base path
            self.path = path.rstrip("/") + "/" + name
            fs, jvm = self._hadoop_fs()
            fs.mkdirs(jvm.org.apache.hadoop.fs.Path(self.path))
            if recover:
                self._recover()

    def _hadoop_fs(self):
        """Hadoop FileSystem for ``self.path`` — state may live on any DFS
        (S3/HDFS/local); driver-local ``os``/``shutil`` would silently
        corrupt GC the moment the path isn't a local directory."""
        jvm = self._spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        return jpath.getFileSystem(
            self._spark._jsc.hadoopConfiguration()), jvm

    def _list_epochs(self) -> list[int]:
        fs, jvm = self._hadoop_fs()
        base = jvm.org.apache.hadoop.fs.Path(self.path)
        if not fs.exists(base):
            return []
        epochs = []
        for st in fs.listStatus(base):
            name = st.getPath().getName()
            if name.startswith("epoch="):
                try:
                    epochs.append(int(name.split("=", 1)[1]))
                except ValueError:
                    pass
        return epochs

    def _recover(self) -> None:
        """Resume from the latest persisted epoch — the reference's
        persistent-trace recovery (src/trace/persistent/mod.rs:2-89: traces
        reopen from storage and the circuit continues stepping).  Works
        from any session: the parquet layout is self-describing."""
        epochs = self._list_epochs()
        if not epochs:
            return
        self._epoch = max(epochs)
        df = self._spark.read.parquet(
            f"{self.path}/epoch={self._epoch}")
        self._current = ZSetFrame(df.select(
            *[F.col(f.name).cast(f.dataType) for f in self._schema.fields]))

    @property
    def current(self) -> ZSetFrame:
        """Materialized current state.  Reading it folds any deltas queued
        by :meth:`defer_update` first — accessing ``current`` IS the read
        that read-tracking materialization triggers on."""
        self._fold()
        return self._current

    def defer_update(self, delta: ZSetFrame) -> None:
        """Queue ``delta`` without materializing the merged state (§5:
        state that nothing reads this tick schedules no job).  The fold
        into a materialized state happens on the first :attr:`current`
        read — k queued deltas then fold in ONE materialization instead
        of k.  Until then :meth:`peek` serves the logical state as a lazy
        plan.  Memory backend only: the parquet backend's per-epoch write
        is the durability contract, so callers must not defer it."""
        if set(delta.df.columns) != {f.name for f in self._schema.fields}:
            raise ValueError(
                f"state table `{self.name}` columns "
                f"{sorted(f.name for f in self._schema.fields)} != delta columns "
                f"{sorted(delta.df.columns)}")
        self._deferred.append(delta)

    def _fold(self, upto: int | None = None) -> None:
        """Fold the first ``upto`` queued deltas (default: all) into the
        materialized state via one :meth:`update`."""
        k = len(self._deferred) if upto is None else upto
        if k <= 0:
            return
        batch = self._deferred[:k]
        del self._deferred[:k]
        self._seq += k
        self.update(ZSetFrame.sum(batch))

    def peek(self) -> ZSetFrame:
        """Logical current state (materialized ∪ queued deltas) as a LAZY
        plan — never schedules a job, never folds.  With nothing queued
        this is exactly the materialized state; otherwise the plan
        consolidates so ``rows()`` nets queued retractions correctly
        (weights are ints, so the fold is bit-exact under any layout)."""
        if not self._deferred:
            return self._current
        return self._current.plus(
            ZSetFrame.sum(self._deferred)).consolidate()

    def replace(self, new_state: ZSetFrame) -> ZSetFrame:
        """state ← ``new_state`` verbatim (no union with the old state).

        For operators that rebuild the full state frame themselves as
        ``untouched-rows ∪ replacement-rows`` (disjoint by key), this
        skips :meth:`update`'s state-wide union + consolidate shuffle —
        the caller's plan typically reaches the old checkpoint through
        broadcast-able delta-sized joins only, so the materialization is
        a single exchange-free job (guide §2.4).  The caller guarantees
        the frame is already weight-consolidated."""
        if set(new_state.df.columns) != {f.name for f in self._schema.fields}:
            raise ValueError(
                f"state table `{self.name}` columns "
                f"{sorted(f.name for f in self._schema.fields)} != replacement "
                f"columns {sorted(new_state.df.columns)}")
        self._current = self._materialize(new_state)
        return self._current

    def update(self, delta: ZSetFrame) -> ZSetFrame:
        """state ← state + delta (merged lazily); returns the new state."""
        if set(delta.df.columns) != {f.name for f in self._schema.fields}:
            raise ValueError(
                f"state table `{self.name}` columns "
                f"{sorted(f.name for f in self._schema.fields)} != delta columns "
                f"{sorted(delta.df.columns)}")
        merged = self._current.plus(delta)
        if (self._epoch + 1) % self.consolidate_every == 0:
            merged = merged.consolidate()
        self._current = self._materialize(merged)
        return self._current

    def _materialize(self, z: ZSetFrame) -> ZSetFrame:
        self._epoch += 1
        if self.path:
            out = f"{self.path}/epoch={self._epoch}"
            writer = z.df.write.mode("overwrite")
            if self.partition_by:
                writer = writer.partitionBy(*self.partition_by)
            writer.parquet(out)
            # read back WITHOUT a forced schema (partition columns are
            # appended by the reader), then rebind by name to the declared
            # column order/types
            df = self._spark.read.parquet(out)
            df = df.select(*[F.col(f.name).cast(f.dataType)
                             for f in self._schema.fields])
            # GC epochs older than N-1: the previous epoch must survive one
            # step (readers like DistinctOp hold the old snapshot), anything
            # older is dead — without this, long streaming runs grow disk
            # without bound (the reference's persistent trace compacts,
            # src/trace/persistent/mod.rs:2-89).  Deletion goes through the
            # Hadoop FS API so the path may be S3/HDFS, not just local.
            fs, jvm = self._hadoop_fs()
            for n in self._list_epochs():
                if n < self._epoch - 1:
                    fs.delete(jvm.org.apache.hadoop.fs.Path(
                        f"{self.path}/epoch={n}"), True)
            return ZSetFrame(df)
        # memory backend: cut lineage so N steps don't stack N plans.
        # materialize_every > 1 trades lineage depth for fewer Spark jobs —
        # right for short incremental runs where each state is read once.
        # Small states materialize with AQE off + exact shuffle sizing
        # (tuning.checkpoint_small): one scheduled job instead of one per
        # exchange — at scale the size gate keeps AQE on.
        if self._epoch % self.materialize_every == 0:
            from database_stream_processor_spark.tuning import (
                checkpoint_small)
            return ZSetFrame(checkpoint_small(z.df, eager=True))
        return z


class LinearOp:
    """Stateless incremental form of any linear operator: the delta passes
    straight through ``f`` (reference: src/operator/filter_map.rs:1 — linear
    operators are incremental as-is)."""

    def __init__(self, f):
        self.f = f

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        return self.f(delta)


class IntegrateOp:
    """Running sum of deltas = current relation (integrate.rs:67)."""

    def __init__(self, empty: ZSetFrame, **state_kw):
        self.state = StateTable(empty, name="integral", **state_kw)

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        return self.state.update(delta)


class DifferentiateOp:
    """Inverse of integrate: successive snapshots → deltas
    (differentiate.rs:24,39).  delta_t = snapshot_t − snapshot_{t-1}."""

    def __init__(self, empty: ZSetFrame, **state_kw):
        self.prev = StateTable(empty, name="prev_snapshot", **state_kw)

    def step(self, snapshot: ZSetFrame) -> ZSetFrame:
        delta = snapshot.minus(self.prev.current).consolidate()
        # z^-1: remember this snapshot for the next tick
        self.prev._current = self.prev._materialize(snapshot.consolidate())
        return delta


class JoinOp:
    """Incremental equi-join via the bilinear formula
    Δ(A⋈B) = ΔA⋈B_old + A_old⋈ΔB + ΔA⋈ΔB = ΔA⋈B_new + A_old⋈ΔB
    (reference: src/operator/join.rs:121-292, formula comment 226-264).

    Cost per step ∝ |ΔA|·|matching B| + |A matching|·|ΔB| — never a full
    A⋈B recompute.  With both state tables partitioned on the join key the
    two delta-joins are partition-pruned lookups.
    """

    def __init__(self, empty_left: ZSetFrame, empty_right: ZSetFrame,
                 on: Sequence[str], how: str = "inner",
                 broadcast: str | None = None,
                 left_state_kw: dict | None = None,
                 right_state_kw: dict | None = None, **state_kw):
        if how not in ("inner", "left_outer", "right_outer", "full_outer"):
            raise ValueError(f"JoinOp: unsupported how={how!r}")
        self.on = list(on)
        self.how = how
        # outer joins are NOT bilinear (the null-padded rows appear/vanish
        # as the other side's key support changes), so they use the
        # touched-key recompute idiom instead of the delta-join formula:
        # restrict both integrals to keys touched by either delta, recompute
        # the outer join there, diff against the old output restricted to
        # the same keys (reference builds outer join as inner join + two
        # antijoins, join.rs:338-361; the antijoin legs are what breaks
        # bilinearity).  Cost ∝ touched keys' data, partition-pruned at
        # scale.
        self._out_state: StateTable | None = None
        #: 'left' | 'right' — hint that one side's *state* is small enough to
        #: broadcast (dimension-table pattern); Catalyst then plans the delta
        #: joins shuffle-free.  AQE would often discover this, but state built
        #: from in-memory unions can lack size stats, so the hint matters.
        self.broadcast = broadcast
        # bilinear delta-join is weight-additive → spine-style lazy merge
        state_kw.setdefault("consolidate_every", 4)
        left_kw = {**state_kw, **(left_state_kw or {})}
        right_kw = {**state_kw, **(right_state_kw or {})}
        self.left = StateTable(empty_left, name="join_left", **left_kw)
        self.right = StateTable(empty_right, name="join_right", **right_kw)
        # deferred state writes: a side's integral is only READ when the
        # *other* side delivers a delta, so deltas queue here and fold in
        # just before that read.  A fact stream joining a forever-static
        # dimension never materializes its (huge) integral at all.
        self._left_pending: list[ZSetFrame] = []
        self._right_pending: list[ZSetFrame] = []

    def _flush(self, state: StateTable, pending: list[ZSetFrame]) -> None:
        if pending:
            state.update(ZSetFrame.sum(pending).consolidate())
            pending.clear()

    def step(self, delta_left: ZSetFrame | None,
             delta_right: ZSetFrame | None) -> ZSetFrame:
        """Advance one tick.  ``None`` for a side means "no changes": that
        leg of the bilinear formula is skipped entirely — no join, no state
        write — so a static dimension side costs nothing per step."""
        if self.how != "inner":
            return self._step_outer(delta_left, delta_right)
        parts = []
        if delta_right is not None:
            # a_old (pre-dl left integral) is about to be read: flush
            self._flush(self.left, self._left_pending)
            a_old = self.left.current
        if delta_left is not None:
            self._flush(self.right, self._right_pending)
            b_new = (self.right.update(delta_right)
                     if delta_right is not None else self.right.current)
            self._left_pending.append(delta_left)
            rhs = b_new
            if self.broadcast == "right":
                rhs = ZSetFrame(F.broadcast(b_new.df))
            parts.append(delta_left.join(rhs, on=self.on, how="inner"))
        elif delta_right is not None:
            self._right_pending.append(delta_right)
        if delta_right is not None:
            lhs = a_old
            if self.broadcast == "left":
                lhs = ZSetFrame(F.broadcast(a_old.df))
            parts.append(lhs.join(delta_right, on=self.on, how="inner"))
        if not parts:
            raise ValueError("JoinOp.step: both deltas are None")
        out = parts[0]
        for p in parts[1:]:
            out = out.plus(p)
        return out.consolidate()

    def _step_outer(self, delta_left: ZSetFrame | None,
                    delta_right: ZSetFrame | None) -> ZSetFrame:
        if delta_left is None and delta_right is None:
            raise ValueError("JoinOp.step: both deltas are None")
        # outer recompute reads both integrals every step
        self._flush(self.left, self._left_pending)
        self._flush(self.right, self._right_pending)
        a_new = (self.left.update(delta_left) if delta_left is not None
                 else self.left.current)
        b_new = (self.right.update(delta_right) if delta_right is not None
                 else self.right.current)
        touched_dfs = [d.df.select(*self.on) for d in
                       (delta_left, delta_right) if d is not None]
        touched = touched_dfs[0]
        for t in touched_dfs[1:]:
            touched = touched.unionByName(t)
        touched = touched.dropDuplicates()

        # null-safe touched-key restriction: a plain equi semi-join would
        # drop rows whose join key is NULL, so their null-padded outer rows
        # would never be emitted or retracted (plain Spark outer joins DO
        # preserve null-key rows — they just never match the other side).
        def semi(df):
            return _ns_semi(df, touched, self.on)

        a_t = ZSetFrame(semi(a_new.df))
        b_t = ZSetFrame(semi(b_new.df))
        new_out = a_t.join(b_t, on=self.on, how=self.how)

        if self._out_state is None:
            self._out_state = StateTable(ZSetFrame(new_out.df.limit(0)),
                                         name="outer_join_output")
            old_out = ZSetFrame(new_out.df.limit(0))
        else:
            old_out = ZSetFrame(semi(self._out_state.current.df))
        out_delta = new_out.minus(old_out).consolidate()
        self._out_state.update(out_delta)
        return out_delta


class MonotonicStreamJoinOp:
    """Stream-stream equi-join specialized for *monotonic* (append-only)
    inputs (reference: join.rs:87 ``monotonic_stream_join`` — no
    retractions can arrive, so no output consolidation is needed and,
    given a time-bound match window, state ages out).

    Matches are restricted to ``|left_ts − right_ts| ≤ window_seconds``.
    The watermark (max event time seen across both inputs − delay) is
    derived inside the step's plan; each side's state below
    ``wm − window`` is evicted — those rows can never match a future row,
    the exact state-cleanup contract of Spark's native stream-stream join
    (streaming/joins.py is the ``readStream`` binding of this operator).

    ``left_ts``/``right_ts`` must be distinct column names (both survive
    into the output).  Per-step output = ΔA⋈B + A⋈ΔB within the window —
    weight-1 rows, emitted without a consolidation shuffle.
    """

    def __init__(self, empty_left: ZSetFrame, empty_right: ZSetFrame,
                 on: Sequence[str], left_ts: str, right_ts: str,
                 window_seconds: int, watermark_delay: int | None = None,
                 **state_kw):
        if left_ts == right_ts:
            raise ValueError("left_ts and right_ts must be distinct names")
        self.on = list(on)
        self.lts, self.rts = left_ts, right_ts
        self.window = window_seconds
        self.delay = watermark_delay
        self.left = StateTable(empty_left, name="mono_join_left", **state_kw)
        self.right = StateTable(empty_right, name="mono_join_right",
                                **state_kw)
        # per-side eviction counters: a shared counter incremented once per
        # side per step would only ever hit the %-period on one side, so a
        # delta-less side would never have its filter-on-filter lineage cut
        self._evict_count: dict[int, int] = {}

    def _wm_df(self):
        """Watermark = max event time in *state* − delay, as a broadcast
        1-row DataFrame (no driver round-trip).  Derived from state only,
        so it lags one step — exactly Spark's streaming watermark, which
        advances at batch boundaries; NULL (empty state) disables both
        late-drop and eviction via the coalesce guard."""
        def ts(df, col):
            return df.select(F.unix_timestamp(F.col(col)).alias("__t"))
        u = ts(self.left.current.df, self.lts).unionByName(
            ts(self.right.current.df, self.rts))
        wm = F.coalesce(F.max("__t") - self.delay, F.lit(-(1 << 60)))
        return F.broadcast(u.agg(wm.alias("__wm")))

    def _evict(self, state: StateTable, ts_col: str, wmb) -> None:
        t = F.unix_timestamp(F.col(ts_col))
        evicted = ZSetFrame(
            state.current.df.crossJoin(wmb)
            .filter(t >= F.col("__wm") - self.window).drop("__wm"))
        # a side that receives no deltas never passes through
        # StateTable._materialize, so this filter-on-filter plan would grow
        # one layer per tick; cut lineage periodically even without updates
        key = id(state)
        self._evict_count[key] = self._evict_count.get(key, 0) + 1
        if self._evict_count[key] % 4 == 0:
            evicted = state._materialize(evicted)
        state._current = evicted

    def _drop_late(self, delta: ZSetFrame | None, ts_col: str,
                   wmb) -> ZSetFrame | None:
        if delta is None:
            return None
        t = F.unix_timestamp(F.col(ts_col))
        return ZSetFrame(delta.df.crossJoin(wmb)
                         .filter(t >= F.col("__wm")).drop("__wm"))

    def step(self, delta_left: ZSetFrame | None,
             delta_right: ZSetFrame | None) -> ZSetFrame:
        # watermarking is opt-in: with delay=None the join is exact and
        # state is unbounded (the caller accepts arbitrarily late rows)
        if self.delay is not None:
            wmb = self._wm_df()
            delta_left = self._drop_late(delta_left, self.lts, wmb)
            delta_right = self._drop_late(delta_right, self.rts, wmb)
            self._evict(self.left, self.lts, wmb)
            self._evict(self.right, self.rts, wmb)

        a_old = self.left.current
        b_new = (self.right.update(delta_right) if delta_right is not None
                 else self.right.current)
        if delta_left is not None:
            self.left.update(delta_left)

        in_window = (
            F.abs(F.unix_timestamp(F.col(self.lts))
                  - F.unix_timestamp(F.col(self.rts))) <= self.window)
        parts = []
        if delta_left is not None:
            parts.append(delta_left.join(b_new, on=self.on, how="inner")
                         .filter(in_window))
        if delta_right is not None:
            parts.append(a_old.join(delta_right, on=self.on, how="inner")
                         .filter(in_window))
        if not parts:
            raise ValueError("MonotonicStreamJoinOp.step: both deltas None")
        # append-only inputs → weight-1 outputs, no consolidation shuffle
        return ZSetFrame.sum(parts)


class DistinctOp:
    """Incremental set-distinct (src/operator/distinct.rs:64).

    Maintains the integral of the input; per step, recomputes the distinct
    of only the *rows touched by the delta* and emits new − old.  Touched
    rows are found by a semi-join of state on the delta (partition-pruned
    at scale).
    """

    def __init__(self, empty: ZSetFrame, **state_kw):
        # distinct() re-consolidates per group internally → lazy merge is safe
        state_kw.setdefault("consolidate_every", 4)
        self.integral = StateTable(empty, name="distinct_integral", **state_kw)

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        cols = delta.data_columns
        old = self.integral.current
        new = self.integral.update(delta)
        touched = delta.df.select(*cols).dropDuplicates()
        # null-safe: a state row containing NULL would never be marked
        # touched by a plain equi semi-join when the same row re-arrives
        old_touched = ZSetFrame(_ns_semi(old.df, touched, cols))
        new_touched = ZSetFrame(_ns_semi(new.df, touched, cols))
        return new_touched.distinct().minus(old_touched.distinct()).consolidate()


class AggregateOp:
    """Incremental group-aggregate with retraction-correct non-linear
    aggregates (reference: aggregate/mod.rs:204-244 — recompute only the
    groups touched by the delta from the integrated trace, emit retraction
    of the old aggregate row + insertion of the new one).

    ``agg_fn(zset) -> ZSetFrame`` computes the batch aggregate keyed by
    ``keys`` — e.g. ``lambda z: z.aggregate(keys, F.max("x").alias("mx"))``
    or a linear ``z.aggregate_linear(keys, ...)``.

    For *linear* aggregates this recompute could be replaced by pure
    delta-summing (aggregate/mod.rs:253-273); we keep one code path because
    the touched-group recompute is already ∝ |touched groups| and the state
    join is partition-pruned at scale.
    """

    def __init__(self, empty_in: ZSetFrame, keys: Sequence[str], agg_fn,
                 **state_kw):
        self.keys = list(keys)
        self.agg_fn = agg_fn
        # input integral merges lazily; step() consolidates the *touched*
        # subset before agg_fn so non-linear aggregates (rows() expansion)
        # see merged weights — cost ∝ touched groups, not state
        state_kw.setdefault("consolidate_every", 4)
        self._state_kw = dict(state_kw)
        self.integral = StateTable(empty_in, name="agg_input", **state_kw)
        self._out_state: StateTable | None = None

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        from database_stream_processor_spark.tuning import checkpoint_small
        new_in = self.integral.update(delta)
        # materialize the (delta-sized) touched-key set once: it is read
        # by the touched restriction, the old-output semi AND the new-
        # state anti below (§3.3)
        touched = checkpoint_small(
            delta.df.select(*self.keys).dropDuplicates(), eager=True)
        # null-safe restriction: SQL GROUP BY keeps a NULL group, and a
        # plain equi semi-join would never mark it touched
        new_touched = ZSetFrame(
            _ns_semi(new_in.df, touched, self.keys)).consolidate()
        # weight-1 rows per surviving group, materialized ONCE: the frame
        # is read by the emitted out_delta AND the replacement state below,
        # and an order-sensitive float agg_fn re-executed under different
        # shuffle layouts could diverge in the low bits between the two —
        # the exact q157 hazard LinearAggregateOp guards against by
        # checkpointing d (r12 post-mortem)
        new_out_rows = ZSetFrame(
            checkpoint_small(self.agg_fn(new_touched).df, eager=True))

        if self._out_state is None:
            empty_out = ZSetFrame(new_out_rows.df.limit(0))
            self._out_state = StateTable(empty_out, name="agg_output",
                                         **self._state_kw)
            old_out_rows = ZSetFrame(new_out_rows.df.limit(0))
        else:
            old_out_rows = ZSetFrame(
                _ns_semi(self._out_state.current.df, touched, self.keys))
        out_delta = new_out_rows.minus(old_out_rows).consolidate()
        # new output state = untouched groups ∪ recomputed groups —
        # disjoint by key, so no state-wide union+consolidate shuffle
        # (§2.4): algebraically identical to update(out_delta) (touched
        # old rows cancel, recomputed rows arrive at weight 1), and the
        # state stays consolidated BY CONSTRUCTION (agg_fn emits one
        # weight-1 row per surviving group; untouched rows are preserved
        # verbatim from the previous replace).
        out_cols = self._out_state.current.df.columns
        untouched = _ns_semi(self._out_state.current.df, touched, self.keys,
                             how="left_anti")
        self._out_state.replace(ZSetFrame(
            untouched.select(*out_cols)
            .unionByName(new_out_rows.df.select(*out_cols))))
        return out_delta

    @property
    def current_output(self) -> ZSetFrame | None:
        return None if self._out_state is None else self._out_state.current


class LinearAggregateOp:
    """Incremental *linear* group-aggregate in O(|delta|) per step
    (reference: aggregate/mod.rs:253-273 ``aggregate_linear`` — for linear
    f, f(state + delta) = f(state) + f(delta), so no input integral is kept
    at all).

    ``aggs`` maps output column → a linear expression over the data columns
    (COUNT(*) = ``F.lit(1)``, SUM(x) = ``F.col("x")``); each is multiplied
    by the row weight and summed.  Per step:

    1. aggregate the delta alone — cost ∝ |delta| (map-side partial agg);
    2. join the per-key delta sums with the stored output — with output
       state partitioned by key this is a pruned lookup of touched keys;
    3. new = old + delta sums; emit retraction of old rows + insertion of
       non-zero new rows.

    Contrast :class:`AggregateOp`, which re-aggregates touched groups from
    the integrated input — required for non-linear aggregates (min/max/
    top-k) but ∝ touched-group *size*; this op is ∝ delta size, the
    difference between rereading a 100 TB fact integral and not.

    Keys must be non-null (same contract as the reference's indexed Z-sets).

    **Zero-sum groups are absent** — faithful to the reference's Z-set
    ``aggregate_linear`` (a group whose aggregate vector is all zeros has
    weight 0 = absent, aggregate/mod.rs:253-273).  This diverges from SQL
    GROUP BY, where a live group summing to 0 still emits a row: if you
    need SQL semantics, include a ``COUNT(*)``-style aggregate
    (``n=F.lit(1)``) so live groups always carry a non-zero column — the
    SQL engine's lowering does exactly this with its hidden ``__live_cnt``
    (sql.py ``_GroupMergeMaintainer``).

    ``n_salts``: when a single group is hot enough that even map-side
    partial aggregation leaves one overwhelmed reducer (a key holding a
    large fraction of every delta), set ``n_salts`` to spread the delta
    aggregate over (keys, salt) sub-groups first, then merge per key —
    two shuffles of tiny partial rows instead of one skewed one.  All
    linear aggregates are sums, so the two-phase split is exact.
    """

    def __init__(self, empty_in: ZSetFrame, keys: Sequence[str],
                 aggs: dict[str, Column] | None = None,
                 n_salts: int | None = None, **state_kw):
        self.keys = list(keys)
        self.aggs = dict(aggs or {})
        self.n_salts = n_salts
        if not self.aggs:
            raise ValueError("LinearAggregateOp requires at least one "
                             "aggregate expression")
        w = F.col(WEIGHT_COL)
        self._delta_exprs = [F.sum(expr * w).alias(name)
                             for name, expr in self.aggs.items()]
        out_schema = (empty_in.df.groupBy(*self.keys).agg(*self._delta_exprs)
                      .withColumn(WEIGHT_COL, F.lit(1).cast("long")))
        self.state = StateTable(ZSetFrame(out_schema.limit(0)),
                                name="linear_agg_output", **state_kw)

    def _delta_agg(self, df: DataFrame) -> DataFrame:
        """Per-key sums of one delta — salted two-phase when configured."""
        if self.n_salts:
            from database_stream_processor_spark.functions.skew import (
                salted_aggregate)
            return salted_aggregate(df, self.keys, self.n_salts,
                                    *self._delta_exprs)
        return df.groupBy(*self.keys).agg(*self._delta_exprs)

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        from database_stream_processor_spark.tuning import checkpoint_small
        names = list(self.aggs)
        # materialize the per-key delta sums ONCE: the frame is read three
        # times below (semi, left, anti) — lazy, each reference would
        # re-execute the delta shuffle (guide §3.3), and a double-typed
        # agg re-executed under different layouts could diverge in the
        # low bits between the emitted delta and the stored state (the
        # r12 q157 lesson).  Statically planning this (aqe_off) was
        # measured SLOWER (q37 3.6 vs 2.8 s, q43 3.5 vs 2.2 s): AQE's
        # extra per-exchange jobs are cheap shells, while a static job
        # serializes the stages — keep AQE on.
        d = checkpoint_small(self._delta_agg(delta.df), eager=True)
        old = self.state.current.df
        old_touched = old.join(d.select(*self.keys), on=self.keys,
                               how="left_semi")
        old_renamed = old_touched.select(
            *self.keys, *[F.col(n).alias(f"__old_{n}") for n in names])
        merged = d.join(old_renamed, on=self.keys, how="left")
        zero = F.lit(0)
        new_rows = merged.select(
            *self.keys,
            *[(F.coalesce(F.col(f"__old_{n}"), zero)
               + F.coalesce(F.col(n), zero)).alias(n) for n in names])
        nonzero = None
        for n in names:
            cond = F.coalesce(F.col(n), zero) != 0
            nonzero = cond if nonzero is None else (nonzero | cond)
        inserts = ZSetFrame.from_df(new_rows.filter(nonzero), 1)
        out_delta = inserts.minus(ZSetFrame(old_touched)).consolidate()
        # new state = untouched old rows ∪ replacement rows — DISJOINT by
        # key, so no consolidate shuffle: algebraically identical to
        # state.update(out_delta) (old touched rows cancel to weight 0,
        # inserts arrive at weight 1) but the state-wide union+groupBy
        # per tick becomes a broadcast anti-join of the delta keys
        # against the old checkpoint — the materialization schedules one
        # exchange-free job instead of an AQE job per exchange (§2.4;
        # state rows are weight-1 unique keys by induction: inserts are
        # from_df(..., 1) and untouched rows are preserved verbatim).
        untouched = old.join(d.select(*self.keys), on=self.keys,
                             how="left_anti")
        state_cols = [f.name for f in self.state._schema.fields]
        self.state.replace(ZSetFrame(
            untouched.select(*state_cols)
            .unionByName(inserts.df.select(*state_cols))))
        return out_delta

    @property
    def current_output(self) -> ZSetFrame:
        return self.state.current


class UpsertOp:
    """Key-value upsert commands → Z-set deltas
    (reference: src/operator/upsert.rs:37; input semantics
    src/operator/input.rs:293-303 ``add_input_map``).

    Input per step: a DataFrame with the key columns, the value columns, a
    boolean ``__delete`` column, and a ``__seq`` column ordering commands
    within the batch (command order matters — input.rs:293-303: later
    commands override earlier ones for the same key).

    Emits retraction of the key's previous value (if any) + insertion of the
    new value (unless the last command was a delete).  State = last value
    per key.
    """

    def __init__(self, empty_values: ZSetFrame, keys: Sequence[str], **state_kw):
        self.keys = list(keys)
        self.state = StateTable(empty_values, name="upsert_state", **state_kw)

    def step(self, commands: DataFrame) -> ZSetFrame:
        from pyspark.sql import Window
        w = Window.partitionBy(*self.keys).orderBy(F.col("__seq").desc())
        last = (commands.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn", "__seq"))
        value_cols = [c for c in last.columns if c not in (*self.keys, "__delete")]

        from database_stream_processor_spark.tuning import checkpoint_small
        old = self.state.current
        # the command batch is read four times below (touched keys ×2,
        # inserts, and through the returned delta) — materialize once
        last = checkpoint_small(last, eager=True)
        touched = last.select(*self.keys).dropDuplicates()
        old_touched = ZSetFrame(old.df.join(touched, on=self.keys, how="left_semi"))

        inserts = ZSetFrame.from_df(
            last.filter(~F.col("__delete")).select(*self.keys, *value_cols), 1
        )
        delta = inserts.plus(old_touched.neg()).consolidate()
        # new state = untouched keys ∪ new values — disjoint, so the
        # state-wide union+consolidate becomes a delta-keyed anti join
        # (§2.4; equivalent to update(delta): old touched rows cancel,
        # inserts arrive at weight 1)
        state_cols = old.df.columns
        untouched = old.df.join(touched, on=self.keys, how="left_anti")
        self.state.replace(ZSetFrame(
            untouched.select(*state_cols)
            .unionByName(inserts.df.select(*state_cols))))
        return delta


class PartitionedRollingAggregateOp:
    """Incremental per-partition rolling aggregate over a relative time
    range, with out-of-order correction (reference:
    time_series/rolling_aggregate.rs:235 ``partitioned_rolling_aggregate``;
    late rows retract and correct previously-emitted outputs,
    rolling_aggregate.rs:119-143).

    ``aggs`` maps output column → aggregate Column; each input row gets the
    aggregate over its partition's rows in ``[ts - before, ts + after]``.
    Per step: recompute only the partitions touched by the delta from the
    integrated input (the touched-group idiom, aggregate/mod.rs:204-244) and
    emit retraction of their old output rows + insertion of the new — so a
    late-arriving row automatically corrects every output row whose frame it
    falls into.

    With ``watermark_delay`` set (``partitioned_rolling_aggregate_with_
    watermark``, rolling_aggregate.rs:155-200), the watermark wm = max seen
    ts − delay bounds both lateness and state:

    - input rows below wm are dropped (late-data policy, watermark.rs:33-46);
    - outputs are *live* only for rows ≥ wm; once a row falls below wm its
      output is frozen — never recomputed, never retracted;
    - input state below ``wm − before`` is truncated (the trace bound
      ``truncate_values_below``, trace/mod.rs:152-165): live rows' frames
      reach at most ``before`` back, so truncated history can never affect a
      live frame.  State stays finite on unbounded streams.
    """

    def __init__(self, empty_in: ZSetFrame, partition_by: str, ts_col: str,
                 before: int, after: int, aggs: dict,
                 watermark_delay: int | None = None,
                 numeric_ts: bool = False, **state_kw):
        from database_stream_processor_spark.operators.windows import (
            rolling_aggregate)
        self.pk = partition_by
        self.ts = ts_col
        self.before = before
        self.after = after
        self.aggs = dict(aggs)
        self.watermark_delay = watermark_delay
        self.numeric_ts = numeric_ts
        state_kw.setdefault("consolidate_every", 4)
        self._state_kw = dict(state_kw)
        self.integral = StateTable(empty_in, name="rolling_input", **state_kw)
        # output state initialized from the probe schema (input cols +
        # agg cols), so downstream composition can read the output shape
        # before the first step
        probe = rolling_aggregate(
            empty_in.df.drop(WEIGHT_COL).limit(0), [self.pk], self.ts,
            before, after, numeric_ts=numeric_ts, **self.aggs)
        self._out_state: StateTable = StateTable(
            ZSetFrame.from_df(probe), name="rolling_output",
            **self._state_kw)

    def _ts_sec(self):
        col = F.col(self.ts)
        return col.cast("long") if self.numeric_ts else F.unix_timestamp(col)

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        """Bounded recompute (rolling_aggregate.rs:119-143 semantics): a
        delta row at time s only affects output rows t with
        t ∈ [s − after, s + before], and recomputing those needs input rows
        in [t − before, t + after].  So per touched partition we recompute
        only the frame range

            outputs: [min(Δts) − max(after,0),  max(Δts) + max(before,0)]
            inputs:  [out_lo − max(before,0),   out_hi + max(after,0)]

        (the max(…,0) clamps keep a delta row's OWN output in range when
        the frame excludes the current row, e.g. ``… AND 1 PRECEDING`` —
        a new/retracted row's output row must still be emitted/retracted
        even though no frame contains its own timestamp)
        — cost ∝ delta time-spread per key, never the key's full history.
        The watermark (max seen event time − delay) is derived *inside the
        step's plan* as a broadcast 1-row DataFrame — no driver round-trip
        per tick.  Max-seen equals max over (kept state ∪ delta): dropped
        late rows are below wm ≤ max-seen, and state truncation at
        wm − before never removes the max row.
        """
        from database_stream_processor_spark.operators.windows import (
            rolling_aggregate)
        from database_stream_processor_spark.tuning import checkpoint_small
        # materialize the incoming delta ONCE: the watermark derivation,
        # the bounds aggregate and the integral update below each
        # re-execute the whole upstream delta pipeline when it stays lazy
        # (§3.3 — the r13 plan audit counted 6 delta-pipeline executions
        # in one tick's out_delta plan)
        delta = ZSetFrame(checkpoint_small(delta.df, eager=True))
        ts_sec = self._ts_sec()
        wmb = None
        if self.watermark_delay is not None:
            wm_df = (self.integral.current.df.select(ts_sec.alias("__t"))
                     .unionByName(delta.df.select(ts_sec.alias("__t")))
                     .agg((F.max("__t") - F.lit(self.watermark_delay))
                          .alias("__wm")))
            wmb = F.broadcast(wm_df)
            # late-data policy (watermark.rs:33-46): rows below wm dropped
            delta = ZSetFrame(delta.df.crossJoin(wmb)
                              .filter(ts_sec >= F.col("__wm")).drop("__wm"))
            # trace bound (trace/mod.rs:152-165): live frames reach at most
            # `before` back, so input history below wm − before is dead
            self.integral._current = ZSetFrame(
                self.integral.current.df.crossJoin(wmb)
                .filter(ts_sec >= F.col("__wm") - self.before).drop("__wm"))
            # outputs below wm are frozen: leave live state so the diff
            # can never retract them
            self._out_state._current = ZSetFrame(
                self._out_state.current.df.crossJoin(wmb)
                .filter(ts_sec >= F.col("__wm")).drop("__wm"))

        # per-pk delta time bounds, materialized once: referenced by the
        # input slice, the recomputed-output restriction AND the old-
        # output slice (3 broadcast probes of a touched-pk-sized frame)
        bounds = checkpoint_small(
            delta.df.groupBy(self.pk)
            .agg(F.min(ts_sec).alias("__dmin"),
                 F.max(ts_sec).alias("__dmax")), eager=True)
        new_in = self.integral.update(delta)

        # the slice must cover the output rows AND their frames
        out_lo = F.col("__dmin") - max(self.after, 0)
        out_hi = F.col("__dmax") + max(self.before, 0)
        in_lo = out_lo - max(self.before, 0)
        in_hi = out_hi + max(self.after, 0)

        # NULL-SAFE pk joins throughout: a NULL partition value is a real
        # window partition in SQL; plain on=pk would silently drop it
        def bjoin(df):
            b = bounds.withColumnRenamed(self.pk, "__bnd_pk")
            return (df.join(b, on=df[self.pk].eqNullSafe(
                F.col("__bnd_pk")), how="inner").drop("__bnd_pk"))

        sliced = ZSetFrame(
            bjoin(new_in.df)
            .filter(ts_sec.between(in_lo, in_hi))
            .drop("__dmin", "__dmax")).consolidate()
        new_rows = rolling_aggregate(sliced.rows(), [self.pk], self.ts,
                                     self.before, self.after,
                                     numeric_ts=self.numeric_ts,
                                     **self.aggs)
        new_rows = (bjoin(new_rows)
                    .filter(ts_sec.between(out_lo, out_hi))
                    .drop("__dmin", "__dmax"))
        if wmb is not None:
            new_rows = (new_rows.crossJoin(wmb)
                        .filter(ts_sec >= F.col("__wm")).drop("__wm"))
        new_out = ZSetFrame.from_df(new_rows, 1)

        old_out = ZSetFrame(
            bjoin(self._out_state.current.df)
            .filter(ts_sec.between(out_lo, out_hi))
            .drop("__dmin", "__dmax"))
        out_delta = new_out.minus(old_out).consolidate()
        self._out_state.update(out_delta)
        return out_delta

    @property
    def current_output(self):
        return self._out_state.current


class TumblingWindowOp:
    """Maintained tumbling-window aggregate: deltas in → per-window
    aggregate deltas out (reference builds tumbling windows from
    watermark + rounding + window, nexmark q5.rs:76-118; window-content
    changes are emitted as deltas, time_series/window.rs:75).

    The window bucket is a *derived grouping column* — flooring ts to the
    window start is linear, so the whole operator reduces to the O(Δ)
    :class:`LinearAggregateOp` keyed by (bucket, *keys): per step, cost ∝
    |delta|, never the number of open windows.  Late rows simply land in
    their (old) bucket and emit a correction delta for that window — the
    out-of-order story falls out of the Z-set algebra for free.

    ``aggs`` maps output column → *linear* expression (COUNT(*) =
    ``F.lit(1)``, SUM(x) = ``F.col("x")``).  For non-linear per-window
    aggregates compose :class:`AggregateOp` with the same bucket column.
    The bucket is emitted as epoch seconds (``long``, engine-portable).
    """

    def __init__(self, empty_in: ZSetFrame, ts_col: str, size_seconds: int,
                 keys: Sequence[str], aggs: dict[str, Column],
                 bucket_col: str = "window_start",
                 n_salts: int | None = None, **state_kw):
        self.ts = ts_col
        self.size = size_seconds
        self.bucket_col = bucket_col
        self.keys = list(keys)
        empty_b = ZSetFrame(self._with_bucket(empty_in.df))
        self._agg = LinearAggregateOp(empty_b, [bucket_col, *self.keys],
                                      aggs, n_salts=n_salts, **state_kw)

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        b = (F.floor(F.unix_timestamp(F.col(self.ts)) / self.size)
             * self.size).cast("long")
        return df.withColumn(self.bucket_col, b)

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        return self._agg.step(ZSetFrame(self._with_bucket(delta.df)))

    @property
    def current_output(self) -> ZSetFrame:
        return self._agg.current_output


class HoppingWindowOp:
    """Maintained hopping (sliding) window aggregate (q5.rs:76-118 10s/2s
    hops).  Exploding a row into its size/hop overlapping window starts is
    linear (a flat_map), so this too reduces to :class:`LinearAggregateOp`
    keyed by (window_start, *keys) — O(Δ · size/hop) per step."""

    def __init__(self, empty_in: ZSetFrame, ts_col: str, size_seconds: int,
                 hop_seconds: int, keys: Sequence[str],
                 aggs: dict[str, Column],
                 bucket_col: str = "window_start",
                 n_salts: int | None = None, **state_kw):
        self.ts = ts_col
        self.size = size_seconds
        self.hop = hop_seconds
        self.bucket_col = bucket_col
        self.keys = list(keys)
        empty_b = ZSetFrame(self._explode_buckets(empty_in.df))
        self._agg = LinearAggregateOp(empty_b, [bucket_col, *self.keys],
                                      aggs, n_salts=n_salts, **state_kw)

    def _explode_buckets(self, df: DataFrame) -> DataFrame:
        ts = F.unix_timestamp(F.col(self.ts))
        first = (F.floor((ts - self.size) / self.hop) + 1) * self.hop
        last = F.floor(ts / self.hop) * self.hop
        # no 0-clamp — see operators/windows.py hopping_window: negative
        # window starts are legal, and a clamp breaks pre-epoch timestamps
        starts = F.sequence(first.cast("long"),
                            last.cast("long"),
                            F.lit(self.hop).cast("long"))
        return df.withColumn(self.bucket_col, F.explode(starts))

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        return self._agg.step(ZSetFrame(self._explode_buckets(delta.df)))

    @property
    def current_output(self) -> ZSetFrame:
        return self._agg.current_output


class WindowOp:
    """Moving window over a time-indexed stream: emits *changes to window
    contents* as the bounds advance (time_series/window.rs:75 — the window
    operator outputs deltas: rows entering as the upper bound advances or
    arriving inside the bounds, retractions as rows fall below the lower
    bound).

    Per step the caller supplies the new ``(lo, hi)`` bounds (epoch
    seconds, half-open ``[lo, hi)``); typically lo/hi derive from a
    waterline.  The emitted delta is computed from *range filters only* —
    never a full-contents diff:

    - delta rows landing inside the new bounds (+);
    - pre-existing state rows in new∖old bounds (+, entering);
    - pre-existing state rows in old∖new bounds (−, leaving).

    With the input integral partitioned on time these are partition-pruned
    range scans ∝ the bound movement, the reference's cost model.
    """

    def __init__(self, empty_in: ZSetFrame, ts_col: str, **state_kw):
        self.ts = ts_col
        self.integral = StateTable(empty_in, name="window_input", **state_kw)
        self._bounds: tuple[int, int] | None = None

    def _in(self, lo: int, hi: int) -> Column:
        t = F.unix_timestamp(F.col(self.ts))
        return (t >= lo) & (t < hi)

    def step(self, delta: ZSetFrame, bounds: tuple[int, int]) -> ZSetFrame:
        lo, hi = bounds
        if self._bounds is not None and lo < self._bounds[0]:
            # the reference requires a monotone window start
            # (window.rs:155 panics on a retreating lower bound): rows
            # below a previous lower bound may already be evicted, so a
            # retreat would silently miss re-entries
            raise ValueError(
                f"window lower bound must be monotone: {lo} < "
                f"{self._bounds[0]}")
        old = self.integral.current
        parts = [delta.filter(self._in(lo, hi))]
        if self._bounds is not None:
            olo, ohi = self._bounds
            entering = self._in(lo, hi) & ~self._in(olo, ohi)
            leaving = self._in(olo, ohi) & ~self._in(lo, hi)
            parts.append(old.filter(entering))
            parts.append(old.filter(leaving).neg())
        self._bounds = (lo, hi)
        self.integral.update(delta)
        return ZSetFrame.sum(parts).consolidate()


class PartitionedRollingAggregateLinearOp:
    """O(Δ) incremental rolling aggregate for *linear* aggregates
    (reference: rolling_aggregate.rs:367 ``partitioned_rolling_aggregate_
    linear`` — linearity lets outputs be *adjusted* by delta
    contributions instead of recomputed from the input slice).

    ``aggs`` maps output column → linear expression (COUNT(*) =
    ``F.lit(1)``, SUM(x) = ``F.col("x")``); each output row carries, per
    agg, Σ over its frame ``[t − before, t + after]`` of expr·weight.

    Per step, two range joins bounded by the delta's frame reach:

    a) existing output rows whose frame overlaps a delta row get
       retracted and re-emitted with value + Σ contributions — an inner
       range join, so untouched rows cost nothing;
    b) the delta rows' own outputs are computed fresh against the updated
       integral (left join — an empty frame yields zero sums).

    The two legs emit the same value for the same row, so weight algebra
    consolidates them: an existing row's weight bump merges, a full
    retraction cancels to zero.  Cost ∝ |Δ| × frame density — never the
    partition history (contrast the general
    :class:`PartitionedRollingAggregateOp`, which recomputes the bounded
    slice to support non-linear aggregates).

    ``frames`` optionally overrides (before, after) *per agg column* —
    several RANGE frames over one PARTITION BY/ORDER BY (the reference's
    demo02 feature view computes 1-day/1-week/1-month frames side by
    side) share a single op: the slice/join bounds widen to the largest
    frame and each agg's adjustment/fresh sum is restricted to its own
    frame by a conditional aggregate.  ``after`` may be negative
    (``… AND 1 PRECEDING`` frames).  With ``numeric_ts`` the ORDER BY
    column is used as-is (epoch seconds already) instead of through
    ``unix_timestamp``.
    """

    def __init__(self, empty_in: ZSetFrame, partition_by: str, ts_col: str,
                 before: int, after: int, aggs: dict[str, Column],
                 frames: dict[str, tuple[int, int]] | None = None,
                 numeric_ts: bool = False, **state_kw):
        self.pk = partition_by
        self.ts = ts_col
        self.before = before
        self.after = after
        self.aggs = dict(aggs)
        if not self.aggs:
            raise ValueError("aggs must not be empty")
        self.frames = {n: (frames or {}).get(n, (before, after))
                       for n in self.aggs}
        #: widest reach across frames — slice/join bounds
        self._b_max = max(b for b, _ in self.frames.values())
        self._a_max = max(a for _, a in self.frames.values())
        self.numeric_ts = numeric_ts
        state_kw.setdefault("consolidate_every", 4)
        self._state_kw = dict(state_kw)
        self.integral = StateTable(empty_in, name="rolling_lin_input",
                                   **state_kw)
        self._in_cols = empty_in.data_columns
        # exact decimal accumulators: legs (a) and (b) must produce
        # BIT-IDENTICAL values for the same row so the Z-set consolidation
        # merges them — float addition isn't associative, decimal is
        self._acc_type = "decimal(25,8)"
        out_df = empty_in.df
        for n in self.aggs:
            out_df = out_df.withColumn(n, F.lit(None).cast(self._acc_type))
        self.out = StateTable(ZSetFrame(out_df.limit(0)),
                              name="rolling_lin_output", **self._state_kw)

    def _sec(self, col: Column) -> Column:
        return col.cast("long") if self.numeric_ts else F.unix_timestamp(col)

    def _bounds_join(self, df: DataFrame, bounds: DataFrame) -> DataFrame:
        """Inner join on the partition key with NULL-SAFE equality — SQL
        windows treat a NULL partition value as a real partition, so a
        plain ``on=pk`` join would silently drop it (and emit zero sums
        for its rows)."""
        b = bounds.withColumnRenamed(self.pk, "__bnd_pk")
        return (df.join(b, on=df[self.pk].eqNullSafe(F.col("__bnd_pk")),
                        how="inner")
                .drop("__bnd_pk"))

    def step(self, delta: ZSetFrame) -> ZSetFrame:
        from database_stream_processor_spark.tuning import checkpoint_small
        names = list(self.aggs)
        # materialize the consolidated delta ONCE: it is read by the
        # contrib aggregate, the integral update AND the fresh-output
        # join below — lazy, Catalyst re-executes the whole upstream
        # delta pipeline per reference (the r13 plan audit counted 14
        # executions of the events scan in ONE tick's out_delta plan,
        # guide §3.3)
        d = ZSetFrame(checkpoint_small(delta.consolidate().df, eager=True))
        new_in = self.integral.update(d)
        ts = self._sec(F.col(self.ts))
        w = F.col(WEIGHT_COL)

        # per-(pk, s) delta contributions: Σ expr·w at each delta time —
        # materialized once too (read by the bounds aggregate twice and
        # the adjustment join; delta-sized)
        contrib = checkpoint_small(
            d.df.groupBy(self.pk, ts.alias("__s"))
            .agg(*[F.sum((expr * w).cast(self._acc_type))
                   .alias(f"__c_{n}")
                   for n, expr in self.aggs.items()]), eager=True)

        # (a) adjust existing outputs whose frame covers a delta time:
        # t ∈ [s − after_n, s + before_n]  ⇔  s ∈ [t − before_n, t + after_n]
        # for the agg's own frame; the slice uses the widest frame, the
        # per-agg conditional sum restricts to each frame.
        # The state is lazily merged (may hold duplicate physical rows),
        # so consolidate just the frame-bounded slice first — the groupBy
        # below then sees each output row exactly once and the range join
        # can't double-count contributions.
        bounds = contrib.groupBy(self.pk).agg(
            F.min("__s").alias("__dmin"), F.max("__s").alias("__dmax"))
        sl = (self._bounds_join(self.out.current.df, bounds)
              .filter(ts.between(F.col("__dmin") - self._a_max,
                                 F.col("__dmax") + self._b_max))
              .drop("__dmin", "__dmax"))
        sl = ZSetFrame(sl).consolidate().df
        olap = {n: ((F.col("__s") >= ts - b) & (F.col("__s") <= ts + a))
                for n, (b, a) in self.frames.items()}
        any_olap = None
        for c in olap.values():
            any_olap = c if any_olap is None else (any_olap | c)
        contrib_r = contrib.withColumnRenamed(self.pk, "__cpk")
        adj = (sl.join(contrib_r,
                       on=sl[self.pk].eqNullSafe(F.col("__cpk")),
                       how="inner").drop("__cpk")
               .filter(any_olap)
               .groupBy(*sl.columns)
               .agg(*[F.coalesce(
                   F.sum(F.when(olap[n], F.col(f"__c_{n}"))),
                   F.lit(0).cast(self._acc_type)).alias(f"__a_{n}")
                   for n in names]))
        # ONE execution of the adj subtree emits BOTH rows per adjusted
        # output: the retraction of the old row (old values, −w) and the
        # adjusted replacement (value + Σ contributions, +w) — exploded
        # from a 2-struct array.  Two separate Union branches would
        # re-execute the whole slice-join-aggregate subtree per branch
        # (§3.3); values and weights are the identical expressions.
        others = [c for c in sl.columns if c not in names and c != WEIGHT_COL]
        pair = F.explode(F.array(
            F.struct(*[F.col(n).alias(n) for n in names],
                     (-F.col(WEIGHT_COL)).alias(WEIGHT_COL)),
            F.struct(*[(F.col(n) + F.col(f"__a_{n}"))
                       .cast(self._acc_type).alias(n) for n in names],
                     F.col(WEIGHT_COL).alias(WEIGHT_COL))))
        adj_both = ZSetFrame(
            adj.select(*others, pair.alias("__pr"))
            .select(*others,
                    *[F.col(f"__pr.{n}").alias(n) for n in names],
                    F.col(f"__pr.{WEIGHT_COL}").alias(WEIGHT_COL))
            .select(*sl.columns))

        # (b) fresh outputs for the delta rows from the updated integral —
        # the state side is pre-restricted to delta-adjacent (pk, time)
        # slices via the (broadcastable, delta-sized) bounds frame, so
        # the frame join never consumes the key's full history, let alone
        # the whole integral
        in_df = (self._bounds_join(new_in.df, bounds)
                 .filter(ts.between(F.col("__dmin") - self._b_max,
                                    F.col("__dmax") + self._a_max))
                 .drop("__dmin", "__dmax"))
        d_keyed = d.df.select(
            *[F.col(c).alias(f"__d_{c}") for c in d.df.columns])
        d_ts = self._sec(F.col(f"__d_{self.ts}"))
        frame = ((d_ts - self._b_max <= ts) & (ts <= d_ts + self._a_max))
        in_frame = {n: ((d_ts - b <= ts) & (ts <= d_ts + a))
                    for n, (b, a) in self.frames.items()}
        joined = d_keyed.join(
            in_df,
            on=(F.col(f"__d_{self.pk}").eqNullSafe(F.col(self.pk))
                & frame),
            how="left")
        fresh = (joined.groupBy(*[f"__d_{c}" for c in d.df.columns])
                 .agg(*[F.coalesce(
                     F.sum(F.when(in_frame[n],
                                  (expr * w).cast(self._acc_type))),
                     F.lit(0)).cast(self._acc_type).alias(n)
                     for n, expr in self.aggs.items()]))
        plus_fresh = ZSetFrame(fresh.select(
            *[F.col(f"__d_{c}").alias(c) for c in self._in_cols],
            *names,
            F.col(f"__d_{WEIGHT_COL}").alias(WEIGHT_COL)))

        out_delta = ZSetFrame.sum([adj_both, plus_fresh]).consolidate()
        self.out.update(out_delta)
        return out_delta

    @property
    def current_output(self) -> ZSetFrame:
        return self.out.current


class Z1Op:
    """``z^-1`` — delay a stream by one tick: emits the *previous* step's
    value, initially empty (src/operator/z1.rs; the feedback edge of every
    DBSP cycle).  The Spark analog of "previous micro-batch's table
    version"."""

    def __init__(self, empty: ZSetFrame, **state_kw):
        self.state = StateTable(empty, name="z1", **state_kw)

    def step(self, value: ZSetFrame) -> ZSetFrame:
        prev = self.state.current
        self.state._current = self.state._materialize(value)
        return prev


class StreamFoldOp:
    """Running fold over the stream of batches with an arbitrary
    accumulator DataFrame (src/operator/stream_fold.rs:21).

    ``fold(acc_df, batch) -> acc_df`` — e.g. a running global min/max/
    count; the accumulator is a (small) DataFrame, kept distributed."""

    def __init__(self, init: DataFrame, fold):
        self.acc = init
        self.fold = fold

    def step(self, batch: ZSetFrame) -> DataFrame:
        self.acc = self.fold(self.acc, batch).localCheckpoint(eager=True)
        return self.acc


class Apply2Op:
    """Arbitrary binary batch function applied per tick
    (src/operator/apply2.rs:17) — the two-input counterpart of
    :class:`LinearOp`.  Stateless; incremental only if ``f`` is bilinear."""

    def __init__(self, f):
        self.f = f

    def step(self, a: ZSetFrame, b: ZSetFrame) -> ZSetFrame:
        return self.f(a, b)

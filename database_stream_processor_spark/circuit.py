"""Circuit builder — the reference's top-level user API on Spark
(reference: crates/dbsp/src/circuit/dbsp_handle.rs ``Runtime::init_circuit``
+ ``DBSPHandle::step``; input handles src/operator/input.rs:75,230,313;
output handles src/operator/output.rs:29).

A user of the reference builds a dataflow of operators over input
streams, then drives it: push deltas into input handles, ``step()`` the
circuit, drain output handles.  This module gives the same shape over the
incremental operator layer::

    c = Circuit(spark)
    orders = c.add_input_zset("o_custkey long, o_totalprice double")
    cust   = c.add_input_zset("c_custkey long, n_name string")
    joined = c.join(orders.map_named(o_custkey="c_custkey"), cust,
                    on=["c_custkey"])          # delta schemas derived
    rev    = c.aggregate_linear(joined, ["n_name"],
                                total=F.col("o_totalprice"))
    out    = c.output(rev)

    orders.push(batch_df)          # any number of pushes per tick
    c.step()                       # one clock tick through the DAG
    out.consolidate()              # integrated view so far

Each ``step()`` evaluates nodes in topological order; a node whose inputs
all produced empty/no deltas is skipped entirely (the reference
scheduler's "no work" fast path).  All data stays in DataFrames — the
circuit object only holds the wiring.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (convenience re-export)

from database_stream_processor_spark.plans.incremental import (
    AggregateOp,
    DistinctOp,
    JoinOp,
    LinearAggregateOp,
    LinearOp,
)
from database_stream_processor_spark.sources.files import OutputHandle
from database_stream_processor_spark.zset import ZSetFrame


class Stream:
    """A named edge in the circuit DAG (reference ``Stream``)."""

    __slots__ = ("circuit", "node_id")

    def __init__(self, circuit: "Circuit", node_id: int):
        self.circuit = circuit
        self.node_id = node_id

    # sugar: linear transforms build LinearOp nodes
    def filter(self, predicate: Column | str) -> "Stream":
        return self.circuit.apply(self, lambda z: z.filter(predicate))

    def map(self, *cols: str | Column) -> "Stream":
        return self.circuit.apply(self, lambda z: z.map(*cols))

    def map_named(self, **renames: str) -> "Stream":
        """Rename columns (e.g. align join keys): map_named(a="b")."""
        def f(z: ZSetFrame) -> ZSetFrame:
            df = z.df
            for old, new in renames.items():
                df = df.withColumnRenamed(old, new)
            return ZSetFrame(df)
        return self.circuit.apply(self, f)

    def neg(self) -> "Stream":
        return self.circuit.apply(self, lambda z: z.neg())


class InputHandle(Stream):
    """``add_input_zset`` handle (input.rs:75): queue deltas between
    ticks; ``step()`` drains them as one delta."""

    __slots__ = ("_schema", "_pending")

    def __init__(self, circuit: "Circuit", node_id: int, schema: str):
        super().__init__(circuit, node_id)
        self._schema = schema
        self._pending: list[ZSetFrame] = []

    def push(self, df: DataFrame | ZSetFrame, weight: int = 1) -> None:
        z = df if isinstance(df, ZSetFrame) else ZSetFrame.from_df(df, weight)
        self._pending.append(z)

    def _drain(self) -> ZSetFrame | None:
        if not self._pending:
            return None
        out = ZSetFrame.sum(self._pending)
        self._pending = []
        return out


class CommandInputHandle(Stream):
    """Input handle for *command-frame* inputs (set / map inputs,
    input.rs:230,313): pushes are raw DataFrames of commands, drained per
    tick and fed through the owning op's ``step``.

    ``insert(df)`` / ``delete(df)`` stamp the command columns; commands
    pushed later in the same tick win (monotone ``__seq``).  A frame that
    already carries the command columns can be pushed verbatim with
    ``push_commands``.
    """

    __slots__ = ("_pending", "_seq", "_flag_col")

    def __init__(self, circuit: "Circuit", node_id: int, flag_col: str):
        super().__init__(circuit, node_id)
        self._pending: list[DataFrame] = []
        self._seq = 0
        self._flag_col = flag_col  # __insert (set) or __delete (map)

    def _stamp(self, df: DataFrame, flag: bool) -> None:
        self._seq += 1
        self._pending.append(
            df.withColumn(self._flag_col, F.lit(flag))
            .withColumn("__seq", F.lit(self._seq)))

    def push_commands(self, df: DataFrame) -> None:
        self._pending.append(df)

    def _drain(self) -> DataFrame | None:
        if not self._pending:
            return None
        out = self._pending[0]
        for d in self._pending[1:]:
            out = out.unionByName(d)
        self._pending = []
        return out


class SetInputHandle(CommandInputHandle):
    """``add_input_set`` handle (input.rs:230): insert/delete element
    commands with set semantics (re-insert of a present element and
    delete of an absent one are no-ops)."""

    def insert(self, df: DataFrame) -> None:
        self._stamp(df, True)

    def delete(self, df: DataFrame) -> None:
        self._stamp(df, False)


class MapInputHandle(CommandInputHandle):
    """``add_input_map`` handle (input.rs:313): keyed upserts — a push
    for an existing key retracts its previous value."""

    __slots__ = ("_value_fields",)

    def upsert(self, df: DataFrame) -> None:
        self._stamp(df, False)

    def delete(self, df: DataFrame) -> None:
        """Keys-only frame allowed: missing value columns are filled with
        typed NULLs (a delete command carries no value)."""
        for f in self._value_fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        self._stamp(df, True)


class _Node:
    __slots__ = ("parents", "run")

    def __init__(self, parents: Sequence[int],
                 run: Callable[[list[ZSetFrame | None]], ZSetFrame | None]):
        self.parents = list(parents)
        self.run = run


class Circuit:
    """The wiring + clock (dbsp_handle.rs ``DBSPHandle``).  Nodes are
    incremental operator objects; ``step()`` is one tick."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._nodes: list[_Node] = []
        #: per-node empty ZSetFrame carrying the node's output schema —
        #: lets operator nodes derive their delta schemas from their
        #: parents instead of requiring DDL strings at every call site
        self._empties: list[ZSetFrame | None] = []
        self._inputs: list[InputHandle] = []
        #: node_id → () -> integrated-output ZSetFrame (or None before the
        #: first tick) for stateful nodes; see _add(snapshot=…)
        self._snapshots: dict[int, Callable[[], ZSetFrame | None]] = {}
        self.ticks = 0

    # ------------------------------------------------------------- #
    # inputs
    # ------------------------------------------------------------- #

    def add_input_zset(self, schema: str | DataFrame) -> InputHandle:
        """``schema`` is a DDL string, or an example DataFrame whose
        schema to copy (no data is read from it)."""
        nid = len(self._nodes)
        handle = InputHandle(self, nid, schema)
        self._nodes.append(_Node([], lambda deltas, h=handle: h._drain()))
        self._empties.append(self._empty(schema))
        self._inputs.append(handle)
        return handle

    def _empty(self, schema: str | DataFrame) -> ZSetFrame:
        if isinstance(schema, DataFrame):
            return ZSetFrame.from_df(schema.limit(0))
        return ZSetFrame.from_df(self.spark.createDataFrame([], schema))

    def add_input_set(self, schema: str | DataFrame,
                      **op_kw) -> SetInputHandle:
        """``add_input_set`` node (input.rs:230; semantics table
        input.rs:214-223): insert/delete commands maintained with set
        semantics; the node's per-tick output is the membership delta."""
        from database_stream_processor_spark.sources.handles import SetInput
        empty = self._empty(schema)
        op = SetInput(empty, **op_kw)
        nid = len(self._nodes)
        handle = SetInputHandle(self, nid, "__insert")

        def run(deltas, h=handle, o=op):
            cmds = h._drain()
            return None if cmds is None else o.step(cmds)
        self._nodes.append(_Node([], run))
        self._empties.append(empty)
        return handle

    def add_input_map(self, schema: str | DataFrame, keys: Sequence[str],
                      **op_kw) -> MapInputHandle:
        """``add_input_map`` node (input.rs:313; semantics
        input.rs:293-303): keyed upsert commands — each tick emits
        retraction of replaced values + insertion of new ones."""
        from database_stream_processor_spark.sources.handles import MapInput
        empty = self._empty(schema)
        op = MapInput(empty, keys, **op_kw)
        nid = len(self._nodes)
        handle = MapInputHandle(self, nid, "__delete")
        handle._value_fields = [
            f for f in empty.df.schema.fields
            if f.name not in set(keys) and f.name != "__weight"]

        def run(deltas, h=handle, o=op):
            cmds = h._drain()
            return None if cmds is None else o.step(cmds)
        self._nodes.append(_Node([], run))
        self._empties.append(empty)
        return handle

    def _resolve_empty(self, given: str | None, src: Stream) -> ZSetFrame:
        """Delta schema for an operator input: an explicit DDL string wins;
        otherwise derive it from the parent node's tracked output schema."""
        if given is not None:
            return self._empty(given)
        e = self._empties[src.node_id]
        if e is None:
            raise ValueError(
                "cannot derive the delta schema for this stream — pass the "
                "empty_* DDL string explicitly")
        return e

    # ------------------------------------------------------------- #
    # operators (each returns a new Stream)
    # ------------------------------------------------------------- #

    def _add(self, parents: Sequence[Stream], run,
             empty: ZSetFrame | None = None,
             snapshot: Callable[[], ZSetFrame | None] | None = None) -> Stream:
        nid = len(self._nodes)
        self._nodes.append(_Node([p.node_id for p in parents], run))
        self._empties.append(empty)
        # stateful nodes register a snapshot of their maintained output —
        # an OutputHandle on such a node reads the trace directly instead
        # of re-merging every per-tick delta (output.rs:130-219 reads the
        # integrated batch, not the delta log)
        if snapshot is not None:
            self._snapshots[nid] = snapshot
        return Stream(self, nid)

    def apply(self, src: Stream, f: Callable[[ZSetFrame], ZSetFrame]) -> Stream:
        """Any linear per-batch transform (LinearOp, filter_map.rs:1)."""
        op = LinearOp(f)

        def run(deltas):
            d = deltas[0]
            return None if d is None else op.step(d)
        parent_empty = self._empties[src.node_id]
        # schema derivation probes f on the parent's empty frame at wiring
        # time; a side-effecting or non-empty-only callable must not break
        # construction (nor run its side effects twice), so any probe
        # failure just means "schema unknown — pass DDL downstream"
        out_empty = None
        if parent_empty is not None:
            try:
                out_empty = f(parent_empty)
            except Exception:
                out_empty = None
        return self._add([src], run, empty=out_empty)

    def join(self, left: Stream, right: Stream, *,
             on: Sequence[str], how: str = "inner",
             empty_left: str | None = None, empty_right: str | None = None,
             **op_kw) -> Stream:
        """Incremental join node (join.rs:121-292).  Delta schemas are
        derived from the parent streams; pass ``empty_left`` /
        ``empty_right`` DDL strings only to override."""
        el = self._resolve_empty(empty_left, left)
        er = self._resolve_empty(empty_right, right)
        op = JoinOp(el, er, on=on, how=how, **op_kw)

        def run(deltas):
            dl, dr = deltas
            if dl is None and dr is None:
                return None
            return op.step(dl, dr)
        return self._add([left, right], run,
                         empty=el.join(er, on=list(on), how="inner"))

    def monotonic_join(self, left: Stream, right: Stream, *,
                       on: Sequence[str], left_ts: str, right_ts: str,
                       window_seconds: int,
                       watermark_delay: int | None = None,
                       empty_left: str | None = None,
                       empty_right: str | None = None,
                       **op_kw) -> Stream:
        """Monotonic (append-only) stream-stream join node with a time
        match window and watermark state eviction (join.rs:87
        ``monotonic_stream_join``)."""
        from database_stream_processor_spark.plans.incremental import (
            MonotonicStreamJoinOp)
        el = self._resolve_empty(empty_left, left)
        er = self._resolve_empty(empty_right, right)
        op = MonotonicStreamJoinOp(el, er, on=on, left_ts=left_ts,
                                   right_ts=right_ts,
                                   window_seconds=window_seconds,
                                   watermark_delay=watermark_delay,
                                   **op_kw)

        def run(deltas):
            dl, dr = deltas
            if dl is None and dr is None:
                return None
            return op.step(dl, dr)
        return self._add([left, right], run,
                         empty=el.join(er, on=list(on), how="inner"))

    def rolling_aggregate(self, src: Stream, partition_by: str,
                          ts_col: str, before: int, after: int,
                          aggs: dict[str, Column],
                          watermark_delay: int | None = None,
                          empty_in: str | None = None,
                          **op_kw) -> Stream:
        """Per-partition rolling aggregate node over a relative time
        range, with out-of-order correction and optional watermark
        (rolling_aggregate.rs:235; …_with_watermark rs:155-200)."""
        from database_stream_processor_spark.operators.windows import (
            rolling_aggregate)
        from database_stream_processor_spark.plans.incremental import (
            PartitionedRollingAggregateOp)
        ein = self._resolve_empty(empty_in, src)
        op = PartitionedRollingAggregateOp(
            ein, partition_by, ts_col, before, after, dict(aggs),
            watermark_delay=watermark_delay, **op_kw)
        out_empty = ZSetFrame.from_df(
            rolling_aggregate(ein.rows(), [partition_by], ts_col,
                              before, after, **dict(aggs)))

        def run(deltas):
            d = deltas[0]
            return None if d is None else op.step(d)
        return self._add([src], run, empty=out_empty,
                         snapshot=lambda: op.current_output)

    def rolling_aggregate_linear(self, src: Stream, partition_by: str,
                                 ts_col: str, before: int, after: int,
                                 aggs: dict[str, Column],
                                 empty_in: str | None = None,
                                 **op_kw) -> Stream:
        """O(Δ) linear rolling aggregate node — outputs are adjusted by
        delta contributions instead of recomputed
        (rolling_aggregate.rs:277 ``partitioned_rolling_aggregate_
        linear``)."""
        from database_stream_processor_spark.plans.incremental import (
            PartitionedRollingAggregateLinearOp)
        ein = self._resolve_empty(empty_in, src)
        op = PartitionedRollingAggregateLinearOp(ein, partition_by, ts_col, before,
                                      after, dict(aggs), **op_kw)

        def run(deltas):
            d = deltas[0]
            return None if d is None else op.step(d)
        return self._add([src], run, empty=op.out.current,
                         snapshot=lambda: op.current_output)

    def aggregate_linear(self, src: Stream, keys: Sequence[str],
                         empty_in: str | None = None,
                         op_kw: dict | None = None,
                         **aggs: Column) -> Stream:
        """O(Δ) linear aggregate node (aggregate/mod.rs:253-273).
        ``op_kw`` tunes the state table (materialize_every, path, …)."""
        op = LinearAggregateOp(self._resolve_empty(empty_in, src), keys,
                               dict(aggs), **(op_kw or {}))

        def run(deltas):
            d = deltas[0]
            return None if d is None else op.step(d)
        return self._add([src], run, empty=op.state.current,
                         snapshot=lambda: op.current_output)

    def aggregate(self, src: Stream, keys: Sequence[str], agg_fn,
                  empty_in: str | None = None, **op_kw) -> Stream:
        """Retraction-correct general aggregate node
        (aggregate/mod.rs:204-244)."""
        ein = self._resolve_empty(empty_in, src)
        op = AggregateOp(ein, keys, agg_fn, **op_kw)

        def run(deltas):
            d = deltas[0]
            return None if d is None else op.step(d)
        return self._add([src], run, empty=agg_fn(ein),
                         snapshot=lambda: op.current_output)

    def distinct(self, src: Stream, empty_in: str | None = None,
                 **op_kw) -> Stream:
        ein = self._resolve_empty(empty_in, src)
        op = DistinctOp(ein, **op_kw)

        def run(deltas):
            d = deltas[0]
            return None if d is None else op.step(d)
        return self._add([src], run, empty=ein)

    def tumbling_window(self, src: Stream, ts_col: str, size_seconds: int,
                        keys: Sequence[str], empty_in: str | None = None,
                        op_kw: dict | None = None,
                        **aggs: Column) -> Stream:
        """Maintained tumbling-window aggregate node (nexmark q5.rs
        pattern; window-content deltas per time_series/window.rs:75)."""
        from database_stream_processor_spark.plans.incremental import (
            TumblingWindowOp)
        op = TumblingWindowOp(self._resolve_empty(empty_in, src), ts_col,
                              size_seconds, keys, dict(aggs),
                              **(op_kw or {}))

        def run(deltas):
            d = deltas[0]
            return None if d is None else op.step(d)
        return self._add([src], run, empty=op._agg.state.current,
                         snapshot=lambda: op.current_output)

    def hopping_window(self, src: Stream, ts_col: str, size_seconds: int,
                       hop_seconds: int, keys: Sequence[str],
                       empty_in: str | None = None,
                       op_kw: dict | None = None,
                       **aggs: Column) -> Stream:
        """Maintained hopping-window aggregate node (q5.rs:76-118)."""
        from database_stream_processor_spark.plans.incremental import (
            HoppingWindowOp)
        op = HoppingWindowOp(self._resolve_empty(empty_in, src), ts_col,
                             size_seconds, hop_seconds, keys, dict(aggs),
                             **(op_kw or {}))

        def run(deltas):
            d = deltas[0]
            return None if d is None else op.step(d)
        return self._add([src], run, empty=op._agg.state.current,
                         snapshot=lambda: op.current_output)

    def plus(self, a: Stream, b: Stream) -> Stream:
        def run(deltas):
            da, db = deltas
            if da is None:
                return db
            if db is None:
                return da
            return da.plus(db)
        # either side may lack a derived schema (e.g. an apply() whose
        # probe failed); the sum's schema is whichever side knows it
        empty = self._empties[a.node_id]
        if empty is None:
            empty = self._empties[b.node_id]
        return self._add([a, b], run, empty=empty)

    def output(self, src: Stream) -> OutputHandle:
        """Attach an output handle (output.rs:29): every tick's delta for
        ``src`` is appended; ``consolidate()`` gives the integrated view —
        read directly from the node's maintained state when the node is
        stateful (no delta-log re-merge)."""
        handle = OutputHandle(snapshot_fn=self._snapshots.get(src.node_id))

        def run(deltas):
            d = deltas[0]
            if d is not None:
                handle.push(d)
            return d
        self._add([src], run, empty=self._empties[src.node_id])
        return handle

    def step_fn(self, handle: InputHandle, out: OutputHandle | None = None):
        """Bridge to the streaming layer: a ``(ZSetFrame) -> ZSetFrame``
        callable for :class:`streaming.driver.StepDriver` — each
        micro-batch is pushed into ``handle``, the circuit ticks once,
        and the tick's delta on ``out`` (if given) is returned.  This is
        the adapters-controller wiring (crates/adapters/src/lib.rs:12-40:
        transport → input handle → circuit step → output)."""
        def tick(dz: ZSetFrame) -> ZSetFrame:
            handle.push(dz)
            n_before = 0 if out is None else len(out._deltas)
            self.step()
            if out is not None and len(out._deltas) > n_before:
                return out.last_delta
            return dz  # passthrough when no tapped output delta emerged
        return tick

    # ------------------------------------------------------------- #
    # the clock
    # ------------------------------------------------------------- #

    def step(self) -> None:
        """One tick: evaluate every node in topological (insertion) order,
        passing parent deltas.  Nodes with no work are skipped; per-node
        deltas are checkpointed once so downstream fan-out doesn't
        recompute them."""
        results: list[ZSetFrame | None] = [None] * len(self._nodes)
        for i, node in enumerate(self._nodes):
            parent_deltas = [results[p] for p in node.parents]
            out = node.run(parent_deltas)
            if out is not None and len(
                    [n for n in self._nodes if i in n.parents]) > 1:
                out = ZSetFrame(out.df.localCheckpoint(eager=True))
            results[i] = out
        self.ticks += 1

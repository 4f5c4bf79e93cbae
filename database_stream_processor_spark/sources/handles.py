"""Input-handle semantics (reference: crates/dbsp/src/operator/input.rs).

The reference exposes three input flavors; each converts client-side pushes
into Z-set deltas entering the circuit:

- ``add_input_zset`` (input.rs:75): raw ``(row, ±weight)`` pushes — in our
  engine that is simply :func:`zset_input` /
  :meth:`~database_stream_processor_spark.zset.ZSetFrame.from_df`.
- ``add_input_set`` (input.rs:230, semantics table input.rs:214-223):
  ``(row, true/false)`` insert/delete *commands* with set semantics —
  inserting a present row or deleting an absent row is a no-op; command
  order within a batch matters (later wins).
- ``add_input_map`` (input.rs:313, semantics input.rs:293-303): keyed
  upserts ``(k, Some(v) | None)`` — emits retraction of the old value plus
  insertion of the new; implemented by
  :class:`~database_stream_processor_spark.plans.incremental.UpsertOp`.

All conversions are DataFrame-only (window + join on the command keys);
state joins are partition-pruned at scale, nothing touches the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from database_stream_processor_spark.plans.incremental import StateTable, UpsertOp
from database_stream_processor_spark.zset import ZSetFrame

#: Command-frame column: True = insert, False = delete (input.rs:214-223).
INSERT_COL = "__insert"
#: Command-frame column ordering commands within one batch (later wins).
SEQ_COL = "__seq"


def zset_input(df: DataFrame, weight: int = 1) -> ZSetFrame:
    """``add_input_zset``: lift a batch of rows into a delta at ``weight``
    (input.rs:75 — ``CollectionHandle`` pushes ``(row, w)`` pairs)."""
    return ZSetFrame.from_df(df, weight)


def indexed_zset_input(df: DataFrame, keys: Sequence[str],
                       weight: int = 1) -> ZSetFrame:
    """``add_input_indexed_zset`` (input.rs:120 ``IndexedZSetHandle``):
    ``(key, value, w)`` pushes entering the circuit pre-indexed.  The
    Spark analog of "indexed" is *hash-partitioned on the key columns* —
    downstream joins/aggregates on the same key then reuse the shuffle
    (EnsureRequirements sees the existing HashPartitioning)."""
    return ZSetFrame.from_df(df.repartition(*[F.col(k) for k in keys]),
                             weight)


class StreamInput:
    """``add_input_stream`` (input.rs:49): plain per-step batches of rows
    entering the circuit at weight +1 — the weightless cousin of
    ``add_input_zset``.  Push any number of DataFrames between ticks;
    ``step()`` drains them as one delta."""

    def __init__(self, empty: DataFrame):
        self._empty = empty.limit(0)
        self._pending: list[DataFrame] = []

    def push(self, df: DataFrame) -> None:
        self._pending.append(df)

    def step(self) -> ZSetFrame:
        dfs = self._pending or [self._empty]
        self._pending = []
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return ZSetFrame.from_df(out, 1)


class Generator:
    """``Generator`` source (src/operator/generator.rs): one batch per
    tick from a caller-supplied ``fn(t) -> DataFrame`` over the tick
    counter — test/demo data without an external feed.  The nested
    variant (GeneratorNested) is ``fn`` closing over outer-loop state."""

    def __init__(self, fn):
        self.fn = fn
        self._t = 0

    def step(self) -> ZSetFrame:
        df = self.fn(self._t)
        self._t += 1
        return ZSetFrame.from_df(df, 1)


class SetInput:
    """``add_input_set`` semantics (input.rs:230; table at input.rs:214-223).

    Per step, feed a *command frame*: the element columns plus
    ``__insert: boolean`` and ``__seq: long``.  Emits the Z-set delta of the
    maintained set:

    - insert of an element not in the set → ``+1``;
    - insert of a present element → no-op (sets don't double-count);
    - delete of a present element → ``-1``;
    - delete of an absent element → no-op;
    - multiple commands for the same element in one batch: the last
      (highest ``__seq``) wins.
    """

    def __init__(self, empty_elements: ZSetFrame, **state_kw):
        self.state = StateTable(empty_elements, name="set_input", **state_kw)

    def step(self, commands: DataFrame) -> ZSetFrame:
        elem_cols = [c for c in commands.columns if c not in (INSERT_COL, SEQ_COL)]
        w = Window.partitionBy(*elem_cols).orderBy(F.col(SEQ_COL).desc())
        last = (commands.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn", SEQ_COL))

        current = self.state.current.df  # weight-1 membership rows
        inserts = (last.filter(F.col(INSERT_COL)).drop(INSERT_COL)
                   .join(current, on=elem_cols, how="left_anti"))
        deletes = (last.filter(~F.col(INSERT_COL)).drop(INSERT_COL)
                   .join(current.select(*elem_cols), on=elem_cols, how="left_semi"))
        delta = ZSetFrame.from_df(inserts, 1).plus(
            ZSetFrame.from_df(deletes, -1)).consolidate()
        self.state.update(delta)
        return delta


class MapInput:
    """``add_input_map`` semantics (input.rs:313; table at input.rs:293-303):
    keyed upsert commands → deltas.  Thin façade over
    :class:`UpsertOp` — feed a frame with key cols, value cols, and a
    ``__delete: boolean`` + ``__seq: long`` pair; receive the
    (old value retracted, new value inserted) delta."""

    def __init__(self, empty_values: ZSetFrame, keys: Sequence[str], **state_kw):
        self._op = UpsertOp(empty_values, keys, **state_kw)

    def step(self, commands: DataFrame) -> ZSetFrame:
        return self._op.step(commands)

    @property
    def state(self) -> StateTable:
        return self._op.state

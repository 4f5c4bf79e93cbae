"""Custom stateful streaming operators via ``applyInPandasWithState``
(reference: SURVEY.md §1.4 — DBSP's Spine/trace state maps to the
Structured Streaming state store; upsert semantics src/operator/upsert.rs:37;
incremental linear aggregation src/operator/aggregate/mod.rs:253-273).

These are the *native streaming* counterparts of the batch-incremental
operators in ``plans/incremental.py``: Spark's state store (HDFS/RocksDB
backed) holds the per-key state, checkpointing gives exactly-once, and
watermark timeouts give the reference's trace-bound GC
(trace/mod.rs:152-165).

Design notes (100 TB / long-running streams):

- State access is keyed — Spark hash-partitions by the grouping key, each
  task owns a shard of the store: the same layout as DBSP's sharded traces.
- The per-group function is Arrow-batched pandas (no per-row Python).
- Aggregation state is O(1) per key (running sums), never the input rows;
  `latest_per_key` state is one row per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def running_linear_agg(df: DataFrame, keys: Sequence[str],
                       value_cols: Sequence[str],
                       weight_col: str | None = None) -> DataFrame:
    """Streaming incremental linear aggregate: per key, maintain
    ``cnt = Σw`` and ``sum_<col> = Σ col·w`` across micro-batches, emitting
    the *updated totals* for every key touched in the batch (update-mode
    output — the reference's ``aggregate_linear`` delta emission,
    aggregate/mod.rs:253-273).

    ``weight_col`` (long, ±) enables retractions; absent → weight 1.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    key_fields = [df.schema[k] for k in keys]
    out_schema = T.StructType(
        key_fields
        + [T.StructField("cnt", T.LongType())]
        + [T.StructField(f"sum_{c}", T.DoubleType()) for c in value_cols])
    state_schema = T.StructType(
        [T.StructField("cnt", T.LongType())]
        + [T.StructField(f"sum_{c}", T.DoubleType()) for c in value_cols])

    def update(key, pdfs, state: GroupState):
        import pandas as pd
        cnt, *sums = state.get if state.exists else (0, *([0.0] * len(value_cols)))
        for pdf in pdfs:
            w = pdf[weight_col] if weight_col else 1
            cnt += int((pdf[weight_col]).sum()) if weight_col else len(pdf)
            sums = [s + float((pdf[c] * w).sum()) for s, c in zip(sums, value_cols)]
        state.update((cnt, *sums))
        yield pd.DataFrame([[*key, cnt, *sums]],
                           columns=[*keys, "cnt",
                                    *[f"sum_{c}" for c in value_cols]])

    return (df.groupBy(*keys)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def latest_per_key(df: DataFrame, keys: Sequence[str],
                   order_col: str) -> DataFrame:
    """Streaming upsert: keep the latest row per key (highest ``order_col``)
    across micro-batches, emitting the current latest for touched keys —
    the reference's ``add_input_map``/upsert state
    (input.rs:293-303, upsert.rs:37)."""
    keys = list(keys)
    out_schema = df.schema
    state_schema = df.schema
    cols = list(df.columns)

    def update(key, pdfs, state: GroupState):
        import pandas as pd
        best = pd.DataFrame([state.get], columns=cols) if state.exists else None
        for pdf in pdfs:
            both = pdf if best is None else pd.concat([best, pdf])
            best = both.sort_values(order_col, kind="stable").tail(1)
        state.update(tuple(best.iloc[0]))
        yield best

    return (df.groupBy(*keys)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))

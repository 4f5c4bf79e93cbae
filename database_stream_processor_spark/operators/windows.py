"""Time-series & windowing operators (reference: SURVEY.md §2.9,
crates/dbsp/src/operator/time_series/).

The reference models time series as tables indexed by a timestamp column
(README.md:72-88); windows emit *changes* to window contents and rolling
aggregates correct earlier outputs on out-of-order input
(time_series/window.rs:75, rolling_aggregate.rs:235).  In batch Spark these
are plain window/groupBy plans; in streaming the same functions run inside
``foreachBatch`` over the incremental layer.

Scale notes: tumbling/hopping windows are pure groupBy on a derived bucket
column (map-side partial agg, one shuffle).  Rolling aggregates are
``Window.partitionBy(pk).orderBy(ts).rangeBetween`` — one shuffle + in-
partition sort; skewed partition keys are handled by AQE.  Nothing needs
the reference's radix-tree (time_series/radix_tree/) because Spark's window
exec evaluates frames directly; for extreme frame sizes a segment-tree
pandas UDF could drop in behind the same signature.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window(df: DataFrame, ts_col: str, size_seconds: int,
                    keys: Sequence[str], *aggs: Column,
                    bucket_col: str = "window_start") -> DataFrame:
    """Fixed (tumbling) event-time window aggregation.

    Reference: tumbling windows built from watermark + rounding + window
    (nexmark q5 pattern, crates/nexmark/src/queries/q5.rs:76-118).

    The bucket is emitted as epoch seconds (``long``) so results are
    engine-portable; callers can ``timestamp_seconds()`` it back.
    """
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / size_seconds)
              * size_seconds).alias(bucket_col)
    return df.groupBy(bucket, *keys).agg(*aggs)


def hopping_window(df: DataFrame, ts_col: str, size_seconds: int,
                   hop_seconds: int, keys: Sequence[str], *aggs: Column,
                   bucket_col: str = "window_start") -> DataFrame:
    """Hopping (sliding) window: each row lands in size/hop overlapping
    windows.  Reference: q5's 10s/2s hopping windows (q5.rs:76-118).

    Implemented by exploding each row into its window-start buckets — a
    JVM-side ``sequence`` + ``explode`` (no Python), then one groupBy.
    """
    ts = F.unix_timestamp(F.col(ts_col))
    first = (F.floor((ts - size_seconds) / hop_seconds) + 1) * hop_seconds
    last = F.floor(ts / hop_seconds) * hop_seconds
    # no 0-clamp: negative window starts are legal (pre-epoch timestamps),
    # matching the tumbling op's pure floor semantics — a clamp would both
    # drop the earliest overlapping windows for ts < size and make
    # sequence(start > stop) throw on pre-epoch rows
    starts = F.sequence(first.cast("long"),
                        last.cast("long"), F.lit(hop_seconds).cast("long"))
    exploded = df.withColumn(bucket_col, F.explode(starts))
    return exploded.groupBy(bucket_col, *keys).agg(*aggs)


def rolling_aggregate(df: DataFrame, partition_by: Sequence[str], ts_col: str,
                      range_before_seconds: int, range_after_seconds: int,
                      numeric_ts: bool = False, **aggs: Column) -> DataFrame:
    """Per-partition rolling aggregate over a *relative time range* per row —
    the reference's ``partitioned_rolling_aggregate`` with
    ``RelRange(-before, after)`` (time_series/rolling_aggregate.rs:235,
    range spec range.rs:1-60).

    ``aggs`` maps output column name → aggregate Column (the window frame is
    applied here).  Emits one row per input row with the aggregate columns
    appended.  ``numeric_ts`` orders by the raw column (epoch seconds
    already) instead of ``unix_timestamp``.
    """
    order = (F.col(ts_col).cast("long") if numeric_ts
             else F.unix_timestamp(F.col(ts_col)))
    w = (Window.partitionBy(*partition_by)
         .orderBy(order)
         .rangeBetween(-range_before_seconds, range_after_seconds))
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def window_range(df: DataFrame, ts_col: str, start, end) -> DataFrame:
    """Moving window over a time-indexed relation: contents of
    ``[start, end)`` (reference: time_series/window.rs:75 — emits changes to
    window contents as the bounds advance; in batch form the contents are a
    pushdown-friendly range filter)."""
    return df.filter((F.col(ts_col) >= start) & (F.col(ts_col) < end))


def watermark_monotonic(df: DataFrame, ts_col: str) -> DataFrame:
    """Running max of event time = the watermark
    (time_series/watermark.rs:33).  One-row DataFrame; in streaming this is
    ``withWatermark`` which Spark maintains internally."""
    return df.select(F.max(ts_col).alias("watermark"))


def topk_per_group(df: DataFrame, keys: Sequence[str],
                   order_by: Sequence[Column], k: int,
                   rank_col: str = "rank") -> DataFrame:
    """Top-K rows per group.

    Reference expresses top-k as an ``aggregate`` with a Fold keeping a
    capped vec (nexmark q19.rs:40-55 top-10 prices/auction; q18.rs:37-50
    latest bid).  Spark-first: rank over a window + filter — Catalyst plans
    this as a partial top-k sort per partition before the shuffle
    (WindowGroupLimit), so it scales without materializing whole groups.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))

"""Native Structured Streaming window/watermark forms (reference:
SURVEY.md §2.9 — ``window(bounds)`` time_series/window.rs:75,
``watermark_monotonic`` time_series/watermark.rs:33, tumbling/hopping
windows nexmark q5.rs:76-118, late-data policy rolling_aggregate.rs:119-143).

The batch-incremental forms live in ``operators/windows.py`` (same
semantics, same bucket math); these are the ``readStream`` equivalents where
Spark itself maintains window state and the watermark evicts it — the
reference's trace-bound GC (trace/mod.rs:152-165) for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watermarked(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """``watermark_monotonic`` + state bound: Spark tracks
    max(event_time) − delay and drops/evicts below it
    (time_series/watermark.rs:33-46; rolling_aggregate.rs:174-199)."""
    return df.withWatermark(ts_col, delay)


def tumbling(df: DataFrame, ts_col: str, size: str, delay: str,
             keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Streaming tumbling window aggregate (q5 pattern, q5.rs:76-118).
    Emits (window struct, keys, aggs); append mode finalizes a window when
    the watermark passes its end — the reference's window-delta emission."""
    return (watermarked(df, ts_col, delay)
            .groupBy(F.window(ts_col, size), *keys)
            .agg(*aggs))


def hopping(df: DataFrame, ts_col: str, size: str, hop: str, delay: str,
            keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Streaming hopping window aggregate — `window(ts, size, slide)`."""
    return (watermarked(df, ts_col, delay)
            .groupBy(F.window(ts_col, size, hop), *keys)
            .agg(*aggs))

"""Stream-stream join — the ``readStream``-native binding of
``monotonic_stream_join`` (reference: crates/dbsp/src/operator/join.rs:87;
batch-incremental form: plans/incremental.MonotonicStreamJoinOp).

Spark's stream-stream inner join IS the monotonic join: both inputs are
append-only, and with watermarks on both sides plus a time-range join
condition the state store evicts rows that can no longer match — the same
trace bound the reference applies to monotone streams
(trace/mod.rs:152-165).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(left: DataFrame, right: DataFrame,
                       on: Sequence[str], left_ts: str, right_ts: str,
                       delay: str, window_seconds: int) -> DataFrame:
    """Watermarked stream-stream inner equi-join with a bounded match
    window ``|left_ts − right_ts| ≤ window_seconds``.

    Both watermark and range condition are REQUIRED for Spark to bound the
    join state (without them state grows forever — the exact hazard the
    reference's monotonic specialization exists to avoid).  ``left_ts`` /
    ``right_ts`` must be distinct column names; key columns are equated by
    name and emitted once.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")
    lw = left.withWatermark(left_ts, delay).alias("l")
    rw = right.withWatermark(right_ts, delay).alias("r")
    cond = None
    for k in on:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = eq if cond is None else (cond & eq)
    rng = (F.col(f"l.{left_ts}")
           >= F.col(f"r.{right_ts}") - F.expr(
               f"INTERVAL {window_seconds} SECONDS")) & \
          (F.col(f"l.{left_ts}")
           <= F.col(f"r.{right_ts}") + F.expr(
               f"INTERVAL {window_seconds} SECONDS"))
    joined = lw.join(rw, cond & rng, "inner")
    keep = [F.col(f"l.{k}").alias(k) for k in on]
    others = [F.col(f"l.{c}") for c in left.columns if c not in on] + \
             [F.col(f"r.{c}") for c in right.columns if c not in on]
    return joined.select(*keep, *others)

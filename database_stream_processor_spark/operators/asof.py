"""As-of (temporal) join — enrich each left row with the latest right row at
or before its timestamp.

The reference has no dedicated as-of operator; time-series enrichment is
done via range joins / rolling aggregates (SURVEY.md §2.4 notes,
src/operator/join_range.rs).  We provide it as a first-class operator
because training-data and feature pipelines need it constantly.

Implementation is the scalable union trick, NOT a range join:

1. tag left rows (0) and right rows (1), union on (key, ts);
2. one window ``partitionBy(key).orderBy(ts, side)`` with
   ``last(right_value, ignorenulls=True)`` carries the most recent right
   row forward;
3. filter back to left rows.

Cost: one shuffle on the key + an in-partition sort — same plan shape as a
sort-merge join, no quadratic blow-up, no per-key Python.  This survives
100× scale-up because the shuffle is on the join key and AQE splits skewed
keys.  A broadcast range-join variant is the right choice only when the
right side is tiny; Catalyst already handles that case if you express the
query as ``join_range`` + top-1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              direction: str = "backward",
              suffix: str = "_right") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward') or smallest
    ``right_ts >= left_ts`` ('forward'), matching on ``on`` keys.

    Right value columns are carried over (renamed with ``suffix`` on
    collision); left rows with no match keep nulls.
    """
    on = list(on)
    lcols = list(left.columns)
    carried = [c for c in lcols if c not in on and c != left_ts]
    rvals = [c for c in right.columns if c not in on and c != right_ts]

    renames = {c: (c + suffix if c in lcols else c) for c in rvals}
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(renames[c]) for c in rvals],
    ).withColumn("__side", F.lit(1))
    rv = [renames[c] for c in rvals]

    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        *carried,
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in rv],
    ).withColumn("__side", F.lit(0))
    # align column order for union
    l = l.select(*on, "__ts", "__side", *carried, *rv)
    r_full = r.select(
        *on, "__ts", "__side",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carried],
        *rv,
    )
    u = l.unionByName(r_full)

    if direction == "backward":
        # right rows sort before left rows at equal ts (side 1 first) so a
        # right row at exactly left_ts is visible to the left row
        w = (Window.partitionBy(*on)
             .orderBy(F.col("__ts").asc(), F.col("__side").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
    elif direction == "forward":
        w = (Window.partitionBy(*on)
             .orderBy(F.col("__ts").desc(), F.col("__side").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    carried = u
    for c in rv:
        carried = carried.withColumn(
            c, F.last(F.when(F.col("__side") == 1, F.col(c)), ignorenulls=True).over(w))
    out = (carried.filter(F.col("__side") == 0)
           .drop("__side")
           .withColumnRenamed("__ts", left_ts))
    return out.select(*lcols, *rv)

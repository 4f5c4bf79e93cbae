"""Bucketed (co-located) tables — the Spark analog of the reference's
sharded indexed Z-sets (src/operator/communication/shard.rs:89: state is
hash-sharded by key so joins/aggregates on that key never re-exchange).

Writing both sides of a repeated join bucketed on the join key by the
same bucket count makes every subsequent join/aggregate on that key
shuffle-free — at 100 TB the single biggest lever for a fact table that
is joined on the same key every step (the state-table layout
`StateTable(partition_by=...)` gives partition *pruning*; bucketing gives
exchange *elimination*).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   n_buckets: int,
                   sort_by: Sequence[str] | None = None) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    on ``keys``.  Joins between tables bucketed on the same keys with the
    same ``n_buckets`` plan with zero exchanges."""
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(n_buckets, *keys))
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the bucketing spec rides along in the
    catalog, so Catalyst knows the data is pre-partitioned."""
    return spark.table(table)

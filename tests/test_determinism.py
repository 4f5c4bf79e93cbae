"""Multi-worker determinism — the reference runs every operator test at
1/2/4/16 workers and requires identical output (distinct.rs:15-28,
dbsp_handle.rs tests).  The Spark analog of worker count is the shuffle
partition count: results must be identical under 1, 4, and 16 partitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_stream_processor_spark.plans.incremental import AggregateOp, JoinOp
from database_stream_processor_spark.zset import ZSetFrame
from tests.conftest import zset_to_dict


def _pipeline_result(spark, sf_dir):
    """Two-step incremental join+aggregate over real sf0.001 tables."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    cust = ZSetFrame.from_df(customer.select("c_custkey", "c_nationkey"))
    empty_orders = ZSetFrame.from_df(
        orders.limit(0).select(F.col("o_custkey").alias("c_custkey"),
                               "o_totalprice"))
    join_op = JoinOp(empty_orders, cust, on=["c_custkey"])
    agg_op = AggregateOp(
        ZSetFrame.from_df(
            spark.createDataFrame([], "c_nationkey int, o_totalprice double")),
        ["c_nationkey"],
        lambda z: z.aggregate_linear(
            ["c_nationkey"], n=F.lit(1),
            rev=F.col("o_totalprice").cast("decimal(25,8)")))

    out = None
    for step in range(2):
        batch = orders.filter(F.col("o_orderkey") % 2 == step)
        dz = ZSetFrame.from_df(
            batch.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"))
        joined = join_op.step(
            dz, cust if step == 0 else ZSetFrame.empty_like(cust))
        delta = agg_op.step(joined.map("c_nationkey", "o_totalprice"))
        out = delta if out is None else out.plus(delta)
    return zset_to_dict(out.consolidate())


@pytest.mark.parametrize("partitions", [1, 4, 16])
def test_incremental_pipeline_partition_invariant(spark, sf_dir, partitions):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        got = _pipeline_result(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    want = getattr(test_incremental_pipeline_partition_invariant, "_ref", None)
    if want is None:
        test_incremental_pipeline_partition_invariant._ref = got
    else:
        assert got == want


def _windows_result(spark, sf_dir):
    """Maintained tumbling window + linear rolling over real events."""
    from database_stream_processor_spark.plans.incremental import (
        PartitionedRollingAggregateLinearOp,
        TumblingWindowOp,
    )
    from database_stream_processor_spark.queries import load_events
    e = load_events(spark, sf_dir).select("event_id", "user_id", "ts",
                                          "value")
    tw = TumblingWindowOp(
        ZSetFrame.from_df(e.limit(0).drop("event_id")), "ts", 3600,
        ["user_id"],
        {"n": F.lit(1), "s": F.col("value").cast("decimal(25,8)")})
    rl = PartitionedRollingAggregateLinearOp(
        ZSetFrame.from_df(e.limit(0).drop("event_id")), "user_id", "ts",
        before=3600, after=0, aggs={"s": F.col("value"), "n": F.lit(1)})
    for step in range(2):
        dz = ZSetFrame.from_df(
            e.filter(F.col("event_id") % 2 == step).drop("event_id"))
        tw.step(dz)
        rl.step(dz)
    t = zset_to_dict(tw.current_output.consolidate())
    r = zset_to_dict(rl.current_output.consolidate())
    return t, r


@pytest.mark.parametrize("partitions", [1, 8])
def test_window_ops_partition_invariant(spark, sf_dir, partitions):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        got = _windows_result(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    want = getattr(test_window_ops_partition_invariant, "_ref", None)
    if want is None:
        test_window_ops_partition_invariant._ref = got
    else:
        assert got == want


@pytest.mark.parametrize("partitions", [1, 8])
def test_distinct_and_topk_partition_invariant(spark, sf_dir, partitions):
    """Batch operators: distinct + rank-based top-k are partition-count
    invariant (total tie-break orders make rank deterministic)."""
    from database_stream_processor_spark.operators.windows import topk_per_group
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        top = topk_per_group(
            orders, ["o_orderpriority"],
            [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], k=3)
        got = sorted(
            (r["o_orderpriority"], r["o_orderkey"], r["rank"])
            for r in top.select("o_orderpriority", "o_orderkey", "rank").collect())
        dz = ZSetFrame.from_df(orders.select("o_custkey"), 1)
        d = sorted(zset_to_dict(dz.distinct()).items())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    key = f"_ref_{None}"
    cache = getattr(test_distinct_and_topk_partition_invariant, "_ref", None)
    if cache is None:
        test_distinct_and_topk_partition_invariant._ref = (got, d)
    else:
        assert (got, d) == cache

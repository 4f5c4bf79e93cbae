"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship incremental query; ``queries()`` /
``oracle_sql()`` expose the full operator inventory (SURVEY.md §2) as
named queries with DuckDB oracles.  Implementations live in
``database_stream_processor_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from database_stream_processor_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue-by-nation maintained *incrementally* across three
    delta batches of orders through the Z-set engine (JoinOp + AggregateOp),
    returning the final integrated result — the SURVEY §7 Phase-0 slice."""
    from pyspark.sql import functions as F

    from database_stream_processor_spark.plans import AggregateOp, JoinOp
    from database_stream_processor_spark.zset import ZSetFrame

    sf_dir = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    cust = ZSetFrame.from_df(
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name"))
    empty_orders = ZSetFrame.from_df(
        orders.limit(0).select(F.col("o_custkey").alias("c_custkey"),
                               "o_totalprice"))
    join_op = JoinOp(empty_orders, cust, on=["c_custkey"])
    agg_op = AggregateOp(
        ZSetFrame.from_df(
            spark.createDataFrame([], "n_name string, o_totalprice double")),
        ["n_name"],
        lambda z: z.aggregate_linear(
            ["n_name"], n_orders=F.lit(1),
            total_revenue=F.col("o_totalprice")),
    )

    out = None
    for step in range(3):
        batch = orders.filter(F.col("o_orderkey") % 3 == step)
        dz = ZSetFrame.from_df(
            batch.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"))
        joined = join_op.step(
            dz, cust if step == 0 else ZSetFrame.empty_like(cust))
        delta = agg_op.step(joined.map("n_name", "o_totalprice"))
        out = delta if out is None else out.plus(delta)
    final = out.consolidate()
    return final.df.select("n_name", "n_orders",
                           F.round("total_revenue", 4).alias("total_revenue"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}

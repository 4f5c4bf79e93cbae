"""Focused tests for the size-adaptive tick tuning (tuning.py) and the
O(Δ) lazily-merged state path it gates.

These pin the r12 optimization invariants:

- the small-tick gate must keep RESOLVING after state tables switch to
  lazily-merged unions (empty seeds are registered, checkpointed pieces
  report their stored bytes) — an UNKNOWN anywhere disables the conf for
  the rest of the run;
- under the static-plan conf (``aqe_off=True``), an eager checkpoint of a
  multi-exchange small plan schedules exactly ONE Spark job (with AQE on
  it is one per exchange plus one);
- ``small_tick_conf`` restores every conf key it touches and is a strict
  no-op at/above the size threshold (the 100 TB axis).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_stream_processor_spark import tuning
from database_stream_processor_spark.zset import ZSetFrame


def _zs(spark, rows, schema):
    return ZSetFrame.from_df(spark.createDataFrame(rows, schema))


def test_leaf_bytes_resolves_lazily_merged_state(spark):
    """State = empty seed ∪ checkpointed pieces must stay measurable:
    the seed is registered as empty and each piece resolves to its
    block-manager bytes, so the gate never saturates to UNKNOWN.  Deltas
    must be file-backed (like every query input) — an in-memory frame has
    no size and correctly keeps the gate conservative."""
    from tests.conftest import SF_DIR
    from database_stream_processor_spark.plans import LinearAggregateOp

    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .select(F.col("l_suppkey").alias("k"),
                  F.col("l_quantity").cast("long").alias("v")))
    op = LinearAggregateOp(
        ZSetFrame.from_df(li.limit(0)), ["k"],
        {"cnt": F.lit(1), "total": F.col("v")})
    assert tuning.leaf_bytes(op.state.current.df) == 0  # registered seed
    op.step(ZSetFrame.from_df(li.filter(F.col("k") % 2 == 0)))
    op.step(ZSetFrame.from_df(li.filter(F.col("k") % 2 == 1)))
    n = tuning.leaf_bytes(op.state.current.df)
    assert 0 < n < tuning._UNKNOWN


def test_small_tick_conf_restores_and_gates(spark):
    conf = spark.conf
    parts0 = conf.get("spark.sql.shuffle.partitions")
    aqe0 = conf.get("spark.sql.adaptive.enabled")
    # resize mode: partitions shrink, AQE untouched
    with tuning.small_tick_conf(spark, 1024) as fired:
        assert fired
        assert conf.get("spark.sql.shuffle.partitions") == "1"
        assert conf.get("spark.sql.adaptive.enabled") == aqe0
    # static mode: AQE off, partitions untouched
    with tuning.small_tick_conf(spark, 1024, aqe_off=True,
                                resize=False) as fired:
        assert fired
        assert conf.get("spark.sql.shuffle.partitions") == parts0
        assert conf.get("spark.sql.adaptive.enabled") == "false"
    # at/above the threshold: strict no-op (the scale axis)
    with tuning.small_tick_conf(spark, tuning.SMALL_PLAN_BYTES,
                                aqe_off=True) as fired:
        assert not fired
        assert conf.get("spark.sql.shuffle.partitions") == parts0
        assert conf.get("spark.sql.adaptive.enabled") == aqe0
    assert conf.get("spark.sql.shuffle.partitions") == parts0
    assert conf.get("spark.sql.adaptive.enabled") == aqe0


def test_static_small_checkpoint_is_one_job(spark):
    """Eager checkpoint of a small 2-exchange plan: ONE statically-planned
    job under aqe_off, and the checkpointed values are unchanged."""
    df = (spark.createDataFrame([(i % 7, i) for i in range(100)], "k long, v long")
          .groupBy("k").agg(F.sum("v").alias("s"))
          .groupBy((F.col("k") % 2).alias("b")).agg(F.sum("s").alias("t")))
    expect = {(r["b"], r["t"]) for r in df.collect()}

    sc = spark.sparkContext
    group = "test-static-ckpt"
    sc.setJobGroup(group, "")
    try:
        out = tuning.checkpoint_small(df, eager=True, aqe_off=True)
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup("", "")
    assert jobs == 1
    assert {(r["b"], r["t"]) for r in out.collect()} == expect


def test_linear_aggregate_state_stays_lazily_merged(spark):
    """Between consolidations the output state is an append-only union of
    per-tick deltas (O(Δ) writes); the consolidated view still equals the
    batch aggregate after a retraction tick."""
    from database_stream_processor_spark.plans import LinearAggregateOp

    deltas = [
        _zs(spark, [(1, 10), (2, 5)], "k long, v long"),
        _zs(spark, [(1, 3)], "k long, v long"),
        _zs(spark, [(2, 5)], "k long, v long").neg(),  # retraction
    ]
    op = LinearAggregateOp(deltas[0], ["k"],
                           {"cnt": F.lit(1), "total": F.col("v")})
    for d in deltas:
        op.step(d)
    # consolidate_every=4 → no consolidation happened in 3 epochs: the
    # state plan is a union carrying one checkpointed piece per tick
    assert op.state._epoch == 3
    leaves = (op.state.current.df._jdf.queryExecution()
              .optimizedPlan().collectLeaves())
    assert leaves.size() >= 3
    got = {(r["k"], r["cnt"], r["total"])
           for r in op.current_output.consolidate().df.collect()}
    assert got == {(1, 2, 13)}  # group 2 fully retracted, group 1 merged

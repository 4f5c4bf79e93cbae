"""Incremental partitioned rolling aggregate — the reference's
out-of-order-correction contract (rolling_aggregate.rs:119-143: a late row
retracts and corrects every previously-emitted output whose frame contains
it) and the watermark variant's state bounds (rolling_aggregate.rs:155-200,
trace/mod.rs:152-165)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from database_stream_processor_spark.operators.windows import rolling_aggregate
from database_stream_processor_spark.plans.incremental import (
    PartitionedRollingAggregateOp,
)
from database_stream_processor_spark.zset import ZSetFrame
from tests.conftest import zset_to_dict


def _rows(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s), float(v))
         for k, s, v in rows],
        "k int, ts timestamp, v double")


def _mk_op(spark, **kw):
    empty = ZSetFrame.from_df(_rows(spark, []).limit(0))
    return PartitionedRollingAggregateOp(
        empty, "k", "ts", before=100, after=0,
        aggs={"s": F.sum("v"), "n": F.count(F.lit(1))}, **kw)


def test_out_of_order_row_corrects_prior_outputs(spark):
    op = _mk_op(spark)
    out = op.step(ZSetFrame.from_df(_rows(spark, [(1, 0, 10), (1, 50, 20)])))
    d1 = zset_to_dict(out)
    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    assert d1 == {(1, t(0), 10.0, 10.0, 1): 1, (1, t(50), 20.0, 30.0, 2): 1}

    # late row at ts=30 lands inside the frame of the ts=50 row →
    # its old output is retracted and corrected (and ts=30 gets an output)
    d2 = zset_to_dict(op.step(ZSetFrame.from_df(_rows(spark, [(1, 30, 5)]))))
    assert d2 == {
        (1, t(30), 5.0, 15.0, 2): 1,
        (1, t(50), 20.0, 30.0, 2): -1,
        (1, t(50), 20.0, 35.0, 3): 1,
    }

    # integrated output equals a one-shot batch rolling aggregate
    batch = rolling_aggregate(
        _rows(spark, [(1, 0, 10), (1, 50, 20), (1, 30, 5)]),
        ["k"], "ts", 100, 0, s=F.sum("v"), n=F.count(F.lit(1)))
    want = {tuple(r): 1 for r in batch.collect()}
    assert zset_to_dict(op.current_output.consolidate()) == want


def test_untouched_partitions_emit_nothing(spark):
    op = _mk_op(spark)
    op.step(ZSetFrame.from_df(_rows(spark, [(1, 0, 10), (2, 0, 7)])))
    d = zset_to_dict(op.step(ZSetFrame.from_df(_rows(spark, [(2, 10, 1)]))))
    assert all(k == 2 for (k, *_rest) in d)  # partition 1 untouched → silent


def test_watermark_drops_late_and_bounds_state(spark):
    op = _mk_op(spark, watermark_delay=50)
    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)

    op.step(ZSetFrame.from_df(_rows(spark, [(1, 0, 10), (1, 200, 20)])))
    # wm = 200 - 50 = 150; a row at ts=100 (< wm) is late → dropped, no output
    d = zset_to_dict(op.step(ZSetFrame.from_df(_rows(spark, [(1, 100, 99)]))))
    assert d == {}

    # a row at ts=260 advances wm to 210; the frozen ts=200 output must NOT
    # be retracted even though 260's arrival touches its partition
    d = zset_to_dict(op.step(ZSetFrame.from_df(_rows(spark, [(1, 260, 1)]))))
    assert d == {(1, t(260), 1.0, 21.0, 2): 1}  # frame [160,260]: 20+1

    # input state truncated below wm − before = 110 → ts=0 row evicted
    state_ts = sorted(r["ts"] for r in op.integral.current.df.collect())
    assert state_ts == [t(200), t(260)]


def test_linear_rolling_matches_batch_through_retraction(spark):
    """O(Δ) linear rolling (rolling_aggregate.rs:367): adjusted outputs
    must exactly equal a one-shot batch rolling aggregate after inserts,
    a late out-of-order row, and a retraction."""
    from database_stream_processor_spark.plans.incremental import (
        PartitionedRollingAggregateLinearOp)
    empty = ZSetFrame.from_df(_rows(spark, []).limit(0))
    op = PartitionedRollingAggregateLinearOp(
        empty, "k", "ts", before=100, after=0,
        aggs={"s": F.col("v"), "n": F.lit(1)})

    batches = [
        ([(1, 0, 10), (1, 50, 20), (2, 5, 7)], 1),
        ([(1, 30, 5)], 1),                  # late row corrects ts=50
        ([(1, 0, 10)], -1),                 # retraction corrects 0..100
    ]
    live = []
    for rows, w in batches:
        if w > 0:
            live.extend(rows)
        else:
            for r in rows:
                live.remove(r)
        op.step(ZSetFrame.from_df(_rows(spark, rows), w))
        batch = rolling_aggregate(
            _rows(spark, live), ["k"], "ts", 100, 0,
            s=F.sum("v"), n=F.count(F.lit(1)))
        want = {(k, t, v, float(s), int(n)): 1
                for k, t, v, s, n in (tuple(r) for r in batch.collect())}
        got = {(k, t, v, float(s), int(n)): wt
               for (k, t, v, s, n), wt in
               zset_to_dict(op.current_output.consolidate()).items()}
        assert got == want


def test_recompute_is_frame_bounded(spark):
    """The per-step recompute must touch only the affected frame range
    [min(Δts)−after−before, max(Δts)+before+after] of a touched partition
    (rolling_aggregate.rs:119-143), not its full history."""
    op = _mk_op(spark)
    # history far in the past of the same partition (ts=0..50), then a
    # delta at ts=10000 — outside every old row's frame reach
    op.step(ZSetFrame.from_df(_rows(spark, [(1, 0, 10), (1, 50, 20)])))
    out = op.step(ZSetFrame.from_df(_rows(spark, [(1, 10000, 1)])))

    # structurally: the recompute plan carries the frame-bound filter
    plan = out.df._jdf.queryExecution().optimizedPlan().toString()
    assert "__dmin" in plan and "__dmax" in plan

    # behaviorally: only the new row's output is emitted; the old rows'
    # outputs are neither recomputed nor retracted
    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    assert zset_to_dict(out) == {(1, t(10000), 1.0, 1.0, 1): 1}

    # and a late row correcting across the bound still works end-to-end
    op.step(ZSetFrame.from_df(_rows(spark, [(1, 9950, 5)])))
    batch = rolling_aggregate(
        _rows(spark, [(1, 0, 10), (1, 50, 20), (1, 10000, 1), (1, 9950, 5)]),
        ["k"], "ts", 100, 0, s=F.sum("v"), n=F.count(F.lit(1)))
    want = {tuple(r): 1 for r in batch.collect()}
    assert zset_to_dict(op.current_output.consolidate()) == want


def test_rolling_ops_null_partition_key(spark):
    """A NULL partition value is a REAL window partition in SQL — both
    rolling ops must maintain it (the internal pk joins are null-safe;
    plain equality silently emitted zero sums for NULL-keyed rows)."""
    from database_stream_processor_spark.plans.incremental import (
        PartitionedRollingAggregateLinearOp, PartitionedRollingAggregateOp)
    from database_stream_processor_spark.zset import ZSetFrame

    mk = lambda rows: spark.createDataFrame(rows, "pk int, ut int, v double")
    batch_sql = """SELECT pk, ut, v,
        SUM(v) OVER (PARTITION BY pk ORDER BY ut
            RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS s FROM t"""
    rows1 = [(None, 10, 1.0), (None, 50, 2.0), (1, 10, 5.0)]
    rows2 = [(None, 60, 4.0), (1, 80, 3.0)]

    for cls, aggs in [
        (PartitionedRollingAggregateLinearOp, {"s": F.col("v")}),
        (PartitionedRollingAggregateOp, {"s": F.sum("v")}),
    ]:
        op = cls(ZSetFrame.from_df(mk([]).limit(0)), "pk", "ut",
                 before=100, after=0, aggs=aggs, numeric_ts=True)
        op.step(ZSetFrame.from_df(mk(rows1)))
        op.step(ZSetFrame.from_df(mk(rows2)))
        op.step(ZSetFrame.from_df(mk([(None, 50, 2.0)]), -1))
        mk(rows1 + rows2).createOrReplaceTempView("__all")
        want = sorted(((r["pk"], r["ut"], float(r["s"])) for r in
                       spark.sql(batch_sql.replace(
                           "FROM t",
                           "FROM (SELECT * FROM __all WHERE NOT (pk IS "
                           "NULL AND ut = 50))")).collect()), key=str)
        got = sorted(((r["pk"], r["ut"], float(r["s"])) for r in
                      op.current_output.consolidate().rows()
                      .select("pk", "ut", "v",
                              F.col("s").cast("double").alias("s"))
                      .collect()), key=str)
        assert got == want, cls.__name__

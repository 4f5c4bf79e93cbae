"""Monotonic stream-stream join — batch-incremental op (join.rs:87) and
the Structured Streaming native binding, checked against batch joins with
the same time-window condition, plus the state-eviction bound."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from database_stream_processor_spark.plans.incremental import (
    MonotonicStreamJoinOp,
)
from database_stream_processor_spark.streaming.joins import stream_stream_join
from database_stream_processor_spark.zset import ZSetFrame
from tests.conftest import zset_to_dict

T0 = dt.datetime(2026, 1, 1)


def _clicks(spark, rows):
    return spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s)) for k, s in rows],
        "k long, click_ts timestamp")


def _views(spark, rows):
    return spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s)) for k, s in rows],
        "k long, view_ts timestamp")


def test_monotonic_join_matches_batch_within_window(spark):
    empty_l = ZSetFrame.from_df(_clicks(spark, []).limit(0))
    empty_r = ZSetFrame.from_df(_views(spark, []).limit(0))
    op = MonotonicStreamJoinOp(empty_l, empty_r, on=["k"],
                               left_ts="click_ts", right_ts="view_ts",
                               window_seconds=30)
    batches = [
        ([(1, 0), (2, 5)], [(1, 10)]),
        ([(1, 40)], [(2, 20), (3, 50)]),
        ([(3, 60)], [(1, 25)]),
    ]
    out, all_l, all_r = None, [], []
    for lb, rb in batches:
        all_l.extend(lb)
        all_r.extend(rb)
        d = op.step(ZSetFrame.from_df(_clicks(spark, lb)),
                    ZSetFrame.from_df(_views(spark, rb)))
        out = d if out is None else out.plus(d)
        want = (_clicks(spark, all_l).join(_views(spark, all_r), on="k")
                .filter(F.abs(F.unix_timestamp("click_ts")
                              - F.unix_timestamp("view_ts")) <= 30))
        assert zset_to_dict(out.consolidate()) == \
            {tuple(r): 1 for r in want.collect()}


def test_monotonic_join_evicts_state_below_watermark(spark):
    empty_l = ZSetFrame.from_df(_clicks(spark, []).limit(0))
    empty_r = ZSetFrame.from_df(_views(spark, []).limit(0))
    op = MonotonicStreamJoinOp(empty_l, empty_r, on=["k"],
                               left_ts="click_ts", right_ts="view_ts",
                               window_seconds=10, watermark_delay=0)
    op.step(ZSetFrame.from_df(_clicks(spark, [(1, 0), (1, 100)])),
            ZSetFrame.from_df(_views(spark, [(1, 5)])))
    # wm (lagging) was empty-state → nothing dropped; now state max = 100
    op.step(ZSetFrame.from_df(_clicks(spark, [(2, 110)])),
            ZSetFrame.from_df(_views(spark, [(2, 112)])))
    # after step 2 the ts=0 click and ts=5 view are below wm − window = 90
    left_ts = {r["click_ts"] for r in op.left.current.df.collect()}
    right_ts = {r["view_ts"] for r in op.right.current.df.collect()}
    assert left_ts == {T0 + dt.timedelta(seconds=s) for s in (100, 110)}
    assert right_ts == {T0 + dt.timedelta(seconds=112)}


def test_native_stream_stream_join(spark, tmp_path):
    """End-to-end readStream × readStream inner join with watermarks and
    range condition (the adapters wiring for two live feeds)."""
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(l_dir)
    os.makedirs(r_dir)
    _clicks(spark, [(1, 0), (2, 5), (3, 100)]).write.parquet(
        os.path.join(l_dir, "b0.parquet"))
    _views(spark, [(1, 10), (2, 50), (3, 95)]).write.parquet(
        os.path.join(r_dir, "b0.parquet"))

    ls = (spark.readStream.schema("k long, click_ts timestamp")
          .option("recursiveFileLookup", True).parquet(l_dir))
    rs = (spark.readStream.schema("k long, view_ts timestamp")
          .option("recursiveFileLookup", True).parquet(r_dir))
    joined = stream_stream_join(ls, rs, on=["k"], left_ts="click_ts",
                                right_ts="view_ts", delay="1 minute",
                                window_seconds=30)
    rows = []
    q = (joined.writeStream
         .foreachBatch(lambda df, _id: rows.extend(
             tuple(r) for r in df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # within the 30 s window: k=1 (|0−10|=10) and k=3 (|100−95|=5);
    # k=2 (|5−50|=45) must not match
    want = {(1, T0, T0 + dt.timedelta(seconds=10)),
            (3, T0 + dt.timedelta(seconds=100),
             T0 + dt.timedelta(seconds=95))}
    assert set(rows) == want


def test_eviction_materializes_delta_less_side(spark):
    """A side receiving no deltas for many ticks still gets its state
    materialized periodically: _evict layers a filter plan per tick, and
    without the periodic localCheckpoint the lineage (and per-tick
    re-scan) grows without bound on long runs."""
    empty_l = ZSetFrame.from_df(_clicks(spark, []).limit(0))
    empty_r = ZSetFrame.from_df(_views(spark, []).limit(0))
    op = MonotonicStreamJoinOp(empty_l, empty_r, on=["k"],
                               left_ts="click_ts", right_ts="view_ts",
                               window_seconds=5, watermark_delay=0)
    op.step(None, ZSetFrame.from_df(_views(spark, [(1, 0)])))
    right_epoch_after_seed = op.right._epoch
    plan_lens = []
    for s in range(1, 10):
        # left-only ticks: the right side never goes through update()
        op.step(ZSetFrame.from_df(_clicks(spark, [(1, s)])), None)
        plan_lens.append(len(op.right.current.df._jdf.queryExecution()
                             .optimizedPlan().toString()))
    # epoch advanced → _materialize ran at least once during eviction
    assert op.right._epoch > right_epoch_after_seed
    # and the plan shrank back after the cut instead of only growing
    assert min(plan_lens[-3:]) < max(plan_lens[:6])


def test_eviction_materializes_delta_less_left_side(spark):
    """Mirror of the test above for a delta-less LEFT side (right-only
    stream).  With a single shared eviction counter, step() incrementing
    it once per side meant the %-period only ever fired for the right
    side, so the left side's lineage was never cut."""
    empty_l = ZSetFrame.from_df(_clicks(spark, []).limit(0))
    empty_r = ZSetFrame.from_df(_views(spark, []).limit(0))
    op = MonotonicStreamJoinOp(empty_l, empty_r, on=["k"],
                               left_ts="click_ts", right_ts="view_ts",
                               window_seconds=5, watermark_delay=0)
    op.step(ZSetFrame.from_df(_clicks(spark, [(1, 0)])), None)
    left_epoch_after_seed = op.left._epoch
    plan_lens = []
    for s in range(1, 10):
        # right-only ticks: the left side never goes through update()
        op.step(None, ZSetFrame.from_df(_views(spark, [(1, s)])))
        plan_lens.append(len(op.left.current.df._jdf.queryExecution()
                             .optimizedPlan().toString()))
    assert op.left._epoch > left_epoch_after_seed
    assert min(plan_lens[-3:]) < max(plan_lens[:6])

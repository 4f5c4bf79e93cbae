"""Incremental vs full-recompute equivalence — the reference's signature
correctness oracle (SURVEY.md §5.2: e.g. distinct.rs:32-75 `distinct_inc_test`
compares `op()` with `integrate().stream_op().differentiate()`).

We feed K delta batches through the incremental operator and check, after
every step, that the integrated output equals the batch operator applied to
the integrated input.  Retraction rounds (FIXTURES.md §5.2) re-feed a prior
batch negated and check outputs revert.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_stream_processor_spark.plans.incremental import (
    AggregateOp,
    DifferentiateOp,
    DistinctOp,
    IntegrateOp,
    JoinOp,
    UpsertOp,
)
from database_stream_processor_spark.zset import WEIGHT_COL, ZSetFrame
from tests.conftest import zset_to_dict


def zs(spark, rows, schema="k long, v string"):
    return ZSetFrame(
        spark.createDataFrame(rows, schema=schema + f", {WEIGHT_COL} long"))


def test_integrate_differentiate_roundtrip(spark):
    deltas = [
        zs(spark, [(1, "a", 1), (2, "b", 1)]),
        zs(spark, [(1, "a", -1), (3, "c", 2)]),
        zs(spark, [(3, "c", -2)]),
    ]
    integ = IntegrateOp(deltas[0])
    diff = DifferentiateOp(deltas[0])
    for d in deltas:
        snapshot = integ.step(d)
        recovered = diff.step(snapshot)
        assert zset_to_dict(recovered) == zset_to_dict(d.consolidate())


def test_incremental_distinct_equals_batch(spark):
    deltas = [
        zs(spark, [(1, "a", 2), (2, "b", 1)]),
        zs(spark, [(1, "a", -1), (2, "b", -1), (3, "c", 1)]),
        zs(spark, [(1, "a", -1)]),          # k=1 weight drops to 0 → retract
        zs(spark, [(2, "b", 5)]),           # k=2 reappears
    ]
    op = DistinctOp(deltas[0])
    out_integral = None
    in_integral = None
    for d in deltas:
        out_delta = op.step(d)
        out_integral = out_delta if out_integral is None else out_integral.plus(out_delta)
        in_integral = d if in_integral is None else in_integral.plus(d)
        assert zset_to_dict(out_integral.consolidate()) == \
            zset_to_dict(in_integral.distinct())


@pytest.mark.slow
def test_incremental_join_equals_batch(spark):
    a_deltas = [
        zs(spark, [(1, "x", 1), (2, "y", 2)], "k long, av string"),
        zs(spark, [(1, "x", -1), (3, "z", 1)], "k long, av string"),
    ]
    b_deltas = [
        zs(spark, [(1, "p", 1)], "k long, bv string"),
        zs(spark, [(2, "q", 3), (1, "p", -1)], "k long, bv string"),
    ]
    op = JoinOp(a_deltas[0], b_deltas[0], on=["k"])
    out_integral, a_int, b_int = None, None, None
    for da, db in zip(a_deltas, b_deltas):
        out = op.step(da, db)
        out_integral = out if out_integral is None else out_integral.plus(out)
        a_int = da if a_int is None else a_int.plus(da)
        b_int = db if b_int is None else b_int.plus(db)
        expected = a_int.consolidate().join(b_int.consolidate(), on=["k"])
        assert zset_to_dict(out_integral.consolidate()) == zset_to_dict(expected)


@pytest.mark.parametrize("how", ["left_outer", "right_outer", "full_outer"])
@pytest.mark.slow
def test_incremental_outer_join_equals_batch(spark, how):
    """Outer joins aren't bilinear (null-padded rows appear/vanish with the
    other side's key support) — JoinOp uses touched-key recompute
    (join.rs:338-361 decomposition).  Includes a retraction that makes a
    previously-matched key unmatched, flipping a joined row back to a
    null-padded one."""
    a_deltas = [
        zs(spark, [(1, "x", 1), (2, "y", 1)], "k long, av string"),
        zs(spark, [(4, "w", 1)], "k long, av string"),
        zs(spark, [(2, "y", -1)], "k long, av string"),  # unmatched b side appears
    ]
    b_deltas = [
        zs(spark, [(1, "p", 1), (3, "r", 1)], "k long, bv string"),
        zs(spark, [(2, "q", 1)], "k long, bv string"),
        zs(spark, [(1, "p", -1)], "k long, bv string"),  # k=1 flips to null-padded
    ]
    op = JoinOp(a_deltas[0], b_deltas[0], on=["k"], how=how)
    out_integral, a_int, b_int = None, None, None
    for da, db in zip(a_deltas, b_deltas):
        out = op.step(da, db)
        out_integral = out if out_integral is None else out_integral.plus(out)
        a_int = da if a_int is None else a_int.plus(da)
        b_int = db if b_int is None else b_int.plus(db)
        expected = a_int.consolidate().join(b_int.consolidate(), on=["k"],
                                            how=how)
        assert zset_to_dict(out_integral.consolidate()) == \
            zset_to_dict(expected.consolidate())


def test_join_op_rejects_unknown_how(spark):
    z = zs(spark, [(1, "x", 1)], "k long, av string")
    with pytest.raises(ValueError):
        JoinOp(z, z, on=["k"], how="left_semi")


@pytest.mark.slow
def test_incremental_aggregate_min_max_with_retraction(spark):
    """Non-linear aggregate: min/max must recover the next-best value when
    the current extreme is retracted (SURVEY §7 'hard parts')."""
    schema = "g string, x long"
    deltas = [
        zs(spark, [("a", 10, 1), ("a", 5, 1), ("b", 7, 1)], schema),
        zs(spark, [("a", 5, -1)], schema),     # retract current min of group a
        zs(spark, [("b", 7, -1)], schema),     # group b disappears entirely
        zs(spark, [("a", 20, 1), ("c", 1, 1)], schema),
    ]
    agg = lambda z: z.aggregate(["g"], F.min("x").alias("mn"), F.max("x").alias("mx"))
    op = AggregateOp(deltas[0], ["g"], agg)
    out_integral, in_integral = None, None
    for d in deltas:
        out = op.step(d)
        out_integral = out if out_integral is None else out_integral.plus(out)
        in_integral = d if in_integral is None else in_integral.plus(d)
        expected = agg(in_integral.consolidate())
        assert zset_to_dict(out_integral.consolidate()) == zset_to_dict(expected)


def test_incremental_linear_aggregate_equals_batch(spark):
    schema = "g string, x long"
    deltas = [
        zs(spark, [("a", 10, 2), ("b", 3, 1)], schema),
        zs(spark, [("a", 10, -2), ("b", 4, 1)], schema),  # 'a' sums to zero rows
    ]
    agg = lambda z: z.aggregate_linear(["g"], cnt=F.lit(1), total=F.col("x"))
    op = AggregateOp(deltas[0], ["g"], agg)
    out_integral, in_integral = None, None
    for d in deltas:
        out = op.step(d)
        out_integral = out if out_integral is None else out_integral.plus(out)
        in_integral = d if in_integral is None else in_integral.plus(d)
        got = zset_to_dict(out_integral.consolidate())
        # drop groups with zero count (empty group) like the batch recompute does
        exp = zset_to_dict(agg(in_integral.consolidate()))
        exp = {k: w for k, w in exp.items() if k[1] != 0}
        got = {k: w for k, w in got.items() if w != 0 and k[1] != 0}
        assert got == exp


def test_upsert_semantics(spark):
    """add_input_map semantics (input.rs:293-303): last command per key wins
    within a batch; emits retract-old + insert-new."""
    op = UpsertOp(
        zs(spark, [], "k long, v string"), keys=["k"])
    cmds1 = spark.createDataFrame(
        [(1, "a", False, 1), (1, "b", False, 2), (2, "x", False, 1)],
        "k long, v string, __delete boolean, __seq long")
    d1 = op.step(cmds1)
    assert zset_to_dict(d1) == {(1, "b"): 1, (2, "x"): 1}

    cmds2 = spark.createDataFrame(
        [(1, "c", False, 1), (2, None, True, 1)],
        "k long, v string, __delete boolean, __seq long")
    d2 = op.step(cmds2)
    assert zset_to_dict(d2) == {(1, "c"): 1, (1, "b"): -1, (2, "x"): -1}


def test_retraction_round_reverts_output(spark):
    """FIXTURES.md §5.2: re-feed a prior batch negated → output reverts."""
    schema = "g string, x long"
    batch = zs(spark, [("a", 10, 1), ("a", 5, 1), ("b", 7, 1)], schema)
    agg = lambda z: z.aggregate(["g"], F.max("x").alias("mx"))
    op = AggregateOp(batch, ["g"], agg)
    first = op.step(batch)
    assert zset_to_dict(first) == {("a", 10): 1, ("b", 7): 1}
    second = op.step(batch.neg())
    # all outputs retracted
    assert zset_to_dict(first.plus(second).consolidate()) == {}


def test_z1_delays_one_tick(spark):
    from database_stream_processor_spark.plans import Z1Op
    empty = ZSetFrame.from_df(spark.createDataFrame([], "x int"))
    z1 = Z1Op(empty)
    a = ZSetFrame.from_df(spark.createDataFrame([(1,)], "x int"))
    b = ZSetFrame.from_df(spark.createDataFrame([(2,)], "x int"))
    assert zset_to_dict(z1.step(a)) == {}            # initial: empty
    assert zset_to_dict(z1.step(b)) == {(1,): 1}     # previous value
    assert zset_to_dict(z1.state.current) == {(2,): 1}


def test_stream_fold_running_scalar(spark):
    from database_stream_processor_spark.plans import StreamFoldOp
    init = spark.createDataFrame([(0,)], "total long")
    fold = StreamFoldOp(init, lambda acc, batch: acc.crossJoin(
        batch.weighted_count().withColumnRenamed("count", "c"))
        .selectExpr("total + c AS total"))
    b1 = ZSetFrame.from_df(spark.createDataFrame([(1,), (2,)], "x int"))
    b2 = ZSetFrame.from_df(spark.createDataFrame([(3,)], "x int"), weight=2)
    assert fold.step(b1).collect()[0]["total"] == 2
    assert fold.step(b2).collect()[0]["total"] == 4


def test_apply2_and_iterate_until(spark):
    from database_stream_processor_spark.operators import iterate_until
    from database_stream_processor_spark.plans import Apply2Op
    op = Apply2Op(lambda a, b: a.join(b, on=["k"]))
    a = ZSetFrame.from_df(spark.createDataFrame([(1, "x")], "k int, v string"))
    b = ZSetFrame.from_df(spark.createDataFrame([(1, 9)], "k int, n int"))
    assert zset_to_dict(op.step(a, b)) == {(1, "x", 9): 1}

    # numeric doubling until threshold — condition-driven iteration
    seed = spark.createDataFrame([(1.0,)], "x double")
    out = iterate_until(
        seed, lambda df: df.selectExpr("x * 2 AS x"),
        lambda df: df.collect()[0]["x"] >= 8)
    assert out.collect()[0]["x"] == 8.0


@pytest.mark.slow
def test_parquet_state_backend_partitioned(spark, tmp_path):
    """Cluster-scale state backend: StateTable persisted as partitioned
    parquet (the Delta/Parquet keyed state of SURVEY §1.4), results
    identical to the memory backend and partition directories present for
    pruning."""
    import os
    from database_stream_processor_spark.plans import AggregateOp

    def build(**state_kw):
        empty = ZSetFrame.from_df(spark.createDataFrame([], "k int, v int"))
        return AggregateOp(empty, ["k"], lambda z: z.aggregate_linear(
            ["k"], cnt=F.lit(1), total=F.col("v")), **state_kw)

    mem = build()
    disk = build(path=str(tmp_path / "state"), partition_by=["k"])
    batches = [[(1, 10), (2, 20)], [(1, -10), (3, 5)], [(2, 1)]]
    for b in batches:
        dz = ZSetFrame.from_df(spark.createDataFrame(b, "k int, v int"))
        assert zset_to_dict(mem.step(dz)) == zset_to_dict(disk.step(dz))
    assert zset_to_dict(mem.current_output) == zset_to_dict(disk.current_output)

    # the input integral is laid out as k=... partition dirs (pruned reads)
    base = tmp_path / "state" / "agg_input"
    epochs = sorted(os.listdir(base))
    assert epochs, "no state epochs written"
    assert any(d.startswith("k=") for d in os.listdir(base / epochs[-1]))


def test_linear_aggregate_op_equals_batch(spark):
    """LinearAggregateOp (O(|delta|), no input integral) matches the batch
    linear aggregate of the integrated input after every step, including a
    full-retraction round that must empty the touched group."""
    from database_stream_processor_spark.plans import LinearAggregateOp

    deltas = [
        zs(spark, [(1, 10, 1), (1, 20, 2), (2, 5, 1)], "k long, v long"),
        zs(spark, [(1, 20, -1), (3, 7, 1)], "k long, v long"),
        zs(spark, [(2, 5, -1)], "k long, v long"),   # group 2 cancels out
        zs(spark, [(2, 9, 4)], "k long, v long"),    # group 2 reappears
    ]
    op = LinearAggregateOp(deltas[0], ["k"],
                           {"cnt": F.lit(1), "total": F.col("v")})
    out_int, in_int = None, None
    for d in deltas:
        out = op.step(d)
        out_int = out if out_int is None else out_int.plus(out)
        in_int = d if in_int is None else in_int.plus(d)
        expected = in_int.aggregate_linear(
            ["k"], cnt=F.lit(1), total=F.col("v"))
        assert zset_to_dict(out_int.consolidate()) == zset_to_dict(expected)
    assert zset_to_dict(op.current_output) == zset_to_dict(
        in_int.aggregate_linear(["k"], cnt=F.lit(1), total=F.col("v")))


def test_join_op_none_delta_skips_leg(spark):
    """JoinOp.step with None for a side = "no changes": output matches the
    two-sided call with an explicit empty delta, and a static dim side never
    contributes a join leg."""
    a0 = zs(spark, [(1, "x", 1), (2, "y", 1)], "k long, av string")
    b0 = zs(spark, [(1, "p", 1), (2, "q", 1)], "k long, bv string")
    a1 = zs(spark, [(3, "z", 1), (1, "x", -1)], "k long, av string")

    op_none = JoinOp(a0, b0, on=["k"])
    op_empty = JoinOp(a0, b0, on=["k"])
    outs_none = [op_none.step(a0, b0), op_none.step(a1, None)]
    outs_empty = [op_empty.step(a0, b0),
                  op_empty.step(a1, ZSetFrame.empty_like(b0))]
    for zn, ze in zip(outs_none, outs_empty):
        assert zset_to_dict(zn) == zset_to_dict(ze)
    with pytest.raises(ValueError):
        op_none.step(None, None)

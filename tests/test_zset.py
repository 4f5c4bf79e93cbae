"""Z-set algebra unit tests — mirrors the reference's per-operator in-file
tests (SURVEY.md §5.1) on small hand-built Z-sets with mixed-sign weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_stream_processor_spark.zset import WEIGHT_COL, ZSetFrame
from tests.conftest import zset_to_dict


def zs(spark, rows, schema="k long, v string"):
    """Build a ZSetFrame from [(row..., weight)] tuples."""
    df = spark.createDataFrame([r[:-1] for r in rows], schema=schema)
    # attach weights by zipping via an id; simplest: build with weight col
    full = spark.createDataFrame(rows, schema=schema + f", {WEIGHT_COL} long")
    return ZSetFrame(full)


def test_consolidate_merges_and_drops_zeros(spark):
    z = zs(spark, [(1, "a", 2), (1, "a", 3), (2, "b", 1), (2, "b", -1), (3, "c", -2)])
    got = zset_to_dict(z)
    assert got == {(1, "a"): 5, (3, "c"): -2}


def test_distinct_keeps_positive_at_weight_one(spark):
    z = zs(spark, [(1, "a", 5), (2, "b", -3), (3, "c", 1), (3, "c", -1)])
    got = zset_to_dict(z.distinct())
    assert got == {(1, "a"): 1, (3, "c"): 0} or got == {(1, "a"): 1}


def test_neg_plus_minus(spark):
    a = zs(spark, [(1, "a", 1), (2, "b", 2)])
    b = zs(spark, [(2, "b", 1), (3, "c", 1)])
    assert zset_to_dict(a.plus(b)) == {(1, "a"): 1, (2, "b"): 3, (3, "c"): 1}
    assert zset_to_dict(a.minus(b)) == {(1, "a"): 1, (2, "b"): 1, (3, "c"): -1}
    assert zset_to_dict(a.neg()) == {(1, "a"): -1, (2, "b"): -2}


def test_join_multiplies_weights(spark):
    a = zs(spark, [(1, "x", 2), (2, "y", 3)], schema="k long, av string")
    b = zs(spark, [(1, "p", 5), (1, "q", -1)], schema="k long, bv string")
    j = a.join(b, on=["k"])
    got = zset_to_dict(j)
    assert got == {(1, "x", "p"): 10, (1, "x", "q"): -2}


def test_semi_anti_join(spark):
    a = zs(spark, [(1, "x", 1), (2, "y", 1), (3, "z", 1)], schema="k long, av string")
    b = zs(spark, [(1, "p", 1), (4, "q", 1)], schema="k long, bv string")
    semi = zset_to_dict(a.join(b, on=["k"], how="left_semi"))
    anti = zset_to_dict(a.join(b, on=["k"], how="left_anti"))
    assert semi == {(1, "x"): 1}
    assert anti == {(2, "y"): 1, (3, "z"): 1}


def test_anti_join_ignores_retracted_support(spark):
    """A key whose support in `other` has net weight <= 0 is absent."""
    a = zs(spark, [(1, "x", 1), (2, "y", 1)], schema="k long, av string")
    b = zs(spark, [(1, "p", 1), (1, "p", -1)], schema="k long, bv string")
    anti = zset_to_dict(a.join(b, on=["k"], how="left_anti"))
    assert anti == {(1, "x"): 1, (2, "y"): 1}


def test_set_ops(spark):
    a = zs(spark, [(1, "a", 2), (2, "b", 1)])
    b = zs(spark, [(2, "b", 3), (3, "c", 1)])
    assert zset_to_dict(a.union(b)) == {(1, "a"): 1, (2, "b"): 1, (3, "c"): 1}
    assert zset_to_dict(a.intersect(b)) == {(2, "b"): 1}
    assert zset_to_dict(a.except_(b)) == {(1, "a"): 1}


def test_aggregate_linear_count_sum(spark):
    z = zs(spark, [(1, 10, 2), (1, 5, 1), (2, 7, -1)], schema="k long, x long")
    out = z.aggregate_linear(["k"], cnt=F.lit(1), total=F.col("x"))
    got = zset_to_dict(out)
    # k=1: cnt = 2+1 = 3, total = 10*2 + 5*1 = 25 ; k=2: cnt=-1, total=-7
    assert got == {(1, 3, 25): 1, (2, -1, -7): 1}


def test_weigh_and_weighted_count(spark):
    z = zs(spark, [(1, 10, 2), (2, 3, 1)], schema="k long, x long")
    w = z.weigh(F.col("x"))
    assert zset_to_dict(w) == {(1, 10): 20, (2, 3): 3}
    assert z.weighted_count().collect()[0]["count"] == 3


def test_rows_expands_multiplicity(spark):
    z = zs(spark, [(1, "a", 3), (2, "b", 1), (3, "c", -1)])
    rows = sorted(tuple(r) for r in z.rows().collect())
    assert rows == [(1, "a")] * 3 + [(2, "b")]


def test_flat_map(spark):
    df = spark.createDataFrame([(1, [10, 20], 2)], "k long, xs array<long>, __weight long")
    z = ZSetFrame(df)
    out = z.flat_map(F.col("xs"), "x", keep=["k"])
    assert zset_to_dict(out) == {(1, 10): 2, (1, 20): 2}


def test_rows_rejects_weight_beyond_int32(spark):
    z = zs(spark, [(1, "a", 2**31)])
    with pytest.raises(Exception, match="weight exceeds int32"):
        z.rows().collect()

"""Property-based tests of the Z-set algebra against a slow Python
reference model — the reference engine's own proptest idiom
(distinct.rs:164-220 proptests over generated Z-sets;
rolling_aggregate.rs:826-960 vs `aggregate_range_slow`).

The model: a Z-set is a dict {row_tuple: weight}.  Every algebraic law the
engine relies on (SURVEY §7 "weight semantics everywhere") is checked
against it on hypothesis-generated inputs.
"""

from __future__ import annotations

import pytest

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from database_stream_processor_spark.zset import ZSetFrame
from tests.conftest import zset_to_dict

# rows: (key k in small range → collisions likely, value v, weight w ≠ huge)
row = st.tuples(st.integers(0, 3), st.integers(0, 2), st.integers(-3, 3))
zset_lists = st.lists(row, min_size=0, max_size=12)

SETTINGS = settings(max_examples=15, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])


def model(rows):
    """Reference consolidation: sum weights per (k, v), drop zeros."""
    m = defaultdict(int)
    for k, v, w in rows:
        m[(k, v)] += w
    return {kv: w for kv, w in m.items() if w != 0}


def lift(spark, rows):
    df = spark.createDataFrame(
        [(k, v, w) for k, v, w in rows], "k int, v int, __weight long")
    return ZSetFrame(df)


@given(rows=zset_lists)
@SETTINGS
def test_consolidate_matches_model(spark, rows):
    assert zset_to_dict(lift(spark, rows)) == model(rows)


@given(rows=zset_lists)
@SETTINGS
def test_distinct_keeps_positive_support_at_one(spark, rows):
    got = zset_to_dict(lift(spark, rows).distinct())
    want = {kv: 1 for kv, w in model(rows).items() if w > 0}
    assert got == want


@given(rows=zset_lists)
@SETTINGS
@pytest.mark.slow
def test_neg_is_additive_inverse(spark, rows):
    z = lift(spark, rows)
    assert zset_to_dict(z.plus(z.neg())) == {}


@given(a=zset_lists, b=zset_lists)
@SETTINGS
@pytest.mark.slow
def test_plus_minus_match_model(spark, a, b):
    za, zb = lift(spark, a), lift(spark, b)
    both = model(a + b)
    assert zset_to_dict(za.plus(zb)) == both
    negb = [(k, v, -w) for k, v, w in b]
    assert zset_to_dict(za.minus(zb)) == model(a + negb)


@given(a=zset_lists, b=zset_lists)
@SETTINGS
@pytest.mark.slow
def test_join_multiplies_weights(spark, a, b):
    """w_out(k, va, vb) = w_a(k, va) * w_b(k, vb)  (join.rs:56-64)."""
    za = lift(spark, a)
    zb = ZSetFrame(lift(spark, b).df.withColumnRenamed("v", "v2"))
    got = zset_to_dict(za.join(zb, on=["k"]))
    want = defaultdict(int)
    for (k1, v1), w1 in model(a).items():
        for (k2, v2), w2 in model(b).items():
            if k1 == k2:
                want[(k1, v1, v2)] += w1 * w2
    assert got == {kv: w for kv, w in want.items() if w != 0}


@given(rows=zset_lists)
@SETTINGS
def test_linear_aggregate_is_weighted_sum(spark, rows):
    """aggregate_linear(count=1, total=v) ≡ per-key weighted sums
    (aggregate/mod.rs:253-273 weight-multiply trick)."""
    z = lift(spark, rows)
    got = zset_to_dict(z.aggregate_linear(["k"], cnt=F.lit(1), total=F.col("v")))
    cnt, tot = defaultdict(int), defaultdict(int)
    for k, v, w in rows:
        cnt[k] += w
        tot[k] += v * w
    # a group whose aggregate vector is all-zero is absent (ring zero)
    want = {(k, cnt[k], tot[k]): 1 for k in cnt
            if (cnt[k], tot[k]) != (0, 0)}
    assert got == want


@given(rows=zset_lists)
@SETTINGS
@pytest.mark.slow
def test_distinct_is_idempotent(spark, rows):
    z = lift(spark, rows).distinct()
    assert zset_to_dict(z.distinct()) == zset_to_dict(z)

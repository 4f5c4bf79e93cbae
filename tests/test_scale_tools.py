"""Scale tools: bucketed co-located joins (exchange elimination — the
shard.rs:89 analog) and salted joins/aggregations for hot-key skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_stream_processor_spark.functions.skew import (
    salted_aggregate,
    salted_join,
)
from database_stream_processor_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    a = spark.createDataFrame([(i % 50, i) for i in range(1000)],
                              "k int, v int")
    b = spark.createDataFrame([(i % 50, i * 2) for i in range(500)],
                              "k int, w int")
    write_bucketed(a, "bkt_a", ["k"], 8, sort_by=["k"])
    write_bucketed(b, "bkt_b", ["k"], 8, sort_by=["k"])
    try:
        # force a merge join: a broadcast would trivially avoid the
        # shuffle; the point is SMJ with no exchange on either side
        j = read_bucketed(spark, "bkt_a").hint("merge").join(
            read_bucketed(spark, "bkt_b"), on="k")
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: zero shuffles
        assert n == 1000 * 10  # 20 rows/key on a, 10 on b, 50 keys
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_join(spark):
    # 90% of probe rows share one hot key
    probe = spark.createDataFrame(
        [((1 if i % 10 else i), i) for i in range(1000)], "k long, v long")
    build = spark.createDataFrame([(i, i * 100) for i in range(100)],
                                  "k long, w long")
    plain = {tuple(r) for r in probe.join(build, on="k").collect()}
    salted = {tuple(r) for r in
              salted_join(probe, build, ["k"], n_salts=8).collect()}
    # 900 hot-key rows + the 10 cold keys present in build (0,10,...,90)
    assert salted == plain and len(plain) == 910


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [((1 if i % 10 else i), float(i)) for i in range(1000)],
        "k long, v double")
    plain = {tuple(r) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count(F.lit(1)).alias("n")).collect()}
    salted = {tuple(r) for r in
              salted_aggregate(df, ["k"], 8,
                               F.sum("v").alias("s"),
                               F.count(F.lit(1)).alias("n")).collect()}
    assert salted == plain


def test_connected_components_chains_rings_singletons(spark):
    """Min-label propagation + pointer jumping finds exact components
    on shapes that stress it: a long chain (deep label chains — the
    pointer-jump payoff), a ring, a star, and isolated nodes supplied
    only via ``nodes``."""
    from database_stream_processor_spark.functions.dedup import (
        connected_components)
    chain = [(i, i + 1) for i in range(10, 25)]          # comp -> 10
    ring = [(30, 31), (31, 32), (32, 33), (33, 30)]      # comp -> 30
    star = [(40, j) for j in range(41, 46)]              # comp -> 40
    edges = spark.createDataFrame(chain + ring + star,
                                  "id_a int, id_b int")
    nodes = spark.createDataFrame([(n,) for n in range(10, 50)] +
                                  [(99,)], "id int")
    got = {(r.id, r.component)
           for r in connected_components(edges, "id_a", "id_b",
                                         nodes=nodes, id_col="id")
           .collect()}
    want = {(n, 10) for n in range(10, 26)}
    want |= {(n, 30) for n in range(30, 34)}
    want |= {(n, 40) for n in range(40, 46)}
    want |= {(n, n) for n in list(range(26, 30)) +
             list(range(34, 40)) + list(range(46, 50)) + [99]}
    assert got == want

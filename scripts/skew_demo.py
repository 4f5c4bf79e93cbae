"""Skew evidence for the headline join/aggregation keys (guide §2.5).

Two parts, written to plans/r13/skew_demo.txt:

1. MEASURE the real key-frequency skew of every headline join/groupBy key
   at the bench SF: max/median rows-per-key.  AQE's skew-join splitting
   only fires when a post-shuffle partition exceeds 5x the median AND the
   byte threshold, so a max/median below ~5 means no headline key is
   skewed enough to demonstrate (or need) splitting.

2. INDUCE a hot key (60% of ×20-amplified orders rerouted to one
   customer) and run the
   q10-shaped customer⋈orders join as a sort-merge join with the AQE skew
   thresholds scaled down to the local data size (at 100 TB the DEFAULT
   256 MB threshold plays the same role — the conf here only makes the
   demo reproducible at sf0.1).  The captured FINAL adaptive plan must
   show `AQEShuffleRead` with `skewed` splits — proving the session's
   skew handling (spark.sql.adaptive.skewJoin.enabled, set by load())
   actually engages on a hot key.

Usage: python scripts/skew_demo.py [--sf DIR]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from database_stream_processor_spark.queries import load
from database_stream_processor_spark.session import get_spark

SF = "/root/testdata/sf0.1"
if "--sf" in sys.argv:
    SF = sys.argv[sys.argv.index("--sf") + 1]

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r13", "skew_demo.txt")

#: headline (table, key) pairs that feed shuffling joins / groupBys
KEYS = [
    ("orders", "o_custkey"),       # q10 join key
    ("lineitem", "l_orderkey"),    # q01/q05 join-agg key
    ("lineitem", "l_suppkey"),     # q05 join key
    ("events", "user_id"),         # q20/q21/q42/q48 partition key
    ("documents", "doc_id"),       # dedup id key
]


def key_skew(spark, table: str, key: str) -> dict:
    counts = load(spark, SF, table).groupBy(key).count()
    row = counts.agg(
        F.max("count").alias("mx"),
        F.expr("percentile_approx(count, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("nkeys")).collect()[0]
    return {"table": table, "key": key, "max_rows_per_key": int(row["mx"]),
            "median_rows_per_key": int(row["med"]),
            "n_keys": int(row["nkeys"]),
            "max_over_median": round(row["mx"] / max(1, row["med"]), 2)}


def main() -> None:
    spark = get_spark(app_name="skew_demo")
    lines: list[str] = ["== Part 1: measured key skew at " + SF + " ==", ""]
    for table, key in KEYS:
        s = key_skew(spark, table, key)
        lines.append(
            f"{s['table']}.{s['key']}: max {s['max_rows_per_key']} / "
            f"median {s['median_rows_per_key']} rows per key "
            f"(ratio {s['max_over_median']}, {s['n_keys']} keys)")
    lines += ["",
              "AQE skew split needs max/median > 5 (skewedPartitionFactor)",
              "AND partition bytes > skewedPartitionThresholdInBytes.",
              "", "== Part 2: induced hot key (60% of x20-amplified orders -> custkey 7),",
              "   q10-shaped SMJ with thresholds scaled to local bytes ==",
              ""]

    orders = load(spark, SF, "orders")
    customer = load(spark, SF, "customer")
    # reroute ~60% of orders to one customer (the classic hot-tenant
    # shape) and amplify ×20 so the hot partition crosses the scaled
    # byte threshold; spread over 16 map tasks — a reduce partition is
    # skew-split into MAP-INDEX RANGES, so a single-mapper input (one
    # parquet file at sf0.1) can never split, while any real-scale scan
    # has thousands of mappers (found while building this demo)
    hot = (orders.repartition(16)
           .withColumn("__x", F.explode(F.sequence(F.lit(1), F.lit(20))))
           .drop("__x")
           .withColumn(
               "o_custkey",
               F.when(F.pmod(F.col("o_orderkey"), F.lit(10)) < 6, F.lit(7))
               .otherwise(F.col("o_custkey"))))
    old = {k: spark.conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize")}
    try:
        # force a shuffling join (no broadcast), and scale the skew/advisory
        # byte thresholds to sf0.1 data so the 5x-median factor — the part
        # that carries over unchanged to 100 TB — is what the demo shows
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "1MB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions"
                       ".minPartitionSize", "64KB")
        joined = (hot.join(customer,
                           hot.o_custkey == customer.c_custkey)
                  .groupBy("c_nationkey")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("o_totalprice").alias("rev")))
        joined.collect()  # finalize the adaptive plan
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        n_skew = plan.count("skewed")  # "Arguments: coalesced and skewed"
        lines.append(f"AQEShuffleRead nodes: {plan.count('AQEShuffleRead')}; "
                     f"'skewed' reader markers: {n_skew}")
        lines.append("")
        lines.append(plan)
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[:20]))
    print(f"... full plan in {OUT}")


if __name__ == "__main__":
    main()

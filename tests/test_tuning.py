"""Focused tests for the size-adaptive tick tuning (tuning.py).

These pin the r12 optimization invariants:

- under the static-plan conf (``aqe_off=True``), an eager checkpoint of a
  multi-exchange small plan schedules exactly ONE Spark job (with AQE on
  it is one per exchange plus one) — the conf the dedup pipelines' one-shot
  shared-subtree checkpoints run under;
- ``small_tick_conf`` restores every conf key it touches and is a strict
  no-op at/above the size threshold (the 100 TB axis).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_stream_processor_spark import tuning


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

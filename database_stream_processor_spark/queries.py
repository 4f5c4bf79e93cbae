"""Query registry: every operator from SURVEY.md §2 exercised as a named
query over the driver's TPC-H-ish tables, each with a DuckDB oracle SQL.

Engine-portability rules used throughout (so the driver's value-hash
compare passes):

- **No float-order nondeterminism**: every SUM/AVG over doubles casts the
  per-row value to ``decimal(25,8)`` (exact arithmetic, order-independent),
  sums, then casts back to double.  Per-row double expressions are fine
  (IEEE ops are deterministic and identical across engines).
- **Bucketing via epoch seconds**: window starts are emitted as ``long``
  epoch seconds, computed by flooring (Spark ``unix_timestamp``, DuckDB
  ``epoch_us // 1_000_000``).
- **Aliases match exactly** between the DataFrame plan and the oracle SQL.
- DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT).

Each query is registered as ``QuerySpec(spark_fn, oracle_sql)``;
``oracle_sql=None`` marks genuinely non-SQL-expressible ops (the driver
then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_stream_processor_spark.zset import ZSetFrame

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col: F.Column, alias: str) -> F.Column:
    """Order-independent SUM of a double expression: exact decimal
    accumulation, result as double."""
    return F.sum(col.cast("decimal(25,8)")).cast("double").alias(alias)


def davg(col: F.Column, alias: str) -> F.Column:
    """Order-independent AVG (decimal sum / count)."""
    return (F.sum(col.cast("decimal(25,8)")).cast("double")
            / F.count(F.lit(1))).alias(alias)


ORACLE_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(25,8))) AS DOUBLE)"
ORACLE_DAVG = "CAST(SUM(CAST({x} AS DECIMAL(25,8))) AS DOUBLE) / COUNT(*)"


def epoch_seconds(col: F.Column) -> F.Column:
    """Event-time → epoch seconds (floored) — matches DuckDB
    ``epoch_us(ts) // 1000000``."""
    return F.unix_timestamp(col.cast("timestamp"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` converted from raw nanosecond longs (see session.py
    nanosAsLong note) to a microsecond timestamp via exact integer division
    — same truncation DuckDB applies when reading TIMESTAMP(NANOS)."""
    e = load(spark, sf_dir, "events")
    return e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


# --------------------------------------------------------------------- #
# Relational core (SURVEY §2.2-2.7)
# --------------------------------------------------------------------- #

@register("q01_pricing_summary", oracle=f"""
SELECT l_returnflag, l_linestatus,
       {ORACLE_DSUM.format(x='l_quantity')} AS sum_qty,
       {ORACLE_DSUM.format(x='l_extendedprice')} AS sum_base_price,
       {ORACLE_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {ORACLE_DSUM.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {ORACLE_DAVG.format(x='l_quantity')} AS avg_qty,
       {ORACLE_DAVG.format(x='l_discount')} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: full-scan groupBy with linear aggregates — the
    reference's aggregate_linear path (aggregate/mod.rs:253-273).  Filter
    and the 4-column projection push down to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(dsum(F.col("l_quantity"), "sum_qty"),
                 dsum(F.col("l_extendedprice"), "sum_base_price"),
                 dsum(disc_price, "sum_disc_price"),
                 dsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
                 davg(F.col("l_quantity"), "avg_qty"),
                 davg(F.col("l_discount"), "avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


@register("q02_revenue_by_nation", oracle=f"""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {ORACLE_DSUM.format(x='o.o_totalprice')} AS total_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def q02_revenue_by_nation(spark, sf_dir):
    """The SURVEY §7 Phase-0 flagship in batch form: two joins + group-agg.
    nation/customer are small → Catalyst broadcasts them; the only shuffle
    is the final n_name aggregation."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum(F.col("o_totalprice"), "total_revenue")))


@register("q03_top_orders", oracle=f"""
SELECT o.o_orderkey, o.o_orderdate,
       {ORACLE_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""")
def q03_top_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective join + group + global top-10 (sort+limit;
    Spark's TakeOrderedAndProject — no full sort materialization).
    Deterministic ordering: exact decimal revenue, orderkey tiebreak."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (F.broadcast(c).join(o, c.c_custkey == o.o_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(dsum(rev, "revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10))


@register("q04_order_priority", oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""")
def q04_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS = left-semi join (reference semijoin_stream,
    src/operator/semijoin.rs:38)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) &
        (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = load(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (o.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


@register("q05_supplier_volume", oracle=f"""
SELECT n.n_name,
       {ORACLE_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'AMERICA')
GROUP BY n.n_name
""")
def q05_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join tree.  All dimensions broadcast; the
    fact table never shuffles until the final group-agg."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "AMERICA"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (c.join(o, o.o_custkey == c.c_custkey)
            .join(li, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) &
                  (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(dsum(rev, "revenue")))


@register("q06_forecast_revenue", oracle=f"""
SELECT {ORACLE_DSUM.format(x='l_extendedprice * l_discount')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25
""")
def q06_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-sum; all predicates push to the
    parquet reader (check PushedFilters in explain)."""
    li = load(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) &
        (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")) &
        F.col("l_discount").between(0.03, 0.07) & (F.col("l_quantity") < 25))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
             F.count(F.lit(1)).alias("n_items")))


@register("q07_customers_without_recent_orders", oracle="""
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_mktsegment
""")
def q07_customers_without_recent_orders(spark, sf_dir):
    """Anti-join (reference antijoin, join.rs:298-320 — built there as
    self − self⋈distinct(other); Spark's left_anti is the same set
    semantics in one operator)."""
    c = load(spark, sf_dir, "customer")
    o = (load(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
         .select(F.col("o_custkey").alias("c_custkey")))
    return (c.join(o, on="c_custkey", how="left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers")))


@register("q08_active_suppliers", oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
              AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00')
""")
def q08_active_suppliers(spark, sf_dir):
    """Semi-join (semijoin.rs:38)."""
    s = load(spark, sf_dir, "supplier")
    li = (load(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
          .select(F.col("l_suppkey").alias("s_suppkey")))
    return (s.join(li, on="s_suppkey", how="left_semi")
            .select("s_suppkey", "s_name"))


@register("q09_nation_customer_counts", oracle="""
SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers,
       COALESCE(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,8))) AS DOUBLE), 0.0) AS total_acctbal
FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def q09_nation_customer_counts(spark, sf_dir):
    """Left-outer join with default padding (reference outer_join_default,
    join.rs:365-386: full_outer + coalesce(col, default))."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return (n.join(c, c.c_nationkey == n.n_nationkey, "left_outer")
            .groupBy("n_name")
            .agg(F.count("c_custkey").alias("n_customers"),
                 F.coalesce(F.sum(F.col("c_acctbal").cast("decimal(25,8)"))
                            .cast("double"), F.lit(0.0)).alias("total_acctbal")))


@register("q10_signup_to_purchase", oracle=f"""
SELECT e1.user_id, CAST(COUNT(*) AS BIGINT) AS n_quick_purchases,
       {ORACLE_DSUM.format(x='e2.value')} AS purchase_value
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts >= e1.ts AND e2.ts < e1.ts + INTERVAL 2 HOUR
WHERE e1.event_type = 'signup' AND e2.event_type = 'purchase'
GROUP BY e1.user_id
""")
def q10_signup_to_purchase(spark, sf_dir):
    """Interval/range join (reference stream_join_range,
    join_range.rs:39-90): equi on user + time-range band.  The equi key
    carries the shuffle; the range predicate filters within partitions."""
    e = load_events(spark, sf_dir)
    e1 = e.filter(F.col("event_type") == "signup").alias("e1")
    e2 = e.filter(F.col("event_type") == "purchase").alias("e2")
    cond = ((F.col("e1.user_id") == F.col("e2.user_id")) &
            (F.col("e2.ts") >= F.col("e1.ts")) &
            (F.col("e2.ts") < F.col("e1.ts") + F.expr("INTERVAL 2 HOUR")))
    return (e1.join(e2, cond)
            .groupBy(F.col("e1.user_id").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n_quick_purchases"),
                 dsum(F.col("e2.value"), "purchase_value")))


@register("q11_distinct_parts_per_flag", oracle="""
SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem GROUP BY l_returnflag
""")
def q11_distinct_parts_per_flag(spark, sf_dir):
    """COUNT(DISTINCT) per group — the reference builds this as distinct()
    + aggregate_linear (nexmark q15/q16 idiom, SURVEY §2.5)."""
    li = load(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n_parts"),
                 F.countDistinct("l_suppkey").alias("n_suppliers")))


@register("q12_rollup_sales", oracle=f"""
SELECT l_returnflag, l_linestatus,
       {ORACLE_DSUM.format(x='l_extendedprice')} AS sum_price,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def q12_rollup_sales(spark, sf_dir):
    """GROUPING SETS/ROLLUP — not in the reference engine (SURVEY §2.5:
    frontend rewrite to unions of group-bys); native in Spark."""
    li = load(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(dsum(F.col("l_extendedprice"), "sum_price"),
                 F.count(F.lit(1)).alias("n_items")))


@register("q13_order_classification", oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 150000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS size_class,
       CONCAT(o_orderstatus, '/', o_orderpriority) AS status_priority,
       REGEXP_EXTRACT(o_orderpriority, '([0-9]+)', 1) AS priority_num,
       SPLIT_PART(o_orderpriority, '-', 1) AS priority_code
FROM orders
WHERE o_orderkey % 10 = 0
""")
def q13_order_classification(spark, sf_dir):
    """Scalar-function surface (SURVEY §2.10): CASE WHEN, concat,
    regexp_extract, split-index — all JVM expressions."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small").alias("size_class"),
        F.concat(F.col("o_orderstatus"), F.lit("/"),
                 F.col("o_orderpriority")).alias("status_priority"),
        F.regexp_extract(F.col("o_orderpriority"), r"([0-9]+)", 1).alias("priority_num"),
        F.split(F.col("o_orderpriority"), "-").getItem(0).alias("priority_code"))


@register("q14_order_date_parts", oracle="""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
       CAST(isodow(o_orderdate) AS INT) AS order_isodow,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(epoch_us(MIN(o_orderdate)) // 1000000 AS BIGINT) AS first_epoch
FROM orders GROUP BY 1, 2, 3
""")
def q14_order_date_parts(spark, sf_dir):
    """Date/time extraction (SURVEY §2.10: EXTRACT(EPOCH/ISODOW), CAST,
    date bucketing).  ISO dow derived portably from Spark's Sunday=1
    dayofweek."""
    o = load(spark, sf_dir, "orders")
    isodow = ((F.dayofweek("o_orderdate") + 5) % 7 + 1).cast("int")
    return (o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"),
                      F.month("o_orderdate").cast("int").alias("order_month"),
                      isodow.alias("order_isodow"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 epoch_seconds(F.min("o_orderdate")).alias("first_epoch")))


@register("q15_topk_orders_per_priority", oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
WHERE rnk <= 5
""")
def q15_topk_orders_per_priority(spark, sf_dir):
    """Top-K per group — reference expresses this as a Fold keeping a capped
    vec (nexmark q19.rs:40-55); Spark plans rank+filter as WindowGroupLimit
    (partial top-k before the shuffle)."""
    from database_stream_processor_spark.operators.windows import topk_per_group
    o = load(spark, sf_dir, "orders")
    return (topk_per_group(o, ["o_orderpriority"],
                           [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
                           k=5, rank_col="rnk")
            .select("o_orderpriority", "o_orderkey", "o_totalprice",
                    F.col("rnk").cast("int").alias("rnk")))


@register("q16_acctbal_extremes", oracle=f"""
SELECT n.n_name,
       MIN(c.c_acctbal) AS min_bal, MAX(c.c_acctbal) AS max_bal,
       {ORACLE_DAVG.format(x='c.c_acctbal')} AS avg_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""")
def q16_acctbal_extremes(spark, sf_dir):
    """Non-linear aggregates (Min/Max aggregators, aggregate/min.rs:1-62,
    max.rs:26-60; avg as (sum,count) pair, average.rs:227)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.min("c_acctbal").alias("min_bal"),
                 F.max("c_acctbal").alias("max_bal"),
                 davg(F.col("c_acctbal"), "avg_bal")))


@register("q17_union_except_intersect", oracle="""
WITH with_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
     building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'union' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM
  (SELECT c_custkey FROM with_orders UNION SELECT c_custkey FROM building)
UNION ALL
SELECT 'intersect' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM
  (SELECT c_custkey FROM with_orders INTERSECT SELECT c_custkey FROM building)
UNION ALL
SELECT 'except' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM
  (SELECT c_custkey FROM with_orders EXCEPT SELECT c_custkey FROM building)
""")
def q17_union_except_intersect(spark, sf_dir):
    """Set ops via the Z-set ring (SURVEY §2.7: plus/minus + distinct).
    Uses the engine's ZSetFrame union/intersect/except_ rather than the
    DataFrame built-ins to exercise the weight algebra."""
    o = ZSetFrame.from_df(load(spark, sf_dir, "orders")
                          .select(F.col("o_custkey").alias("c_custkey")))
    b = ZSetFrame.from_df(load(spark, sf_dir, "customer")
                          .filter(F.col("c_mktsegment") == "BUILDING")
                          .select("c_custkey"))
    od = o.distinct()
    rows = [
        od.union(b).df.select(F.lit("union").alias("op")),
        od.intersect(b).df.select(F.lit("intersect").alias("op")),
        od.except_(b).df.select(F.lit("except").alias("op")),
    ]
    counts = [df.groupBy("op").agg(F.count(F.lit(1)).alias("n")) for df in rows]
    out = counts[0].unionByName(counts[1]).unionByName(counts[2])
    return out


@register("q18_event_type_pivot", oracle="""
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
FROM events GROUP BY user_id
""")
def q18_event_type_pivot(spark, sf_dir):
    """Pivot = keyed conditional aggregation (Spark-native; the reference
    would express it as per-type filters + join)."""
    e = load_events(spark, sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    return (e.groupBy("user_id")
            .pivot("event_type", types)
            .agg(F.count(F.lit(1)))
            .na.fill(0, types))

"""Nexmark-style query suite — the reference engine's own test queries.

The reference ships 22 streaming Nexmark queries (q0-q9, q12-q22;
crates/nexmark/src/queries/mod.rs:31-53 — q10/q11 absent) over an
auction-site model (Person/Auction/Bid).  Our testdata has no auction
tables, so we derive the three relations *deterministically* from the
``events`` table — with the same arithmetic in the Spark builders and in
the DuckDB oracle CTEs — and re-express each query's semantics Spark-first:

- ``bid``     — one bid per event: auction = event_id % 199, price =
  floor(value*100) (integer cents → exact cross-engine aggregation),
  channel = event_type, synthetic url, b_ts = epoch seconds.
- ``auction`` — one per distinct auction id: seller/category/initial_bid by
  modular arithmetic, a_start = first bid time, expires = a_start + 7 days.
- ``person``  — one per distinct bidder with name/city/state by modular
  arithmetic.

Determinism conventions (driver hash-compares exact values):

- prices are integers (``floor``), so SUM/MIN/MAX are exact and
  AVG = CAST(SUM AS DOUBLE)/COUNT is the same IEEE division in both engines;
- all times are ``long`` epoch seconds; windows are integer ``div`` math;
- every rank/top-k has a total tie-break (price DESC, b_ts ASC, b_id ASC);
- ``round(price*0.908, 2)``: 908k mod 1000 is always a multiple of 4, never
  500, so no half-way rounding cases exist cross-engine.

Each query cites the reference file whose semantics it mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_stream_processor_spark.queries import (
    epoch_seconds,
    load,
    load_events,
    register,
)

# --------------------------------------------------------------------- #
# Derived Nexmark-ish relations (Spark side)
# --------------------------------------------------------------------- #

STATE_CASE = ("CASE p_id % 7 WHEN 0 THEN 'OR' WHEN 1 THEN 'ID' WHEN 2 THEN 'CA' "
              "WHEN 3 THEN 'WA' WHEN 4 THEN 'NV' WHEN 5 THEN 'UT' ELSE 'AZ' END")


def bids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return e.select(
        F.col("event_id").alias("b_id"),
        (F.col("event_id") % 199).alias("auction"),
        F.col("user_id").alias("bidder"),
        F.floor(F.col("value") * 100).alias("price"),
        F.col("event_type").alias("channel"),
        F.concat(F.lit("https://www.nexmark.com/"), F.col("event_type"),
                 F.lit("/item"),
                 (F.col("event_id") % 50).cast("string")).alias("url"),
        epoch_seconds(F.col("ts")).alias("b_ts"),
    )


def auctions(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bids(spark, sf_dir)
    return (b.groupBy(F.col("auction").alias("a_id"))
            .agg(F.min("b_ts").alias("a_start"))
            .select(
                "a_id",
                F.concat(F.lit("item"), F.col("a_id").cast("string")).alias("item_name"),
                (F.col("a_id") % 97).alias("seller"),
                (F.col("a_id") % 10).alias("category"),
                ((F.col("a_id") * 7) % 100 + 1).alias("initial_bid"),
                "a_start",
                (F.col("a_start") + 604800).alias("expires"),
            ))


def persons(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bids(spark, sf_dir)
    return (b.groupBy(F.col("bidder").alias("p_id"))
            .agg(F.min("b_ts").alias("p_ts"))
            .select(
                "p_id",
                F.concat(F.lit("user_"), F.col("p_id").cast("string")).alias("name"),
                F.concat(F.lit("city_"), (F.col("p_id") % 13).cast("string")).alias("city"),
                F.expr(STATE_CASE).alias("state"),
                "p_ts",
            ))


#: DuckDB CTE prefix mirroring the builders above, byte-for-byte semantics.
NX = """
WITH bid AS (
  SELECT event_id AS b_id,
         event_id % 199 AS auction,
         user_id AS bidder,
         CAST(floor(value * 100) AS BIGINT) AS price,
         event_type AS channel,
         'https://www.nexmark.com/' || event_type || '/item'
            || CAST(event_id % 50 AS VARCHAR) AS url,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS b_ts
  FROM events),
auction AS (
  SELECT auction AS a_id,
         'item' || CAST(auction AS VARCHAR) AS item_name,
         auction % 97 AS seller,
         auction % 10 AS category,
         (auction * 7) % 100 + 1 AS initial_bid,
         MIN(b_ts) AS a_start,
         MIN(b_ts) + 604800 AS expires
  FROM bid GROUP BY auction),
person AS (
  SELECT bidder AS p_id,
         'user_' || CAST(bidder AS VARCHAR) AS name,
         'city_' || CAST(bidder % 13 AS VARCHAR) AS city,
         CASE bidder % 7 WHEN 0 THEN 'OR' WHEN 1 THEN 'ID' WHEN 2 THEN 'CA'
              WHEN 3 THEN 'WA' WHEN 4 THEN 'NV' WHEN 5 THEN 'UT'
              ELSE 'AZ' END AS state,
         MIN(b_ts) AS p_ts
  FROM bid GROUP BY bidder)
"""

AVG_PRICE = "ROUND(CAST(SUM(price) AS DOUBLE) / COUNT(*), 4)"


def davg_long(col: str) -> F.Column:
    """AVG of an exact integer column as the same IEEE double division the
    oracle performs (sums < 2^53 are exact), rounded to 4 decimals so the
    driver's value canonicalizer can't split Spark vs DuckDB on halfway
    representations (the r5 nx_q17 red row: thousands of count-1/count-2
    groups emitting .0/.5 doubles)."""
    return F.round(F.sum(col).cast("double") / F.count(F.lit(1)), 4)


# --------------------------------------------------------------------- #
# q0-q2: passthrough / map / filter (linear operators, SURVEY §2.2)
# --------------------------------------------------------------------- #

@register("nx_q00_passthrough", oracle=NX + "SELECT * FROM bid")
def nx_q00_passthrough(spark, sf_dir):
    """q0: identity over the bid stream (crates/nexmark/src/queries/q0.rs) —
    measures raw pipeline overhead; here: one projection-only scan."""
    return bids(spark, sf_dir)


@register("nx_q01_currency", oracle=NX + """
SELECT auction, bidder, round(price * 0.908, 2) AS price_eur, b_ts FROM bid""")
def nx_q01_currency(spark, sf_dir):
    """q1: dollar→euro conversion (q1.rs:30 — price * 0.908). Pure map,
    stays in whole-stage codegen."""
    return bids(spark, sf_dir).select(
        "auction", "bidder",
        F.round(F.col("price") * 0.908, 2).alias("price_eur"), "b_ts")


@register("nx_q02_selection", oracle=NX + """
SELECT auction, price FROM bid WHERE auction % 13 = 0""")
def nx_q02_selection(spark, sf_dir):
    """q2: selection on auction id (q2.rs — auction %% N = 0; N scaled to
    our id space so the result is non-trivial)."""
    b = bids(spark, sf_dir)
    return b.filter(F.col("auction") % 13 == 0).select("auction", "price")


# --------------------------------------------------------------------- #
# q3-q4: joins + non-linear aggregates
# --------------------------------------------------------------------- #

@register("nx_q03_local_item_suggestion", oracle=NX + """
SELECT p.name, p.city, p.state, a.a_id
FROM auction a JOIN person p ON a.seller = p.p_id
WHERE a.category = 4 AND p.state IN ('OR', 'ID', 'CA')""")
def nx_q03_local_item_suggestion(spark, sf_dir):
    """q3: who is selling in OR/ID/CA in category 4 (q3.rs — incremental
    person⋈auction). The person side is tiny → broadcast join."""
    a = auctions(spark, sf_dir)
    p = persons(spark, sf_dir)
    return (a.filter(F.col("category") == 4)
            .join(F.broadcast(p.filter(F.col("state").isin("OR", "ID", "CA"))),
                  a.seller == p.p_id)
            .select("name", "city", "state", "a_id"))


WINNING_SQL = """
winning AS (
  SELECT a.a_id, a.seller, a.category, a.expires, MAX(b.price) AS final_price
  FROM auction a JOIN bid b
    ON b.auction = a.a_id AND b.b_ts BETWEEN a.a_start AND a.expires
  GROUP BY a.a_id, a.seller, a.category, a.expires)
"""


def winning_bids(spark, sf_dir):
    """Closing price per auction: max bid within [a_start, expires]
    (q4.rs:94-95 winning-bid core, shared with q6/q9)."""
    a = auctions(spark, sf_dir)
    b = bids(spark, sf_dir)
    return (a.join(b, (b.auction == a.a_id)
                   & b.b_ts.between(a.a_start, a.expires))
            .groupBy("a_id", "seller", "category", "expires")
            .agg(F.max("price").alias("final_price")))


@register("nx_q04_avg_closing_price", oracle=NX + "," + WINNING_SQL + f"""
SELECT category, {AVG_PRICE.replace('price', 'final_price')} AS avg_final
FROM winning GROUP BY category""")
def nx_q04_avg_closing_price(spark, sf_dir):
    """q4: average closing price per category (q4.rs)."""
    return (winning_bids(spark, sf_dir)
            .groupBy("category")
            .agg(F.round(F.sum("final_price").cast("double")
                         / F.count(F.lit(1)), 4).alias("avg_final")))


# --------------------------------------------------------------------- #
# q5, q7: windowed aggregates (SURVEY §2.9)
# --------------------------------------------------------------------- #

@register("nx_q05_hot_items", oracle=NX + """
, wb AS (
  SELECT b.auction, 900 * w AS window_start
  FROM bid b,
       UNNEST(generate_series((b.b_ts - 3600) // 900 + 1, b.b_ts // 900)) AS t(w)
  WHERE 900 * w >= 0),
counts AS (
  SELECT window_start, auction, COUNT(*) AS bid_count
  FROM wb GROUP BY window_start, auction)
SELECT window_start, auction, bid_count
FROM (SELECT *, MAX(bid_count) OVER (PARTITION BY window_start) AS mx
      FROM counts)
WHERE bid_count = mx""")
def nx_q05_hot_items(spark, sf_dir):
    """q5: hot items — auctions with the most bids per hopping window
    (q5.rs:76-118; 1h window, 15min hop here). The hop expansion is a
    JVM-side sequence+explode; the per-window max is a window function over
    the aggregated (small) frame — no second shuffle of raw bids."""
    b = bids(spark, sf_dir)
    starts = F.sequence(F.expr("(b_ts - 3600) div 900 + 1"),
                        F.expr("b_ts div 900"))
    wb = (b.withColumn("__w", F.explode(starts))
          .withColumn("window_start", F.col("__w") * 900)
          .filter(F.col("window_start") >= 0))
    counts = wb.groupBy("window_start", "auction").agg(
        F.count(F.lit(1)).alias("bid_count"))
    mx = F.max("bid_count").over(Window.partitionBy("window_start"))
    return (counts.withColumn("mx", mx)
            .filter(F.col("bid_count") == F.col("mx"))
            .select("window_start", "auction", "bid_count"))


@register("nx_q07_highest_bid", oracle=NX + """
SELECT window_start, auction, bidder, price FROM (
  SELECT (b_ts // 3600) * 3600 AS window_start, auction, bidder, price,
         ROW_NUMBER() OVER (PARTITION BY (b_ts // 3600)
                            ORDER BY price DESC, b_id ASC) AS rn
  FROM bid) WHERE rn = 1""")
def nx_q07_highest_bid(spark, sf_dir):
    """q7: highest bid per tumbling window (q7.rs; 1h windows). Catalyst
    plans rank-filter as WindowGroupLimit — per-partition top-1 before the
    shuffle."""
    b = bids(spark, sf_dir).withColumn(
        "window_start", F.expr("b_ts div 3600") * 3600)
    w = Window.partitionBy("window_start").orderBy(
        F.col("price").desc(), F.col("b_id").asc())
    return (b.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("window_start", "auction", "bidder", "price"))


# --------------------------------------------------------------------- #
# q6, q8, q9: winning-bid family + user monitoring
# --------------------------------------------------------------------- #

@register("nx_q06_avg_selling_price_by_seller", oracle=NX + "," + WINNING_SQL + f"""
, ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY seller
                               ORDER BY expires DESC, a_id DESC) AS rn
  FROM winning)
SELECT seller, {AVG_PRICE.replace('price', 'final_price')} AS avg_price
FROM ranked WHERE rn <= 10 GROUP BY seller""")
def nx_q06_avg_selling_price_by_seller(spark, sf_dir):
    """q6: average selling price of each seller's last 10 closed auctions
    (q6.rs:45,97 — Fold over a bounded per-seller window)."""
    win = winning_bids(spark, sf_dir)
    w = Window.partitionBy("seller").orderBy(
        F.col("expires").desc(), F.col("a_id").desc())
    return (win.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .groupBy("seller")
            .agg(F.round(F.sum("final_price").cast("double")
                         / F.count(F.lit(1)), 4).alias("avg_price")))


@register("nx_q08_monitor_new_users", oracle=NX + """
SELECT DISTINCT p.p_id, p.name, (p.p_ts // 86400) * 86400 AS window_start
FROM person p JOIN auction a
  ON a.seller = p.p_id AND (a.a_start // 86400) = (p.p_ts // 86400)""")
def nx_q08_monitor_new_users(spark, sf_dir):
    """q8: users who appeared and opened an auction in the same daily window
    (q8.rs — person⋈auction on tumbling windows)."""
    p = persons(spark, sf_dir).withColumn("p_day", F.expr("p_ts div 86400"))
    a = auctions(spark, sf_dir).withColumn("a_day", F.expr("a_start div 86400"))
    return (p.join(a, (a.seller == p.p_id) & (p.p_day == a.a_day))
            .select("p_id", "name", (F.col("p_day") * 86400).alias("window_start"))
            .dropDuplicates())


@register("nx_q09_winning_bids", oracle=NX + """
SELECT a_id, b_id, bidder, price, b_ts FROM (
  SELECT a.a_id, b.b_id, b.bidder, b.price, b.b_ts,
         ROW_NUMBER() OVER (PARTITION BY a.a_id
                            ORDER BY b.price DESC, b.b_ts ASC, b.b_id ASC) AS rn
  FROM auction a JOIN bid b
    ON b.auction = a.a_id AND b.b_ts BETWEEN a.a_start AND a.expires)
WHERE rn = 1""")
def nx_q09_winning_bids(spark, sf_dir):
    """q9: the winning bid (row, not just price) per auction (q9.rs) —
    highest price, earliest time/id as tie-break."""
    a = auctions(spark, sf_dir)
    b = bids(spark, sf_dir)
    joined = a.join(b, (b.auction == a.a_id)
                    & b.b_ts.between(a.a_start, a.expires))
    w = Window.partitionBy("a_id").orderBy(
        F.col("price").desc(), F.col("b_ts").asc(), F.col("b_id").asc())
    return (joined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("a_id", "b_id", "bidder", "price", "b_ts"))


# --------------------------------------------------------------------- #
# q12-q14: processing-time windows, side-input join, calculation
# --------------------------------------------------------------------- #

@register("nx_q12_processing_time_windows", oracle=NX + """
SELECT bidder, b_id // 1000 AS batch, COUNT(*) AS bid_count
FROM bid GROUP BY bidder, b_id // 1000""")
def nx_q12_processing_time_windows(spark, sf_dir):
    """q12: bids per bidder per processing-time window (q12.rs:62 —
    wall-clock windows). Deterministic analog: arrival-order batches of
    1000 events stand in for processing-time ticks."""
    return (bids(spark, sf_dir)
            .groupBy("bidder", F.expr("b_id div 1000").alias("batch"))
            .agg(F.count(F.lit(1)).alias("bid_count")))


@register("nx_q13_side_input_join", oracle=NX + """
SELECT b.auction, b.bidder, b.price, n.n_name AS side_value
FROM bid b JOIN nation n ON b.auction % 25 = n.n_nationkey""")
def nx_q13_side_input_join(spark, sf_dir):
    """q13: enrich bids against a bounded side input (q13.rs) — the nation
    table plays the static side; broadcast hash join, no shuffle of bids."""
    b = bids(spark, sf_dir)
    n = load(spark, sf_dir, "nation")
    return (b.join(F.broadcast(n), b.auction % 25 == n.n_nationkey)
            .select("auction", "bidder", "price",
                    F.col("n_name").alias("side_value")))


@register("nx_q14_calculation", oracle=NX + """
SELECT auction, bidder, round(price * 0.908, 2) AS price_eur,
       CASE WHEN (b_ts % 86400) // 3600 BETWEEN 8 AND 18 THEN 'dayTime'
            WHEN (b_ts % 86400) // 3600 <= 6 THEN 'nightTime'
            ELSE 'otherTime' END AS bid_time_type,
       b_ts
FROM bid WHERE round(price * 0.908, 2) > 10000""")
def nx_q14_calculation(spark, sf_dir):
    """q14: converted price + day/night bucketing + filter (q14 in the
    Nexmark set; scalar-function surface of SURVEY §2.10)."""
    b = bids(spark, sf_dir)
    hour = F.expr("(b_ts % 86400) div 3600")
    price_eur = F.round(F.col("price") * 0.908, 2)
    return (b.withColumn("price_eur", price_eur)
            .withColumn("bid_time_type",
                        F.when(hour.between(8, 18), "dayTime")
                        .when(hour <= 6, "nightTime")
                        .otherwise("otherTime"))
            .filter(F.col("price_eur") > 10000)
            .select("auction", "bidder", "price_eur", "bid_time_type", "b_ts"))


# --------------------------------------------------------------------- #
# q15-q17: statistics reports (COUNT DISTINCT + filtered counts, §2.5)
# --------------------------------------------------------------------- #

STATS_COLS_SQL = """
  COUNT(*) AS total_bids,
  COUNT(*) FILTER (WHERE price < 2000) AS rank1_bids,
  COUNT(*) FILTER (WHERE price >= 2000 AND price < 8000) AS rank2_bids,
  COUNT(*) FILTER (WHERE price >= 8000) AS rank3_bids,
  COUNT(DISTINCT bidder) AS total_bidders,
  COUNT(DISTINCT auction) AS total_auctions"""


def _stats_cols():
    return [
        F.count(F.lit(1)).alias("total_bids"),
        F.count(F.when(F.col("price") < 2000, 1)).alias("rank1_bids"),
        F.count(F.when((F.col("price") >= 2000) & (F.col("price") < 8000), 1)
                ).alias("rank2_bids"),
        F.count(F.when(F.col("price") >= 8000, 1)).alias("rank3_bids"),
        F.countDistinct("bidder").alias("total_bidders"),
        F.countDistinct("auction").alias("total_auctions"),
    ]


@register("nx_q15_bidding_statistics", oracle=NX + f"""
SELECT (b_ts // 86400) * 86400 AS day, {STATS_COLS_SQL}
FROM bid GROUP BY (b_ts // 86400) * 86400""")
def nx_q15_bidding_statistics(spark, sf_dir):
    """q15: daily bidding report with price-band counts and distinct
    bidders/auctions (q15.rs:78 — distinct() + aggregate_linear build)."""
    b = bids(spark, sf_dir).withColumn("day", F.expr("b_ts div 86400") * 86400)
    return b.groupBy("day").agg(*_stats_cols())


@register("nx_q16_channel_statistics", oracle=NX + f"""
SELECT channel, (b_ts // 86400) * 86400 AS day, {STATS_COLS_SQL}
FROM bid GROUP BY channel, (b_ts // 86400) * 86400""")
def nx_q16_channel_statistics(spark, sf_dir):
    """q16: per-channel daily report (q16.rs:158)."""
    b = bids(spark, sf_dir).withColumn("day", F.expr("b_ts div 86400") * 86400)
    return b.groupBy("channel", "day").agg(*_stats_cols())


@register("nx_q17_auction_statistics", oracle=NX + f"""
SELECT auction, (b_ts // 86400) * 86400 AS day,
       COUNT(*) AS total_bids,
       MIN(price) AS min_price, MAX(price) AS max_price,
       CAST(SUM(price) AS BIGINT) AS sum_price,
       {AVG_PRICE} AS avg_price
FROM bid GROUP BY auction, (b_ts // 86400) * 86400""")
def nx_q17_auction_statistics(spark, sf_dir):
    """q17: per-auction daily stats — count/min/max/sum/avg (q17 of the
    Nexmark set; min/max are the non-linear aggregates of SURVEY §2.5)."""
    b = bids(spark, sf_dir).withColumn("day", F.expr("b_ts div 86400") * 86400)
    return (b.groupBy("auction", "day")
            .agg(F.count(F.lit(1)).alias("total_bids"),
                 F.min("price").alias("min_price"),
                 F.max("price").alias("max_price"),
                 F.sum("price").alias("sum_price"),
                 davg_long("price").alias("avg_price")))


# --------------------------------------------------------------------- #
# q18-q22: last-bid, top-k, expand, channel-id, url parsing
# --------------------------------------------------------------------- #

@register("nx_q18_find_last_bid", oracle=NX + """
SELECT b_id, auction, bidder, price, b_ts FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY bidder, auction
                               ORDER BY b_ts DESC, b_id DESC) AS rn
  FROM bid) WHERE rn = 1""")
def nx_q18_find_last_bid(spark, sf_dir):
    """q18: each bidder's latest bid per auction (q18.rs:37-50 — Fold
    keeping the max-date bid; Spark-first: row_number + WindowGroupLimit)."""
    b = bids(spark, sf_dir)
    w = Window.partitionBy("bidder", "auction").orderBy(
        F.col("b_ts").desc(), F.col("b_id").desc())
    return (b.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("b_id", "auction", "bidder", "price", "b_ts"))


@register("nx_q19_auction_top10_prices", oracle=NX + """
SELECT auction, b_id, bidder, price, price_rank FROM (
  SELECT auction, b_id, bidder, price,
         ROW_NUMBER() OVER (PARTITION BY auction
                            ORDER BY price DESC, b_id ASC) AS price_rank
  FROM bid) WHERE price_rank <= 10""")
def nx_q19_auction_top10_prices(spark, sf_dir):
    """q19: top-10 priced bids per auction (q19.rs:40-55 — Fold with a
    capped vec; Spark plans a per-partition partial top-k)."""
    b = bids(spark, sf_dir)
    w = Window.partitionBy("auction").orderBy(
        F.col("price").desc(), F.col("b_id").asc())
    return (b.withColumn("price_rank", F.row_number().over(w))
            .filter(F.col("price_rank") <= 10)
            .select("auction", "b_id", "bidder", "price", "price_rank"))


@register("nx_q20_expand_bid_with_auction", oracle=NX + """
SELECT b.b_id, b.auction, b.bidder, b.price, b.channel, b.b_ts,
       a.item_name, a.seller, a.category, a.expires
FROM bid b JOIN auction a ON b.auction = a.a_id
WHERE a.category = 4""")
def nx_q20_expand_bid_with_auction(spark, sf_dir):
    """q20: bids enriched with their auction's metadata, one category
    (q20 of the Nexmark set). Auction side is small → broadcast."""
    b = bids(spark, sf_dir)
    a = auctions(spark, sf_dir).filter(F.col("category") == 4)
    return (b.join(F.broadcast(a), b.auction == a.a_id)
            .select("b_id", "auction", "bidder", "price", "channel", "b_ts",
                    "item_name", "seller", "category", "expires"))


@register("nx_q21_add_channel_id", oracle=NX + """
SELECT auction, bidder, price, channel,
       CASE channel WHEN 'click' THEN '0' WHEN 'view' THEN '1'
            WHEN 'purchase' THEN '2' WHEN 'signup' THEN '3'
            ELSE regexp_extract(url, 'item([0-9]+)', 1) END AS channel_id
FROM bid""")
def nx_q21_add_channel_id(spark, sf_dir):
    """q21: map known channels to ids, else REGEXP_EXTRACT from the url
    (q21.rs doc:42)."""
    b = bids(spark, sf_dir)
    cid = (F.when(F.col("channel") == "click", "0")
           .when(F.col("channel") == "view", "1")
           .when(F.col("channel") == "purchase", "2")
           .when(F.col("channel") == "signup", "3")
           .otherwise(F.regexp_extract("url", "item([0-9]+)", 1)))
    return b.select("auction", "bidder", "price", "channel",
                    cid.alias("channel_id"))


@register("nx_q22_get_url_directories", oracle=NX + """
SELECT auction, bidder, price,
       split_part(url, '/', 4) AS dir1, split_part(url, '/', 5) AS dir2
FROM bid""")
def nx_q22_get_url_directories(spark, sf_dir):
    """q22: SPLIT_INDEX over the bid url (q22.rs:36)."""
    b = bids(spark, sf_dir)
    parts = F.split("url", "/")
    return b.select("auction", "bidder", "price",
                    parts.getItem(3).alias("dir1"),
                    parts.getItem(4).alias("dir2"))


# --------------------------------------------------------------------- #
# Incremental variants — the reference runs the Nexmark suite through its
# incremental circuit (crates/nexmark/src/queries/q4.rs, q7.rs, q18.rs run
# under `Circuit` with input deltas); these drive the same semantics
# through the Z-set operator layer across 3 delta batches and check the
# integrated output against the identical one-shot oracle (the q56 idiom).
# --------------------------------------------------------------------- #


@register("nx_q04_inc_avg_closing", oracle=NX + "," + WINNING_SQL + f"""
SELECT category, {AVG_PRICE.replace('price', 'final_price')} AS avg_final
FROM winning GROUP BY category""")
def nx_q04_inc_avg_closing(spark, sf_dir):
    """q4 incrementally (q4.rs:60-101): JoinOp (bid deltas against the
    static auction dim, broadcast) → range filter → AggregateOp (per-
    auction MAX, touched-group recompute) → LinearAggregateOp (per-category
    SUM/COUNT in O(Δ)) across 3 bid batches; avg derived from the
    integrated (sum, count) pairs."""
    from database_stream_processor_spark.plans.incremental import (
        AggregateOp, JoinOp, LinearAggregateOp)
    from database_stream_processor_spark.zset import ZSetFrame

    a = auctions(spark, sf_dir).select("a_id", "category", "a_start",
                                       "expires")
    b = bids(spark, sf_dir).select(F.col("auction").alias("a_id"), "price",
                                   "b_ts", "b_id")

    join_op = JoinOp(ZSetFrame.from_df(b.limit(0).drop("b_id")),
                     ZSetFrame.from_df(a.limit(0)), on=["a_id"],
                     broadcast="right")
    win_schema = "a_id bigint, category bigint, final_price bigint"
    win_op = AggregateOp(
        ZSetFrame.from_df(
            spark.createDataFrame([], "a_id bigint, category bigint, "
                                      "price bigint")),
        ["a_id"],
        lambda z: ZSetFrame.from_df(
            z.rows().groupBy("a_id", "category")
            .agg(F.max("price").alias("final_price")), 1),
        materialize_every=1)
    cat_op = LinearAggregateOp(
        ZSetFrame.from_df(
            spark.createDataFrame([], win_schema).drop("a_id")),
        ["category"], {"s": F.col("final_price"), "n": F.lit(1)},
        materialize_every=1)

    az = ZSetFrame.from_df(a)
    out = None
    for step in range(3):
        db = ZSetFrame.from_df(
            b.filter(F.col("b_id") % 3 == step).drop("b_id"))
        joined = join_op.step(db, az if step == 0 else None)
        in_range = joined.filter(
            F.col("b_ts").between(F.col("a_start"), F.col("expires")))
        win_delta = win_op.step(in_range.map("a_id", "category", "price"))
        d = cat_op.step(win_delta.map("category", "final_price"))
        out = d if out is None else out.plus(d)
    final = out.consolidate().rows()
    return final.select(
        "category",
        F.round(F.col("s").cast("double") / F.col("n"), 4).alias("avg_final"))


@register("nx_q07_inc_highest_bid", oracle=NX + """
SELECT window_start, auction, bidder, price FROM (
  SELECT (b_ts // 3600) * 3600 AS window_start, auction, bidder, price,
         ROW_NUMBER() OVER (PARTITION BY (b_ts // 3600)
                            ORDER BY price DESC, b_id ASC) AS rn
  FROM bid) WHERE rn = 1""")
def nx_q07_inc_highest_bid(spark, sf_dir):
    """q7 incrementally (q7.rs): tumbling-window assignment is a linear
    map on the bid delta; the per-window top-1 (non-linear) is an
    AggregateOp keyed by window_start — each tick recomputes only windows
    touched by the delta from the integrated trace."""
    from database_stream_processor_spark.plans.incremental import AggregateOp
    from database_stream_processor_spark.zset import ZSetFrame

    b = bids(spark, sf_dir).select(
        (F.expr("b_ts div 3600") * 3600).alias("window_start"),
        "auction", "bidder", "price", "b_id")

    def top1(z):
        w = Window.partitionBy("window_start").orderBy(
            F.col("price").desc(), F.col("b_id").asc())
        rows = z.rows().withColumn("rn", F.row_number().over(w))
        return ZSetFrame.from_df(
            rows.filter(F.col("rn") == 1).drop("rn"), 1)

    op = AggregateOp(ZSetFrame.from_df(b.limit(0)), ["window_start"], top1,
                     materialize_every=1)
    out = None
    for step in range(3):
        d = op.step(ZSetFrame.from_df(b.filter(F.col("b_id") % 3 == step)))
        out = d if out is None else out.plus(d)
    return (out.consolidate().rows()
            .select("window_start", "auction", "bidder", "price"))


@register("nx_q18_inc_last_bid", oracle=NX + """
SELECT b_id, auction, bidder, price, b_ts FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY bidder, auction
                               ORDER BY b_ts DESC, b_id DESC) AS rn
  FROM bid) WHERE rn = 1""")
def nx_q18_inc_last_bid(spark, sf_dir):
    """q18 incrementally (q18.rs:37-50 — the reference's max-by Fold):
    AggregateOp keyed by (bidder, auction) recomputes each touched
    bidder×auction group's latest bid from the integrated trace; cost per
    tick ∝ touched groups, not the bid history."""
    from database_stream_processor_spark.plans.incremental import AggregateOp
    from database_stream_processor_spark.zset import ZSetFrame

    b = bids(spark, sf_dir).select("b_id", "auction", "bidder", "price",
                                   "b_ts")

    def latest(z):
        w = Window.partitionBy("bidder", "auction").orderBy(
            F.col("b_ts").desc(), F.col("b_id").desc())
        rows = z.rows().withColumn("rn", F.row_number().over(w))
        return ZSetFrame.from_df(
            rows.filter(F.col("rn") == 1).drop("rn"), 1)

    op = AggregateOp(ZSetFrame.from_df(b.limit(0)), ["bidder", "auction"],
                     latest, materialize_every=1)
    out = None
    for step in range(3):
        d = op.step(ZSetFrame.from_df(b.filter(F.col("b_id") % 3 == step)))
        out = d if out is None else out.plus(d)
    return (out.consolidate().rows()
            .select("b_id", "auction", "bidder", "price", "b_ts"))

"""Window-function family (SURVEY.md §2.6: the reference's only brush with
window semantics is its 1..10 result enumeration, T3).  Declared queries
cover ranking (row_number/rank/dense_rank/ntile), analytic offsets
(lag/lead), and aggregates over sliding/running frames.

Determinism: every window ORDER BY carries a unique tiebreaker column so
both engines rank identically; frame-sum queries aggregate exact decimals
where the frame can grow large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number: each customer's 3 most expensive orders
    (operators.relational.top_k_per_group keeps the rank column here)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rn"))


def q_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank + ntile over customers per market segment."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_mktsegment", "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"))


def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: per-user event value delta in time order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_prev"),
        F.lead("event_id").over(w).alias("next_event_id"))


def q_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frame: 3-row moving sum of event value per user."""
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    return ev.select(
        "user_id", "event_id",
        F.round(F.sum("value").over(w), 6).alias("moving_sum_3"),
        F.count("*").over(w).alias("frame_rows"))


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (unbounded-preceding) total of order value per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
        .cast("double").alias("running_total"))


def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame: each customer's first
    and latest order price."""
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return o.select(
        "o_custkey", "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"))


def q_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist distribution functions per segment — the
    remaining window-function family members (rank/dense_rank/ntile live
    in win_rank_dense)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_mktsegment", "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"))


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame — the time-window analytic ROWS frames
    can't express: per customer, order value and count over the 30 days
    up to and including each order.  Spark's rangeBetween needs a single
    numeric ORDER BY, so the sort key is days-since-epoch; the frame is
    peer-inclusive (all same-day orders join the frame), which makes the
    aggregate deterministic without a tiebreaker.  Exact DECIMAL inside
    the frame sum, one double conversion at the end (house float
    policy)."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1970-01-01")))
    w = (Window.partitionBy("o_custkey").orderBy(days)
         .rangeBetween(-30, 0))
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
        .cast("double").alias("sum_30d"),
        F.count("*").over(w).alias("n_orders_30d"))


QUERIES = {
    "win_range_frame": q_range_frame,
    "win_distribution": q_distribution,
    "win_topk_per_group": q_topk_per_group,
    "win_first_last": q_first_last,
    "win_rank_dense": q_rank_dense,
    "win_lag_delta": q_lag_delta,
    "win_sliding_sum": q_sliding_sum,
    "win_running_total": q_running_total,
}

ORACLES = {
    "win_range_frame": """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
           AS sum_30d,
       count(*) OVER w AS n_orders_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
""",
    "win_distribution": """
SELECT c_mktsegment, c_custkey,
       round(percent_rank() OVER w, 6) AS bal_pct_rank,
       round(cume_dist() OVER w, 6) AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    "win_first_last": """
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    "win_topk_per_group": """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn <= 3
""",
    "win_rank_dense": """
SELECT c_mktsegment, c_custkey,
       rank() OVER w AS bal_rank,
       dense_rank() OVER w AS bal_dense_rank,
       ntile(4) OVER w AS bal_quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
    "win_lag_delta": """
SELECT user_id, event_id,
       round(value - lag(value) OVER w, 6) AS delta_prev,
       lead(event_id) OVER w AS next_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    "win_sliding_sum": """
SELECT user_id, event_id,
       round(sum(value) OVER w, 6) AS moving_sum_3,
       count(*) OVER w AS frame_rows
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    "win_running_total": """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
}

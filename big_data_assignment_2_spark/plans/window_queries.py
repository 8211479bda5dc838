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


def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped time-series gap-fill + linear interpolation — the
    hypertable `time_bucket_gapfill`/`interpolate` shape: per user, the
    daily event count becomes a dense calendar (``sequence`` over each
    user's own [min, max] day span, exploded), missing days are filled by
    linear interpolation between the surrounding observations via
    running ``last(..., ignorenulls)`` / ``first(..., ignorenulls)``
    windows.  Endpoints are always observed (the span is bounded by the
    user's own observations), so no extrapolation branch exists.

    The observed metric is an integer count, so the interpolated value is
    an exact-rational double computed by the identical expression tree in
    both engines — bit-identical before the 6 dp round.  Scale: the
    calendar explode is proportional to sum of per-key spans (never a
    global calendar cross join), and both windows run inside the same
    per-user partition — one shuffle on user_id total."""
    e = load_table(spark, sf_dir, "events")
    obs = (e.groupBy("user_id", F.to_date("ts").alias("day"))
           .agg(F.count(F.lit(1)).alias("v")))
    cal = (obs.groupBy("user_id")
           .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
           .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day")))
    j = cal.join(obs, ["user_id", "day"], "left")
    wb = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(0, Window.unboundedFollowing))
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    prev_v = F.last("v", ignorenulls=True).over(wb)
    prev_d = F.last(obs_day, ignorenulls=True).over(wb)
    next_v = F.first("v", ignorenulls=True).over(wf)
    next_d = F.first(obs_day, ignorenulls=True).over(wf)
    frac = (F.datediff(F.col("day"), prev_d).cast("double")
            / F.datediff(next_d, prev_d).cast("double"))
    interp = F.when(F.col("v").isNotNull(), F.col("v").cast("double")) \
        .otherwise(prev_v.cast("double")
                   + (next_v - prev_v).cast("double") * frac)
    return j.select("user_id", "day",
                    F.round(interp, 6).alias("v_filled"),
                    F.col("v").isNull().alias("was_gap"))


QUERIES = {
    "win_gapfill_interp": q_gapfill_interp,
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
    # Same calendar, same forward/backward ignore-nulls scans, same
    # exact-integer interpolation arithmetic — DuckDB's generate_series is
    # inclusive like Spark's sequence; DATE - DATE is whole days in both.
    "win_gapfill_interp": """
WITH obs AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS v
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs
         GROUP BY user_id),
cal AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
j AS (
  SELECT c.user_id, c.day, o.v
  FROM cal c LEFT JOIN obs o ON c.user_id = o.user_id AND c.day = o.day
),
w AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER wb AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
             OVER wb AS prev_d,
         first_value(v IGNORE NULLS) OVER wf AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
             OVER wf AS next_d
  FROM j
  WINDOW wb AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
             ELSE CAST(prev_v AS DOUBLE)
                  + CAST(next_v - prev_v AS DOUBLE)
                    * (CAST(day - prev_d AS DOUBLE)
                       / CAST(next_d - prev_d AS DOUBLE)) END, 6)
           AS v_filled,
       (v IS NULL) AS was_gap
FROM w
""",
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

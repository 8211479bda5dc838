"""Event-analytics family (batch queries over the events table) + DuckDB
oracle twins: ordered conversion funnel and cohort retention — the two
canonical product-analytics shapes a warehouse engine must run well.

Scale notes: both queries aggregate to per-user rows first (one shuffle on
user_id, map-side combinable), then to tiny report relations; no
self-joins on the raw stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table

FUNNEL_STAGES = ["signup", "click", "purchase"]


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: a stage counts only when
    it happens at-or-after the user's previous stage.  Three conditional
    min-aggregations per user (single shuffle), then a tiny stage-count
    rollup — never a self-join of the event stream."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(*[
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
        for s in FUNNEL_STAGES])
    t0, t1, t2 = [F.col(f"t_{s}") for s in FUNNEL_STAGES]
    # stage reached: timestamps must be present AND ordered
    reached1 = t0.isNotNull()
    reached2 = reached1 & t1.isNotNull() & (t1 >= t0)
    reached3 = reached2 & t2.isNotNull() & (t2 >= t1)
    staged = per_user.select(
        F.when(reached3, 3).when(reached2, 2).when(reached1, 1)
        .otherwise(0).alias("funnel_stage"))
    return (staged.groupBy("funnel_stage")
            .agg(F.count(F.lit(1)).alias("n_users")))


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; for each later week, how many were active.  Per-user distinct
    activity weeks (one shuffle), cohort = min week, offsets exact because
    week-truncated dates differ by multiples of 7 days."""
    ev = load_table(spark, sf_dir, "events")
    weeks = (ev.select("user_id",
                       F.date_trunc("week", "ts").cast("date").alias("week"))
             .distinct())
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = weeks.join(cohort, "user_id")
    return (j.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users")))


Z_CUTOFF = 2.5


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly scan: events whose ``value`` deviates
    ≥ Z_CUTOFF population standard deviations from their type's mean.
    The per-type moments are a tiny agg broadcast back onto the stream —
    NOT a window partitioned by event_type, which would funnel each
    (few-valued, hence hot) type through one task at scale."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"))
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
    return (ev.join(F.broadcast(stats), "event_type")
            .select("event_id", "event_type", "value", z.alias("z"))
            .filter(F.abs(F.col("z")) >= Z_CUTOFF))




SESSION_GAP_US = 1_800_000_000    # 30 min inactivity splits a session


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized user-journey PATH MINING: per-user events are split
    into sessions at >30-min inactivity gaps (lag + cumulative-flag —
    the classic gap-sessionization window pattern, complementing the
    streaming ``session_window`` rows), each session's ordered
    event-type sequence becomes a '>'-joined path, and paths are counted
    across the corpus with their distinct-user reach — the product-
    analytics "what journeys do users actually take" report.

    Scale shape: every window is partitioned by user_id (well
    distributed, no global window), the session agg carries sorted
    structs in-row, and the final path rollup is an ordinary hash agg.
    Gap arithmetic is exact integer microseconds (unix_micros /
    epoch_us) so both engines sessionize identically; ordering ties
    break on event_id."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp"))
        .alias("__us"))
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    gap = F.col("__us") - F.lag("__us").over(w)
    sess = (ev.withColumn(
        "__new", F.when(gap.isNull() | (gap > SESSION_GAP_US), 1)
        .otherwise(0))
        .withColumn("session_no", F.sum("__new").over(w)))
    paths = (sess.groupBy("user_id", "session_no")
             .agg(F.array_join(F.transform(
                 F.sort_array(F.collect_list(
                     F.struct("__us", "event_id", "event_type"))),
                 lambda s: s["event_type"]), ">").alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.countDistinct("user_id").alias("n_users")))




def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov TRANSITION COUNTS over the sessionized event
    stream: within each session (same gap sessionization as
    ``events_paths``), count (from_event -> to_event) adjacent pairs and
    report each transition's share of its from-state's outgoing edges —
    the transition-matrix view of user behavior (next-step prediction,
    journey-graph weighting).

    Same scale shape as the path query: user-partitioned windows only,
    then one hash agg on (from_event, to_event) and a broadcast-sized
    per-from rollup joined back for the share."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__us"))
    w = Window.partitionBy("user_id").orderBy("__us", "event_id")
    gap = F.col("__us") - F.lag("__us").over(w)
    sess = (ev.withColumn(
        "__new", F.when(gap.isNull() | (gap > SESSION_GAP_US), 1)
        .otherwise(0))
        .withColumn("session_no", F.sum("__new").over(w)))
    ws = Window.partitionBy("user_id", "session_no")         .orderBy("__us", "event_id")
    steps = (sess
             .withColumn("to_event", F.lead("event_type").over(ws))
             .filter(F.col("to_event").isNotNull())
             .select(F.col("event_type").alias("from_event"), "to_event"))
    counts = (steps.groupBy("from_event", "to_event")
              .agg(F.count(F.lit(1)).alias("n")))
    outgoing = counts.groupBy("from_event")         .agg(F.sum("n").alias("__out"))
    return (counts.join(F.broadcast(outgoing), "from_event")
            .select("from_event", "to_event", "n",
                    F.round(F.col("n") / F.col("__out"), 6).alias("share")))


QUERIES = {
    "events_paths": q_event_paths,
    "events_transitions": q_event_transitions,
    "events_funnel": q_funnel,
    "events_retention": q_retention,
    "events_zscore_outliers": q_zscore_outliers,
}

ORACLES = {
    # Same sessionization CTEs as events_paths; lead() within session,
    # transition counts + per-from share.
    "events_transitions": f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
l AS (
  SELECT *, us - lag(us) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS gap
  FROM e),
s AS (
  SELECT *, sum(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_US}
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_no
  FROM l),
t AS (
  SELECT event_type AS from_event,
         lead(event_type) OVER (PARTITION BY user_id, session_no
                                ORDER BY us, event_id) AS to_event
  FROM s),
c AS (SELECT from_event, to_event, count(*) AS n
      FROM t WHERE to_event IS NOT NULL GROUP BY from_event, to_event),
o AS (SELECT from_event, sum(n) AS outn FROM c GROUP BY from_event)
SELECT c.from_event, c.to_event, c.n,
       round(CAST(c.n AS DOUBLE) / o.outn, 6) AS share
FROM c JOIN o USING (from_event)
""",
    # Gap sessionization replayed with the same integer-microsecond
    # arithmetic and (ts, event_id) tie-break; string_agg ORDER BY is the
    # sorted-struct transform's twin.
    "events_paths": f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
l AS (
  SELECT *, us - lag(us) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS gap
  FROM e),
s AS (
  SELECT *, sum(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_US}
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_no
  FROM l),
p AS (
  SELECT user_id, session_no,
         string_agg(event_type, '>' ORDER BY us, event_id) AS path
  FROM s GROUP BY user_id, session_no)
SELECT path, count(*) AS n_sessions,
       count(DISTINCT user_id) AS n_users
FROM p GROUP BY path
""",
    "events_zscore_outliers": f"""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY event_type),
z AS (
  SELECT e.event_id, e.event_type, e.value,
         round((e.value - s.mu) / s.sigma, 6) AS z
  FROM events e JOIN stats s USING (event_type))
SELECT event_id, event_type, value, z
FROM z WHERE abs(z) >= {Z_CUTOFF}
""",
    "events_funnel": f"""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id),
staged AS (
  SELECT CASE
           WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                AND t_click >= t_signup AND t_purchase IS NOT NULL
                AND t_purchase >= t_click THEN 3
           WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                AND t_click >= t_signup THEN 2
           WHEN t_signup IS NOT NULL THEN 1
           ELSE 0 END AS funnel_stage
  FROM per_user)
SELECT funnel_stage, count(*) AS n_users
FROM staged GROUP BY funnel_stage
""",
    "events_retention": """
WITH weeks AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', c.cohort_week, w.week) / 7 AS INTEGER)
           AS week_offset,
       count(*) AS n_active_users
FROM weeks w JOIN cohort c USING (user_id)
GROUP BY 1, 2
""",
}

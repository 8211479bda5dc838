"""Skew-mitigation family declared queries + DuckDB oracle twins.

The skew tools (operators/skew.py) are result-identical rewrites of a plain
join / aggregation, so their oracles are simply the PLAIN SQL forms — the
driver's comparison proves the salted plans compute exactly the unsalted
semantics (the property that makes them safe to drop into a 100 TB job).

l_quantity is integral (TPC-H 1..50, stored DOUBLE); aggregating it as
BIGINT keeps sums exact so the cross-engine hash compare is
float-order-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join, two_phase_agg
from ..sources.io import load_table

SALT = 8


def q_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation over lineitem's 3-value l_returnflag — the
    canonical hot-key groupBy (AQE does not split aggregation skew; the
    (key, salt) partial pass does)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_orderkey")
    return two_phase_agg(li, "l_returnflag", {
        "sum_qty": ("qty", "sum"),
        "n_rows": ("l_orderkey", "count"),
        "min_qty": ("qty", "min"),
        "max_qty": ("qty", "max"),
    }, salt=SALT)


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact×dim join (lineitem ⋈ supplier on suppkey) + revenue
    rollup by nation — the shape used when the dim is too big to broadcast
    and a hot fact key would serialize one sort-merge partition."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_quantity").cast("bigint").alias("qty"))
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey")
    joined = salted_join(li, sup, "suppkey", salt=SALT)
    return (joined.groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("qty").alias("sum_qty")))


def q_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER half of the skew story: when the join IS sort-merge, AQE
    skew splitting handles a hot key at runtime with no code change — no
    salting needed (operators/skew.py covers the shapes AQE can't:
    broadcast/shuffled-hash joins and aggregations).

    A hot key is planted (80% of documents map to key 0) and joined
    against a per-key dimension under skew-split-friendly AQE confs
    (restored afterwards so the session is untouched).  Three details
    make ``OptimizeSkewedJoin`` genuinely fire rather than silently
    decline, each learned the hard way:

    * the dimension is materialized (eager ``localCheckpoint``) BEFORE
      the join — derived lazily from the fact side it plans as
      ``Sort ← HashAggregate ← ShuffleStage`` and the rule never matches
      (replicating a split partition into an agg would be unsound);
      checkpointed, both SMJ children are bare shuffle stages;
    * every fact row carries an md5 payload (verified via ``max`` in the
      output so column pruning cannot drop it) — without it the
      constant-key/sequential-id hot partition lz4-compresses to under
      any sane ``skewedPartitionThresholdInBytes``;
    * the fact side is repartitioned to 8 map tasks — the split is by
      map-index ranges, so a single-mapper shuffle can never be split.

    The oracle is the plain SQL join (AQE's partition surgery must be
    result-invisible), and the query RAISES if the final adaptive plan
    lacks the ``skew=true`` marker — so a green driver row certifies
    both result parity and that the split actually happened.
    tests/test_skew.py::test_aqe_splits_planted_skew asserts the same on
    a larger planted-skew range.
    """
    docs = load_table(spark, sf_dir, "documents")
    nid = F.col("doc_id").cast("bigint")
    left = (docs.select(
        F.when(nid % 10 < 8, F.lit(0)).otherwise(nid).alias("k"),
        nid.alias("id"),
        F.md5(F.encode(nid.cast("string"), "utf-8")).alias("payload"))
        .repartition(8))

    skew_confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "32",
    }
    saved = {k: spark.conf.get(k, None) for k in skew_confs}
    try:
        for k, v in skew_confs.items():
            spark.conf.set(k, v)
        dim = (left.select("k").distinct()
               .select("k", (F.col("k") % 7).alias("label"))
               .localCheckpoint(eager=True))
        out = (left.join(dim, "k")
               .groupBy("label")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("id").alias("sum_id"),
                    F.max("payload").alias("max_payload")))
        # Eager: the plan must be chosen while the confs are active;
        # localCheckpoint materializes it now, so restoring confs after
        # cannot re-plan it.
        result = out.localCheckpoint(eager=True)
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "skew=true" not in plan:
            raise AssertionError(
                "AQE skew split did not fire on the planted hot key — "
                "the demonstration claim would be vacuous:\n" + plan)
        return result
    finally:
        for k, v in saved.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def q_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning — the third adaptive-execution
    lever after AQE skew split (`skew_aqe_join`) and salting
    (`skew_salted_join`).  When a selective dimension feeds a shuffle
    join, Spark injects a bloom_filter_agg scalar subquery on the dim and
    a might_contain predicate on the fact side, pruning fact rows BEFORE
    the shuffle — at 100 TB this is the difference between shuffling the
    full fact table and shuffling the ~1/20th that survives the filter.

    A selective orders slice (one priority, one date cut ≈ 5% of rows)
    joins lineitem with broadcast disabled (forcing the shuffle join the
    rule targets) and the application-side scan threshold lowered (the
    10 GB default is tuned for clusters, not a 17 MB test table).  Confs
    are restored afterwards.  The oracle is the plain SQL join — the
    runtime filter must be result-invisible — and the query RAISES if
    the executed plan lacks ``might_contain``, so a green driver row
    certifies both result parity and that the filter was injected.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("bigint").alias("qty"))
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderpriority") == "1-URGENT")
                 & (F.col("o_orderdate") < F.lit("1995-06-01")))
         .select("o_orderkey", "o_orderpriority"))

    bloom_confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in bloom_confs}
    try:
        for k, v in bloom_confs.items():
            spark.conf.set(k, v)
        out = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
               .groupBy("o_orderpriority")
               .agg(F.count(F.lit(1)).alias("n_items"),
                    F.sum("qty").alias("sum_qty")))
        # Eager checkpoint: plan while the confs are active.
        result = out.localCheckpoint(eager=True)
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "might_contain" not in plan:
            raise AssertionError(
                "runtime Bloom filter was not injected — the "
                "demonstration claim would be vacuous:\n" + plan)
        return result
    finally:
        for k, v in saved.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


QUERIES = {
    "skew_aqe_join": q_aqe_skew_join,
    "skew_bloom_filter_join": q_bloom_runtime_filter,
    "skew_two_phase_agg": q_two_phase_agg,
    "skew_salted_join": q_salted_join,
}

ORACLES = {
    # Plain SQL twin of the AQE-skew-split join: AQE partition surgery
    # must be result-invisible.
    "skew_aqe_join": """
WITH left_side AS (
  SELECT CASE WHEN CAST(doc_id AS BIGINT) % 10 < 8 THEN 0
              ELSE CAST(doc_id AS BIGINT) END AS k,
         CAST(doc_id AS BIGINT) AS id,
         md5(CAST(CAST(doc_id AS BIGINT) AS VARCHAR)) AS payload
  FROM documents),
dim AS (SELECT DISTINCT k, k % 7 AS label FROM left_side)
SELECT d.label, count(*) AS n_rows,
       CAST(sum(l.id) AS BIGINT) AS sum_id,
       max(l.payload) AS max_payload
FROM left_side l JOIN dim d ON l.k = d.k
GROUP BY d.label
""",
    # Plain SQL twin: the injected runtime filter must be result-invisible.
    "skew_bloom_filter_join": """
SELECT o.o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_orderdate < TIMESTAMP '1995-06-01'
GROUP BY o.o_orderpriority
""",
    # DuckDB sum(BIGINT) yields HUGEINT; cast back so the typed hash
    # compare matches Spark's BIGINT sums.
    "skew_two_phase_agg": """
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(l_orderkey) AS n_rows,
       min(CAST(l_quantity AS BIGINT)) AS min_qty,
       max(CAST(l_quantity AS BIGINT)) AS max_qty
FROM lineitem GROUP BY l_returnflag
""",
    "skew_salted_join": """
SELECT s.s_nationkey, count(*) AS n_items,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
}

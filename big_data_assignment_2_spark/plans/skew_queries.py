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


QUERIES = {
    "skew_two_phase_agg": q_two_phase_agg,
    "skew_salted_join": q_salted_join,
}

ORACLES = {
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

"""SQL-surface family: queries expressed through ``spark.sql`` over
registered views (the engine's second API surface next to the DataFrame
DSL).  Covers the remaining relational gap categories: DISTINCT, GROUPING
SETS, scalar / EXISTS / IN subqueries (Catalyst decorrelates them), string
scalar functions, exact percentiles, CASE bucketing.

Where Spark and DuckDB SQL dialects agree the oracle is the identical
statement — worth having some of these byte-identical to demonstrate ANSI
parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import register_views


def _sql(stmt: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(stmt)

    return run


_DISTINCT = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""

_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
"""

_SCALAR_SUBQ = """
SELECT o_orderstatus, count(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderstatus
"""

_EXISTS_SUBQ = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT'
                AND o.o_totalprice > 150000)
"""

_IN_SUBQ = """
SELECT p_brand, count(*) AS n_parts
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
GROUP BY p_brand
"""

_STRING_FUNCS = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       length(c_name) AS name_len,
       substr(c_name, 1, 8) AS name_prefix,
       replace(c_name, '#', '-') AS name_dashed,
       lpad(CAST(c_custkey AS STRING), 8, '0') AS key_padded,
       concat(c_mktsegment, ':', c_name) AS tagged
FROM customer
WHERE c_name LIKE 'Customer%'
"""

_CASE_BUCKETS = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS price_band,
       o_orderstatus,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY 1, 2
"""

# Exact interpolated percentiles: Spark `percentile` (exact) ≡ DuckDB
# quantile_cont.
_PERCENTILE_SPARK = """
SELECT o_orderstatus,
       round(percentile(o_totalprice, 0.5), 4) AS median_price,
       round(percentile(o_totalprice, 0.9), 4) AS p90_price
FROM orders GROUP BY o_orderstatus
"""
_PERCENTILE_DUCK = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders GROUP BY o_orderstatus
"""

# TPC-H Q2 shape: correlated scalar subquery in WHERE — for each part the
# cheapest line item; Catalyst decorrelates into an aggregate + join.
_MIN_COST_SUPPLIER = """
SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice
FROM lineitem l
WHERE l.l_extendedprice = (
    SELECT min(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
ORDER BY l.l_partkey, l.l_suppkey
"""

# TPC-H Q18 shape: HAVING-filtered aggregate driving an IN subquery.
_BIG_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, qty_sum
FROM orders
JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS qty_sum
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 120) big
  ON o_orderkey = big.l_orderkey
"""

# Null-safe equality: rows where nullable computed keys match including
# NULL==NULL (Spark `<=>` ≡ ANSI IS NOT DISTINCT FROM, which DuckDB has).
_NULLSAFE_JOIN_SPARK = """
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b
FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer) a
JOIN (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer) b
  ON a.seg <=> b.seg AND a.c_custkey < b.c_custkey AND a.c_custkey <= 20
"""
_NULLSAFE_JOIN_DUCK = _NULLSAFE_JOIN_SPARK.replace(
    "a.seg <=> b.seg", "a.seg IS NOT DISTINCT FROM b.seg")

QUERIES = {
    "sql_min_cost_supplier": _sql(_MIN_COST_SUPPLIER),
    "sql_big_orders": _sql(_BIG_ORDERS),
    "sql_nullsafe_join": _sql(_NULLSAFE_JOIN_SPARK),
    "sql_distinct": _sql(_DISTINCT),
    "sql_grouping_sets": _sql(_GROUPING_SETS),
    "sql_scalar_subquery": _sql(_SCALAR_SUBQ),
    "sql_exists_subquery": _sql(_EXISTS_SUBQ),
    "sql_in_subquery": _sql(_IN_SUBQ),
    "sql_string_funcs": _sql(_STRING_FUNCS),
    "sql_case_buckets": _sql(_CASE_BUCKETS),
    "sql_percentile": _sql(_PERCENTILE_SPARK),
}

ORACLES = {
    "sql_min_cost_supplier": _MIN_COST_SUPPLIER,
    "sql_big_orders": _BIG_ORDERS,
    "sql_nullsafe_join": _NULLSAFE_JOIN_DUCK,
    "sql_distinct": _DISTINCT,
    "sql_grouping_sets": _GROUPING_SETS,
    "sql_scalar_subquery": _SCALAR_SUBQ,
    "sql_exists_subquery": _EXISTS_SUBQ,
    "sql_in_subquery": _IN_SUBQ,
    "sql_string_funcs": _STRING_FUNCS,
    "sql_case_buckets": _CASE_BUCKETS,
    "sql_percentile": _PERCENTILE_DUCK,
}

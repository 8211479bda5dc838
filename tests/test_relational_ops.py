"""Unit tests for the scale-aware relational operators (as-of join with
tolerance/ties, grouped top-k)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.relational import (asof_join,
                                                              top_k_per_group)


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), 100.0),
         (1, ts("2024-01-01T10:05:00"), 101.0),
         (2, ts("2024-01-01T10:03:00"), 50.0),
         (3, ts("2024-01-01T09:00:00"), 7.0)],       # before any quote
        "sym int, ts timestamp, price double")
    quotes = spark.createDataFrame(
        [(1, ts("2024-01-01T09:59:00"), 99.5),
         (1, ts("2024-01-01T10:00:00"), 99.9),        # tie with trade 1 ts
         (1, ts("2024-01-01T10:04:00"), 100.5),
         (2, ts("2024-01-01T10:00:00"), 49.5),
         (3, ts("2024-01-01T12:00:00"), 7.5)],        # after the trade
        "sym int, ts timestamp, quote double")
    return trades, quotes


def test_asof_backward_with_ties(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", right_cols=["quote"])
    got = {(r["sym"], r["ts"].isoformat()): r["quote"] for r in out.collect()}
    # tie at 10:00 → the quote AT the trade timestamp is visible
    assert got[(1, "2024-01-01T10:00:00")] == 99.9
    assert got[(1, "2024-01-01T10:05:00")] == 100.5
    assert got[(2, "2024-01-01T10:03:00")] == 49.5
    assert got[(3, "2024-01-01T09:00:00")] is None    # nothing at-or-before


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", right_cols=["quote"],
                    tolerance=F.expr("INTERVAL 2 MINUTES"))
    got = {(r["sym"], r["ts"].isoformat()): r["quote"] for r in out.collect()}
    assert got[(1, "2024-01-01T10:00:00")] == 99.9    # 0 min old: kept
    assert got[(1, "2024-01-01T10:05:00")] == 100.5   # 1 min old: kept
    assert got[(2, "2024-01-01T10:03:00")] is None    # 3 min old: dropped


def test_asof_row_count_preserved(spark, trades_quotes):
    trades, quotes = trades_quotes
    assert asof_join(trades, quotes, on="sym",
                     right_cols=["quote"]).count() == trades.count()


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 7)) for i in range(20)]
        + [("b", i, float(i)) for i in range(3)],
        "grp string, id long, score double")
    out = top_k_per_group(df, ["grp"], [F.desc("score"), F.asc("id")], 2)
    got = {(r["grp"], r["id"]) for r in out.collect()}
    assert got == {("a", 6), ("a", 13), ("b", 2), ("b", 1)}


def test_global_rank_matches_naive_window(spark, sf_dir):
    from big_data_assignment_2_spark.operators.relational import global_rank
    from big_data_assignment_2_spark.sources.io import load_table
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    naive = o.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("bigint"))
    for n in (4, 13):  # rank must not depend on the partition count
        got = global_rank(o, order, partitions=n)
        assert got.exceptAll(naive).count() == 0
        assert naive.exceptAll(got).count() == 0


def test_global_rank_plan_has_range_exchange(spark, sf_dir):
    """The full-data path must be range-partitioned, NOT a single-partition
    window sort (the trap this operator exists to avoid)."""
    from big_data_assignment_2_spark.operators.relational import global_rank
    from big_data_assignment_2_spark.sources.io import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = global_rank(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")],
                      partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    # The only SinglePartition exchange feeds the per-partition-count window
    # (one row per partition), never the orders scan.
    assert plan.count("SinglePartition") <= 1


def test_scd2_history_versioning_invariants(spark, sf_dir):
    """SCD2 invariants: changed keys carry exactly two abutting versions
    (old closed at the effective date, new open-ended), unchanged keys
    one open row; no gaps or overlaps."""
    import datetime

    from big_data_assignment_2_spark.plans.relational_queries import (
        SCD2_MIN_ORDERS, SCD2_OPEN_END, q_scd2_history)
    from big_data_assignment_2_spark.sources.io import load_table

    def _d(v):
        # o_orderdate may surface as datetime at test scale; compare dates
        return v.date() if hasattr(v, "date") else v

    rows = q_scd2_history(spark, sf_dir).collect()
    open_end = datetime.date.fromisoformat(SCD2_OPEN_END)
    # Harness compatibility: the sentinel must survive a pandas
    # datetime64[ns] round-trip (ceiling 2262-04-11).
    import pandas as pd
    assert pd.Timestamp(SCD2_OPEN_END) <= pd.Timestamp.max
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["custkey"], []).append(r)
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import functions as F
    changed = {r[0] for r in o.groupBy("o_custkey").count()
               .filter(F.col("count") >= SCD2_MIN_ORDERS)
               .select("o_custkey").collect()}
    assert changed, "threshold too high for this sf: no changed keys"
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r["version"])
        if k in changed:
            assert len(vs) == 2
            assert _d(vs[0]["valid_to"]) == _d(vs[1]["valid_from"])  # abut
            assert _d(vs[1]["valid_to"]) == open_end
            assert vs[1]["segment"] == "PREMIUM"
        else:
            assert len(vs) == 1 and _d(vs[0]["valid_to"]) == open_end

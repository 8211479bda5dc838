"""Incremental view maintenance and grouped gap-fill interpolation:
the delta-merge must equal a recompute, and the interpolation must hit the
hand-computed line between observations."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment_2_spark.plans.relational_queries import (
    IVM_DEL_MOD, IVM_SPLIT, q_ivm_delta_agg)
from big_data_assignment_2_spark.plans.window_queries import q_gapfill_interp


def test_ivm_delta_merge_equals_recompute(spark, sf_dir):
    """The whole point of IVM: folding the signed delta into the
    materialized aggregate lands on exactly the table a full recompute
    over (base - deletions + inserts) produces — including groups that
    vanish when their multiplicity count hits zero."""
    from big_data_assignment_2_spark.sources.io import load_table

    got = {r["o_custkey"]: (r["n_orders"], r["sum_price"])
           for r in q_ivm_delta_agg(spark, sf_dir).collect()}

    o = load_table(spark, sf_dir, "orders")
    split = F.lit(IVM_SPLIT).cast("date")
    eff = o.filter(
        ((F.col("o_orderdate") < split)
         & (F.col("o_orderkey") % IVM_DEL_MOD != 0))
        | (F.col("o_orderdate") >= split))
    want = {r["o_custkey"]: (r["n_orders"], r["sum_price"])
            for r in eff.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("sum_price")).collect()}
    assert got == want


def test_ivm_groups_can_vanish(spark):
    """A key whose only base row is deleted and gets no insert must drop
    out of the maintained view (count reaches 0) — the counting-algorithm
    invariant that distinguishes IVM from append-only merge."""
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, p double")
    delta = spark.createDataFrame([(1, 10.0, -1), (3, 5.0, 1)],
                                  "k int, p double, m int")
    view = base.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                 F.sum("p").alias("s"))
    dagg = delta.groupBy("k").agg(
        F.sum("m").alias("dn"), F.sum(F.col("p") * F.col("m")).alias("ds"))
    merged = (view.join(dagg, "k", "full")
              .select("k",
                      (F.coalesce("n", F.lit(0))
                       + F.coalesce("dn", F.lit(0))).alias("n"),
                      (F.coalesce("s", F.lit(0.0))
                       + F.coalesce("ds", F.lit(0.0))).alias("s"))
              .filter(F.col("n") > 0))
    rows = {r["k"]: (r["n"], r["s"]) for r in merged.collect()}
    assert rows == {2: (1, 20.0), 3: (1, 5.0)}


def test_gapfill_linear_values(spark, tmp_path):
    """Observed days 1 and 4 with counts 2 and 8: days 2/3 interpolate to
    4.0 and 6.0 on the straight line; observed days pass through."""
    e = spark.createDataFrame(
        [(i, "2024-03-01 12:00:00", 7) for i in range(2)]
        + [(i + 2, "2024-03-04 12:00:00", 7) for i in range(8)],
        "event_id bigint, ts_s string, user_id int").selectExpr(
            "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
            "'c' AS event_type", "1.0 AS value", "map() AS props")
    # q_gapfill_interp counts events per (user, day): give user 7 two
    # events on day 1 and eight on day 4.
    d = str(tmp_path / "sf")
    e.write.parquet(f"{d}/events.parquet")
    out = {str(r["day"]): (r["v_filled"], r["was_gap"])
           for r in q_gapfill_interp(spark, d).collect()}
    assert out == {
        "2024-03-01": (2.0, False),
        "2024-03-02": (4.0, True),
        "2024-03-03": (6.0, True),
        "2024-03-04": (8.0, False),
    }


def test_gapfill_dense_series_untouched(spark, tmp_path):
    """A user with no gaps yields zero was_gap rows and original counts."""
    rows = []
    eid = 0
    for day, n in [("2024-03-01", 3), ("2024-03-02", 1), ("2024-03-03", 2)]:
        for _ in range(n):
            rows.append((eid, f"{day} 01:00:00", 9))
            eid += 1
    e = spark.createDataFrame(
        rows, "event_id bigint, ts_s string, user_id int").selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "'c' AS event_type", "1.0 AS value", "map() AS props")
    d = str(tmp_path / "sf")
    e.write.parquet(f"{d}/events.parquet")
    res = q_gapfill_interp(spark, d).collect()
    assert [r["was_gap"] for r in res] == [False] * 3
    assert sorted(r["v_filled"] for r in res) == [1.0, 2.0, 3.0]

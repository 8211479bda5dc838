"""transformWithStateInPandas (Spark 4 StatefulProcessor) converges to the
batch aggregation, same as the applyInPandasWithState variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.sources.io import load_table
from big_data_assignment_2_spark.streaming.windows import events_stream


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (absent in "
           "this container; the applyInPandasWithState variant in "
           "test_stateful_streaming.py covers custom state end-to-end)")
def test_stateful_v2_converges_to_batch(spark, sf_dir):
    from big_data_assignment_2_spark.streaming.stateful_v2 import (
        rocksdb_state_conf, running_user_totals_v2)

    rocksdb_state_conf(spark)
    stream = events_stream(spark, sf_dir, with_watermark=None)
    out = running_user_totals_v2(stream)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("running_totals_v2")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.table("running_totals_v2").collect()}
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("t"))
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert set(got) == set(want)
    for u, (n, t) in want.items():
        assert got[u][0] == n
        assert abs(got[u][1] - t) < 1e-4


def test_processor_batch_harness_converges(spark, sf_dir):
    """The protobuf-free certification path: the SAME RunningTotalsProcessor
    driven through init -> 3x handleInputRows (ValueState persisted between
    calls) -> close per key must land on the batch aggregate exactly."""
    from big_data_assignment_2_spark.streaming.stateful_v2 import (
        run_processor_batch)

    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in run_processor_batch(
               load_table(spark, sf_dir, "events")).collect()}
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("t"))
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert set(got) == set(want)
    for u, (n, t) in want.items():
        assert got[u][0] == n
        assert abs(got[u][1] - t) < 1e-4


def test_processor_batch_state_evolves_across_chunks(spark):
    """With n_microbatches=3 the processor's ValueState must actually carry
    counts between handleInputRows calls (a fresh-state bug would still
    pass the final-total check if each chunk were summed independently and
    yielded only once)."""
    from big_data_assignment_2_spark.streaming.stateful_v2 import (
        run_processor_batch)

    df = spark.createDataFrame(
        [(1, float(i)) for i in range(9)], "user_id long, value double")
    out = run_processor_batch(df, n_microbatches=3).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 9          # 3 chunks of 3, accumulated
    assert abs(out[0]["total_value"] - 36.0) < 1e-9


# --- TopKSessionProcessor (session TTL) -------------------------------------

def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts_s string, user_id bigint, value double"
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
                 "value")


def test_topk_ttl_session_reset(spark):
    """Events 40 minutes apart split sessions: only the LAST session's
    values survive, earlier (even larger) values are evicted."""
    from big_data_assignment_2_spark.streaming.stateful_v2 import (
        run_processor_timeordered)

    ev = _mk_events(spark, [
        (1, "2024-01-01 10:00:00", 7, 99.0),   # session 1 (largest value)
        (2, "2024-01-01 10:10:00", 7, 98.0),   # session 1
        (3, "2024-01-01 11:00:00", 7, 1.0),    # 50-min gap -> new session
        (4, "2024-01-01 11:20:00", 7, 3.0),
        (5, "2024-01-01 11:25:00", 7, 2.0),
        (6, "2024-01-01 11:40:00", 7, 4.0),
    ])
    out = sorted((r["rnk"], r["value"], r["n_session"])
                 for r in run_processor_timeordered(ev).collect())
    assert out == [(1, 4.0, 4), (2, 3.0, 4), (3, 2.0, 4)]


def test_topk_ttl_exact_30min_gap_keeps_session(spark):
    """The rule is STRICTLY greater than the gap (matches the oracle's
    `>` on INTERVAL 30 MINUTE)."""
    from big_data_assignment_2_spark.streaming.stateful_v2 import (
        run_processor_timeordered)

    ev = _mk_events(spark, [
        (1, "2024-01-01 10:00:00", 7, 5.0),
        (2, "2024-01-01 10:30:00", 7, 6.0),    # exactly 30 min: same sess
    ])
    out = sorted((r["rnk"], r["value"], r["n_session"])
                 for r in run_processor_timeordered(ev).collect())
    assert out == [(1, 6.0, 2), (2, 5.0, 2)]


def test_topk_ttl_batch_boundary_invariant(spark, sf_dir):
    """The per-row gap rule makes the final state independent of how the
    time-ordered input is chunked into micro-batches."""
    from big_data_assignment_2_spark.streaming.stateful_v2 import (
        run_processor_timeordered)

    ev = load_table(spark, sf_dir, "events")
    a = sorted(map(tuple, run_processor_timeordered(
        ev, n_microbatches=1).collect()))
    b = sorted(map(tuple, run_processor_timeordered(
        ev, n_microbatches=7).collect()))
    assert a == b and len(a) > 0

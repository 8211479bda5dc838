"""applyInPandasWithState: running per-user totals over a real stream must
converge to the batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment_2_spark.sources.io import load_table
from big_data_assignment_2_spark.streaming.stateful import running_user_totals
from big_data_assignment_2_spark.streaming.windows import events_stream


def test_running_totals_converge_to_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir, with_watermark=None)
    out = running_user_totals(stream)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("running_totals")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # Last update per user = final running value.
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.table("running_totals").collect()}
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("t"))
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert set(got) == set(want)
    for u, (n, t) in want.items():
        assert got[u][0] == n
        assert abs(got[u][1] - t) < 1e-4

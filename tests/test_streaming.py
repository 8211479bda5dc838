"""Genuine Structured Streaming execution (readStream → availableNow →
memory sink) must agree with the batch evaluation of the same operators."""

from __future__ import annotations

import pytest

from big_data_assignment_2_spark.sources.io import load_table
from big_data_assignment_2_spark.streaming.windows import (
    dedup_keys, events_stream, interval_join, session_agg, sliding_agg,
    stream_to_memory, tumbling_agg)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("agg", [tumbling_agg, sliding_agg, session_agg])
def test_stream_batch_parity(spark, sf_dir, agg):
    batch = agg(load_table(spark, sf_dir, "events"))
    stream = agg(events_stream(spark, sf_dir, with_watermark="1 hour"))
    assert stream.isStreaming
    name = f"t_{agg.__name__}"
    stream_to_memory(stream, name)
    got = _rows(spark.table(name))
    want = _rows(batch)
    assert got == want


@pytest.mark.parametrize("op", [dedup_keys, interval_join])
def test_append_mode_stream_batch_parity(spark, sf_dir, op):
    """Streaming dedup and stream-stream interval join (append-mode
    operators with watermark-bounded state) must agree with their batch
    evaluation.  availableNow emits all rows once the source drains."""
    batch = op(load_table(spark, sf_dir, "events"))
    stream = op(events_stream(spark, sf_dir, with_watermark="1 hour"))
    assert stream.isStreaming
    name = f"t_append_{op.__name__}"
    stream_to_memory(stream, name, output_mode="append")
    got = _rows(spark.table(name))
    want = _rows(batch)
    assert got == want


def test_foreachbatch_sink(spark, sf_dir, tmp_path):
    """foreachBatch: arbitrary batch sink (e.g. upsert target) — each
    micro-batch lands as parquet; total rows match the source."""
    import os

    out = os.path.join(tmp_path, "sink")
    stream = events_stream(spark, sf_dir, with_watermark=None) \
        .select("event_id", "event_type", "value")

    def sink(batch_df, batch_id: int):
        batch_df.write.mode("append").parquet(out)

    q = (stream.writeStream.foreachBatch(sink)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out)
    want = load_table(spark, sf_dir, "events")
    assert got.count() == want.count()


def test_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Checkpointed foreachBatch: a second run over the same source with the
    same checkpoint processes nothing — exactly-once at the sink."""
    import os

    out = os.path.join(tmp_path, "sink")
    ckpt = os.path.join(tmp_path, "ckpt")

    def run():
        stream = events_stream(spark, sf_dir, with_watermark=None) \
            .select("event_id")
        q = (stream.writeStream
             .foreachBatch(lambda df, bid: df.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run()
    n1 = spark.read.parquet(out).count()
    run()   # same checkpoint: source exhausted, nothing re-emitted
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == load_table(spark, sf_dir, "events").count()


def test_exactly_once_recovery_replay(spark, sf_dir):
    """The registry's exactly-once row injects a REAL failure: batch 0's
    first attempt writes a partial sink partition then dies before the
    checkpoint commit; a second query resumes from the same checkpoint
    and the replayed batch's overwrite replaces the partial partition.
    The drained sink must equal the plain batch aggregate — per-event
    integer cents, so the comparison is exact integer arithmetic (the
    r14 float-rounding flake cannot recur).  The query itself asserts
    the [0, 0, 1] attempt sequence (replay really happened)."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.plans.streaming_queries import (
        q_stream_exactly_once_sink)

    got = _rows(q_stream_exactly_once_sink(spark, sf_dir))
    want = _rows(
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .alias("total_cents")))
    assert got == want and want


def test_foreachbatch_topk_ranking_parity(spark, sf_dir):
    """Ranked top-k over an updating streaming aggregate is not an
    incremental operator; the production pattern ranks each micro-batch's
    aggregate snapshot in foreachBatch.  With availableNow the final
    snapshot equals the batch evaluation."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.streaming.windows import (
        events_stream, topk_types_per_window)

    want = _rows(topk_types_per_window(load_table(spark, sf_dir, "events")))

    agg = (events_stream(spark, sf_dir, with_watermark="1 hour")
           .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
           .agg(F.count("*").alias("n")))
    assert agg.isStreaming
    result = {}

    def rank_snapshot(batch_df, batch_id: int):
        from pyspark.sql import Window

        win = Window.partitionBy("w").orderBy(F.desc("n"),
                                              F.asc("event_type"))
        out = (batch_df.withColumn("rank", F.row_number().over(win))
               .filter(F.col("rank") <= 3)
               .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                       .alias("window_start"), "event_type", "n", "rank"))
        result["rows"] = sorted(tuple(r) for r in out.collect())

    q = (agg.writeStream.outputMode("complete")
         .foreachBatch(rank_snapshot).trigger(availableNow=True).start())
    q.awaitTermination()
    assert result["rows"] == want


def test_dedup_within_watermark_streaming(spark, sf_dir):
    """dropDuplicatesWithinWatermark (bare-key state, watermark
    eviction) through the real micro-batch engine: with one drained
    input file (a single micro-batch) the surviving key set must be
    exactly the distinct keys of the batch table."""
    from big_data_assignment_2_spark.streaming.windows import \
        dedup_keys_within_watermark

    stream = dedup_keys_within_watermark(
        events_stream(spark, sf_dir, with_watermark="1 hour"))
    assert stream.isStreaming
    stream_to_memory(stream, "t_dedup_wm", output_mode="append")
    got = _rows(spark.table("t_dedup_wm"))
    want = _rows(load_table(spark, sf_dir, "events")
                 .select("user_id", "event_type").distinct())
    assert got == want


def test_stream_static_enrichment_parity(spark, sf_dir):
    """Stream-static broadcast enrichment drained under availableNow
    must equal the batch join+agg of the same relations."""
    from pyspark.sql import functions as F

    dim = (load_table(spark, sf_dir, "nation")
           .select(F.col("n_nationkey").alias("nk"),
                   F.col("n_name").alias("nation")))

    def shape(ev):
        return (ev.withColumn("nk", F.col("user_id") % 25)
                .join(F.broadcast(dim), "nk")
                .groupBy("nation", "event_type")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum(F.round(F.col("value") * 100).cast("bigint"))
                     .alias("total_cents")))

    stream = shape(events_stream(spark, sf_dir, with_watermark=None))
    assert stream.isStreaming
    stream_to_memory(stream, "t_enrich_static")
    got = _rows(spark.table("t_enrich_static"))
    want = _rows(shape(load_table(spark, sf_dir, "events")))
    assert got == want


def test_stream_dedup_history_matches_batch_anti_join(spark, sf_dir):
    """stream_dedup_history (r9): the streamed left-anti result must
    equal the batch anti-join of incoming keys vs historical keys."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.dedup import tokenset_key
    from big_data_assignment_2_spark.plans.streaming_queries import \
        q_stream_dedup_history

    got = {(r["doc_id"], r["source"])
           for r in q_stream_dedup_history(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumn("__k", tokenset_key("text")) \
        .withColumn("__nid", F.col("doc_id").cast("bigint"))
    hist = docs.filter("__nid % 5 <> 0").select("__k").distinct()
    want = {(str(r["doc_id"]), r["source"]) for r in
            docs.filter("__nid % 5 = 0")
            .join(hist, "__k", "left_anti")
            .select("doc_id", "source").collect()}
    assert got == want and want


def test_interval_join_outer_stream_batch_parity(spark, sf_dir):
    """LEFT OUTER stream-stream interval join: the drained stream,
    restricted to the closed region (join window below the engine's
    final watermark — which derives from max(click ∪ purchase) ts, the
    only rows the pushed-below-filter watermark node ever sees), must
    equal the batch left join under the same bound, and must contain
    BOTH matched and null-padded rows (the nulls are the part only the
    stateful runtime can produce)."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.plans.streaming_queries import (
        q_interval_join_outer_live)
    from big_data_assignment_2_spark.streaming.windows import (
        interval_join_outer)

    got = _rows(q_interval_join_outer_live(spark, sf_dir))
    ev = load_table(spark, sf_dir, "events") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    mx = (ev.filter(F.col("event_type").isin("click", "purchase"))
          .agg(F.max("ts")).first()[0])
    closed = ((F.col("l_ts") + F.expr("INTERVAL 1 hour"))
              < (F.lit(mx) - F.expr("INTERVAL 1 hour")
                 - F.expr("INTERVAL 1 minute")))
    want = _rows(interval_join_outer(ev).filter(closed)
                 .select("user_id",
                         F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                         .alias("left_ts"),
                         F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                         .alias("right_ts")))
    assert got == want and want
    assert any(r[2] is None for r in got)      # unmatched clicks emitted
    assert any(r[2] is not None for r in got)  # matched pairs too

"""Structured Streaming over the events table (SURVEY.md §2.8: the
reference has NO streaming — its "Hadoop Streaming" is stdin piping).

Design: every aggregation here is written against a plain DataFrame, so the
SAME function serves batch (oracle-checkable) and streaming (readStream)
inputs — ``F.window``/``F.session_window`` are streaming-native operators
that also evaluate in batch.  Streaming execution is exercised in
tests/test_streaming.py with a file source + availableNow trigger; batch
results are the oracle (SURVEY.md §7.5: declared streaming queries are
restricted to batch-equivalent results).

Scale notes: with ``withWatermark`` the state store evicts windows older
than the watermark, so state is bounded by (watermark horizon × key
cardinality); tumbling/sliding aggs shuffle once on (key, window); the
session-window agg uses Spark's built-in session merge rather than a
custom applyInPandasWithState — same semantics, JVM-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, sf_dir: str,
                  with_watermark: str | None = "1 hour") -> DataFrame:
    """File-source stream of the events table (one-file directory; for a
    live pipeline this would be Kafka — the transformations are identical).
    Converts the nanos-as-long ts exactly like the batch loader."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The directory also contains the other tables; restrict via pathGlobFilter.
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if with_watermark:
        stream = stream.withWatermark("ts", with_watermark)
    return stream


def tumbling_agg(events: DataFrame, width: str = "1 day") -> DataFrame:
    """Tumbling-window counts/sums per event_type."""
    return (events.groupBy(F.window("ts", width).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("total_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                    "event_type", "n", "total_value"))


def sliding_agg(events: DataFrame, width: str = "2 days",
                slide: str = "1 day") -> DataFrame:
    """Sliding-window counts per event_type (each event lands in
    width/slide windows)."""
    return (events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                    "event_type", "n"))


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: sessions close after `gap` of inactivity."""
    return (events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("session_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("session_start"),
                    "user_id", "n_events", "session_value"))


def stream_to_memory(stream_df: DataFrame, name: str) -> None:
    """Run a streaming query to completion over the available data
    (availableNow trigger) into an in-memory sink; returns after the
    stream finishes.  Complete mode because the aggs above are stateful."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()

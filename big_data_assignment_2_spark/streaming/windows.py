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
                  with_watermark: str | None = "1 hour",
                  single_batch: bool = False) -> DataFrame:
    """File-source stream of the events table (one-file directory; for a
    live pipeline this would be Kafka — the transformations are identical).
    Converts the nanos-as-long ts exactly like the batch loader."""
    # UTC for oracle parity (see sources.io.load_table): window bucketing
    # and date_format follow the session zone; DuckDB's oracles are
    # zone-free.  Runtime-settable, so driver-owned bare sessions work.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    import os
    reader = spark.readStream.schema(raw_schema)
    if single_batch:
        # Callers whose oracle assumes the availableNow drain is ONE
        # micro-batch (e.g. dropDuplicatesWithinWatermark, where state
        # evicted between batches re-admits a key) pin the per-trigger
        # file cap above any plausible part-file count, so a
        # directory-of-part-files table can't split the drain.
        reader = reader.option("maxFilesPerTrigger", 1_000_000)
    if os.path.isdir(f"{sf_dir}/events.parquet"):
        # Spark-written table (e.g. the ~sf1 scale set): a DIRECTORY of
        # part files — stream the directory itself (a filename glob
        # against sf_dir would match nothing and silently drain empty).
        stream = reader.parquet(f"{sf_dir}/events.parquet")
    else:
        # Driver testdata: single files side by side; restrict via
        # pathGlobFilter so the other tables' files are not read.
        stream = (reader.option("pathGlobFilter", "events.parquet")
                  .parquet(sf_dir))
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Parquet may surface ts as TIMESTAMP_NTZ; withWatermark requires
        # TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).  The
        # stored instants are session-TZ-free, so the cast is value-exact.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
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


def dedup_keys(events: DataFrame, width: str = "1 day") -> DataFrame:
    """Streaming deduplication: one row per (user, event_type, window) key.

    Under readStream this is ``dropDuplicates`` on a watermarked window
    column, so state evicts once the watermark passes the window — bounded
    by (horizon × key cardinality), the standard streaming-dedup shape.
    Projected to the key columns so batch and streaming (and the oracle's
    DISTINCT) agree deterministically regardless of which duplicate row
    the operator keeps.
    """
    return (events
            .select("user_id", "event_type", F.window("ts", width).alias("w"))
            .dropDuplicates(["user_id", "event_type", "w"])
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "user_id", "event_type"))


def dedup_keys_within_watermark(events: DataFrame) -> DataFrame:
    """Streaming dedup on BARE keys with watermark-driven state eviction
    (``dropDuplicatesWithinWatermark``, Spark 3.5+): unlike
    :func:`dedup_keys` there is no window column in the key, so state for
    a key is dropped once the watermark passes its last-seen event time —
    the unbounded-key-cardinality-safe shape (keys never accumulate
    forever).  Requires an upstream ``withWatermark``.  Projected to the
    key columns so batch/streaming/oracle agree regardless of which
    duplicate survives; under an availableNow drain of a single input
    file (one micro-batch) the kept-key set is exactly DISTINCT keys.
    """
    return (events
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type"))


def interval_join(events: DataFrame, left_type: str = "click",
                  right_type: str = "purchase",
                  horizon: str = "1 hour") -> DataFrame:
    """Stream-stream event-time interval join: pair each ``left_type``
    event with the same user's ``right_type`` events in the following
    ``horizon`` (click→purchase attribution).

    In streaming both sides carry the source watermark and the join
    condition bounds event-time distance, so Spark can evict join state
    older than (watermark + horizon); in batch the same plan is an
    equi-join on user_id with a range predicate (no cartesian).
    """
    l = (events.filter(F.col("event_type") == left_type)
         .select("user_id", F.col("ts").alias("l_ts")))
    r = (events.filter(F.col("event_type") == right_type)
         .select(F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")))
    j = l.join(r, (F.col("user_id") == F.col("r_user"))
               & (F.col("r_ts") >= F.col("l_ts"))
               & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")))
    return j.select(
        "user_id",
        F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("left_ts"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("right_ts"))


def interval_join_outer(events: DataFrame, left_type: str = "click",
                        right_type: str = "purchase",
                        horizon: str = "1 hour") -> DataFrame:
    """LEFT OUTER stream-stream interval join (r15): like
    :func:`interval_join`, but clicks with NO purchase in the horizon
    ALSO emit — with a NULL right side — once the watermark passes their
    join window (click→purchase attribution including the non-buyers,
    the funnel-drop-off measurement).  The outer rows are the part only
    the STREAMING runtime can certify: the engine must hold the left row
    in state until the watermark proves no match can still arrive, then
    emit exactly one null-padded row and evict.

    Returns RAW (user_id, l_ts, r_ts) — callers apply the closed-region
    restriction (l_ts + horizon safely BELOW the final watermark) before
    comparing against a batch left join: rows whose join window the
    drained stream never closed are still in state at shutdown and must
    be excluded from BOTH engines (deterministic, data-derived bound).
    In batch the same plan is a plain left equi-join with the range
    predicate."""
    l = (events.filter(F.col("event_type") == left_type)
         .select("user_id", F.col("ts").alias("l_ts")))
    r = (events.filter(F.col("event_type") == right_type)
         .select(F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")))
    cond = ((F.col("user_id") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")))
    return l.join(r, cond, "leftOuter").select("user_id", "l_ts", "r_ts")


def topk_types_per_window(events: DataFrame, width: str = "1 day",
                          k: int = 3) -> DataFrame:
    """Trending-items shape: top-k event types per tumbling window by
    count, rank ties broken alphabetically.

    Batch: windowed agg → per-window row_number (the window-function input
    is the already-aggregated (window × type) relation — tiny, no hot
    partition).  Under readStream, a rank over an updating aggregate isn't
    an incremental operator; the production pattern is ``foreachBatch``
    ranking each micro-batch's aggregate snapshot — exercised in
    tests/test_streaming.py — which yields exactly this batch result once
    the stream drains (availableNow).
    """
    from pyspark.sql import Window

    agg = (events.groupBy(F.window("ts", width).alias("w"), "event_type")
           .agg(F.count("*").alias("n")))
    win = Window.partitionBy("w").orderBy(F.desc("n"), F.asc("event_type"))
    return (agg.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "event_type", "n", "rank"))


# Timing decomposition of the LAST stream_to_memory call (r14, VERDICT
# r13 #4): bench rows built on run_stream_to_df previously billed the
# whole query LIFECYCLE (planning + checkpoint setup + source listing +
# micro-batches + stop) to the row; this records where the wall time went
# so harness startup is separable from the actual drain.  Keys:
#   start_sec    — writeStream.start(): plan resolution + query-thread
#                  launch (the harness-startup half that runs inline)
#   drain_sec    — awaitTermination(): everything the streaming thread
#                  does, including per-batch planning and execution
#   trigger_ms   — sum of per-batch durationMs.triggerExecution from the
#                  engine's own progress events (the true drain work)
#   n_batches    — number of micro-batches executed
LAST_RUN_STATS: dict = {}


def stream_to_memory(stream_df: DataFrame, name: str,
                     output_mode: str = "complete") -> None:
    """Run a streaming query to completion over the available data
    (availableNow trigger) into an in-memory sink; returns after the
    stream finishes.  Complete mode for the stateful aggs above; dedup and
    stream-stream joins emit with ``append``."""
    import json
    import time

    t0 = time.perf_counter()
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    t1 = time.perf_counter()
    q.awaitTermination()
    t2 = time.perf_counter()
    trigger_ms = 0.0
    n_batches = 0
    try:
        for p in q.recentProgress:
            prog = json.loads(p) if isinstance(p, str) else \
                (p if isinstance(p, dict) else json.loads(p.json))
            trigger_ms += float(prog.get("durationMs", {})
                                .get("triggerExecution", 0))
            n_batches += 1
    except Exception:
        trigger_ms, n_batches = -1.0, -1  # diagnostics only — never fail a run
    LAST_RUN_STATS.update(start_sec=round(t1 - t0, 3),
                          drain_sec=round(t2 - t1, 3),
                          trigger_ms=round(trigger_ms, 1),
                          n_batches=n_batches)


_MEMSINK_SEQ = __import__("itertools").count()


def run_stream_to_df(spark: SparkSession, stream_df: DataFrame,
                     output_mode: str = "complete") -> DataFrame:
    """Execute a streaming plan through the REAL streaming runtime
    (micro-batch engine, availableNow trigger — drains all available input
    then stops) and return the sink table as a batch DataFrame.  This is
    how declared ``stream_*`` queries certify the streaming path under the
    external oracle gate rather than batch-evaluating the same plan; each
    call gets a fresh sink name so repeated runs in one session (bench
    REPEATS, the driver's row/hash double-run) never collide."""
    name = f"__stream_sink_{next(_MEMSINK_SEQ)}"
    stream_to_memory(stream_df, name, output_mode)
    return spark.table(name)


def docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table (same single-file /
    Spark-written-directory handling as :func:`events_stream`)."""
    import os

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(f"{sf_dir}/documents.parquet"):
        return reader.parquet(f"{sf_dir}/documents.parquet")
    return (reader.option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir))

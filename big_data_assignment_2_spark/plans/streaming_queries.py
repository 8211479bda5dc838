"""Streaming family declared queries: the tumbling/sliding/session window
aggregations evaluated in BATCH over events (the oracle-checkable side;
identical code runs under readStream — tests/test_streaming.py proves the
parity with a real streaming execution).

Session-window oracle: classic gaps-and-islands — a session breaks where
the gap to the previous event exceeds 30 minutes; Spark's session_window
start equals the session's first event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import cleanup_stale_scratch, load_table
from ..streaming.windows import (dedup_keys, events_stream, interval_join,
                                 run_stream_to_df, session_agg, sliding_agg,
                                 topk_types_per_window, tumbling_agg)


def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executed through the REAL streaming runtime: readStream file source
    → watermarked tumbling agg → availableNow micro-batches → memory sink.
    The oracle row therefore certifies streaming execution, not a batch
    evaluation of the same plan (tumbling_agg is identical code either
    way — tests/test_streaming.py proves the parity for every shape)."""
    return run_stream_to_df(spark, tumbling_agg(events_stream(spark, sf_dir)))


def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-executed like :func:`q_tumbling` (sliding windows)."""
    return run_stream_to_df(spark, sliding_agg(events_stream(spark, sf_dir)))


def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load_table(spark, sf_dir, "events"))


def q_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM-stateful path hard-certified: per-user running totals
    via ``applyInPandasWithState`` (Python state in the Spark state store,
    Arrow-marshalled per group) executed through the micro-batch engine,
    then reduced to each user's final update (max n_events — the count is
    monotone per user).  Under availableNow the drained stream's final
    state equals the batch aggregate, so the DuckDB oracle is exact; a
    green row certifies the whole Python-state machinery produces
    oracle-identical numbers."""
    from pyspark.sql import functions as F

    from ..streaming.stateful import running_user_totals

    ev = events_stream(spark, sf_dir, with_watermark=None)
    out = run_stream_to_df(spark, running_user_totals(ev),
                           output_mode="update")
    # Hash-compared column is an exact integer: event values are 2-dp
    # money, so cents sum exactly in an int64; a rounded float sum is
    # order-dependent at the ULP level and can flip a 6-dp rounding
    # boundary between pandas and DuckDB (round-4 ADVICE).  The float
    # accumulation error over ~1e4 2-dp values is ~1e-10 — far below the
    # half-cent the final round() must resolve, so the cents are exact.
    return (out.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
            .select("user_id", F.col("s.n_events").alias("n_events"),
                    F.round(F.col("s.total_value") * 100).cast("bigint")
                    .alias("total_cents")))


def q_stateful_totals_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-4 arbitrary-state successor API
    (``transformWithStateInPandas`` + StatefulProcessor, typed named
    state on a handle) certified by the same exact-cents oracle as the
    ``applyInPandasWithState`` variant.

    Engine selection is environment-honest: the native path's Python
    worker speaks a protobuf state-server protocol, and this container
    has no ``google.protobuf`` — when it is importable the REAL engine
    runs (readStream → transformWithStateInPandas → availableNow drain,
    as tests/test_stateful_v2.py does); otherwise the SAME
    RunningTotalsProcessor object is driven through its full lifecycle
    (init → 3 micro-batch handleInputRows with ValueState persisted
    between calls → close) per key via applyInPandas — certifying the
    processor-side contract while the engine path stays import-gated,
    exactly like the PIL-bound JPEG codec stubs."""
    from pyspark.sql import functions as F

    from ..streaming.stateful_v2 import (protobuf_available,
                                         rocksdb_state_conf,
                                         run_processor_batch,
                                         running_user_totals_v2)

    if protobuf_available():
        rocksdb_state_conf(spark)
        ev = events_stream(spark, sf_dir, with_watermark=None)
        out = run_stream_to_df(spark, running_user_totals_v2(ev),
                               output_mode="update")
        out = (out.groupBy("user_id")
               .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
               .select("user_id", F.col("s.n_events").alias("n_events"),
                       F.col("s.total_value").alias("total_value")))
    else:
        out = run_processor_batch(load_table(spark, sf_dir, "events"))
    # Exact integer cents, immune to float summation order (see
    # q_stateful_totals).
    return out.select("user_id", "n_events",
                      F.round(F.col("total_value") * 100).cast("bigint")
                      .alias("total_cents"))


def q_topk_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful top-k with SESSION TTL (streaming/stateful_v2.
    TopKSessionProcessor): per user, the top-3 event values within the
    LAST event-time session, where 30 min of idleness expires the key's
    state — the timer/TTL dimension of the StatefulProcessor contract
    that running totals (which never expire) cannot exercise.

    The oracle re-derives the same answer declaratively: lag-gap session
    segmentation, last session per user, rank by value.  A green row
    therefore certifies that the imperative per-row state machine
    (insert into fixed top-k slots, reset on gap) equals the relational
    definition for every user."""
    from pyspark.sql import functions as F

    from ..streaming.stateful_v2 import run_processor_timeordered

    out = run_processor_timeordered(load_table(spark, sf_dir, "events"))
    return out.select("user_id", "rnk",
                      F.round("value", 6).alias("value"), "n_session")


def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_keys(load_table(spark, sf_dir, "events"))


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interval_join(load_table(spark, sf_dir, "events"))


def q_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_types_per_window(load_table(spark, sf_dir, "events"))


# --- runtime-certified twins -----------------------------------------------
# The four remaining streaming shapes executed through the micro-batch
# engine (the batch-evaluated queries above stay as the bench-stable
# forms; these *_live rows certify the runtime path with the SAME oracle).

def q_session_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via the streaming runtime: built-in session merge
    in the state store, complete mode, availableNow."""
    return run_stream_to_df(spark, session_agg(events_stream(spark, sf_dir)))


def q_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (watermarked dropDuplicates state) in append mode."""
    return run_stream_to_df(spark, dedup_keys(events_stream(spark, sf_dir)),
                            output_mode="append")


def q_enrich_static_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join through the micro-batch engine — the standard
    enrichment shape (fact stream × broadcast dimension) and a distinct
    streaming execution path from the stream-stream interval join: the
    static side is planned as an ordinary batch broadcast against every
    micro-batch, no state store involved.  Users map to nations by
    user_id % 25 (the harness's synthetic user→geo assignment); output
    is value totals per (nation, event_type) in exact cents."""
    from pyspark.sql import functions as F

    ev = events_stream(spark, sf_dir, with_watermark=None)
    dim = (load_table(spark, sf_dir, "nation")
           .select(F.col("n_nationkey").alias("nk"),
                   F.col("n_name").alias("nation")))
    joined = ev.withColumn("nk", F.col("user_id") % 25) \
        .join(F.broadcast(dim), "nk")
    agg = (joined.groupBy("nation", "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .alias("total_cents")))
    return run_stream_to_df(spark, agg, output_mode="complete")


def q_dedup_within_wm_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark through the micro-batch engine:
    bare-key dedup state evicted by watermark (no window key column) —
    the Spark-3.5 API for dedup over unbounded key cardinality.

    single_batch: the DISTINCT-keys oracle is only exact when the drain
    is one micro-batch — a key whose state was watermark-evicted between
    batches is re-emitted, so a multi-file source table (the sf1-style
    Spark-written directory) splitting the availableNow drain would
    break parity.  The pinned file cap makes the one-batch contract
    explicit instead of an accident of the single-file fixture."""
    from ..streaming.windows import dedup_keys_within_watermark

    return run_stream_to_df(
        spark, dedup_keys_within_watermark(
            events_stream(spark, sf_dir, single_batch=True)),
        output_mode="append")


def q_interval_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join (state bounded by
    watermark + horizon on both sides), append mode."""
    return run_stream_to_df(
        spark, interval_join(events_stream(spark, sf_dir)),
        output_mode="append")


OUTER_JOIN_HORIZON = "1 hour"     # join window
OUTER_JOIN_DELAY = "1 hour"       # events_stream's watermark delay
OUTER_JOIN_MARGIN = "1 minute"    # boundary guard below the final watermark


def q_interval_join_outer_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join through the REAL runtime
    (r15): clicks with no purchase in the following hour emit a
    NULL-padded row once the watermark proves no match can still arrive
    — the funnel-drop-off attribution only a stateful streaming engine
    can produce incrementally.  Drained single-batch (the documented
    dropDuplicatesWithinWatermark convention: one batch regardless of
    part-file count, so no row is ever late against a mid-drain
    watermark), then restricted to the CLOSED region on BOTH engines:
    rows whose join window the drain never closed are still in engine
    state at shutdown and belong to neither side.

    The closed bound derives from the watermark THE ENGINE ACTUALLY
    COMPUTES, pinned empirically via StreamingQueryProgress: Catalyst
    pushes the event_type filters below the EventTimeWatermark operator,
    so the watermark node only ever SEES click/purchase rows and the
    final watermark is max(ts over clicks ∪ purchases) − delay — NOT the
    global max (the sf0.01 global max is a 'view' event 19 min later,
    which made a naive global-max bound off by one row).  A left row's
    null emits iff l_ts + horizon < that watermark; the row restricts to
    l_ts + horizon < (side-max − delay − margin), margin covering the
    engine's ms-truncation of the watermark.  The oracle is the batch
    LEFT JOIN under the same bound, so a green row certifies outer-state
    eviction and exactly-one null emission per unmatched click."""
    from pyspark.sql import functions as F

    from ..streaming.windows import interval_join_outer

    out = run_stream_to_df(
        spark,
        interval_join_outer(events_stream(spark, sf_dir, single_batch=True)),
        output_mode="append")
    mx = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("click", "purchase"))
          .agg(F.max(F.col("ts").cast("timestamp"))).first()[0])
    closed = ((F.col("l_ts") + F.expr(f"INTERVAL {OUTER_JOIN_HORIZON}"))
              < (F.lit(mx) - F.expr(f"INTERVAL {OUTER_JOIN_DELAY}")
                 - F.expr(f"INTERVAL {OUTER_JOIN_MARGIN}")))
    return (out.filter(closed)
            .select("user_id",
                    F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("left_ts"),
                    F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("right_ts")))


def q_topk_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production pattern for rank-over-updating-aggregate: foreachBatch
    ranks each complete-mode aggregate snapshot and overwrites a parquet
    sink; once availableNow drains, the last snapshot IS the batch answer.
    (A rank is not an incremental streaming operator — this is the
    documented workaround, here certified by the oracle gate.)"""
    import os
    import tempfile

    from pyspark.sql import Window, functions as F

    from ..streaming.windows import _MEMSINK_SEQ

    ev = events_stream(spark, sf_dir)
    agg = (ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
           .agg(F.count("*").alias("n")))
    outdir = os.path.join(tempfile.gettempdir(), "spark_graft_io",
                          f"topk_fb_{next(_MEMSINK_SEQ)}")

    def emit(batch_df: DataFrame, _batch_id: int) -> None:
        win = Window.partitionBy("w").orderBy(F.desc("n"), F.asc("event_type"))
        (batch_df.withColumn("rank", F.row_number().over(win))
         .filter(F.col("rank") <= 3)
         .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                 .alias("window_start"), "event_type", "n", "rank")
         .write.mode("overwrite").parquet(outdir))

    q = (agg.writeStream.outputMode("complete").foreachBatch(emit)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(outdir)


def q_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint/RESTART recovery — the production streaming property the
    other live rows don't exercise: a watermarked tumbling aggregation is
    run over the FIRST HALF of events (ts below the corpus midpoint),
    STOPPED, then a second query with the SAME checkpoint directory
    drains the second half plus one far-future flush sentinel.  The
    recovered run must resume from the persisted state store + committed
    watermark: the midpoint-boundary window (counts accumulated in run 1
    but not yet emitted — the watermark lags 1 hour) can only come out
    correct in run 2 if its state survived the restart, and a checkpoint
    ignored would re-emit run-1 windows (duplicate rows) — both failure
    modes break the oracle's exact per-window counts.

    The sentinel (far-future ts, sentinel type) pushes the final
    watermark past every real window so append mode flushes them all;
    its own window stays unemitted in state and is filtered anyway.
    Scratch hygiene: per-process dirs, stale siblings removed (same
    policy as the source_* roundtrips)."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.windows import _MEMSINK_SEQ

    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_io")
    base = os.path.join(scratch, f"restart_{os.getpid()}_{next(_MEMSINK_SEQ)}")
    cleanup_stale_scratch(scratch, "restart_*", keep=base)
    src, ckpt, sink = (os.path.join(base, d) for d in ("src", "ckpt", "sink"))

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cutoff = lo + (hi - lo) / 2
    flush_ts = hi + __import__("datetime").timedelta(days=35)

    def drain_from_src() -> None:
        # Parquet may surface ts as TIMESTAMP_NTZ; withWatermark requires
        # TIMESTAMP (value-exact cast — session zone is UTC).
        stream = (spark.readStream.schema(ev.schema).parquet(src)
                  .withColumn("ts", F.col("ts").cast("timestamp"))
                  .withWatermark("ts", "1 hour"))
        agg = (stream.groupBy(F.window("ts", "1 day").alias("w"),
                              "event_type")
               .agg(F.count("*").alias("n")))
        out = agg.select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"), "event_type", "n")
        q = (out.writeStream.outputMode("append").format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # Run 1: first half, drain, STOP (query terminates with state +
    # watermark committed to ckpt).
    ev.filter(F.col("ts") < F.lit(cutoff)).write.mode("append").parquet(src)
    drain_from_src()
    # Run 2: new files (file-source checkpoint skips the already-read
    # ones), fresh query object, SAME checkpoint — the restart.
    second = ev.filter(F.col("ts") >= F.lit(cutoff))
    sentinel = spark.createDataFrame(
        [(int(-1), flush_ts, int(-1), "__FLUSH__", 0.0)], ev.schema)
    second.unionByName(sentinel).write.mode("append").parquet(src)
    drain_from_src()

    return (spark.read.parquet(sink)
            .filter(F.col("event_type") != "__FLUSH__"))




def q_stream_dedup_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC LEFT ANTI join (r9): the incoming document stream
    (doc_id % 5 == 0, the same ingest-batch split as the batch
    ``dedup_incremental``) deduped against a STATIC historical
    fingerprint relation — only documents whose token-set key is absent
    from history survive, the streaming half of the daily-ingest dedup
    shape.  Left-anti is one of the stream-static join types the
    micro-batch engine executes with NO state store: the static side
    plans as an ordinary batch broadcast against every micro-batch, so
    history size never grows streaming state.  Output is the surviving
    new-content stream (doc_id, source) in append mode."""
    from pyspark.sql import functions as F

    from ..operators.dedup import tokenset_key
    from ..streaming.windows import docs_stream, run_stream_to_df

    from ..hints import broadcast_if_source_small

    base = load_table(spark, sf_dir, "documents")
    hist = (base.filter((F.col("doc_id").cast("bigint") % 5) != 0)
            .select(tokenset_key("text").alias("__k"))
            .distinct())
    inc = (docs_stream(spark, sf_dir)
           .filter((F.col("doc_id").cast("bigint") % 5) == 0)
           .withColumn("__k", tokenset_key("text")))
    # history keys scale with the corpus: size-gate the hint; past the
    # gate a real deployment keys history as a bucketed table and AQE
    # plans the stream-static join from runtime sizes.
    fresh = (inc.join(broadcast_if_source_small(hist, base), "__k", "left_anti")
             .select(F.col("doc_id").cast("string").alias("doc_id"),
                     "source"))
    return run_stream_to_df(spark, fresh, output_mode="append")


def q_stream_dedup_near_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup dedup against a persisted fingerprint store
    (r10, VERDICT r9 #8 — the join-up of ``dedup_incremental`` and
    ``stream_dedup_history``): the historical corpus's fingerprints
    (exact token-set keys + MinHash band keys + verify arrays) are
    PERSISTED once by ``dedup.write_fingerprint_store``; the incoming
    document stream is then flagged per micro-batch in ``foreachBatch``
    by ``dedup.flag_batch_against_store`` — exact-key left join, the
    ONE-SIDED band probe, in-row Jaccard verify — so the streaming path
    catches near-dups, not just exact token-set matches.  No state
    store anywhere: history lives in the store, and statuses are
    independent of micro-batch boundaries (no incoming×incoming work),
    so the drained sink equals the batch flagger and the
    ``dedup_incremental`` oracle applies verbatim (same split, same
    threshold)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.dedup import (flag_batch_against_store,
                                   write_fingerprint_store)
    from ..plans.dedup_queries import INC_DEDUP_MOD, JACCARD_THRESHOLD
    from ..streaming.windows import _MEMSINK_SEQ, docs_stream

    import glob
    import shutil

    # Pid-unique paths + stale cleanup: the append-mode sink must never be
    # shared across processes (the per-process _MEMSINK_SEQ alone collides
    # there — two gate runs would append into one directory).
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_io")
    base = os.path.join(scratch,
                        f"near_dedup_{os.getpid()}_{next(_MEMSINK_SEQ)}")
    cleanup_stale_scratch(scratch, "near_dedup_*", keep=base)
    store, sink = os.path.join(base, "store"), os.path.join(base, "sink")
    write_fingerprint_store(
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id").cast("bigint") % INC_DEDUP_MOD) != 0),
        store)

    inc = docs_stream(spark, sf_dir) \
        .filter((F.col("doc_id").cast("bigint") % INC_DEDUP_MOD) == 0)

    def emit(batch_df: DataFrame, _batch_id: int) -> None:
        flag_batch_against_store(batch_df, store, JACCARD_THRESHOLD) \
            .write.mode("append").parquet(sink)

    q = (inc.writeStream.outputMode("append").foreachBatch(emit)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(sink)


def q_stream_dedup_rollover_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CLOSE-THE-LOOP rollover (r11, VERDICT r10 #6): each
    micro-batch both FLAGS against the persisted fingerprint store and
    APPENDS its unique docs' fingerprints — the atomic flag→append a
    real daily ingest pipeline runs, where today's survivors become
    history for tomorrow.  Two "days" of documents (the rollover split:
    %5==4 then %5==0) arrive as two source files drained one per
    micro-batch (maxFilesPerTrigger=1, oldest first), so day 2 is
    flagged against the store GROWN by day 1's uniques; the drained
    sink holds BOTH days' flags and must equal the batch two-day
    maintenance loop replayed from first principles by the oracle.

    Batching contract: one micro-batch per ingest day (the append
    happens after the whole batch is flagged against the store as of
    batch start, so flags never see same-batch uniques — the same
    no-incoming×incoming guarantee as the batch flagger).  The emit
    guards the contract fail-loud: a micro-batch mixing the two day
    splits raises instead of silently producing boundary-dependent
    flags.  At 100 TB the "file" is a day's ingest partition; one
    batch per partition is exactly how a foreachBatch maintenance job
    is deployed."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.dedup import (append_fingerprints,
                                   flag_batch_against_store,
                                   write_fingerprint_store)
    from ..plans.dedup_queries import JACCARD_THRESHOLD
    from ..streaming.windows import _MEMSINK_SEQ

    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_io")
    base = os.path.join(scratch,
                        f"roll_live_{os.getpid()}_{next(_MEMSINK_SEQ)}")
    cleanup_stale_scratch(scratch, "roll_live_*", keep=base)
    store, src, sink = (os.path.join(base, d)
                        for d in ("store", "src", "sink"))

    docs = load_table(spark, sf_dir, "documents")
    nid = F.col("doc_id").cast("bigint")
    write_fingerprint_store(docs.filter((nid % 5).isin(1, 2, 3)), store)
    # One source file per ingest day, written in day order (the file
    # source drains oldest-first).  repartition(1) is certification
    # plumbing: production would point the stream at per-day ingest
    # partitions instead of squeezing a day into one file.
    docs.filter((nid % 5) == 4).repartition(1) \
        .write.mode("append").parquet(src)
    day1_files = _parquet_files(src)
    docs.filter((nid % 5) == 0).repartition(1) \
        .write.mode("append").parquet(src)
    # The file source orders by MODIFICATION TIME: two appends can land
    # with equal-millisecond mtimes, making the day order nondeterministic
    # (round-11 advice).  Bump day 2's files strictly past day 1's.
    _bump_mtime_after(src, day1_files)

    inc = (spark.readStream.schema(docs.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    seen_days: list[int] = []

    def emit(batch_df: DataFrame, _batch_id: int) -> None:
        _rollover_emit(batch_df, store, sink, seen_days, expect=(4, 0))

    q = (inc.writeStream.outputMode("append").foreachBatch(emit)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(sink)


def _parquet_files(src: str) -> set:
    import glob
    import os

    return set(glob.glob(os.path.join(src, "*.parquet")))


def _bump_mtime_after(src: str, earlier_files: set) -> None:
    """Set every parquet file NOT in ``earlier_files`` to a modification
    time strictly greater than all of them — deterministic oldest-first
    drain order for the file source regardless of filesystem mtime
    granularity."""
    import os

    floor = max((os.path.getmtime(f) for f in earlier_files), default=0.0)
    # STRICTLY increasing per file (r12 advice): a shared mtime would
    # re-create the intra-day tie this helper exists to remove if a day
    # ever lands as more than one file.
    for i, f in enumerate(sorted(_parquet_files(src) - earlier_files)):
        t = floor + 0.01 * (i + 1)
        os.utime(f, (t, t))


def _rollover_emit(batch_df: DataFrame, store: str, sink: str,
                   seen_days: list, expect: tuple) -> None:
    """One micro-batch of the flag→append maintenance loop, with TWO
    fail-loud guards on the day-granularity contract: a batch mixing day
    splits raises, and the days must arrive in the expected sequence
    (a swapped order would flag day 1 against a store grown by day 2 —
    silently wrong, so it is an error instead; round-11 advice)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import append_fingerprints, flag_batch_against_store
    from ..plans.dedup_queries import JACCARD_THRESHOLD

    mods = [r[0] for r in batch_df
            .select((F.col("doc_id").cast("bigint") % 5).alias("m"))
            .distinct().collect()]
    if len(mods) > 1:
        raise ValueError(
            f"day-granularity batching violated: batch mixes day "
            f"splits {sorted(mods)}")
    if mods:
        seen_days.append(mods[0])
        if tuple(seen_days) != expect[:len(seen_days)]:
            raise ValueError(
                f"ingest days out of order: saw {seen_days}, "
                f"expected prefix of {list(expect)}")
    flags = flag_batch_against_store(batch_df, store, JACCARD_THRESHOLD)
    flags.write.mode("append").parquet(sink)
    uniq = batch_df.join(
        flags.filter(F.col("status") == "unique")
        .select(F.col("doc_id").cast("bigint").alias("__uid")),
        F.col("doc_id").cast("bigint") == F.col("__uid")).drop("__uid")
    append_fingerprints(uniq, store)


def q_stream_dedup_rollover_restart(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """RESTART-RECOVERY of the rollover loop (r12, VERDICT r11 #7): the
    daily flag→append maintenance job is killed BETWEEN ingest days and
    resumed from its checkpoint — day 1 is drained by one query, the
    query stops, day 2's file lands, and a SECOND query with the SAME
    checkpoint + sink + store drains it.  The file-source checkpoint must
    skip day 1's already-committed file (re-processing would double-append
    day-1 uniques into the store AND duplicate their sink rows — both
    break the oracle), and day 2 must be flagged against the store as
    grown by run 1.  The drained sink across both runs must equal the
    uninterrupted two-day replay — the SAME oracle as
    ``stream_dedup_rollover_live``, so a green row certifies idempotent
    resumption, THE failure mode of a daily foreachBatch job."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.dedup import write_fingerprint_store
    from ..streaming.windows import _MEMSINK_SEQ

    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_io")
    base = os.path.join(scratch,
                        f"roll_restart_{os.getpid()}_{next(_MEMSINK_SEQ)}")
    cleanup_stale_scratch(scratch, "roll_restart_*", keep=base)
    store, src, sink, ckpt = (os.path.join(base, d)
                              for d in ("store", "src", "sink", "ckpt"))

    docs = load_table(spark, sf_dir, "documents")
    nid = F.col("doc_id").cast("bigint")
    write_fingerprint_store(docs.filter((nid % 5).isin(1, 2, 3)), store)
    seen_days: list[int] = []

    def drain() -> None:
        inc = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        q = (inc.writeStream.outputMode("append")
             .foreachBatch(lambda b, _i: _rollover_emit(
                 b, store, sink, seen_days, expect=(4, 0)))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # Run 1: day 1 only, drain, STOP (source offsets + batch commits land
    # in the checkpoint).
    docs.filter((nid % 5) == 4).repartition(1) \
        .write.mode("append").parquet(src)
    drain()
    day1_files = _parquet_files(src)
    # The kill-between-days restart: day 2 arrives, a NEW query resumes
    # from the same checkpoint.
    docs.filter((nid % 5) == 0).repartition(1) \
        .write.mode("append").parquet(src)
    _bump_mtime_after(src, day1_files)
    drain()
    return spark.read.parquet(sink)


def q_stream_ann_ingest_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ANN INGEST (r14): new vectors arrive as micro-batches and
    are folded into the persisted IVF+PQ store by encoding against the
    FROZEN stored codebooks and appending to the list-partitioned codes
    (persist.ivfpq_append — the FAISS add() path; map-side, no retrain,
    no cross-batch ordering requirement), then the query set is answered
    from the grown index.  The streaming twin of sim_ivfpq_append_probe:
    the oracle is IDENTICAL (Lloyd chains over the base rows only,
    assignment/codes/ADC over the full corpus), so a green row certifies
    that continuous vector ingest through the real micro-batch runtime
    serves old + new rows exactly like the one-shot batch append."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.persist import (ivfpq_append, ivfpq_probe_persisted,
                                     write_ivfpq)
    from ..streaming.windows import _MEMSINK_SEQ
    from .similarity_queries import (APPEND_MOD, APPEND_REM, IVFPQ_COARSE_K,
                                     IVFPQ_COARSE_ITERS, IVFPQ_NPROBE, PQ_ITERS,
                                     PQ_KS, PQ_M, TOP_K, _queries_df)

    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_io")
    base_dir = os.path.join(scratch,
                            f"ann_ingest_{os.getpid()}_{next(_MEMSINK_SEQ)}")
    cleanup_stale_scratch(scratch, "ann_ingest_*", keep=base_dir)
    path, src = (os.path.join(base_dir, d) for d in ("index", "src"))

    em = load_table(spark, sf_dir, "embeddings")
    nid = F.col("vec_id").cast("bigint")
    base = em.filter((nid % APPEND_MOD) != APPEND_REM)
    delta = em.filter((nid % APPEND_MOD) == APPEND_REM)
    write_ivfpq(base, path, n_centroids=IVFPQ_COARSE_K,
                coarse_iters=IVFPQ_COARSE_ITERS, m=PQ_M, ks=PQ_KS,
                pq_iters=PQ_ITERS)

    # Two ingest "days" of new vectors, one source file each (drained
    # oldest-first, one micro-batch per file).
    day1_files: set = set()
    for day, rem in enumerate((APPEND_REM, APPEND_MOD + APPEND_REM)):
        delta.filter((nid % (2 * APPEND_MOD)) == rem).repartition(1) \
            .write.mode("append").parquet(src)
        if day == 0:
            day1_files = _parquet_files(src)
    _bump_mtime_after(src, day1_files)

    inc = (spark.readStream.schema(em.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    q = (inc.writeStream.outputMode("append")
         .foreachBatch(lambda b, _i: ivfpq_append(b, path))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return ivfpq_probe_persisted(spark, path, _queries_df(spark, sf_dir),
                                 k=TOP_K, nprobe=IVFPQ_NPROBE)


def q_stream_sq8_ingest_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SQ8 INGEST (r16): the zero-maintenance counterpoint to
    q_stream_ann_ingest_live — new vectors arrive as micro-batches and
    are folded into the persisted SQ8 tier by per-row encoding + pure
    partition append (persist.sq8_append: per-vector scales carry no
    trained state, so unlike the IVF+PQ twin there are no frozen
    codebooks to encode against and no drift to retrain away — EVER).
    The grown store must serve bit-identically to the in-flight
    sq8_topk, whose oracle applies verbatim; a green row certifies that
    continuous ingest through the real micro-batch runtime is
    indistinguishable from a one-shot full-corpus write."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.persist import sq8_append, sq8_probe_persisted, write_sq8
    from ..streaming.windows import _MEMSINK_SEQ
    from .similarity_queries import (APPEND_MOD, APPEND_REM, TOP_K,
                                     _queries_df)

    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_io")
    base_dir = os.path.join(scratch,
                            f"sq8_ingest_{os.getpid()}_{next(_MEMSINK_SEQ)}")
    cleanup_stale_scratch(scratch, "sq8_ingest_*", keep=base_dir)
    path, src = (os.path.join(base_dir, d) for d in ("store", "src"))

    em = load_table(spark, sf_dir, "embeddings")
    nid = F.col("vec_id").cast("bigint")
    write_sq8(em.filter((nid % APPEND_MOD) != APPEND_REM), path)

    # Two ingest "days" of new vectors, one source file each (drained
    # oldest-first, one micro-batch per file).
    delta = em.filter((nid % APPEND_MOD) == APPEND_REM)
    day1_files: set = set()
    for day, rem in enumerate((APPEND_REM, APPEND_MOD + APPEND_REM)):
        delta.filter((nid % (2 * APPEND_MOD)) == rem).repartition(1) \
            .write.mode("append").parquet(src)
        if day == 0:
            day1_files = _parquet_files(src)
    _bump_mtime_after(src, day1_files)

    inc = (spark.readStream.schema(em.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    q = (inc.writeStream.outputMode("append")
         .foreachBatch(lambda b, _i: sq8_append(b, path))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return sq8_probe_persisted(spark, path, _queries_df(spark, sf_dir),
                               k=TOP_K)


def q_stream_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE foreachBatch sink with a REAL recovery-replay (r15,
    VERDICT r14 #1+#2): each micro-batch writes its per-type aggregate to
    a batch_id-keyed partition directory with OVERWRITE — the
    idempotent-sink pattern that upgrades foreachBatch's at-least-once
    delivery to effectively-once (a replayed batch overwrites its own
    partition instead of appending a duplicate).

    The failure is INJECTED, not simulated in-call: batch 0's first
    attempt writes a deliberately PARTIAL sink partition (one event_type
    only) and then raises before the checkpoint can commit the batch —
    the "task wrote some output, then the job died" shape.  The query
    fails; a SECOND query resumes from the SAME checkpoint, Structured
    Streaming replays batch 0 (it was never committed), and the full
    overwrite replaces the partial partition.  With an append sink the
    partial rows would survive AND duplicate — so a green row certifies
    recovery-replay idempotence across a restart, not merely double-call
    idempotence (the weaker r14 form this replaces).

    Determinism (r14's one red row): cents are rounded PER EVENT to
    bigints and only then summed — integer arithmetic is
    order-independent, so Spark's partition order and DuckDB's scan
    order cannot disagree (``round(sum(double))`` can flip at .5
    boundaries; SURVEY.md §7.5's trap, same pattern as
    stream_enrich_static_live)."""
    import os
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.errors import StreamingQueryException

    from ..streaming.windows import _MEMSINK_SEQ

    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_io")
    base = os.path.join(scratch,
                        f"once_sink_{os.getpid()}_{next(_MEMSINK_SEQ)}")
    cleanup_stale_scratch(scratch, "once_sink_*", keep=base)
    src, sink, ckpt = (os.path.join(base, d)
                       for d in ("src", "sink", "ckpt"))

    ev = load_table(spark, sf_dir, "events")
    half1_files: set = set()
    for i, keep in enumerate((0, 1)):
        ev.filter(F.col("event_id") % 2 == keep).repartition(1) \
            .write.mode("append").parquet(src)
        if i == 0:
            half1_files = _parquet_files(src)
    _bump_mtime_after(src, half1_files)

    attempts: list[int] = []  # batch_ids seen, in emit-call order

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        agg = (batch_df.groupBy("event_type")
               .agg(F.count("*").alias("n"),
                    F.sum(F.round(F.col("value") * 100).cast("bigint"))
                    .alias("cents")))
        part = os.path.join(sink, f"batch_id={batch_id}")
        first_attempt = batch_id not in attempts
        attempts.append(batch_id)
        if batch_id == 0 and first_attempt:
            # Injected crash mid-write: a partial partition lands (one
            # event_type only), then the batch dies before its checkpoint
            # commit — the at-least-once redelivery a real failure makes.
            first_type = agg.select(F.min("event_type")).first()[0]
            agg.filter(F.col("event_type") == first_type) \
                .write.mode("overwrite").parquet(part)
            raise RuntimeError(
                "injected sink failure after partial write (batch 0)")
        agg.write.mode("overwrite").parquet(part)

    def drain() -> None:
        inc = (spark.readStream.schema(ev.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
        q = (inc.writeStream.outputMode("append").foreachBatch(emit)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    try:
        drain()  # dies inside batch 0, after the partial write
        raise AssertionError(
            "injected failure did not propagate — retry never exercised")
    except StreamingQueryException:
        pass
    except RuntimeError as e:
        # Depending on session context the foreachBatch helper re-raises
        # the ORIGINAL Python exception instead of wrapping it in
        # StreamingQueryException — accept only OUR injected failure.
        if "injected sink failure" not in str(e):
            raise
    # Recovery: same checkpoint, same sink.  Batch 0 was never committed,
    # so it replays under the SAME batch_id and the full overwrite
    # replaces the partial partition; batch 1 then proceeds normally.
    drain()
    if attempts != [0, 0, 1]:
        raise AssertionError(
            f"expected replay sequence [0, 0, 1], saw {attempts}")
    return (spark.read.parquet(sink)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n_events"),
                 F.sum("cents").alias("total_cents")))


QUERIES = {
    "stream_ann_ingest_live": q_stream_ann_ingest_live,
    "stream_sq8_ingest_live": q_stream_sq8_ingest_live,
    "stream_exactly_once_sink": q_stream_exactly_once_sink,
    "stream_dedup_rollover_restart": q_stream_dedup_rollover_restart,
    "stream_dedup_rollover_live": q_stream_dedup_rollover_live,
    "stream_dedup_near_live": q_stream_dedup_near_live,
    "stream_dedup_history": q_stream_dedup_history,
    "stream_restart_recovery": q_restart_recovery,
    "stream_stateful_totals": q_stateful_totals,
    "stream_stateful_totals_v2": q_stateful_totals_v2,
    "stream_topk_ttl": q_topk_ttl,
    "stream_session_30m_live": q_session_live,
    "stream_dedup_keys_live": q_dedup_live,
    "stream_dedup_within_wm_live": q_dedup_within_wm_live,
    "stream_enrich_static_live": q_enrich_static_live,
    "stream_interval_join_1h_live": q_interval_join_live,
    "stream_interval_join_outer_live": q_interval_join_outer_live,
    "stream_topk_foreachbatch": q_topk_foreachbatch,
    "stream_topk_per_day": q_topk_window,
    "stream_dedup_keys": q_dedup,
    "stream_interval_join_1h": q_interval_join,
    "stream_tumbling_1d": q_tumbling,
    "stream_sliding_2d_1d": q_sliding,
    "stream_session_30m": q_session,
}

from .dedup_queries import _INC_SQL, _rollover_sql  # noqa: E402

ORACLES = {
    # Both days' flags from the first-principles two-day replay: the
    # foreachBatch flag→append loop (one micro-batch per ingest day) must
    # reproduce the batch maintenance loop exactly.
    "stream_dedup_rollover_live": _rollover_sql(both_days=True),
    # Kill-between-days restart: resuming from the checkpoint must make
    # the two-run drain indistinguishable from the uninterrupted one —
    # the SAME two-day replay oracle (a double-appended day 1 would turn
    # day-2 near-dup matches into different match_ids; a re-flagged day 1
    # would duplicate sink rows — both hash-visible).
    "stream_dedup_rollover_restart": _rollover_sql(both_days=True),
    # Streaming near-dup flagging is micro-batch-independent (every
    # incoming doc is flagged against the persisted HISTORY only, never
    # against other incoming docs), so the drained foreachBatch sink
    # equals the batch incremental_dedup on the same split — the
    # dedup_incremental oracle applies verbatim.
    "stream_dedup_near_live": _INC_SQL,
    # Stream-static anti join: batch semantics are exactly "incoming docs
    # whose token-set key has no historical twin" (same key formula as
    # pipeline_decontaminate / dedup_incremental).
    "stream_dedup_history": """
WITH keyed AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         CAST(doc_id AS BIGINT) AS nid,
         md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(
                 regexp_replace(lower(text), '[^\\w\\s]', ' ', 'g'),
                 '\\s+'), t -> t <> ''))), ' ')) AS k
  FROM documents),
hist AS (SELECT DISTINCT k FROM keyed WHERE nid % 5 <> 0)
SELECT ky.doc_id, ky.source
FROM keyed ky LEFT JOIN hist h ON h.k = ky.k
WHERE ky.nid % 5 = 0 AND h.k IS NULL
""",
    # Restart recovery: the two-run drained sink must equal the one-shot
    # batch aggregate over ALL events — state lost on restart zeroes the
    # midpoint window, checkpoint ignored duplicates run-1 windows.
    "stream_restart_recovery": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n
FROM events GROUP BY 1, 2
""",
    # Final drained state == batch aggregate; the compared total is exact
    # integer cents (values are 2-dp money), immune to summation order.
    "stream_stateful_totals": """
SELECT user_id, count(*) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) AS total_cents
FROM events GROUP BY user_id
""",
    # Declarative twin of the session-TTL state machine: lag-gap session
    # segmentation -> last session per user -> rank by value.  Constants
    # mirror streaming/stateful_v2.py (30 min gap, k=3).
    "stream_topk_ttl": """
WITH l AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_ts
  FROM events
),
s AS (
  SELECT *, sum(CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sess
  FROM l
),
last_sess AS (SELECT user_id, max(sess) AS sess FROM s GROUP BY user_id),
f AS (SELECT s.* FROM s JOIN last_sess USING (user_id, sess)),
r AS (
  SELECT user_id, value, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rnk,
         count(*) OVER (PARTITION BY user_id) AS n_session
  FROM f
)
SELECT user_id, rnk, round(value, 6) AS value, n_session
FROM r WHERE rnk <= 3
""",
    # v2 (transformWithStateInPandas / StatefulProcessor) shares the v1
    # exact-cents oracle: same semantics, successor state API.
    "stream_stateful_totals_v2": """
SELECT user_id, count(*) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) AS total_cents
FROM events GROUP BY user_id
""",
    "stream_topk_per_day": """
WITH agg AS (
  SELECT date_trunc('day', ts) AS w, event_type, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n, rank FROM (
  SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, n,
         CAST(row_number() OVER (PARTITION BY w
             ORDER BY n DESC, event_type ASC) AS INTEGER) AS rank
  FROM agg)
WHERE rank <= 3
""",
    "stream_dedup_keys": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       user_id, event_type
FROM events GROUP BY 1, 2, 3
""",
    "stream_interval_join_1h": """
SELECT l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS left_ts,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS right_ts
FROM events l JOIN events r ON r.user_id = l.user_id
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
""",
    "stream_tumbling_1d": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
    # Each event belongs to 2 sliding windows: [trunc(day)-1d, +2d) and
    # [trunc(day), +2d).
    "stream_sliding_2d_1d": """
WITH assigned AS (
  SELECT event_type,
         date_trunc('day', ts) - (INTERVAL 1 DAY) * off AS wstart
  FROM events, (SELECT unnest([0, 1]) AS off))
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n
FROM assigned GROUP BY 1, 2
""",
    "stream_session_30m": """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered)
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, session_id
""",
}

# Runtime-certified twins share the batch twins' oracles verbatim: same
# semantics, different execution engine path.
# Streaming ANN ingest ends in the exact final state of the one-shot batch
# append, so it shares sim_ivfpq_append_probe's first-principles replay.
from .similarity_queries import ORACLES as _SIM_ORACLES  # noqa: E402

ORACLES["stream_ann_ingest_live"] = _SIM_ORACLES["sim_ivfpq_append_probe"]
# SQ8 ingest carries no trained state: drained appends == fresh full
# store == the in-flight sq8_topk replay, verbatim.
ORACLES["stream_sq8_ingest_live"] = _SIM_ORACLES["sim_sq8_topk"]

# Exactly-once sink: sum of per-batch aggregates == global aggregate.
# Cents are rounded PER EVENT to bigints before any sum (r15, VERDICT
# r14 #1) — integer addition is order-independent and batch-split
# independent, so the oracle is simply the global per-type aggregate
# (rounding a summed double was order-dependent and flapped in r14).
# The outer CAST is load-bearing (r16, VERDICT r15 #1): DuckDB's
# sum(BIGINT) returns HUGEINT, which pandas fetches as float64 and the
# driver's type-sensitive value hash sees 10195100.0 vs Spark's
# 10195100 — identical values, flipped hash. Same pattern as the green
# sibling stream_enrich_static_live below.
ORACLES["stream_exactly_once_sink"] = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events GROUP BY event_type
"""
ORACLES["stream_session_30m_live"] = ORACLES["stream_session_30m"]
ORACLES["stream_dedup_keys_live"] = ORACLES["stream_dedup_keys"]
# Single-file availableNow drain = one micro-batch, so the surviving
# bare-key set is exactly the distinct keys.
ORACLES["stream_dedup_within_wm_live"] = \
    "SELECT DISTINCT user_id, event_type FROM events"
# Drained complete-mode agg == batch aggregate; cents are exact ints.
ORACLES["stream_enrich_static_live"] = """
SELECT n.n_name AS nation, e.event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
GROUP BY 1, 2
"""
ORACLES["stream_interval_join_1h_live"] = ORACLES["stream_interval_join_1h"]
# Outer interval join: the batch LEFT JOIN restricted to the closed
# region (join window strictly below the final watermark minus the
# margin) — the same deterministic bound the engine row applies.
ORACLES["stream_interval_join_outer_live"] = """
WITH b AS (SELECT max(ts) - INTERVAL 1 HOUR - INTERVAL 1 MINUTE AS wm
           FROM events WHERE event_type IN ('click', 'purchase'))
SELECT l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS left_ts,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS right_ts
FROM events l
LEFT JOIN events r ON r.user_id = l.user_id AND r.event_type = 'purchase'
  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
CROSS JOIN b
WHERE l.event_type = 'click' AND l.ts + INTERVAL 1 HOUR < b.wm
"""
ORACLES["stream_topk_foreachbatch"] = ORACLES["stream_topk_per_day"]

"""Incremental ingest-batch dedup (operators/dedup.py r9): statuses,
best-match selection, and the one-sided guarantee that incoming docs are
never compared against each other."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.dedup import incremental_dedup

BASE = ("spark catalyst shuffle join broadcast partition codegen "
        "arrow parquet vector")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _run(spark, rows, hist_pred=None, thr=0.8):
    docs = _docs(spark, rows)
    pred = hist_pred if hist_pred is not None \
        else (F.col("doc_id") % 2) == 1
    return {r["doc_id"]: (r["status"], r["match_id"], r["jaccard"])
            for r in incremental_dedup(docs, pred, thr).collect()}


def test_statuses_and_matches(spark):
    """History: docs 1,3,5.  Incoming: 0 (exact dup of 1 — same token
    set, reordered), 2 (near dup of 3), 4 (unique)."""
    toks = BASE.split()
    rows = [
        (1, " ".join(toks)),
        (3, " ".join(toks[:9]) + " extra1"),
        (5, "completely different words entirely here"),
        (0, " ".join(reversed(toks))),             # exact dup of 1
        (2, " ".join(toks[:9]) + " extra2"),       # near dup of 3 (J=9/11)
        (4, "nothing shared with anything above"),
    ]
    got = _run(spark, rows)
    assert got["0"] == ("exact_dup", "1", 1.0)
    status, match, j = got["2"]
    assert (status, match) == ("near_dup", "3") and 0.8 <= j < 1.0
    assert got["4"] == ("unique", None, None)


def test_incoming_never_compared_to_incoming(spark):
    """Two IDENTICAL incoming docs with no historical twin must both be
    unique — the operator must not flag batch-internal duplicates."""
    rows = [
        (1, "history words alpha beta gamma delta"),
        (0, BASE),
        (2, BASE),                                  # identical to 0
    ]
    got = _run(spark, rows)
    assert got["0"] == ("unique", None, None)
    assert got["2"] == ("unique", None, None)


def test_best_match_prefers_higher_jaccard_then_lower_id(spark):
    toks = BASE.split()
    rows = [
        (1, " ".join(toks[:8]) + " x1"),   # J vs incoming = 8/11 < 0.8
        (3, " ".join(toks[:9])),           # J = 9/10 = 0.9
        (5, " ".join(toks[:9])),           # ties 3 at 0.9 -> lower id wins
        (0, " ".join(toks[:9]) + " y0"),   # incoming
    ]
    got = _run(spark, rows)
    status, match, j = got["0"]
    assert (status, match, j) == ("near_dup", "3", 0.9)


def test_exact_dup_takes_lowest_historical_id(spark):
    rows = [
        (1, BASE),
        (3, BASE),
        (0, BASE),
    ]
    got = _run(spark, rows)
    assert got["0"] == ("exact_dup", "1", 1.0)


def test_matches_oracle_semantics_on_corpus(spark, sf_dir):
    """Corpus smoke: every incoming doc gets exactly one row and every
    match_id is historical."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = (F.col("doc_id").cast("bigint") % 5) != 0
    rows = incremental_dedup(docs, pred, 0.9).collect()
    inc_ids = {str(r["doc_id"]) for r in
               docs.filter(~pred).select("doc_id").collect()}
    assert {r["doc_id"] for r in rows} == inc_ids
    assert len(rows) == len(inc_ids)
    for r in rows:
        if r["match_id"] is not None:
            assert int(r["match_id"]) % 5 != 0
        assert (r["status"] == "unique") == (r["match_id"] is None)


# --- streaming near-dup vs batch flagger parity (r10) ----------------------

def test_stream_flagger_equals_batch_flagger(spark, sf_dir):
    """The foreachBatch body (flag_batch_against_store over a persisted
    fingerprint store) must produce EXACTLY the batch incremental_dedup
    output on the same split — statuses, match ids, and jaccards."""
    import os
    import tempfile

    from big_data_assignment_2_spark.operators.dedup import (
        flag_batch_against_store, write_fingerprint_store)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist_pred = (F.col("doc_id").cast("bigint") % 5) != 0
    batch_rows = sorted(
        (tuple(r) for r in incremental_dedup(docs, hist_pred, 0.9).collect()))
    with tempfile.TemporaryDirectory() as d:
        store = os.path.join(d, "store")
        write_fingerprint_store(docs.filter(hist_pred), store)
        stream_rows = sorted(
            (tuple(r) for r in
             flag_batch_against_store(docs.filter(~hist_pred), store, 0.9)
             .collect()))
    assert batch_rows == stream_rows
    assert len(batch_rows) > 0


def test_stream_flagger_batch_boundary_independent(spark, sf_dir):
    """Splitting the incoming batch in two and flagging each half against
    the same store yields the union of rows — the property that makes
    the drained streaming sink equal the one-shot batch answer."""
    import os
    import tempfile

    from big_data_assignment_2_spark.operators.dedup import (
        flag_batch_against_store, write_fingerprint_store)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist_pred = (F.col("doc_id").cast("bigint") % 5) != 0
    inc = docs.filter(~hist_pred)
    with tempfile.TemporaryDirectory() as d:
        store = os.path.join(d, "store")
        write_fingerprint_store(docs.filter(hist_pred), store)
        whole = sorted(tuple(r) for r in
                       flag_batch_against_store(inc, store, 0.9).collect())
        half_a = inc.filter((F.col("doc_id").cast("bigint") % 2) == 0)
        half_b = inc.filter((F.col("doc_id").cast("bigint") % 2) == 1)
        split = sorted(
            [tuple(r) for r in
             flag_batch_against_store(half_a, store, 0.9).collect()]
            + [tuple(r) for r in
               flag_batch_against_store(half_b, store, 0.9).collect()])
    assert whole == split


def test_append_fingerprints_store_derived_batch_is_safe(spark, sf_dir):
    """Appending a batch whose lineage READS the store it appends to must
    not self-contaminate: Spark's post-append refreshByPath invalidates
    cached plans over the store, so without eager lineage truncation the
    bands/arrays writes re-evaluate the batch against the half-grown
    store (every doc flags as an exact dup of itself) and append NOTHING
    — the bug found building dedup_store_rollover.  All three relations
    must receive every unique day-1 doc."""
    import os
    import tempfile

    from big_data_assignment_2_spark.operators.dedup import (
        append_fingerprints, flag_batch_against_store,
        write_fingerprint_store)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nid = F.col("doc_id").cast("bigint")
    with tempfile.TemporaryDirectory() as d:
        store = os.path.join(d, "store")
        write_fingerprint_store(docs.filter((nid % 5).isin(1, 2, 3)), store)
        day1 = docs.filter((nid % 5) == 4)
        flags1 = flag_batch_against_store(day1, store, 0.9)
        uniq_ids = {int(r["doc_id"]) for r in
                    flags1.filter(F.col("status") == "unique")
                    .select("doc_id").collect()}
        assert uniq_ids
        # the store-derived batch: day-1 docs joined with their OWN flags
        uniq1 = day1.join(
            flags1.filter(F.col("status") == "unique")
            .select(F.col("doc_id").cast("bigint").alias("__uid")),
            nid == F.col("__uid")).drop("__uid")
        append_fingerprints(uniq1, store)
        got_keys = {r["__exact_nid"] for r in
                    spark.read.parquet(f"{store}/keys")
                    .filter((F.col("__exact_nid") % 5) == 4).collect()}
        got_bands = {r["hist_nid"] for r in
                     spark.read.parquet(f"{store}/bands")
                     .filter((F.col("hist_nid") % 5) == 4)
                     .select("hist_nid").distinct().collect()}
        got_arrays = {r["hist_nid"] for r in
                      spark.read.parquet(f"{store}/arrays")
                      .filter((F.col("hist_nid") % 5) == 4).collect()}
        assert got_bands == uniq_ids
        assert got_arrays == uniq_ids
        assert got_keys <= uniq_ids and got_keys  # min-per-key subset


def test_stream_rollover_equals_batch_maintenance_loop(spark, sf_dir):
    """The streaming flag→append foreachBatch loop (one micro-batch per
    ingest day) must equal the batch maintenance loop driven directly
    through the store API on the same day split — flags for BOTH days,
    statuses, match ids, jaccards.  Day granularity is the batching
    contract: within a day no doc sees same-day uniques (store read as
    of batch start), across days the store has grown."""
    import os
    import tempfile

    from big_data_assignment_2_spark.operators.dedup import (
        append_fingerprints, flag_batch_against_store,
        write_fingerprint_store)
    from big_data_assignment_2_spark.plans.dedup_queries import (
        JACCARD_THRESHOLD)
    from big_data_assignment_2_spark.plans.streaming_queries import (
        q_stream_dedup_rollover_live)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nid = F.col("doc_id").cast("bigint")
    with tempfile.TemporaryDirectory() as d:
        store = os.path.join(d, "store")
        write_fingerprint_store(docs.filter((nid % 5).isin(1, 2, 3)), store)
        batch_rows = []
        for day_mod in (4, 0):
            day = docs.filter((nid % 5) == day_mod)
            flags = flag_batch_against_store(
                day, store, JACCARD_THRESHOLD).localCheckpoint()
            batch_rows += [tuple(r) for r in flags.collect()]
            uniq = day.join(
                flags.filter(F.col("status") == "unique")
                .select(F.col("doc_id").cast("bigint").alias("__uid")),
                nid == F.col("__uid")).drop("__uid")
            append_fingerprints(uniq, store)
        stream_rows = [tuple(r) for r in
                       q_stream_dedup_rollover_live(spark, sf_dir).collect()]
    assert sorted(batch_rows) == sorted(stream_rows)
    assert len(batch_rows) > 0


def test_compact_fingerprint_store_is_result_invariant(spark, sf_dir):
    """Compacting the keys log (per-doc distinct + directory swap) must
    shrink or keep the row count and leave flagging output
    byte-identical.  Since r11 the log is PER-DOC (exact tombstone
    deletes), so compaction dedups rows rather than min-folding keys —
    one row per (key, doc) afterwards."""
    import os
    import tempfile

    from big_data_assignment_2_spark.operators.dedup import (
        append_fingerprints, compact_fingerprint_store,
        flag_batch_against_store, write_fingerprint_store)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nid = F.col("doc_id").cast("bigint")
    with tempfile.TemporaryDirectory() as d:
        store = os.path.join(d, "store")
        write_fingerprint_store(docs.filter((nid % 5).isin(1, 2)), store)
        append_fingerprints(docs.filter((nid % 5) == 3), store)
        # a REPLAYED append -> duplicate per-doc rows for compaction to fold
        append_fingerprints(docs.filter((nid % 5) == 3), store)
        append_fingerprints(docs.filter((nid % 5) == 4), store)
        probe = docs.filter((nid % 5) == 0)
        before_rows = spark.read.parquet(f"{store}/keys").count()
        before = sorted(tuple(r) for r in
                        flag_batch_against_store(probe, store, 0.9).collect())
        compact_fingerprint_store(spark, store)
        after_rows = spark.read.parquet(f"{store}/keys").count()
        after = sorted(tuple(r) for r in
                       flag_batch_against_store(probe, store, 0.9).collect())
        assert after == before
        assert after_rows < before_rows      # the replayed rows folded
        distinct_rows = spark.read.parquet(f"{store}/keys") \
            .select("__k", "__exact_nid").distinct().count()
        assert after_rows == distinct_rows   # one row per (key, doc) now


def test_rollover_restart_no_double_append(spark, sf_dir):
    """Kill-between-days restart (r12): the restart query must equal the
    uninterrupted rollover, and a THIRD drain from the same checkpoint
    with no new files must append nothing — double-appending day-1
    uniques is impossible under the committed file-source offsets."""
    import glob
    import os
    import tempfile

    from big_data_assignment_2_spark.plans.streaming_queries import (
        q_stream_dedup_rollover_live, q_stream_dedup_rollover_restart)

    restart = sorted(tuple(r) for r in
                     q_stream_dedup_rollover_restart(spark, sf_dir).collect())
    live = sorted(tuple(r) for r in
                  q_stream_dedup_rollover_live(spark, sf_dir).collect())
    assert restart == live

    # Locate the restart run's scratch (newest roll_restart_* dir) and
    # drain a third time: no new source files => zero new sink rows and
    # an unchanged store keys log.
    scratch = os.path.join(tempfile.gettempdir(), "spark_graft_io")
    base = max(glob.glob(os.path.join(scratch, "roll_restart_*")),
               key=os.path.getmtime)
    store, src, sink, ckpt = (os.path.join(base, d)
                              for d in ("store", "src", "sink", "ckpt"))
    n_sink = spark.read.parquet(sink).count()
    n_keys = spark.read.parquet(os.path.join(store, "keys")).count()

    from big_data_assignment_2_spark.plans.streaming_queries import (
        _rollover_emit)
    from big_data_assignment_2_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    inc = (spark.readStream.schema(docs.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    q = (inc.writeStream.outputMode("append")
         .foreachBatch(lambda b, _i: _rollover_emit(
             b, store, sink, [], expect=()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.read.parquet(sink).count() == n_sink
    assert spark.read.parquet(os.path.join(store, "keys")).count() == n_keys

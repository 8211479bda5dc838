"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is collected (full materialization) and timed as the median of
REPEATS runs after a session warm-up, so JVM/codegen startup is not billed
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPEATS = 3

# Headline set: one representative per family, weighted toward the heavy
# shuffling/joining paths that dominate at scale.
HEADLINE = [
    "search_bm25_topk",      # full index build + search plan
    "rel_pricing_summary",   # wide scan + hash agg
    "rel_q3_top10",          # fact-fact join + topk
    "rel_region_revenue",    # 6-table star join
    "rel_join_range",        # equi+range join
    "win_running_total",     # window over full orders
    "dedup_minhash_near",    # explode + 16 min-aggs + band self-join
    "dedup_simhash",         # explode + 60 bit-vote aggs
    "sim_ann_bruteforce",    # broadcast vector scoring
    "stream_session_30m",    # session windows
]

# Timed like HEADLINE but excluded from the suite total so `value` stays
# comparable with BASELINE.md round over round (these queries postdate it).
EXTRA = [
    # CHANGELOG (round 10, per VERDICT r9 #6): the FIXED-width LSH rows
    # (sim_cosine_top_pairs, sim_cosine_banded) are RETIRED from the bench
    # (~7 s/round) — their scale verdict is settled (fixed bucket space
    # admits a fixed fraction of all N² pairs; the width-ADAPTIVE twins
    # below are the certified 100 TB path).  Both stay registered as
    # sf0.01/sf0.1 gate artifacts for correctness continuity.
    "sim_cosine_top_pairs_scaled",  # width sized from corpus (100 TB form)
    "sim_cosine_near_dups_banded",  # certified default near-dup (adaptive)
    "sim_tfidf_topk",        # sparse TF-IDF cosine via inverted-index join
    "stream_tumbling_1d",    # REAL micro-batch streaming execution
    "mm_decode_real",        # stdlib BMP/WAV codec via Arrow mapInPandas
    "mm_png_decode",         # stdlib PNG codec (zlib + 5-filter unfilter)
    "pipeline_global_shuffle",  # distributed total-order permutation
    "dedup_prefix_jaccard",  # EXACT PPJoin set-similarity join (lossless)
    "sim_pq_topk",           # product-quantization ADC ANN
    "sim_ivfpq_topk",        # IVF+PQ residual index (production ANN shape)
    "text_bpe_train",        # distributed tokenizer training (8 merges)
    "mm_jpeg_decode",        # baseline JPEG codec (Huffman + IDCT)
    "mm_mp4_frames",         # MP4 sample-table demux + per-frame decode
    "mm_jpeg_420",           # 4:2:0 subsampled color JPEG
    "text_heavy_hitters_exact",  # two-pass Misra-Gries + exact verify
    "dedup_incremental",     # ingest batch vs historical fingerprints
    # CHANGELOG (round 12, per VERDICT r11 #2): sim_semdedup_scaled (k ∝
    # corpus, clusters stay ~SEMDEDUP_K_DIV vectors) replaces the fixed-k
    # row as the HEADLINE semdedup number — the fixed-k shape is N²/k and
    # was the sf1 sweep's slowest row (68.8 s); the scaled shape is the
    # operator's documented 100 TB contract.  The fixed-k row stays
    # registered as an oracle gate artifact for continuity.
    "sim_semdedup_scaled",   # cluster-then-prune semantic dedup (k ∝ N)
    "events_paths",          # gap sessionization + journey path mining
    "stream_dedup_history",  # stream-static anti-join dedup
    "mm_jpeg_dri",           # restart-interval JPEG (camera layout)
    "mm_jpeg_progressive",   # SOF2 multi-scan progressive (web layout)
    "mm_jpeg_422",           # 4:2:2 via the generic MCU loop
    "dedup_exact_substring",  # sorted-shingle maximal repeated spans
    # CHANGELOG (round 11, per VERDICT r10 #2): dedup_store_rollover and
    # stream_dedup_near_live are RETIRED from the bench — both rebuild
    # their fingerprint store from scratch per run (certification shape;
    # ~130 s of churn per sf1 sweep) and hid the serving cost.  The split
    # rows below (fingerprint_store_build once + dedup_store_probe
    # repeated) time what a production pipeline actually pays, mirroring
    # the r10 ANN build/probe split.  Both stay registered as oracle gate
    # rows for correctness continuity.
]

# Queries additionally timed COLD (spark.catalog.clearCache() first, single
# run) so round-over-round numbers aren't flattered by cache state; the
# `<name>_cold` entries are informational and excluded from the suite total
# (BASELINE.md's totals predate them).  "Cold" = no Spark persisted blocks;
# OS page cache / JIT warmth is inherent to an in-process bench.
COLD_ALSO = ["dedup_minhash_near", "dedup_clusters"]


# Fixed-width LSH rows dropped from sweeps at sf >= ~1: their fixed bucket
# space admits a fixed FRACTION of all N² pairs (measured 84-87 s each at
# sf1, 30x candidate blowup per 10x data — the cliff SCALE.md documents).
# Since round 10 they are out of EXTRA entirely (settled verdict); the set
# stays as a guard should either row ever be re-added.
FIXED_WIDTH_LSH = {"sim_cosine_top_pairs", "sim_cosine_banded"}

# Sub-2 s rows get extra repeats (5 total instead of 3): two rounds running
# the driver's official number drifted ~+12% on PLANS THAT DID NOT CHANGE
# (co-tenant noise, confirmed by min-of-3 re-runs both times — VERDICT r9
# #3).  More repeats tighten min-of-N exactly where noise swamps signal,
# and the per-query MEDIAN is emitted alongside the min so drift is
# diagnosable from the JSON alone: plan regressions move min and median
# together; co-tenant noise moves the median while the min holds.
EXTRA_REPEATS_UNDER_SEC = 2.0
EXTRA_REPEATS = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from big_data_assignment_2_spark.session import get_spark
    from big_data_assignment_2_spark.plans import all_queries

    spark = get_spark("bench")
    qs = all_queries()

    sf_name = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        big_sf = float(sf_name) >= 0.5
    except ValueError:
        big_sf = True  # synthetic dirs (e.g. sf1x) are the scale sweeps
    extra = [q for q in EXTRA if not (big_sf and q in FIXED_WIDTH_LSH)]
    if big_sf:
        skipped = sorted(FIXED_WIDTH_LSH & set(EXTRA))
        if skipped:
            print(f"# sf {sf_name!r} >= 0.5: skipping fixed-width LSH rows "
                  f"{skipped} (fixed bucket space admits a fixed fraction "
                  "of all N^2 pairs; adaptive twins stay timed)",
                  file=sys.stderr)

    # Warm up JVM / codegen / parquet footer caches.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in ("region", "nation", "lineitem", "orders", "events",
                 "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").count()

    def materialize(df) -> None:
        # noop sink: full computation, zero driver-side row serialization
        # (collect() on a ~1M-row result would bill py4j transfer to the
        # engine).
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    extra_timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    # HEADLINE first, cold-heavies LAST: round 3 showed the 10s+ cold dedup
    # runs (exploded token state, GC debt) executing before the headline
    # loop can inflate an unchanged query's min-of-3 several-fold.  Timing
    # order now matches the conditions BASELINE.md was recorded under.
    for name in HEADLINE + extra:
        fn = qs[name]
        materialize(fn(spark, sf_dir))   # untimed warmup: codegen + JIT
        spark.sparkContext._jvm.System.gc()
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        if min(runs) < EXTRA_REPEATS_UNDER_SEC:
            # cheap rows, noisy minima: buy precision where it's cheap
            for _ in range(EXTRA_REPEATS):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
        # min, not median, is the headline: the metric is the engine's
        # cost, and min-of-N is the estimator least contaminated by
        # co-tenant machine load.  The median rides along (see
        # EXTRA_REPEATS_UNDER_SEC) for drift diagnosis.
        (timings if name in HEADLINE else extra_timings)[name] = \
            round(min(runs), 3)
        medians[name] = round(sorted(runs)[len(runs) // 2], 3)
    for name in COLD_ALSO:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        materialize(qs[name](spark, sf_dir))
        extra_timings[f"{name}_cold"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()

    # Serving path: probe a persisted term-bucketed index (build+persist is
    # untimed setup — the amortized query latency is the number that
    # matters for a search service).
    import tempfile

    from big_data_assignment_2_spark.operators.index import build_index
    from big_data_assignment_2_spark.operators.persist import (
        bm25_probe_persisted, write_index)
    from big_data_assignment_2_spark.plans.search_queries import FLAGSHIP_QUERY
    from big_data_assignment_2_spark.sources.io import load_table

    with tempfile.TemporaryDirectory() as warmdir:
        # Untimed warmup build: parquet-write + codegen paths compile once,
        # so the single timed build below isn't billed JIT/IO-warmup noise.
        write_index(build_index(load_table(spark, sf_dir, "documents")),
                    warmdir)
    with tempfile.TemporaryDirectory() as ixdir:
        t0 = time.perf_counter()
        write_index(build_index(load_table(spark, sf_dir, "documents")), ixdir)
        timings["index_build_persist"] = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(REPEATS + EXTRA_REPEATS):
            t0 = time.perf_counter()
            materialize(bm25_probe_persisted(spark, ixdir, FLAGSHIP_QUERY))
            runs.append(time.perf_counter() - t0)
        timings["search_bm25_probe_persisted"] = round(min(runs), 3)
        medians["search_bm25_probe_persisted"] = \
            round(sorted(runs)[len(runs) // 2], 3)
        # Batched serving probe (r13, VERDICT r12 #4): 3 queries through
        # ONE bucket-pruned scan.  Sublinear vs Q sequential probes =
        # this row < 3 x search_bm25_probe_persisted (same index, same
        # session — directly comparable within one JSON).
        from big_data_assignment_2_spark.operators.persist import (
            bm25_probe_persisted_batch)
        from big_data_assignment_2_spark.plans.search_queries import (
            BATCH_QUERIES)

        runs = []
        for _ in range(REPEATS + EXTRA_REPEATS):
            t0 = time.perf_counter()
            materialize(bm25_probe_persisted_batch(
                spark, ixdir, BATCH_QUERIES, k=5))
            runs.append(time.perf_counter() - t0)
        extra_timings["search_bm25_batch_probe"] = round(min(runs), 3)
        medians["search_bm25_batch_probe"] = \
            round(sorted(runs)[len(runs) // 2], 3)

    # ANN serving path (round 10, VERDICT r9 #1): train the IVF+PQ index
    # ONCE (timed as the build row), then time PROBES against the persisted
    # codes — the amortized serving latency that matters at 100 TB, where
    # the in-flight sim_ivfpq_topk row deliberately keeps billing Lloyd
    # training to every run as its certification cost.
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_probe_persisted, write_ivfpq)

    em = load_table(spark, sf_dir, "embeddings")
    qdf = em.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")
    with tempfile.TemporaryDirectory() as anndir:
        t0 = time.perf_counter()
        write_ivfpq(em, anndir, n_centroids=4, coarse_iters=1,
                    m=4, ks=8, pq_iters=1)
        extra_timings["ivfpq_index_build"] = round(time.perf_counter() - t0, 3)
        materialize(ivfpq_probe_persisted(spark, anndir, qdf, k=10, nprobe=2))
        runs = []
        for _ in range(REPEATS + EXTRA_REPEATS):
            t0 = time.perf_counter()
            materialize(ivfpq_probe_persisted(spark, anndir, qdf,
                                              k=10, nprobe=2))
            runs.append(time.perf_counter() - t0)
        extra_timings["sim_ivfpq_probe_persisted"] = round(min(runs), 3)
        medians["sim_ivfpq_probe_persisted"] = \
            round(sorted(runs)[len(runs) // 2], 3)

        # Two-stage serving path (r12): ADC top-C nomination from the SAME
        # prebuilt index + exact re-rank — the refine latency a
        # recall-sensitive deployment pays per query batch.
        from big_data_assignment_2_spark.operators.similarity import (
            exact_rerank)
        from big_data_assignment_2_spark.plans.similarity_queries import (
            RERANK_C)

        def rerank_probe():
            cand = ivfpq_probe_persisted(spark, anndir, qdf,
                                         k=RERANK_C, nprobe=2)
            return exact_rerank(cand, em, qdf, k=10)

        materialize(rerank_probe())
        runs = []
        for _ in range(REPEATS + EXTRA_REPEATS):
            t0 = time.perf_counter()
            materialize(rerank_probe())
            runs.append(time.perf_counter() - t0)
        extra_timings["sim_ivfpq_rerank_probe"] = round(min(runs), 3)
        medians["sim_ivfpq_rerank_probe"] = \
            round(sorted(runs)[len(runs) // 2], 3)

    # PRODUCTION-config serving latency (r13, beside sim_ivfpq_quality's
    # correctness row): the m=16/ks=16 + nprobe=3 + C=100 re-rank config
    # that certifies recall@10 >= 0.85 — build once untimed, time the
    # probe+refine.  The recall/latency trade a serving team tunes.
    from big_data_assignment_2_spark.plans.similarity_queries import (
        QUALITY_NPROBE, QUALITY_PQ_ITERS, QUALITY_PQ_KS, QUALITY_PQ_M,
        quality_c_for)

    with tempfile.TemporaryDirectory() as qanndir:
        write_ivfpq(em, qanndir, n_centroids=4, coarse_iters=1,
                    m=QUALITY_PQ_M, ks=QUALITY_PQ_KS,
                    pq_iters=QUALITY_PQ_ITERS)
        quality_c = quality_c_for(em.count())

        def quality_probe():
            cand = ivfpq_probe_persisted(spark, qanndir, qdf,
                                         k=quality_c,
                                         nprobe=QUALITY_NPROBE)
            return exact_rerank(cand, em, qdf, k=10)

        materialize(quality_probe())
        runs = []
        for _ in range(REPEATS + EXTRA_REPEATS):
            t0 = time.perf_counter()
            materialize(quality_probe())
            runs.append(time.perf_counter() - t0)
        extra_timings["sim_ivfpq_quality_probe"] = round(min(runs), 3)
        medians["sim_ivfpq_quality_probe"] = \
            round(sorted(runs)[len(runs) // 2], 3)

    # Fingerprint-store serving path (round 11, VERDICT r10 #2): build the
    # historical store ONCE (timed as the build row — the nightly batch
    # cost), then time flag_batch_against_store ALONE as the serving row —
    # the per-ingest-batch latency a daily pipeline actually pays, which
    # the retired rollover rows conflated with two store rebuilds.
    from big_data_assignment_2_spark.operators.dedup import (
        flag_batch_against_store, write_fingerprint_store)
    from big_data_assignment_2_spark.plans.dedup_queries import (
        INC_DEDUP_MOD, JACCARD_THRESHOLD)

    docs = load_table(spark, sf_dir, "documents")
    nid = F.col("doc_id").cast("bigint")
    with tempfile.TemporaryDirectory() as fpdir:
        store = os.path.join(fpdir, "store")
        t0 = time.perf_counter()
        write_fingerprint_store(docs.filter((nid % INC_DEDUP_MOD) != 0),
                                store)
        extra_timings["fingerprint_store_build"] = \
            round(time.perf_counter() - t0, 3)
        batch = docs.filter((nid % INC_DEDUP_MOD) == 0)
        materialize(flag_batch_against_store(batch, store,
                                             JACCARD_THRESHOLD))
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            materialize(flag_batch_against_store(batch, store,
                                                 JACCARD_THRESHOLD))
            runs.append(time.perf_counter() - t0)
        extra_timings["dedup_store_probe"] = round(min(runs), 3)
        medians["dedup_store_probe"] = round(sorted(runs)[len(runs) // 2], 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_suite_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {**timings, **extra_timings},
        # per-query MEDIAN alongside the min: a real plan regression moves
        # both; co-tenant noise moves the median while the min holds — so
        # round-over-round drift is diagnosable from this JSON alone.
        "queries_median": medians,
        "sf": sf_val,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (r14, VERDICT r13 #1): the LAST stdout line is ONE
COMPACT JSON line <= 1500 chars — {"metric", "value", "unit", "sf",
"queries": {headline mins only}, "suspect": [...]} — because the external
driver captures only a 2000-char stdout tail; every BENCH_r*.json from
r10-r13 had "parsed": null because the full per-query min+median dicts
(~3.5 kB) overflowed it.  The FULL result — extra-row mins, medians,
per-row load averages and min/median spreads, stream-drain decomposition
— goes to BENCH_LOCAL.json beside this script.

Noise self-labeling (r14, VERDICT r13 #3): os.getloadavg() is recorded
around every row and each row's (median-min)/min spread is computed; rows
whose spread exceeds NOISE_BAND land in "suspect" so co-tenant noise is
flagged by the bench itself instead of costing a judge-round of
re-timing.

Each query is collected (full materialization) and timed as the min of
REPEATS runs after a session warm-up, so JVM/codegen startup is not
billed to the first query.
"""

from __future__ import annotations

import contextlib
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
    "search_bm25f_topk",     # fielded BM25F (title+body weighted norms)
    "search_fuzzy_topk",     # OOV query-term expansion (Levenshtein<=1)
    "search_hybrid_rrf",     # BM25 + dense-cosine reciprocal-rank fusion
    "search_proximity",      # positions-array min-gap boosted ranking (r14)
    "sim_ivf_filtered",      # pre-filtered ANN (label pruned in-list, r14)
    "sim_mmr_diversify",     # MMR diversity re-rank (cogrouped greedy, r18)
    # CHANGELOG (round 11, per VERDICT r10 #2): dedup_store_rollover and
    # stream_dedup_near_live are RETIRED from the bench — both rebuild
    # their fingerprint store from scratch per run (certification shape;
    # ~130 s of churn per sf1 sweep) and hid the serving cost.  The split
    # rows below (fingerprint_store_build once + dedup_store_probe
    # repeated) time what a production pipeline actually pays, mirroring
    # the r10 ANN build/probe split.  Both stay registered as oracle gate
    # rows for correctness continuity.
    # r17 additions: the keep-chain policy priced against its pairwise
    # sibling (sim_semdedup_scaled above), and BM25 over the CJK bigram
    # index priced against search_bm25_topk (bigrams ≈ 2x postings on
    # the snippet share of each doc).
    "sim_semdedup_chain",    # greedy transitive semdedup (applyInPandas)
    "search_bm25_cjk",       # BM25 over a CJK character-bigram index
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

# A row whose (median - min) / min exceeds this is self-labeled "suspect":
# its runs disagreed more than the ±30% band the round workflow treats as
# co-tenant noise, so its min should be idle-rerun before being read as a
# plan change (r14, VERDICT r13 #3 — stream_dedup_history and events_paths
# would have been auto-flagged in r13).
NOISE_BAND = 0.30

# Rows executed through the REAL micro-batch engine via run_stream_to_df:
# their wall time includes streaming-harness startup (query-thread launch,
# checkpoint + source listing per run), so BENCH_LOCAL.json records the
# engine's own drain decomposition beside the wall min (VERDICT r13 #4).
# (stream_session_30m is the BATCH evaluation of the session agg — its
# engine-executed twin is stream_session_30m_live, a gate row.)
STREAM_ROWS = {"stream_tumbling_1d", "stream_dedup_history"}

# Hard budget for the final stdout line (driver tail capture is 2000
# chars; headroom for the tail cutting mid-line).
COMPACT_BUDGET = 1500


def _compact_line(out: dict) -> str:
    """Render the driver-facing JSON line, degrading gracefully: drop
    tail suspect names first (the top ones also key "load"), then tail
    load verdicts, keeping counts, until it fits COMPACT_BUDGET."""
    line = json.dumps(out, separators=(",", ":"))
    while len(line) > COMPACT_BUDGET and (out.get("suspect")
                                          or out.get("load")):
        if out.get("suspect"):
            out["suspect"] = out["suspect"][:-1]
            out["n_suspect_dropped"] = out.get("n_suspect_dropped", 0) + 1
        else:
            del out["load"][list(out["load"])[-1]]
            out["n_load_dropped"] = out.get("n_load_dropped", 0) + 1
        line = json.dumps(out, separators=(",", ":"))
    return line


def _tree_bytes(path: str) -> int:
    """Recursive on-disk byte total (parquet part files + metadata)."""
    total = 0
    for dirpath, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from big_data_assignment_2_spark.session import get_spark
    from big_data_assignment_2_spark.plans import all_queries
    from big_data_assignment_2_spark.streaming import windows as stream_mod

    spark = get_spark("bench")
    qs = all_queries()

    # Effective-parallelism evidence (r18, VERDICT r17 #2): the driver's
    # $SPARK_GRAFT_CPUS scaling probe could not verify from the output that
    # the bench honors the core count (session.py wires it into
    # local[$SPARK_GRAFT_CPUS], but nothing in the JSON proved it).  Emit
    # the actual master URL and sc.defaultParallelism in BOTH the compact
    # line and BENCH_LOCAL so the contract is checkable from stdout alone.
    sc = spark.sparkContext
    master = sc.master
    default_parallelism = sc.defaultParallelism

    # Pre-existing machine pressure, sampled BEFORE any Spark work: the
    # bench's own 32-thread execution drives 1-min loadavg into the
    # 8-11 range even on an idle machine, so per-row loadavg alone can't
    # separate self-load from co-tenants — the start sample can.
    load_start = round(os.getloadavg()[0], 2)

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
    loadavg: dict[str, list[float]] = {}
    stream_drain: dict[str, dict] = {}
    # On-disk store sizes (r17, VERDICT r16 #8): the gap-encoded layout's
    # claimed win is storage — price it next to the serving rows.
    store_bytes: dict[str, int] = {}

    def timed_runs(fn, n: int, name: str | None = None) -> list[float]:
        """n timed materializations; records loadavg around the block and
        (for stream rows) the engine's drain decomposition of the
        MIN-run's lifecycle."""
        runs, drains = [], []
        la0 = os.getloadavg()
        for _ in range(n):
            t0 = time.perf_counter()
            materialize(fn())
            runs.append(time.perf_counter() - t0)
            if name in STREAM_ROWS:
                drains.append(dict(stream_mod.LAST_RUN_STATS))
        la1 = os.getloadavg()
        if name is not None:
            loadavg[name] = [round(la0[0], 2), round(la1[0], 2)]
            if drains:
                best = min(range(len(runs)), key=runs.__getitem__)
                stream_drain[name] = drains[best]
        return runs

    def record(name: str, runs: list[float], dest: dict) -> None:
        # min, not median, is the headline: the metric is the engine's
        # cost, and min-of-N is the estimator least contaminated by
        # co-tenant machine load.  The median rides along for drift
        # diagnosis (a plan regression moves both; noise moves the
        # median while the min holds).
        dest[name] = round(min(runs), 3)
        medians[name] = round(sorted(runs)[len(runs) // 2], 3)

    # Bench-start isolation (r15, VERDICT r14 #3): the flagship's driver
    # number drifted 1.76 -> 2.84 s across two rounds on an UNCHANGED plan
    # (PLANS.md identical; idle re-runs at the SCALE.md stage floor ~2.0 s)
    # because it executed in timed slot 1, while executor thread pools,
    # the noop-sink commit path, and shuffle-fetch machinery were still
    # warming.  Two fixes: (a) five noop-sink SHUFFLE warmups before any
    # timed row (the range-sum warmup above never exercised a shuffle or
    # the noop committer), and (b) the flagship executes LAST among the
    # headline rows — reported order unchanged, BASELINE comparability
    # unaffected (the suite total is order-independent).
    from pyspark.sql import functions as _F
    for i in range(5):
        materialize(spark.range(2_000_000)
                    .withColumn("g", _F.col("id") % (512 + i))
                    .groupBy("g").agg(_F.count("*").alias("n"),
                                      _F.sum("id").alias("s")))

    # HEADLINE first, cold-heavies LAST: round 3 showed the 10s+ cold dedup
    # runs (exploded token state, GC debt) executing before the headline
    # loop can inflate an unchanged query's min-of-3 several-fold.  Timing
    # order now matches the conditions BASELINE.md was recorded under.
    _flagship = "search_bm25_topk"
    run_order = ([q for q in HEADLINE if q != _flagship] + [_flagship]
                 + extra)
    for name in run_order:
        fn = qs[name]
        materialize(fn(spark, sf_dir))   # untimed warmup: codegen + JIT
        spark.sparkContext._jvm.System.gc()
        runs = timed_runs(lambda: fn(spark, sf_dir), REPEATS, name)
        if min(runs) < EXTRA_REPEATS_UNDER_SEC:
            # cheap rows, noisy minima: buy precision where it's cheap
            runs += timed_runs(lambda: fn(spark, sf_dir), EXTRA_REPEATS)
        record(name, runs, timings if name in HEADLINE else extra_timings)
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
        bm25_probe_persisted, bm25_probe_persisted_batch, write_index)
    from big_data_assignment_2_spark.plans.search_queries import (
        BATCH_QUERIES, FLAGSHIP_QUERY)
    from big_data_assignment_2_spark.sources.io import load_table

    with tempfile.TemporaryDirectory() as warmdir:
        # Untimed warmup build: parquet-write + codegen paths compile once,
        # so the single timed build below isn't billed JIT/IO-warmup noise.
        write_index(build_index(load_table(spark, sf_dir, "documents"),
                        term_buckets=16),
                    warmdir)
    # min-of-3 with a TRUE median (r16 advice: the r15 "median" of two
    # runs was max(build_runs) — not a median, inflating the row's
    # min→median spread vs the min-of-3 rows).  The LAST timed build
    # writes into the probes' ixdir, so the serving rows reuse a timed
    # build instead of paying a fourth, untimed tokenize+explode+agg
    # corpus pass per bench invocation (second r16 advice item).
    with tempfile.TemporaryDirectory() as ixdir:
        build_runs = []
        for i in range(3):
            # last build writes the probes' ixdir; the throwaway tmpdir is
            # only entered for the discarded builds (r16 advice: no tmpdir
            # churn inside the timed region on the final iteration)
            with contextlib.ExitStack() as stack:
                tgt = (ixdir if i == 2 else
                       stack.enter_context(tempfile.TemporaryDirectory()))
                t0 = time.perf_counter()
                write_index(
                    build_index(load_table(spark, sf_dir, "documents")), tgt)
                build_runs.append(time.perf_counter() - t0)
        timings["index_build_persist"] = round(min(build_runs), 3)
        medians["index_build_persist"] = round(sorted(build_runs)[1], 3)
        record("search_bm25_probe_persisted",
               timed_runs(lambda: bm25_probe_persisted(
                   spark, ixdir, FLAGSHIP_QUERY),
                   REPEATS + EXTRA_REPEATS, "search_bm25_probe_persisted"),
               timings)
        # Batched serving probe (r13, VERDICT r12 #4): 3 queries through
        # ONE bucket-pruned scan.  Sublinear vs Q sequential probes =
        # this row < 3 x search_bm25_probe_persisted (same index, same
        # session — directly comparable within one JSON).
        record("search_bm25_batch_probe",
               timed_runs(lambda: bm25_probe_persisted_batch(
                   spark, ixdir, BATCH_QUERIES, k=5),
                   REPEATS + EXTRA_REPEATS, "search_bm25_batch_probe"),
               extra_timings)
        # Plain-store positional consumer: the baseline the delta rows
        # below compare against (same index, same session).
        from big_data_assignment_2_spark.operators.persist import read_index
        from big_data_assignment_2_spark.operators.search import phrase_match
        store_bytes["postings_plain"] = _tree_bytes(
            os.path.join(ixdir, "term_document"))
        record("search_phrase_probe",
               timed_runs(lambda: phrase_match(
                   read_index(spark, ixdir)["term_document"],
                   ["vector", "query"]),
                   REPEATS + EXTRA_REPEATS, "search_phrase_probe"),
               extra_timings)

    # Gap-encoded store on the SERVING path (r16, VERDICT r15 #6): the
    # storage win (0.18x postings on long docs) is certified elsewhere;
    # these rows PRICE the read side.  BM25 never reads positions, so
    # probe_delta must be in-band with search_bm25_probe_persisted (the
    # column-pruned scan makes the layout invisible); phrase_delta pays
    # the aggregate-fold decode and is directly comparable to
    # search_phrase_probe above — the honest decode cost, not just the
    # storage win.  Build is untimed setup (amortized serving, as with
    # every probe row).
    with tempfile.TemporaryDirectory() as dxdir:
        write_index(build_index(load_table(spark, sf_dir, "documents"),
                        term_buckets=16),
                    dxdir, delta_positions=True)
        store_bytes["postings_delta"] = _tree_bytes(
            os.path.join(dxdir, "term_document"))
        record("search_bm25_probe_delta",
               timed_runs(lambda: bm25_probe_persisted(
                   spark, dxdir, FLAGSHIP_QUERY),
                   REPEATS + EXTRA_REPEATS, "search_bm25_probe_delta"),
               extra_timings)
        record("search_phrase_probe_delta",
               timed_runs(lambda: phrase_match(
                   read_index(spark, dxdir)["term_document"],
                   ["vector", "query"]),
                   REPEATS + EXTRA_REPEATS, "search_phrase_probe_delta"),
               extra_timings)

    # ANN serving path (round 10, VERDICT r9 #1): train the IVF+PQ index
    # ONCE (timed as the build row), then time PROBES against the persisted
    # codes — the amortized serving latency that matters at 100 TB, where
    # the in-flight sim_ivfpq_topk row deliberately keeps billing Lloyd
    # training to every run as its certification cost.
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_probe_persisted, write_ivfpq)
    from big_data_assignment_2_spark.operators.similarity import exact_rerank
    # The bench measures exactly the configs the gate rows certify (r14
    # advice: hardcoded 4/1 here would silently diverge if the plan
    # constants moved).
    from big_data_assignment_2_spark.plans.similarity_queries import (
        BOUNDEDC_C, BOUNDEDC_NPROBE, BOUNDEDC_PQ_ITERS, BOUNDEDC_PQ_KS,
        BOUNDEDC_PQ_M, IVFPQ_COARSE_ITERS, IVFPQ_COARSE_K, PQ_ITERS, PQ_KS,
        PQ_M, QUALITY_NPROBE, QUALITY_PQ_ITERS, QUALITY_PQ_KS, QUALITY_PQ_M,
        RERANK_C, quality_c_for)

    em = load_table(spark, sf_dir, "embeddings")
    qdf = em.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")
    with tempfile.TemporaryDirectory() as anndir:
        t0 = time.perf_counter()
        write_ivfpq(em, anndir, n_centroids=IVFPQ_COARSE_K,
                    coarse_iters=IVFPQ_COARSE_ITERS,
                    m=PQ_M, ks=PQ_KS, pq_iters=PQ_ITERS)
        extra_timings["ivfpq_index_build"] = round(time.perf_counter() - t0, 3)
        materialize(ivfpq_probe_persisted(spark, anndir, qdf, k=10, nprobe=2))
        record("sim_ivfpq_probe_persisted",
               timed_runs(lambda: ivfpq_probe_persisted(
                   spark, anndir, qdf, k=10, nprobe=2),
                   REPEATS + EXTRA_REPEATS, "sim_ivfpq_probe_persisted"),
               extra_timings)

        # Two-stage serving path (r12): ADC top-C nomination from the SAME
        # prebuilt index + exact re-rank — the refine latency a
        # recall-sensitive deployment pays per query batch.
        def rerank_probe():
            cand = ivfpq_probe_persisted(spark, anndir, qdf,
                                         k=RERANK_C, nprobe=2)
            return exact_rerank(cand, em, qdf, k=10)

        materialize(rerank_probe())
        record("sim_ivfpq_rerank_probe",
               timed_runs(rerank_probe, REPEATS + EXTRA_REPEATS,
                          "sim_ivfpq_rerank_probe"),
               extra_timings)

    # PRODUCTION-config serving latency (r13, beside sim_ivfpq_quality's
    # correctness row): the m=16/ks=16 + nprobe=3 + C=max(100,N/20) re-rank
    # config that certifies recall@10 >= 0.85 — build once untimed, time
    # the probe+refine.  The recall/latency trade a serving team tunes.
    with tempfile.TemporaryDirectory() as qanndir:
        write_ivfpq(em, qanndir, n_centroids=IVFPQ_COARSE_K,
                    coarse_iters=IVFPQ_COARSE_ITERS,
                    m=QUALITY_PQ_M, ks=QUALITY_PQ_KS,
                    pq_iters=QUALITY_PQ_ITERS)
        quality_c = quality_c_for(em.count())

        def quality_probe():
            cand = ivfpq_probe_persisted(spark, qanndir, qdf,
                                         k=quality_c,
                                         nprobe=QUALITY_NPROBE)
            return exact_rerank(cand, em, qdf, k=10)

        materialize(quality_probe())
        record("sim_ivfpq_quality_probe",
               timed_runs(quality_probe, REPEATS + EXTRA_REPEATS,
                          "sim_ivfpq_quality_probe"),
               extra_timings)

    # BOUNDED-C quality config (r14, VERDICT r13 #2): the scale-safe
    # recall lever — candidate budget capped at C=BOUNDEDC_C regardless of
    # corpus size, recall recovered by scanning every coarse list with a
    # finer code (ks=64).  Timed beside the C∝N probe above so the JSON
    # itself quantifies what bounding C buys/costs at each sf.
    with tempfile.TemporaryDirectory() as banndir:
        write_ivfpq(em, banndir, n_centroids=IVFPQ_COARSE_K,
                    coarse_iters=IVFPQ_COARSE_ITERS,
                    m=BOUNDEDC_PQ_M, ks=BOUNDEDC_PQ_KS,
                    pq_iters=BOUNDEDC_PQ_ITERS)

        def boundedc_probe():
            cand = ivfpq_probe_persisted(spark, banndir, qdf,
                                         k=BOUNDEDC_C,
                                         nprobe=BOUNDEDC_NPROBE)
            return exact_rerank(cand, em, qdf, k=10)

        materialize(boundedc_probe())
        record("sim_ivfpq_boundedc_probe",
               timed_runs(boundedc_probe, REPEATS + EXTRA_REPEATS,
                          "sim_ivfpq_boundedc_probe"),
               extra_timings)

    # SQ8 memory-tier serving (r16): probe the persisted int8 store —
    # the 5.2x-smaller-scan serving path — timed beside
    # sim_ann_bruteforce (the float64 exact path over the same corpus
    # and query set) so one JSON prices what the tier buys.  Build is
    # untimed setup, as with every probe row.
    from big_data_assignment_2_spark.operators.persist import (
        sq8_probe_persisted, write_sq8)
    with tempfile.TemporaryDirectory() as sq8dir:
        write_sq8(em, sq8dir)
        materialize(sq8_probe_persisted(spark, sq8dir, qdf, k=10))
        record("sim_sq8_probe_persisted",
               timed_runs(lambda: sq8_probe_persisted(
                   spark, sq8dir, qdf, k=10),
                   REPEATS + EXTRA_REPEATS, "sim_sq8_probe_persisted"),
               extra_timings)

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
        record("dedup_store_probe",
               timed_runs(lambda: flag_batch_against_store(
                   batch, store, JACCARD_THRESHOLD),
                   REPEATS, "dedup_store_probe"),
               extra_timings)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # Restore declaration order in the reported dict (the flagship runs
    # last for isolation but reads first, matching BASELINE.md row order).
    timings = {**{n: timings[n] for n in HEADLINE if n in timings},
               **{n: v for n, v in timings.items() if n not in HEADLINE}}
    all_mins = {**timings, **extra_timings}
    spread = {n: round((medians[n] - all_mins[n]) / all_mins[n], 3)
              for n in medians if all_mins.get(n)}
    suspect = sorted((n for n, s in spread.items() if s > NOISE_BAND),
                     key=lambda n: -spread[n])

    # Load self-adjudication (r17, VERDICT r16 #4): r16's driver headline
    # read 1.73x r15 purely from sandbox load, and only out-of-band idle
    # re-runs could prove it.  Now the bench adjudicates itself: every
    # HEADLINE row whose repeats disagreed beyond NOISE_BAND is re-run
    # in-bench (fresh min-of-REPEATS at the end, when transient co-tenant
    # spikes have had time to pass), its min is updated from the combined
    # evidence, and a per-row verdict {load_ok, max_loadavg, rerun_min}
    # rides INTO the driver-captured stdout tail.  load_ok means the
    # re-run block internally agreed (spread <= NOISE_BAND), i.e. the
    # recorded min is now trustworthy without an out-of-band run.
    RERUN_CAP = 6  # bound the added wall time on a genuinely loaded box
    load_rows: dict[str, dict] = {}
    for name in [n for n in suspect if n in HEADLINE][:RERUN_CAP]:
        fn = qs[name]
        rr = timed_runs(lambda: fn(spark, sf_dir), REPEATS,
                        f"{name}__rerun")
        rr_min, rr_med = min(rr), sorted(rr)[len(rr) // 2]
        new_min = round(min(rr_min, all_mins[name]), 3)
        load_rows[name] = {
            "load_ok": bool((rr_med - rr_min) / rr_min <= NOISE_BAND),
            "max_loadavg": max(loadavg.get(name, [0.0])
                               + loadavg.get(f"{name}__rerun", [0.0])),
            "rerun_min": round(rr_min, 3),
        }
        timings[name] = new_min
        all_mins[name] = new_min
        spread[name] = round((medians[name] - new_min) / new_min, 3)

    full = {
        "metric": "headline_suite_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_val,
        "master": master,
        "default_parallelism": default_parallelism,
        "load_start": load_start,
        "load_rows": load_rows,
        "queries": all_mins,
        # per-query MEDIAN alongside the min: a real plan regression moves
        # both; co-tenant noise moves the median while the min holds — so
        # round-over-round drift is diagnosable from this JSON alone.
        "queries_median": medians,
        # (median-min)/min per row; > NOISE_BAND lands in "suspect".
        "spread": spread,
        "suspect": suspect,
        "noise_band": NOISE_BAND,
        # 1-min loadavg [before, after] each row's timing block: co-tenant
        # pressure at measurement time, readable post-hoc.
        "loadavg": loadavg,
        # run_stream_to_df rows: the engine's own decomposition of the
        # min run (start/drain wall + summed triggerExecution ms), so
        # harness startup is separable from drain (VERDICT r13 #4).
        "stream_drain": stream_drain,
        # On-disk postings bytes, plain vs gap-encoded (same corpus,
        # same bucketing): the layout's storage price/win beside its
        # serving rows (VERDICT r16 #8).
        "store_bytes": store_bytes,
    }
    local_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_LOCAL.json")
    with open(local_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(f"# full per-row detail written to {local_path}", file=sys.stderr)

    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "sf": sf_val,
        # scaling-contract proof (VERDICT r17 #2): actual master URL +
        # defaultParallelism so the driver's core-count probe is verifiable
        "master": master,
        "parallelism": default_parallelism,
        "queries": timings,          # headline mins only — fits the tail
        "suspect": suspect,
        # self-adjudication verdict in the driver-visible tail: 1-min
        # loadavg BEFORE any Spark work (co-tenant pressure, untainted by
        # the bench's own threads) and the per-suspect re-run verdicts.
        "load_start": load_start,
        "load": load_rows,
        "detail": "BENCH_LOCAL.json",
    }
    line = _compact_line(compact)
    assert len(line) <= COMPACT_BUDGET, len(line)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

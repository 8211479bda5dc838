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
    # NOTE: the FIXED-width LSH rows (sim_cosine_top_pairs, and the gate's
    # sim_cosine_near_dups / sim_cosine_banded) are kept for
    # round-over-round continuity only — their fixed bucket space admits a
    # fixed fraction of all N² pairs (measured 30x candidate blowup at a
    # 10x scale-up).  The 100 TB near-dup path is the width-ADAPTIVE pair:
    # sim_cosine_top_pairs_scaled / sim_cosine_near_dups_banded.
    "sim_cosine_top_pairs",  # LSH-bucket candidate pair join (no all-pairs)
    "sim_cosine_banded",     # banded sign-LSH (width-tunable scale path)
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
    "sim_semdedup",          # cluster-then-prune semantic dedup
    "events_paths",          # gap sessionization + journey path mining
    "stream_dedup_history",  # stream-static anti-join dedup
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
# The adaptive pair stays timed at every scale; one fixed-width gate row
# remains oracle-certified at sf0.01/sf0.1 for continuity.
FIXED_WIDTH_LSH = {"sim_cosine_top_pairs", "sim_cosine_banded"}


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
        # min, not median: the metric is the engine's cost, and min-of-N is
        # the estimator least contaminated by co-tenant machine load.
        (timings if name in HEADLINE else extra_timings)[name] = \
            round(min(runs), 3)
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
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            materialize(bm25_probe_persisted(spark, ixdir, FLAGSHIP_QUERY))
            runs.append(time.perf_counter() - t0)
        timings["search_bm25_probe_persisted"] = round(min(runs), 3)

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
        "sf": sf_val,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Stage decomposition of the three >20 s sf1 bench rows (r16, VERDICT
r15 #5): sim_cosine_top_pairs_scaled, sim_ivfpq_boundedc_probe,
dedup_prefix_jaccard.

Same protocol as profile_bm25_sf1.py: each stage is a CUMULATIVE
materialization (stage N includes stages 1..N-1's plan), min-of-N after a
warmup run, noop sink so no driver-side row serialization is billed.
The point is to separate, per row, what a 10x scale-up conversation
should focus on — certification overhead (ground-truth/oracle work) vs
the serving/discovery cost a production deployment actually pays — and
to pin plan-stable metrics (candidate counts) so future drift localizes
to a stage.

Rows and their stages:

  sim_cosine_top_pairs_scaled   (discovery job — all cost is "real")
    count      one count() that sizes the band width (pure function of N)
    buckets    normalize + per-band sign-LSH bucketing + explode
    pairs      (band,bucket) self-join + cosine + distinct  <- the cost
    topn       orderBy(cos desc) + limit over thresholded pairs (TakeOrdered)

  sim_ivfpq_boundedc_probe      (serving path, C=200 cap, nprobe=all)
    build      write_ivfpq (untimed setup in bench — shown for context)
    adc        ADC nomination: top-C per query from the persisted codes
    rerank     exact re-rank of the C candidates (the refine latency)

  dedup_prefix_jaccard          (exact PPJoin — exactness is the product)
    arrays     tokenize + global-df vocabulary + per-doc ordered arrays
    candidates prefix explode + inverted-index self-join + PPJoin filters
    verify     size-prune + in-row array_intersect Jaccard >= t

Usage: python tools/profile_slow_sf1.py [sf_dir]  (default sf1 scratch)
Prints one JSON line per row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    import tempfile

    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.dedup import (
        df_ordered_token_arrays, jaccard_verify_arrays, ppjoin_candidates)
    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_probe_persisted, write_ivfpq)
    from big_data_assignment_2_spark.operators.similarity import (
        band_width_for, banded_lsh_candidate_pairs, cosine_top_pairs_scaled,
        exact_rerank)
    from big_data_assignment_2_spark.plans.dedup_queries import (
        JACCARD_THRESHOLD)
    from big_data_assignment_2_spark.plans.similarity_queries import (
        BOUNDEDC_C, BOUNDEDC_NPROBE, BOUNDEDC_PQ_ITERS, BOUNDEDC_PQ_KS,
        BOUNDEDC_PQ_M, IVFPQ_COARSE_ITERS, IVFPQ_COARSE_K, SCALED_BANDS,
        SCALED_CPV, TOP_PAIRS)
    from big_data_assignment_2_spark.session import get_spark
    from big_data_assignment_2_spark.sources.io import load_table

    spark = get_spark("slowprofile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(fn) -> dict:
        mat(fn())  # warmup: codegen + JIT + shuffle machinery
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            mat(fn())
            runs.append(time.perf_counter() - t0)
        return {"min": round(min(runs), 3),
                "median": round(sorted(runs)[len(runs) // 2], 3)}

    # ---- sim_cosine_top_pairs_scaled -------------------------------
    em = load_table(spark, sf_dir, "embeddings")
    n = em.count()
    r = band_width_for(n, SCALED_BANDS, SCALED_CPV)

    def buckets_only():
        # the `v` relation of banded_lsh_candidate_pairs, un-persisted so
        # the stage is billed honestly
        from big_data_assignment_2_spark.operators.similarity import (
            as_double, l2_norm, lsh_bucket)
        return (em.select(F.col("vec_id").alias("id"),
                          as_double("embedding").alias("v"))
                .withColumn("nrm", l2_norm(F.col("v")))
                .select("id",
                        F.transform("v", lambda x: x / F.col("nrm"))
                        .alias("vn"),
                        F.array(*[F.struct(
                            F.lit(j).alias("band"),
                            lsh_bucket(F.col("v"), r,
                                       plane_offset=j * r).alias("bucket"))
                            for j in range(SCALED_BANDS)]).alias("bb"))
                .select("id", "vn", F.explode("bb").alias("bb")))

    out: dict[str, object] = {"row": "sim_cosine_top_pairs_scaled",
                              "sf_dir": sf_dir, "n_vectors": n, "r": r}
    t0 = time.perf_counter()
    em.count()
    out["count"] = {"min": round(time.perf_counter() - t0, 3)}
    out["buckets"] = timed(buckets_only)
    out["pairs"] = timed(lambda: banded_lsh_candidate_pairs(
        em, r, SCALED_BANDS))
    out["topn"] = timed(lambda: cosine_top_pairs_scaled(
        em, top_n=TOP_PAIRS, bands=SCALED_BANDS,
        candidates_per_vector=SCALED_CPV))
    out["n_candidates"] = banded_lsh_candidate_pairs(
        em, r, SCALED_BANDS).count()
    print(json.dumps(out))

    # ---- sim_ivfpq_boundedc_probe ----------------------------------
    qdf = em.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")
    with tempfile.TemporaryDirectory() as anndir:
        t0 = time.perf_counter()
        write_ivfpq(em, anndir, n_centroids=IVFPQ_COARSE_K,
                    coarse_iters=IVFPQ_COARSE_ITERS, m=BOUNDEDC_PQ_M,
                    ks=BOUNDEDC_PQ_KS, pq_iters=BOUNDEDC_PQ_ITERS)
        build_s = round(time.perf_counter() - t0, 3)
        out = {"row": "sim_ivfpq_boundedc_probe", "sf_dir": sf_dir,
               "n_vectors": n, "C": BOUNDEDC_C,
               "build_untimed_in_bench": build_s}
        out["adc"] = timed(lambda: ivfpq_probe_persisted(
            spark, anndir, qdf, k=BOUNDEDC_C, nprobe=BOUNDEDC_NPROBE))
        out["rerank"] = timed(lambda: exact_rerank(
            ivfpq_probe_persisted(spark, anndir, qdf, k=BOUNDEDC_C,
                                  nprobe=BOUNDEDC_NPROBE), em, qdf, k=10))
        print(json.dumps(out))

    # ---- dedup_prefix_jaccard --------------------------------------
    docs = load_table(spark, sf_dir, "documents")
    out = {"row": "dedup_prefix_jaccard", "sf_dir": sf_dir,
           "threshold": JACCARD_THRESHOLD, "n_docs": docs.count()}
    out["arrays"] = timed(lambda: df_ordered_token_arrays(docs))
    out["candidates"] = timed(lambda: ppjoin_candidates(
        df_ordered_token_arrays(docs), JACCARD_THRESHOLD, True))
    out["verify"] = timed(lambda: jaccard_verify_arrays(
        ppjoin_candidates(df_ordered_token_arrays(docs),
                          JACCARD_THRESHOLD, True),
        df_ordered_token_arrays(docs), JACCARD_THRESHOLD))
    out["n_candidates"] = ppjoin_candidates(
        df_ordered_token_arrays(docs), JACCARD_THRESHOLD, True).count()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Filtered-ANN selectivity sweep: mean recall@10 of PRE-filtering (label
predicate inside the probed IVF lists) vs POST-filtering (unfiltered
top-30 page, then keep matching, then top-10) against label-filtered
exact ground truth, as the filter gets more selective.

Pseudo-labels vec_id % K give selectivity 1/K without re-seeding data;
K=10 reproduces the certified sim_filtered_recall config.

Usage: python tools/sweep_filtered_selectivity.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.similarity import (
        brute_force_topk, ivf_topk_deterministic)
    from big_data_assignment_2_spark.session import get_spark
    from big_data_assignment_2_spark.sources.io import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("filtered-sweep", master="local[32]",
                      shuffle_partitions=32)
    em0 = load_table(spark, sf_dir, "embeddings")
    ivf_kw = dict(n_centroids=8, iters=2, nprobe=2)
    for k_mod in (2, 10, 50):
        em = em0.withColumn("lbl", (F.col("vec_id") % k_mod).cast("int"))
        q = (em.filter(F.col("vec_id") < 5)
             .select(F.col("vec_id").alias("query_id"), "embedding", "lbl"))
        gt = brute_force_topk(em, q, k=10, same_label_col="lbl") \
            .select("query_id", "neighbor_id")
        pre = ivf_topk_deterministic(em, q, k=10, same_label_col="lbl",
                                     **ivf_kw).select("query_id",
                                                      "neighbor_id")
        cand = ivf_topk_deterministic(em, q, k=30, **ivf_kw)
        lbl = em.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("lbl").alias("nl"))
        qlbl = q.select("query_id", F.col("lbl").alias("ql"))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id"))
        post = (cand.join(lbl, "neighbor_id")
                .join(F.broadcast(qlbl), "query_id")
                .filter(F.col("nl") == F.col("ql"))
                .withColumn("r2", F.row_number().over(w))
                .filter(F.col("r2") <= 10)
                .select("query_id", "neighbor_id"))

        def recall(res):
            hits = gt.join(res, ["query_id", "neighbor_id"]).count()
            return hits / gt.count()

        print(f"selectivity 1/{k_mod} ({100 // k_mod}%): "
              f"pre {recall(pre):.2f}  post {recall(post):.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

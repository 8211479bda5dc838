"""Bounded-C recall sweep (r14, VERDICT r13 #2): find the IVF+PQ config
that recovers mean recall@10 >= 0.85 at sf1 (N=20k) with the candidate
budget CAPPED at C <= 200 — i.e. recall bought with code precision
(m/ks) and list coverage (nprobe) instead of a linear-in-N re-rank.

Usage: python tools/sweep_boundedc_sf1.py [sf_dir]
Prints one line per config: m, ks, pq_iters, nprobe, C, mean/min
recall@10, probe+refine latency (min of 3).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_assignment_2_spark.operators.persist import (  # noqa: E402
    ivfpq_probe_persisted, write_ivfpq)
from big_data_assignment_2_spark.operators.similarity import (  # noqa: E402
    brute_force_topk, exact_rerank)
from big_data_assignment_2_spark.plans.similarity_queries import (  # noqa: E402
    IVFPQ_COARSE_ITERS, IVFPQ_COARSE_K, TOP_K, _queries_df,
    _recall_per_query)
from big_data_assignment_2_spark.session import get_spark  # noqa: E402
from big_data_assignment_2_spark.sources.io import load_table  # noqa: E402

CONFIGS = [
    # (m, ks, pq_iters, nprobe, C) — pass a subset as argv[2:] indices
    (16, 16, 2, 3, 100),   # the C∝N row's config at FIXED C=100 (baseline)
    (16, 16, 2, 4, 200),   # widen lists + C to the cap
    (16, 32, 2, 4, 200),   # finer codes: 5 bits/subspace
    (16, 64, 2, 4, 200),   # finer codes: 6 bits/subspace
    (32, 16, 2, 4, 200),   # more subspaces: 2-dim, 128 bits/vector
    (16, 64, 2, 3, 200),   # can finer codes alone keep nprobe at 3?
    (32, 32, 2, 4, 200),   # both knobs
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    configs = [CONFIGS[int(i)] for i in sys.argv[2:]] or CONFIGS
    spark = get_spark("sweep_boundedc")
    em = load_table(spark, sf_dir, "embeddings").cache()
    n = em.count()
    qs = _queries_df(spark, sf_dir)
    bf = brute_force_topk(em, qs, k=TOP_K).select("query_id", "neighbor_id")
    bf.cache().count()
    print(f"sf_dir={sf_dir} N={n}")
    for m, ks, pi, nprobe, c in configs:
        with tempfile.TemporaryDirectory() as path:
            t0 = time.perf_counter()
            write_ivfpq(em, path, n_centroids=IVFPQ_COARSE_K,
                        coarse_iters=IVFPQ_COARSE_ITERS,
                        m=m, ks=ks, pq_iters=pi)
            t_build = time.perf_counter() - t0

            def probe():
                cand = ivfpq_probe_persisted(spark, path, qs, k=c,
                                             nprobe=nprobe)
                return exact_rerank(cand, em, qs, k=TOP_K)

            rr = probe().select("query_id", "neighbor_id")
            per = _recall_per_query(bf, rr)
            row = per.agg(F.avg("recall").alias("mean"),
                          F.min("recall").alias("mn")).first()
            lat = []
            for _ in range(2):
                t0 = time.perf_counter()
                probe().write.format("noop").mode("overwrite").save()
                lat.append(time.perf_counter() - t0)
            print(f"m={m:>2} ks={ks:>2} pi={pi} nprobe={nprobe} C={c:>3}  "
                  f"mean={row['mean']:.3f} min={row['mn']:.3f}  "
                  f"build={t_build:.1f}s probe={min(lat):.2f}s",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

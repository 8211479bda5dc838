"""Stage decomposition of search_bm25_topk (r13, VERDICT r12 #2).

The flagship drifted at sf1 two consecutive rounds (min 2.08 -> 2.89 ->
3.89 s) on a git-verified unchanged plan while sf0.1 recovered — the
minhash-cold protocol says: decompose the pipeline into its stages on an
IDLE machine, time each stage cumulatively, and pin plan-stable metrics
(row counts) so any future drift localizes to a stage instead of a
whole-query number.

Stages (each timed as a cumulative materialization, min-of-N after a
warmup, noop sink so no driver serialization is billed):

  tokenize   tokenize_positions(docs)            X1 explode
  postings   build_postings(tokens)              A1 agg (tf + positions)
  dfreq      doc_freq(postings)                  A2 agg
  stats      doc_stats(docs)                     A3 map-side agg
  full       search_documents(...)  (probe join + scoring + top-k on top)

Usage: python tools/profile_bm25_sf1.py [sf_dir]   (default sf1 scratch)
Prints one JSON line with per-stage times and the plan-stable metrics.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    from big_data_assignment_2_spark.operators.index import (
        build_postings, doc_freq, doc_stats, tokenize_positions)
    from big_data_assignment_2_spark.operators.search import search_documents
    from big_data_assignment_2_spark.plans.search_queries import FLAGSHIP_QUERY
    from big_data_assignment_2_spark.session import get_spark
    from big_data_assignment_2_spark.sources.io import load_table

    spark = get_spark("bm25profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    stages = {
        "tokenize": lambda: tokenize_positions(docs),
        "postings": lambda: build_postings(tokenize_positions(docs)),
        "dfreq": lambda: doc_freq(build_postings(tokenize_positions(docs))),
        "stats": lambda: doc_stats(docs),
        "full": lambda: search_documents(spark, docs, FLAGSHIP_QUERY, k=10),
    }
    out: dict[str, object] = {}
    for name, fn in stages.items():
        mat(fn())  # warmup: codegen + JIT
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            mat(fn())
            runs.append(time.perf_counter() - t0)
        out[name] = {"min": round(min(runs), 3),
                     "median": round(sorted(runs)[len(runs) // 2], 3)}

    # Plan-stable metrics: if these move round-over-round the DATA or the
    # plan changed; if they hold while a stage's time moves, it's the
    # machine.
    toks = tokenize_positions(docs)
    posts = build_postings(toks)
    out["metrics"] = {
        "n_docs": docs.count(),
        "n_tokens": toks.count(),
        "n_postings": posts.count(),
        "n_terms": doc_freq(posts).count(),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    la1, la5, la15 = os.getloadavg()
    out["loadavg"] = [round(la1, 2), round(la5, 2), round(la15, 2)]
    out["sf_dir"] = sf_dir
    print(json.dumps(out))


if __name__ == "__main__":
    main()

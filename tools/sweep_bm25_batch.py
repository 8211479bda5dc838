"""Batched-BM25 throughput sweep: one plan scoring Q queries vs Q
sequential jobs (operators.search.bm25_topk_batch vs bm25_topk) over the
in-flight index at sf0.1.

Usage: python tools/sweep_bm25_batch.py [sf_dir]

r14 measurements (idle local[32], min of 3):
    Q=1:   batch 1.43 s   sequential 1.33 s   (parity - windowed rank vs
                                               TakeOrderedAndProject)
    Q=10:  batch 1.44 s   sequential 10.91 s  (7.6x)
    Q=100: batch 2.81 s   -> 28 ms/query      (47x vs one-at-a-time)
The index pass dominates; adding queries to the broadcast term relation
is nearly free until the per-query top-k windows grow to matter.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    from big_data_assignment_2_spark.operators.index import build_index
    from big_data_assignment_2_spark.operators.search import (bm25_topk,
                                                              bm25_topk_batch)
    from big_data_assignment_2_spark.session import get_spark
    from big_data_assignment_2_spark.sources.io import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bm25-batch-sweep", master="local[32]",
                      shuffle_partitions=32)
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    ix = build_index(docs)
    args = (ix["term_document"], ix["document_frequency"],
            ix["documents_info"])
    vocab = ["vector", "query", "stream", "fast", "join", "table", "row",
             "scan", "hash", "data", "batch", "window", "order", "column",
             "agg", "small", "line", "customer", "key", "value"]

    def qtext(i: int) -> str:
        return " ".join(vocab[(i + j * 3) % len(vocab)] for j in range(5))

    bm25_topk(spark, qtext(0), *args, k=10).collect()  # warm
    for q_n in (1, 10, 100):
        queries = {f"q{i}": qtext(i) for i in range(q_n)}
        best_b = min(_timed(lambda: bm25_topk_batch(
            spark, queries, *args, k=10).collect()) for _ in range(3))
        if q_n <= 10:
            best_s = min(_timed(lambda: [
                bm25_topk(spark, q, *args, k=10).collect()
                for q in queries.values()]) for _ in range(2))
            seq = f"sequential {best_s:.2f}s"
        else:
            seq = "sequential skipped"
        print(f"Q={q_n}: batch {best_b:.2f}s {seq} "
              f"per-query-batched {best_b / q_n * 1000:.0f}ms")
    spark.stop()
    return 0


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    sys.exit(main())

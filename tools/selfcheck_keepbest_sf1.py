"""sf1 construction self-check for dedup_keep_best (VERDICT r9 task #4).

The keep-best cluster oracle is DuckDB-infeasible at sf1 (it embeds the
full minhash-cluster oracle — r6 precedent), so at-scale correctness is
certified by construction instead, the same 10x-copy argument that
certified dedup_minhash_near (r6) and PPJoin (r9): the sf1 corpus is 10
token-disjoint copies of sf0.1 (copy 0 byte-identical, copies 1-9
token-salted, doc_id stride 1,000,000), so near-dup clusters can never
cross copies and the keep-best output must satisfy:

  (a) zero cross-copy: each cluster's rep and best doc live in the same
      copy, and per-copy member counts each equal the sf0.1 doc count.
  (b) copy-0 exactness: the copy-0 rows equal the sf0.1 output EXACTLY
      (reps, best docs, char lengths, member counts) — copy 0 is
      byte-identical, so any divergence is an engine bug.
  (c) restricted-input closure for EVERY copy: rerunning the operator on
      copy k's documents ALONE reproduces the copy-k rows of the full
      sf1 run — the sf1 answer is exactly the concatenation of 10
      independently-reproducible sub-answers, i.e. the clustering never
      used any other copy's data.

NOT asserted: per-copy cluster COUNTS being equal across copies.  They
are close but not identical (first run: 2209 for copy 0, 2211 for copy
7) because the clusters come from banded-MinHash pairs, and salting
changes token HASH values — LSH band recall is a function of the hashes,
so a salted copy's candidate set may miss/keep a borderline pair the
original recalled.  True Jaccard is salting-invariant (token sets map
bijectively on this punctuation-free corpus); the variation is a
property of the approximate candidate generator under the corpus
construction, not an engine bug — and (c) pins exactly what the engine
owes: each copy's answer equals its own restricted run.

Usage: python tools/selfcheck_keepbest_sf1.py [sf1_dir] [sf01_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

STRIDE = 1_000_000
COPIES = 10


def keep_best_rows(spark, docs):
    """The q_keep_best plan over an explicit docs relation (the registered
    query binds a directory; the restricted-input check needs a filter)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.dedup import near_dup_clusters
    from big_data_assignment_2_spark.plans.dedup_queries import \
        JACCARD_THRESHOLD

    clusters = near_dup_clusters(docs, threshold=JACCARD_THRESHOLD)
    quality = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                          F.length("text").alias("n_chars"))
    j = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_rep").orderBy(
        F.desc("n_chars"), F.col("doc_id").cast("bigint"))
    wc = Window.partitionBy("cluster_rep")
    out = (j.withColumn("rn", F.row_number().over(w))
           .withColumn("n_members", F.count(F.lit(1)).over(wc))
           .filter(F.col("rn") == 1)
           .select("cluster_rep", F.col("doc_id").alias("best_doc"),
                   F.col("n_chars").alias("best_chars"), "n_members"))
    return [(int(r["cluster_rep"]), int(r["best_doc"]),
             int(r["best_chars"]), int(r["n_members"]))
            for r in out.collect()]


def main() -> int:
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.session import get_spark
    from big_data_assignment_2_spark.sources.io import load_table

    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    sf01 = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("selfcheck-keepbest")

    t0 = time.time()
    rows1 = keep_best_rows(spark, load_table(spark, sf1, "documents"))
    t_sf1 = time.time() - t0
    t0 = time.time()
    rows01 = keep_best_rows(spark, load_table(spark, sf01, "documents"))
    t_sf01 = time.time() - t0
    n_docs01 = load_table(spark, sf01, "documents").count()
    ok = True

    # (a) zero cross-copy + per-copy member budget
    cross = [r for r in rows1 if r[0] // STRIDE != r[1] // STRIDE]
    per_copy = {}
    for rep, _best, _ch, n in rows1:
        per_copy[rep // STRIDE] = per_copy.get(rep // STRIDE, 0) + n
    bad_budget = {k: v for k, v in per_copy.items() if v != n_docs01}
    if not cross and not bad_budget and len(per_copy) == COPIES:
        print(f"PASS (a) zero cross-copy; every copy's members sum to "
              f"{n_docs01}")
    else:
        ok = False
        print(f"FAIL (a): cross={cross[:3]} bad_budget={bad_budget}")

    # (b) copy-0 exact equality
    c0 = sorted(r for r in rows1 if r[0] // STRIDE == 0)
    base = sorted(rows01)
    if c0 == base:
        print(f"PASS (b) copy-0 subset == sf0.1 output ({len(base)} rows)")
    else:
        ok = False
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(c0, base))
                    if a != b)
        print(f"FAIL (b): first diff at {diff}")

    # (c) restricted-input closure for every copy
    t0 = time.time()
    counts = []
    for k in range(COPIES):
        docs_k = (load_table(spark, sf1, "documents")
                  .filter((F.col("doc_id").cast("bigint") / STRIDE)
                          .cast("bigint") == k))
        alone = sorted(keep_best_rows(spark, docs_k))
        full_k = sorted(r for r in rows1 if r[0] // STRIDE == k)
        counts.append(len(full_k))
        if alone != full_k or not alone:
            ok = False
            print(f"FAIL (c) copy {k}: alone={len(alone)} "
                  f"full={len(full_k)}")
    t_closure = time.time() - t0
    if ok:
        print(f"PASS (c) all {COPIES} copies: restricted run == full-run "
              f"subset; per-copy cluster counts {counts} "
              f"(variation = banded-LSH recall under token re-hashing, "
              f"see header)")

    print(f"timings: sf1 {t_sf1:.1f}s, sf0.1 {t_sf01:.1f}s, "
          f"{COPIES}-copy closure {t_closure:.1f}s")
    print("SELF-CHECK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

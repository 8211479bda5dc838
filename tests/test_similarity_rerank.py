"""Exact re-rank stage (r12, FAISS IndexRefineFlat shape): re-ranking the
FULL corpus as candidates must equal brute force exactly; re-ranking a
restricted candidate set must be exact WITHIN it and must repair ADC rank
inversions."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.similarity import (
    brute_force_topk, exact_rerank)
from big_data_assignment_2_spark.sources.io import load_table

K = 10


def _queries(em):
    return em.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")


def test_full_candidates_equals_brute_force(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = _queries(em)
    # every (query, non-self vector) pair as the candidate relation
    cand = (q.select("query_id").crossJoin(
        em.select(F.col("vec_id").alias("neighbor_id")))
        .filter(F.col("query_id") != F.col("neighbor_id")))
    got = sorted(map(tuple, exact_rerank(cand, em, q, k=K).collect()))
    want = sorted(map(tuple, brute_force_topk(em, q, k=K).collect()))
    assert got == want


def test_rerank_is_exact_within_candidates(spark, sf_dir):
    """Restricted candidates: the re-ranked top-k must equal brute force
    computed over ONLY those candidates (exactness within the nominated
    set — the two-stage retrieval contract)."""
    em = load_table(spark, sf_dir, "embeddings")
    q = _queries(em)
    cand = (q.select("query_id").crossJoin(
        em.select(F.col("vec_id").alias("neighbor_id")))
        .filter((F.col("query_id") != F.col("neighbor_id"))
                & (F.col("neighbor_id") % 3 == 0)))   # arbitrary subset
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in exact_rerank(cand, em, q, k=K).collect()}
    full = brute_force_topk(em, q, k=10**9).collect()
    want = {}
    perq: dict = {}
    for r in sorted(full, key=lambda r: (r["query_id"], r["rank"])):
        if int(r["neighbor_id"]) % 3 == 0:
            n = perq.get(r["query_id"], 0) + 1
            perq[r["query_id"]] = n
            if n <= K:
                want[(r["query_id"], n)] = r["neighbor_id"]
    assert got == want


def test_rerank_repairs_adc_inversions(spark):
    """A tiny planted corpus where compressed-order (candidate input
    order) disagrees with exact cosine: the re-rank must order by exact
    cosine regardless of the candidate relation's own ranking."""
    em = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 63),
         (1, [0.9, 0.1] + [0.0] * 62),     # cos ~0.994 to query
         (2, [0.5, 0.5] + [0.0] * 62)],    # cos ~0.707 to query
        "vec_id bigint, embedding array<double>")
    q = em.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding")
    # candidate relation deliberately ranks 2 above 1 (a PQ inversion)
    cand = spark.createDataFrame([(0, 2, 1), (0, 1, 2)],
                                 "query_id bigint, neighbor_id bigint, rank int")
    out = exact_rerank(cand, em, q, k=2).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [1, 2]

"""MMR diversity re-rank (r14): independent pure-Python replay of the
selection loop over the collected candidate/pair sims must match the
unrolled plan exactly; plus structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.similarity import (
    as_double, brute_force_topk, cosine, mmr_rerank)
from big_data_assignment_2_spark.sources.io import load_table

C, K, LAM = 20, 5, 0.7


def _fixture(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    cand = brute_force_topk(em, q, k=C) \
        .select("query_id", "neighbor_id", "cos_sim")
    return em, cand


def test_mmr_matches_pure_python_replay(spark, sf_dir):
    em, cand = _fixture(spark, sf_dir)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in mmr_rerank(cand, em, k=K, lam=LAM).collect()}

    crows = cand.collect()
    v = em.select(F.col("vec_id").alias("a"), as_double("embedding").alias("va"))
    w = em.select(F.col("vec_id").alias("b"), as_double("embedding").alias("vb"))
    ids = sorted({r["neighbor_id"] for r in crows})
    sims = {(r["a"], r["b"]): r["s"] for r in
            (v.filter(F.col("a").isin(ids)).crossJoin(w.filter(F.col("b").isin(ids)))
             .select("a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("s"))
             .collect())}

    want = {}
    by_q: dict = {}
    for r in crows:
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cos_sim"]))
    for qid, lst in by_q.items():
        rel = dict(lst)
        picked = []
        # pick 1: pure relevance, ties by id
        first = sorted(rel, key=lambda d: (-rel[d], d))[0]
        picked.append(first)
        want[(qid, 1)] = first
        for step in range(2, K + 1):
            best = None
            for d in sorted(rel):
                if d in picked:
                    continue
                pen = max(sims[(d, s)] for s in picked)
                score = round(LAM * rel[d] - (1 - LAM) * pen, 6)
                key = (-score, d)
                if best is None or key < best[0]:
                    best = (key, d)
            picked.append(best[1])
            want[(qid, step)] = best[1]
    assert got == want


def test_mmr_structure(spark, sf_dir):
    em, cand = _fixture(spark, sf_dir)
    rows = mmr_rerank(cand, em, k=K, lam=LAM).collect()
    cand_ids = {(r["query_id"], r["neighbor_id"]) for r in cand.collect()}
    qids = {r["query_id"] for r in rows}
    for qid in qids:
        picks = sorted((r["rank"], r["neighbor_id"]) for r in rows
                       if r["query_id"] == qid)
        assert [p[0] for p in picks] == list(range(1, K + 1))
        assert len({p[1] for p in picks}) == K  # no repeats
    for r in rows:
        assert (r["query_id"], r["neighbor_id"]) in cand_ids


def test_mmr_cache_registry_releases_caches(spark, sf_dir):
    """The cache_registry hook (r14 advice): every persisted intermediate
    is handed back so a serving loop can unpersist deterministically —
    same result, and all handles release cleanly."""
    em, cand = _fixture(spark, sf_dir)
    baseline = sorted(map(tuple, mmr_rerank(cand, em, k=K, lam=LAM).collect()))
    reg: list = []
    got = sorted(map(tuple,
                     mmr_rerank(cand, em, k=K, lam=LAM,
                                cache_registry=reg).collect()))
    assert got == baseline
    # r18: only the thrice-referenced candidate page is persisted (the
    # greedy selection moved into one cogrouped applyInPandas stage, so
    # the per-level pick caches no longer exist)
    assert len(reg) == 1
    for df in reg:
        assert df.is_cached
        df.unpersist()
        assert not df.is_cached

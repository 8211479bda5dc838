"""Filtered vector search (r14): the metadata predicate must act as a
PRE-filter — pruning candidates inside the probed lists before ranking —
and the filtered result must be internally consistent with its unfiltered
and brute-force counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.similarity import (
    brute_force_topk, ivf_topk_deterministic)
from big_data_assignment_2_spark.sources.io import load_table

K = 10
IVF_KW = dict(n_centroids=8, iters=2, nprobe=2)


def _queries(em):
    return em.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding", "label")


def test_filtered_results_share_query_label(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = _queries(em)
    res = ivf_topk_deterministic(em, q, k=K, same_label_col="label", **IVF_KW)
    labels = {r["vec_id"]: r["label"] for r in em.select("vec_id", "label").collect()}
    rows = res.collect()
    assert rows, "filtered search returned nothing"
    for r in rows:
        assert labels[int(r["neighbor_id"])] == labels[int(r["query_id"])]


def test_prefilter_equals_filter_of_probed_candidates(spark, sf_dir):
    """Pre-filtering must equal 'take ALL candidates from the probed lists,
    keep same-label, rank top-k' — i.e. the filter loses no same-label
    candidate the probe saw (unlike post-filtering a truncated top-C)."""
    em = load_table(spark, sf_dir, "embeddings")
    q = _queries(em)
    pre = ivf_topk_deterministic(em, q, k=K, same_label_col="label", **IVF_KW)
    # unfiltered at unbounded k = every candidate in the probed lists
    allc = ivf_topk_deterministic(em, q, k=10**9, **IVF_KW)
    labels = {r["vec_id"]: r["label"] for r in em.select("vec_id", "label").collect()}
    want = {}
    perq: dict = {}
    for r in sorted(allc.collect(), key=lambda r: (r["query_id"], r["rank"])):
        if labels[int(r["neighbor_id"])] != labels[int(r["query_id"])]:
            continue
        n = perq.get(r["query_id"], 0)
        if n < K:
            perq[r["query_id"]] = n + 1
            want[(r["query_id"], n + 1)] = r["neighbor_id"]
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in pre.collect()}
    assert got == want


def test_filtered_brute_force_is_filtered_full_ranking(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = _queries(em)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in brute_force_topk(em, q, k=K, same_label_col="label").collect()}
    labels = {r["vec_id"]: r["label"] for r in em.select("vec_id", "label").collect()}
    full = brute_force_topk(em, q.select("query_id", "embedding"), k=10**9)
    want = {}
    perq: dict = {}
    for r in sorted(full.collect(), key=lambda r: (r["query_id"], r["rank"])):
        if labels[int(r["neighbor_id"])] != labels[int(r["query_id"])]:
            continue
        n = perq.get(r["query_id"], 0)
        if n < K:
            perq[r["query_id"]] = n + 1
            want[(r["query_id"], n + 1)] = r["neighbor_id"]
    assert got == want


def test_persisted_probe_allowed_all_is_identity(spark, sf_dir, tmp_path):
    """allowed = every (query, candidate) pair must change nothing — the
    pre-filter semi-join is a pure restriction, not a re-scorer."""
    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_probe_persisted, write_ivfpq)

    em = load_table(spark, sf_dir, "embeddings")
    base = str(tmp_path / "ivfpq_allowed_identity")
    write_ivfpq(em, base, n_centroids=4, coarse_iters=1, m=4, ks=8,
                pq_iters=1)
    q = em.filter(F.col("vec_id") < 3) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    allowed = (q.select("query_id").crossJoin(
        em.select(F.col("vec_id").alias("neighbor_id"))))
    plain = ivfpq_probe_persisted(spark, base, q, k=5, nprobe=2)
    filt = ivfpq_probe_persisted(spark, base, q, k=5, nprobe=2,
                                 allowed=allowed)
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, filt.collect()))

"""IVF ANN: bucket assignment is total, deterministic, and recall vs the
exact brute force is high on the harness embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.similarity import (
    brute_force_topk, ivf_build, ivf_topk_deterministic)
from big_data_assignment_2_spark.sources.io import load_table


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_ivf_assignment_total_and_deterministic(embeddings):
    a1, c1 = ivf_build(embeddings, n_centroids=8, seed=0)
    a2, c2 = ivf_build(embeddings, n_centroids=8, seed=0)
    assert (c1 == c2).all()
    rows1 = {r["vec_id"]: r["list_id"] for r in a1.collect()}
    rows2 = {r["vec_id"]: r["list_id"] for r in a2.collect()}
    assert rows1 == rows2
    assert len(rows1) == embeddings.count()
    assert set(rows1.values()) <= set(range(8))
    # buckets are data-adaptive: more than one list actually used
    assert len(set(rows1.values())) > 1


def test_ivf_recall_vs_bruteforce(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")
    exact = brute_force_topk(embeddings, q, k=10).collect()
    approx = ivf_topk_deterministic(embeddings, q, k=10, n_centroids=8,
                                    iters=2, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(exact_sets[k0] & approx_sets.get(k0, set())) / 10
               for k0 in exact_sets]
    assert sum(recalls) / len(recalls) >= 0.5   # nprobe=4 of 8 lists
    # approx results are a subset of valid ids with correct ranking order
    for r in approx:
        assert r["rank"] >= 1


def test_ivf_deterministic_results_are_probed_subset(spark, embeddings):
    """Every returned neighbor really lives in one of the query's nprobe
    lists, ranks are contiguous from 1, and two runs agree exactly (the
    property the SQL oracle of sim_ivf_topk relies on)."""
    q = embeddings.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")
    r1 = ivf_topk_deterministic(embeddings, q, k=10, n_centroids=8,
                                iters=2, nprobe=2).collect()
    r2 = ivf_topk_deterministic(embeddings, q, k=10, n_centroids=8,
                                iters=2, nprobe=2).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    by_q = {}
    for r in sorted(r1, key=key):
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != r["query_id"] for r in rows)

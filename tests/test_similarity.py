"""Similarity search: planted vectors with known nearest neighbors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.similarity import (
    brute_force_topk, lsh_bucket, lsh_topk, as_double)


def _vec(angle: float, scale: float = 1.0) -> list[float]:
    """Unit-ish vector in a 4-dim space, direction controlled by angle."""
    return [scale * math.cos(angle), scale * math.sin(angle),
            scale * 0.1, scale * 0.2]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, _vec(0.00)),           # query
        (1, _vec(0.01)),           # nearest (tiny angle)
        (2, _vec(0.30)),
        (3, _vec(1.50)),
        (4, _vec(3.00)),           # nearly opposite
        (5, _vec(0.00, 5.0)),      # same direction, bigger magnitude → cos 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_ranking(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(vectors, q, k=5).collect()
    order = [r["neighbor_id"] for r in out]
    assert order[0] == 5                   # cosine invariant to magnitude
    assert order[1] == 1
    assert order[-1] == 4
    sims = [r["cos_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)
    assert abs(sims[0] - 1.0) < 1e-6


def test_lsh_same_direction_same_bucket(spark, vectors):
    b = vectors.select("vec_id",
                       lsh_bucket(as_double("embedding")).alias("bucket")).collect()
    buckets = {r["vec_id"]: r["bucket"] for r in b}
    assert buckets[0] == buckets[5]        # colinear vectors: identical signs
    assert all(0 <= v < 256 for v in buckets.values())


def test_lsh_topk_finds_colinear(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_topk(vectors, q, k=3, probe_hamming=1).collect()
    assert out and out[0]["neighbor_id"] == 5

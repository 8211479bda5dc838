"""Banded sign-LSH near-dup: planted-pair recall, no false positives after
verification, and the width knob actually prunes candidates.

The scale claim under test (see banded_lsh_candidate_pairs docstring):
random-collision rate is bands * 2^-r, recall for per-plane agreement p is
1 - (1 - p^r)^b — so recall of TRUE near-dups (p ~ 1) survives widths that
prune nearly all random pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.similarity import (
    banded_lsh_candidate_pairs, cosine_near_dups_banded)
from big_data_assignment_2_spark.sources.io import load_table


def test_band_width_grows_with_log_corpus():
    from big_data_assignment_2_spark.operators.similarity import band_width_for
    r1 = band_width_for(2_000)
    r10 = band_width_for(20_000)
    r1e9 = band_width_for(1_000_000_000)
    # 10x corpus -> ~log2(10) ~ 3-4 more planes; monotone, bounded sanely.
    assert 2 <= r1 < r10 < r1e9 <= 40
    assert 3 <= r10 - r1 <= 4


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    """Embeddings plus, for each vector, a planted near-dup (one component
    nudged by 1%): cosine(v, v') ~ 0.9999, per-plane agreement ~ 1."""
    em = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = em.count()
    dup = em.select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * F.lit(1.01)).otherwise(x)
        ).cast("array<float>").alias("embedding"))
    return em.unionByName(dup).cache(), n


def test_planted_recall_high_at_pruning_width(planted):
    vectors, n = planted
    # r=8 prunes ~ (1 - 2^-8)-worth of random pairs per band, yet each
    # planted pair (p ~ 1) should still collide in some band.
    pairs = cosine_near_dups_banded(vectors, threshold=0.99,
                                    rows_per_band=8, bands=4)
    found = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    planted_pairs = {(i, i + n) for i in range(n)}
    recall = len(found & planted_pairs) / n
    assert recall >= 0.95, f"recall {recall} over {n} planted pairs"


def test_no_false_positives_after_verification(planted):
    vectors, n = planted
    # Thresholded output must be a SUBSET of exact all-pairs >= threshold:
    # LSH only prunes candidates; the verification cosine is exact.
    out = cosine_near_dups_banded(vectors, threshold=0.99,
                                  rows_per_band=4, bands=2)
    a = vectors.select(F.col("vec_id").alias("ia"),
                       F.col("embedding").cast("array<double>").alias("va"))
    b = vectors.select(F.col("vec_id").alias("ib"),
                       F.col("embedding").cast("array<double>").alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x * x))
    exact = (a.join(b, F.col("ia") < F.col("ib"))
             .select("ia", "ib",
                     (dot / (nrm(F.col("va")) * nrm(F.col("vb")))).alias("cos"))
             .filter(F.col("cos") >= 0.989))  # slack for 6-dp rounding
    exact_pairs = {(r["ia"], r["ib"]) for r in exact.collect()}
    for r in out.collect():
        assert (r["vec_a"], r["vec_b"]) in exact_pairs


def test_width_prunes_candidates_band_join_dedups(planted):
    vectors, n = planted
    wide = banded_lsh_candidate_pairs(vectors, rows_per_band=8, bands=2)
    narrow = banded_lsh_candidate_pairs(vectors, rows_per_band=2, bands=2)
    n_wide, n_narrow = wide.count(), narrow.count()
    # The width knob: r=8 must admit far fewer candidates than r=2
    # (expected ratio ~ 2^-6 on random pairs).
    assert n_wide < n_narrow / 4
    # Pairs are emitted once even when they collide in several bands.
    assert wide.select("vec_a", "vec_b").distinct().count() == n_wide
    assert wide.filter(F.col("vec_a") >= F.col("vec_b")).count() == 0

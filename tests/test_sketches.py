"""KMV/theta sketch properties: mergeability, exact degeneration,
estimator error bounds, and the set-algebra estimates."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.sketches import (
    KMV_K, KMV_P, kmv_estimate, kmv_intersect_estimate, kmv_merge,
    kmv_sketch)


def _sketch_of(spark, values, k=KMV_K):
    df = spark.createDataFrame([(v,) for v in values], "x bigint") \
        .withColumn("g", F.lit("a"))
    return kmv_sketch(df, "g", "x", k).collect()[0]["kmin"]


def test_exact_when_under_k(spark):
    """theta = p keeps every entry: the estimator IS the distinct count."""
    vals = list(range(50)) * 3  # duplicates must not inflate
    kmin = _sketch_of(spark, vals)
    df = spark.createDataFrame([(kmin,)], "kmin array<bigint>")
    est = df.select(kmv_estimate(F.col("kmin")).alias("e")).collect()[0]["e"]
    assert est == 50.0


def test_merge_equals_whole(spark):
    """k-min of k-mins == global k-min: sketch(A ∪ B) from the two halves'
    sketches must be byte-identical to the sketch built over the union —
    the property that makes per-shard sketches safe to fold at 100 TB."""
    a = list(range(0, 4000, 3))
    b = list(range(1, 6000, 7))
    whole = _sketch_of(spark, a + b)
    ka, kb = _sketch_of(spark, a), _sketch_of(spark, b)
    df = spark.createDataFrame([(ka,), (kb,)], "kmin array<bigint>")
    merged = df.agg(
        kmv_merge(F.collect_list("kmin")).alias("m")).collect()[0]["m"]
    assert merged == whole


def test_estimate_error_bound(spark):
    """KMV relative stderr is ~1/sqrt(k-2) (~8.9% at k=128); 3 sigma."""
    n = 20_000
    kmin = _sketch_of(spark, list(range(n)))
    df = spark.createDataFrame([(kmin,)], "kmin array<bigint>")
    est = df.select(kmv_estimate(F.col("kmin")).alias("e")).collect()[0]["e"]
    assert abs(est - n) / n < 3 / (KMV_K - 2) ** 0.5


def test_intersect_exact_small_sets(spark):
    """Both sketches exact (under k) -> the theta intersection collapses
    to the true overlap count."""
    ka = _sketch_of(spark, list(range(0, 60)))
    kb = _sketch_of(spark, list(range(40, 100)))
    df = spark.createDataFrame([(ka, kb)],
                               "ka array<bigint>, kb array<bigint>")
    est = df.select(
        kmv_intersect_estimate(F.col("ka"), F.col("kb")).alias("e")
    ).collect()[0]["e"]
    assert est == 20.0  # |{40..59}|


def test_intersect_estimate_large_sets(spark):
    """Estimating regime: planted 50% overlap recovered within a loose
    (intersection compounds two sketches' noise) but useful bound."""
    ka = _sketch_of(spark, list(range(0, 20_000)))
    kb = _sketch_of(spark, list(range(10_000, 30_000)))
    df = spark.createDataFrame([(ka, kb)],
                               "ka array<bigint>, kb array<bigint>")
    est = df.select(
        kmv_intersect_estimate(F.col("ka"), F.col("kb")).alias("e")
    ).collect()[0]["e"]
    assert abs(est - 10_000) / 10_000 < 0.5


def test_hash_stays_in_bigint_domain(spark):
    """The LCG multiply must not exceed int64 for any plausible key: the
    largest pre-mod value at the documented ceiling stays under 2^63."""
    ceiling = 8_300_000_000  # documented input bound in sketches.py
    assert ceiling * 1_103_515_245 + 12_345 < 2 ** 63
    kmin = _sketch_of(spark, [ceiling - 1, 0, 1])
    assert all(0 <= h < KMV_P for h in kmin)

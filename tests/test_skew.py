"""Salted join / two-phase agg must be result-identical to the plain ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.skew import salted_join, two_phase_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share one hot key.
    fact = spark.createDataFrame(
        [(1 if i % 10 else i % 50, i, float(i)) for i in range(5000)],
        "k long, id long, v double")
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(50)],
                                "k long, label string")
    return fact, dim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_identical(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", salt=8)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_left_join_identical(spark, skewed):
    fact, dim = skewed
    missing = fact.withColumn("k", F.col("k") + 1000)  # no dim match
    plain = missing.join(dim, "k", "left")
    salted = salted_join(missing, dim, "k", salt=8, how="left")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_two_phase_agg_exact(skewed):
    fact, _ = skewed
    plain = fact.groupBy("k").agg(
        F.sum("v").alias("sv"), F.count("id").alias("n"),
        F.min("v").alias("mn"), F.max("v").alias("mx"))
    salted = two_phase_agg(fact, "k", {
        "sv": ("v", "sum"), "n": ("id", "count"),
        "mn": ("v", "min"), "mx": ("v", "max")}, salt=8)
    a = {r["k"]: (round(r["sv"], 6), r["n"], r["mn"], r["mx"])
         for r in plain.collect()}
    b = {r["k"]: (round(r["sv"], 6), r["n"], r["mn"], r["mx"])
         for r in salted.collect()}
    assert a == b

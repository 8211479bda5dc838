"""Regression test for the local checker's dtype-parity gate (VERDICT r15 #2).

The driver fetches oracle results through pandas ``fetchdf()``, where
DuckDB's HUGEINT (the type of ``sum(BIGINT)``) materializes as float64
and flips a type-sensitive value hash against Spark's bigint.
``tools/check.py`` used to coerce values before comparing, so the r15
``stream_exactly_once_sink`` oracle (the one integer-sum site missing an
outer CAST) passed locally while the driver flagged it.  These tests pin
the checker to driver behavior: the un-cast shape must be flagged, the
cast shape must be silent, and NULL-bearing int columns (float64 in
pandas regardless of declared type — tolerated by the driver) must not
false-positive.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, ".")

from tools.check import dtype_parity_problems  # noqa: E402


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _spark_df(spark):
    return spark.sql(
        "SELECT 'a' AS k, CAST(10195100 AS BIGINT) AS total_cents")


def test_uncast_hugeint_sum_is_flagged(spark, con):
    # sum(BIGINT) -> HUGEINT -> pandas float64: the exact r15 red-row shape.
    problems = dtype_parity_problems(
        _spark_df(spark), con,
        "SELECT 'a' AS k, sum(CAST(10195100 AS BIGINT)) AS total_cents")
    assert len(problems) == 1
    assert "total_cents" in problems[0]
    assert "CAST" in problems[0]


def test_cast_sum_is_silent(spark, con):
    problems = dtype_parity_problems(
        _spark_df(spark), con,
        "SELECT 'a' AS k, CAST(sum(CAST(10195100 AS BIGINT)) AS BIGINT)"
        " AS total_cents")
    assert problems == []


def test_decimal_projection_is_flagged(spark, con):
    problems = dtype_parity_problems(
        _spark_df(spark), con,
        "SELECT 'a' AS k, CAST(10195100 AS DECIMAL(18,2)) AS total_cents")
    assert len(problems) == 1


def test_nullable_int_with_nulls_not_flagged(spark, con):
    # Outer-join style NULLs force float64 in pandas for ANY declared int
    # type; the driver tolerates those rows (stream_interval_join_outer_live
    # is green), so the checker must not false-positive on them.
    sdf = spark.sql(
        "SELECT * FROM VALUES ('a', CAST(1 AS BIGINT)), ('b', CAST(NULL AS BIGINT))"
        " AS t(k, total_cents)")
    problems = dtype_parity_problems(
        sdf, con,
        "SELECT 'a' AS k, CAST(1 AS BIGINT) AS total_cents "
        "UNION ALL SELECT 'b', NULL")
    assert problems == []


def test_float_column_is_silent(spark, con):
    sdf = spark.sql("SELECT 'a' AS k, CAST(1.5 AS DOUBLE) AS score")
    problems = dtype_parity_problems(
        sdf, con, "SELECT 'a' AS k, 1.5 AS score")
    assert problems == []

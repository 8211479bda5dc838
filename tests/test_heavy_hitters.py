"""Two-pass Misra-Gries exact heavy hitters (operators/sketches.py r9):
candidate losslessness under adversarial layouts, bounded candidate
volume, and strict-threshold semantics."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.sketches import (
    heavy_hitters_exact, misra_gries_candidates)


def _df(spark, rows, n_parts):
    return spark.createDataFrame(
        [(r,) for r in rows], "key string").repartition(n_parts)


def _brute(rows, k):
    n = len(rows)
    return {key: c for key, c in Counter(rows).items() if c * (k + 1) > n}


def test_exact_under_noise_decrements(spark):
    """3 heavy keys drowned in 5000 unique noise keys: the noise forces
    constant MG decrements, yet the exact result must equal brute force."""
    rows = (["hot"] * 3000 + ["warm"] * 2000 + ["mild"] * 1200
            + [f"noise{i}" for i in range(5000)])
    k = 8
    got = {r["key"]: r["freq"]
           for r in heavy_hitters_exact(_df(spark, rows, 8), "key", k)
           .collect()}
    assert got == _brute(rows, k)
    assert "hot" in got and "noise0" not in got


def test_spread_thin_heavy_key_is_caught(spark):
    """Adversarial layout: the heavy key is just above threshold and
    uniformly spread over many partitions, so no partition sees it as
    locally dominant — the pigeonhole guarantee must still catch it."""
    k = 4
    # n = 2500; threshold n/(k+1) = 500; heavy has 520.
    rows = ["heavy"] * 520 + [f"u{i}" for i in range(1980)]
    df = _df(spark, rows, 16)
    got = {r["key"]: r["freq"]
           for r in heavy_hitters_exact(df, "key", k).collect()}
    assert got == {"heavy": 520}


def test_strict_threshold_boundary(spark):
    """freq == n/(k+1) exactly must be EXCLUDED (strict >): n = 100,
    k = 4 -> threshold 20; one key at 20, one at 21."""
    rows = ["at"] * 20 + ["above"] * 21 + [f"u{i}" for i in range(59)]
    assert len(rows) == 100
    got = {r["key"]: r["freq"]
           for r in heavy_hitters_exact(_df(spark, rows, 4), "key", 4)
           .collect()}
    assert got == {"above": 21}


def test_candidate_volume_bounded(spark):
    """Pass 1 ships at most k candidates per partition regardless of the
    distinct-key count."""
    k, n_parts = 6, 8
    rows = [f"u{i}" for i in range(20000)]
    cand = misra_gries_candidates(_df(spark, rows, n_parts), "key", k)
    assert cand.count() <= k * n_parts


def test_matches_plain_groupby(spark, sf_dir):
    """On the harness corpus the two-pass plan must equal the one-shot
    groupBy/HAVING plan token for token."""
    from big_data_assignment_2_spark.functions.text import tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokenize("text")).alias("term")).persist()
    k = 31
    got = {(r["term"], r["freq"])
           for r in heavy_hitters_exact(toks, "term", k).collect()}
    n = toks.count()
    want = {(r["term"], r["freq"]) for r in
            toks.groupBy("term").agg(F.count("*").alias("freq"))
            .filter(F.col("freq") * (k + 1) > n).collect()}
    assert got == want and want
    toks.unpersist()


def test_pass2_joins_broadcast(spark):
    """The candidate set must reach pass 2 as a broadcast (the whole
    point: no shuffle of the full stream against candidates)."""
    rows = ["a"] * 50 + [f"u{i}" for i in range(50)]
    plan = heavy_hitters_exact(_df(spark, rows, 4), "key", 4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

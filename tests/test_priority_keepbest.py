"""Priority sampling (Duffield et al.) invariants and the keep-best
cluster canonicalization policy."""

from __future__ import annotations

import duckdb

from big_data_assignment_2_spark.plans.dedup_queries import q_keep_best
from big_data_assignment_2_spark.plans.text_queries import (
    PRIORITY_SAMPLE_K, q_priority_sample)


def test_priority_sample_size_and_determinism(spark, sf_dir):
    rows1 = q_priority_sample(spark, sf_dir).collect()
    rows2 = q_priority_sample(spark, sf_dir).collect()
    assert len(rows1) == min(PRIORITY_SAMPLE_K, 500)
    assert sorted(r["doc_id"] for r in rows1) \
        == sorted(r["doc_id"] for r in rows2)


def test_priority_sample_ht_estimate_properties(spark, sf_dir):
    """est_weight = max(w, tau) >= w for every sampled item, and the
    Horvitz-Thompson subset-sum estimate recovers the true total weight
    within priority sampling's expected error at k=200/n=500."""
    rows = q_priority_sample(spark, sf_dir).collect()
    assert all(r["est_weight"] >= r["w"] for r in rows)
    total = duckdb.sql(
        "SELECT sum(length(text) + 1) FROM "
        f"'{sf_dir}/documents.parquet'").fetchone()[0]
    est_total = sum(r["est_weight"] for r in rows)
    assert abs(est_total - total) / total < 0.25


def test_priority_sample_heavy_items_always_kept(spark, sf_dir):
    """Core guarantee: any item whose weight exceeds the threshold tau is
    sampled with probability 1 — no heavy doc can be dropped."""
    rows = q_priority_sample(spark, sf_dir).collect()
    sampled = {r["doc_id"] for r in rows}
    # tau is recoverable: any sampled row with est_weight > w has
    # est_weight == tau.
    taus = {r["est_weight"] for r in rows if r["est_weight"] > r["w"]}
    assert len(taus) == 1
    tau = taus.pop()
    heavy = duckdb.sql(
        "SELECT CAST(doc_id AS VARCHAR) FROM "
        f"'{sf_dir}/documents.parquet' "
        f"WHERE length(text) + 1 > {tau}").fetchall()
    assert {d for (d,) in heavy} <= sampled


def _write_docs(spark, rows, path):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
              " n_chars int") \
        .write.parquet(f"{path}/documents.parquet")


def test_keep_best_prefers_longest(spark, tmp_path):
    """Two near-identical docs (one longer) plus an unrelated singleton:
    the longer near-dup survives, the singleton keeps itself."""
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the observer takes careful notes about every motion") * 3
    rows = [
        (1, base, "en", "a", len(base)),
        # ONE novel token keeps token-set Jaccard at 18/19 > 0.9.
        (2, base + " appended", "en", "a", 0),
        (3, "completely different text about distributed query engines "
            "and columnar storage formats running on large clusters",
         "en", "b", 0),
    ]
    d = str(tmp_path / "sf")
    _write_docs(spark, rows, d)
    out = {r["cluster_rep"]: r for r in q_keep_best(spark, d).collect()}
    assert out["1"]["best_doc"] == "2"          # longer member wins
    assert out["1"]["n_members"] == 2
    assert out["3"]["best_doc"] == "3"          # singleton passthrough
    assert out["3"]["n_members"] == 1


def test_clusters_survive_no_dup_corpus(spark, tmp_path):
    """Regression: zero near-dup edges used to crash the driver-side
    union-find on an empty pandas frame (CANNOT_INFER_EMPTY_SCHEMA);
    every doc must come back as its own singleton cluster."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "a", 0),
        (2, "one two three four five six seven eight", "en", "a", 0),
    ]
    d = str(tmp_path / "sf")
    _write_docs(spark, rows, d)
    out = {r["cluster_rep"]: r["n_members"]
           for r in q_keep_best(spark, d).collect()}
    assert out == {"1": 1, "2": 1}


def test_keep_best_one_row_per_cluster(spark, sf_dir):
    from big_data_assignment_2_spark.operators.dedup import near_dup_clusters
    from big_data_assignment_2_spark.plans.dedup_queries import (
        JACCARD_THRESHOLD)
    from big_data_assignment_2_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_clusters = (near_dup_clusters(docs, threshold=JACCARD_THRESHOLD)
                  .select("cluster_rep").distinct().count())
    out = q_keep_best(spark, sf_dir).collect()
    assert len(out) == n_clusters
    assert sum(r["n_members"] for r in out) == docs.count()

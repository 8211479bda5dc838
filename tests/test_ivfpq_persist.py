"""Persisted IVF+PQ index: write-once → probe equals the in-flight query
bit-for-bit, and the probe's code scan is partition-pruned to the probed
lists (the production ANN serving contract — train once, probe forever)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.persist import (
    ivfpq_probe_persisted, write_ivfpq)
from big_data_assignment_2_spark.operators.similarity import ivfpq_topk
from big_data_assignment_2_spark.sources.io import load_table

PARAMS = dict(n_centroids=4, coarse_iters=1, m=4, ks=8, pq_iters=1)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries_df(embeddings):
    return embeddings.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")


@pytest.fixture(scope="module")
def index_dir(embeddings):
    with tempfile.TemporaryDirectory() as d:
        base = os.path.join(d, "ivfpq")
        write_ivfpq(embeddings, base, **PARAMS)
        yield base


def _key(r):
    return (r["query_id"], r["rank"])


def test_probe_equals_inflight(spark, embeddings, queries_df, index_dir):
    """Identical deterministic training + exact parquet double round-trip
    + the same serving plan ⇒ the persisted probe IS the in-flight query."""
    inflight = ivfpq_topk(embeddings, queries_df, k=10, nprobe=2, **PARAMS)
    probe = ivfpq_probe_persisted(spark, index_dir, queries_df, k=10, nprobe=2)
    a = sorted(inflight.collect(), key=_key)
    b = sorted(probe.collect(), key=_key)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["query_id"] == rb["query_id"]
        assert ra["neighbor_id"] == rb["neighbor_id"]
        assert ra["adc_dist"] == rb["adc_dist"]
        assert ra["rank"] == rb["rank"]


def test_probe_scan_is_partition_pruned(spark, queries_df, index_dir):
    """The code scan reads only the probed lists' partition directories:
    the pushed partition filter appears in the physical plan, and the
    isin list is a strict subset of all lists when nprobe < n_centroids."""
    # ONE query at nprobe=1: the probed-list set is a single list, so the
    # strict-subset and result-containment assertions below have teeth
    # (five spread-out queries at nprobe=1 probe every list — no pruning
    # to observe).
    one_query = queries_df.filter(F.col("query_id") == 0)
    probe = ivfpq_probe_persisted(spark, index_dir, one_query,
                                  k=10, nprobe=1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "list_id" in plan
    all_lists = {r["list_id"] for r in
                 spark.read.parquet(f"{index_dir}/codes")
                 .select("list_id").distinct().collect()}
    assert len(all_lists) > 1  # data-adaptive: more than one list in use
    # Recompute the nprobe=1 list selection independently (argmin squared
    # distance to the stored coarse centroids) and assert the probe's
    # RESULTS honor it — a pruning regression that still mentions the
    # filter in the plan string can no longer pass.
    cent = {r["cid"]: list(r["centroid"]) for r in
            spark.read.parquet(f"{index_dir}/coarse").collect()}
    probed_lists = set()
    for q in one_query.collect():
        v = list(q["embedding"])
        probed_lists.add(min(
            cent, key=lambda c: sum((a - b) ** 2
                                    for a, b in zip(v, cent[c]))))
    assert probed_lists < all_lists      # strict subset: pruning possible
    allowed_ids = {r["neighbor_id"] for r in
                   spark.read.parquet(f"{index_dir}/codes")
                   .filter(F.col("list_id").isin(sorted(probed_lists)))
                   .select("neighbor_id").collect()}
    got_ids = {r["neighbor_id"] for r in probe.collect()}
    assert got_ids and got_ids <= allowed_ids


def test_index_layout(spark, index_dir):
    """The stored index holds exactly what serving needs — codebooks and
    m-byte codes — never the raw vectors (the PQ compression contract)."""
    codes = spark.read.parquet(f"{index_dir}/codes")
    assert set(codes.columns) == {"neighbor_id", "list_id",
                                  "c0", "c1", "c2", "c3"}
    coarse = spark.read.parquet(f"{index_dir}/coarse")
    assert coarse.count() == PARAMS["n_centroids"]
    books = spark.read.parquet(f"{index_dir}/books")
    assert books.count() == PARAMS["m"] * PARAMS["ks"]
    sub = 64 // PARAMS["m"]
    row = books.first()
    assert len(row["centroid"]) == sub


# --- incremental append (FAISS add() path, r10) ----------------------------

def test_append_equals_inflight_encode(spark, embeddings):
    """Appended code rows must equal in-flight encoding of the new
    vectors against the base-trained codebooks, and probes over the
    grown index must equal scoring the union of base+new codes."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.persist import (
        _read_ivfpq_codebooks, ivfpq_append)
    from big_data_assignment_2_spark.operators.similarity import (
        ivfpq_encode, ivfpq_score, ivfpq_train)

    nid = F.col("vec_id").cast("bigint")
    base = embeddings.filter((nid % 10) != 9)
    new = embeddings.filter((nid % 10) == 9)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ivfpq")
        write_ivfpq(base, path, **PARAMS)
        ivfpq_append(new, path)
        cent, books = _read_ivfpq_codebooks(spark, path)
        stored = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/codes")
            .select("neighbor_id", "list_id", "c0", "c1", "c2", "c3")
            .collect())
        # in-flight twin: train on base, encode everyone with those books
        cent2, books2, codes_base, cached = ivfpq_train(base, **PARAMS)
        assert cent == cent2 and books == books2   # parquet exactness
        inflight = sorted(
            tuple(r) for r in
            codes_base.unionByName(ivfpq_encode(new, cent2, books2))
            .select("neighbor_id", "list_id", "c0", "c1", "c2", "c3")
            .collect())
        for df in cached:
            df.unpersist()
        assert stored == inflight
        assert len(stored) == embeddings.count()


def test_append_probe_sees_new_vectors(spark, embeddings, queries_df):
    """A probe after append can return appended neighbors (the grown
    index genuinely serves old + new): force it by appending a clone of
    a query vector — it must surface at rank 1 by ADC distance 0-ish."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_append, ivfpq_probe_persisted)

    nid = F.col("vec_id").cast("bigint")
    base = embeddings.filter((nid % 10) != 9)
    clone_id = 1_000_000_009
    clone = (embeddings.filter(F.col("vec_id") == 0)
             .select(F.lit(clone_id).cast("long").alias("vec_id"),
                     "embedding"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ivfpq")
        write_ivfpq(base, path, **PARAMS)
        ivfpq_append(clone, path)
        out = ivfpq_probe_persisted(spark, path, queries_df, k=10, nprobe=2)
        top_q0 = [r for r in out.collect()
                  if r["query_id"] == 0 and r["rank"] == 1]
        assert top_q0 and top_q0[0]["neighbor_id"] == clone_id


def test_delete_masks_and_compaction_removes(spark, embeddings, queries_df):
    """Tombstone deletes (r11): deleted vectors must vanish from served
    neighbors immediately (read-time masking), the top-k must refill
    from survivors, compaction must remove the code rows PHYSICALLY and
    drop the log, and the probe must be identical before/after
    compaction."""
    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_compact, ivfpq_delete)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ivfpq")
        write_ivfpq(embeddings, path, **PARAMS)
        before = ivfpq_probe_persisted(spark, path, queries_df,
                                       k=5, nprobe=2).collect()
        # tombstone every currently-served neighbor of query 0
        victims = sorted({int(r["neighbor_id"]) for r in before
                          if r["query_id"] == 0})
        assert victims
        ivfpq_delete(spark, path, victims)
        masked = ivfpq_probe_persisted(spark, path, queries_df,
                                       k=5, nprobe=2).collect()
        served = {int(r["neighbor_id"]) for r in masked}
        assert served.isdisjoint(victims)
        assert sum(1 for r in masked if r["query_id"] == 0) == 5  # refilled
        ivfpq_compact(spark, path)
        after = ivfpq_probe_persisted(spark, path, queries_df,
                                      k=5, nprobe=2).collect()
        assert sorted(map(tuple, after)) == sorted(map(tuple, masked))
        left = {int(r["neighbor_id"]) for r in
                spark.read.parquet(f"{path}/codes")
                .select("neighbor_id").collect()}
        assert left.isdisjoint(victims)
        assert not os.path.exists(f"{path}/tombstones")
        # deleting is idempotent-safe on ids that no longer exist
        ivfpq_delete(spark, path, victims[:1])
        again = ivfpq_probe_persisted(spark, path, queries_df,
                                      k=5, nprobe=2).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, after))


def test_filtered_probe_keeps_partition_pruning(spark, embeddings,
                                                queries_df, index_dir):
    """The `allowed` pre-filter semi-join must not defeat the probed-list
    partition pruning: the plan still carries the list_id PartitionFilters
    on the code scan."""
    from pyspark.sql import functions as F

    allowed = (queries_df.select("query_id").crossJoin(
        embeddings.select(F.col("vec_id").alias("neighbor_id")))
        .filter(F.col("neighbor_id") % 2 == 0))
    probe = ivfpq_probe_persisted(spark, index_dir, queries_df, k=5,
                                  nprobe=1, allowed=allowed)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    rows = probe.collect()
    assert rows
    assert all(int(r["neighbor_id"]) % 2 == 0 for r in rows)


def test_retrain_equals_fresh_build(spark, embeddings, queries_df):
    """persist.ivfpq_retrain (r15): after frozen-codebook appends, a
    retrain over the live corpus must be BIT-IDENTICAL to a fresh
    full-corpus build — write_ivfpq is deterministic in its input
    relation, which is what lets sim_ivfpq_retrain_probe share the
    fresh-build first-principles oracle."""
    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_append, ivfpq_retrain)

    nid = F.col("vec_id").cast("bigint")
    with tempfile.TemporaryDirectory() as d:
        grown, fresh = (os.path.join(d, p) for p in ("grown", "fresh"))
        write_ivfpq(embeddings.filter((nid % 10) != 9), grown, **PARAMS)
        ivfpq_append(embeddings.filter((nid % 10) == 9), grown)
        ivfpq_retrain(embeddings, grown, **PARAMS)
        write_ivfpq(embeddings, fresh, **PARAMS)
        a = sorted(map(tuple, ivfpq_probe_persisted(
            spark, grown, queries_df, k=10, nprobe=2).collect()))
        b = sorted(map(tuple, ivfpq_probe_persisted(
            spark, fresh, queries_df, k=10, nprobe=2).collect()))
        assert a == b and a
        # the scratch training dir is swept after the swap
        assert not [p for p in os.listdir(grown) if p.startswith("retrain_")]


def test_retrain_excludes_tombstones_and_drops_log(spark, embeddings,
                                                   queries_df):
    """Retrain subsumes compaction: tombstoned vectors neither train nor
    re-enter the rebuilt index (== a fresh build on the survivor set),
    and the tombstone log is dropped."""
    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_delete, ivfpq_retrain)

    victims = [7, 11, 13]
    with tempfile.TemporaryDirectory() as d:
        path, fresh = (os.path.join(d, p) for p in ("ix", "fresh"))
        write_ivfpq(embeddings, path, **PARAMS)
        ivfpq_delete(spark, path, victims)
        ivfpq_retrain(embeddings, path, **PARAMS)
        assert not os.path.exists(f"{path}/tombstones")
        left = {int(r["neighbor_id"]) for r in
                spark.read.parquet(f"{path}/codes")
                .select("neighbor_id").collect()}
        assert left.isdisjoint(victims)
        write_ivfpq(embeddings.filter(~F.col("vec_id").cast("bigint")
                                      .isin(victims)), fresh, **PARAMS)
        a = sorted(map(tuple, ivfpq_probe_persisted(
            spark, path, queries_df, k=10, nprobe=2).collect()))
        b = sorted(map(tuple, ivfpq_probe_persisted(
            spark, fresh, queries_df, k=10, nprobe=2).collect()))
        assert a == b and a


def test_list_stats_counts_live_rows(spark, embeddings):
    """ivfpq_list_stats: per-list counts sum to the live corpus and drop
    tombstoned rows — the retrain-trigger relation is the serving view."""
    from big_data_assignment_2_spark.operators.persist import (
        ivfpq_delete, ivfpq_list_stats)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ix")
        write_ivfpq(embeddings, path, **PARAMS)
        n = embeddings.count()
        stats = ivfpq_list_stats(spark, path)
        assert stats.agg(F.sum("n_vectors")).first()[0] == n
        ivfpq_delete(spark, path, [0, 1])
        assert (ivfpq_list_stats(spark, path)
                .agg(F.sum("n_vectors")).first()[0] == n - 2)

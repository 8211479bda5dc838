"""Physical-layout tests: partition pruning on term buckets, shuffle-free
bucketed joins — asserted from the actual physical plans."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.index import build_index
from big_data_assignment_2_spark.operators.persist import (
    _py_bucket, probe_postings, read_index, write_bucketed, write_index)
from big_data_assignment_2_spark.operators.search import bm25_topk
from big_data_assignment_2_spark.sources.io import load_table


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("index"))
    ix = build_index(load_table(spark, sf_dir, "documents"))
    write_index(ix, path, term_buckets=8)
    return path


def test_roundtrip_and_search(spark, sf_dir, index_path):
    ix = read_index(spark, index_path)
    live = build_index(load_table(spark, sf_dir, "documents"))
    q = "vector query stream fast join"
    got = bm25_topk(spark, q, ix["term_document"], ix["document_frequency"],
                    ix["documents_info"]).collect()
    want = bm25_topk(spark, q, live["term_document"],
                     live["document_frequency"], live["documents_info"]).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_term_bucket_partition_pruning(spark, index_path):
    probe = probe_postings(spark, f"{index_path}/term_document",
                           ["vector", "query"], n_buckets=8)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got_terms = {r["term"] for r in probe.select("term").distinct().collect()}
    assert got_terms == {"vector", "query"}
    # pruning must not lose rows vs a full scan
    full = spark.read.parquet(f"{index_path}/term_document") \
        .filter(F.col("term").isin(["vector", "query"])).count()
    assert probe.count() == full


@pytest.mark.parametrize("n_buckets", [2, 4])
def test_probe_prunes_directories_and_rowgroups(spark, sf_dir,
                                                tmp_path_factory, n_buckets):
    """100×-pruning proof at two bucket counts: the probe plan must carry a
    term_bucket PartitionFilter (directory pruning) AND a pushed term
    filter, and the sorted-by-term layout must produce rowgroup min/max
    stats that actually skip non-matching rowgroups (counted from the
    parquet footers of the matching bucket directories)."""
    import glob

    import pyarrow.parquet as pq

    from big_data_assignment_2_spark.operators.persist import (
        partition_postings_by_term_bucket)

    path = str(tmp_path_factory.mktemp(f"ixrg{n_buckets}"))
    ix = build_index(load_table(spark, sf_dir, "documents"))
    partition_postings_by_term_bucket(ix["term_document"], path,
                                      n_buckets, rowgroup_bytes=4096)
    terms = ["vector", "query"]
    probe = probe_postings(spark, path, terms, n_buckets=n_buckets)
    plan = probe._jdf.queryExecution().executedPlan().toString()

    # 1. directory pruning: partition filter on term_bucket in the scan
    assert "PartitionFilters" in plan
    assert "term_bucket" in plan.split("PartitionFilters", 1)[1][:300]
    # 2. rowgroup pruning precondition: term IN-filter pushed to parquet
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "term" in pushed and "In" in pushed

    # 3. rowgroup stats skip count: within the matching bucket dirs, some
    # rowgroups must be skippable for the probe terms (sorted layout ⇒
    # disjoint min/max ranges), and at least one must match.
    want_buckets = {_py_bucket(t, n_buckets) for t in terms}
    total = matching = 0
    for dirname in glob.glob(f"{path}/term_bucket=*"):
        if int(dirname.rsplit("=", 1)[1]) not in want_buckets:
            continue
        for fname in glob.glob(f"{dirname}/*.parquet"):
            md = pq.ParquetFile(fname).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ti = names.index("term")
            for r in range(md.num_row_groups):
                st = md.row_group(r).column(ti).statistics
                total += 1
                if any(st.min <= t <= st.max for t in terms):
                    matching += 1
    assert total >= 3, f"layout produced only {total} rowgroups"
    assert 1 <= matching < total, \
        f"no skippable rowgroups (matching={matching}, total={total})"

    # 4. pruning loses no rows vs a full scan
    full = spark.read.parquet(path) \
        .filter(F.col("term").isin(terms)).count()
    assert probe.count() == full


def test_py_bucket_matches_spark(spark, index_path):
    df = spark.read.parquet(f"{index_path}/term_document") \
        .select("term", "term_bucket").distinct()
    for r in df.collect():
        assert _py_bucket(r["term"], 8) == int(r["term_bucket"])


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, "o_orderkey",
                   path=f"{wh}/orders_b")
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8, "l_orderkey",
                   path=f"{wh}/lineitem_b")
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o, li.l_orderkey == o.o_orderkey) \
            .groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join itself must not introduce exchanges on either side
        pre_agg = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_reference_format_export(spark, sf_dir, tmp_path_factory):
    from big_data_assignment_2_spark.operators.persist import export_reference_format
    from big_data_assignment_2_spark.operators.index import build_index

    path = str(tmp_path_factory.mktemp("refmt"))
    ix = build_index(load_table(spark, sf_dir, "documents"))
    export_reference_format(ix, path)
    step1 = spark.read.option("sep", "\t").csv(
        f"{path}/step1", schema="term string, doc_id string, tf string, positions string")
    row = step1.filter(F.col("tf").cast("int") > 1).first()
    # F6 rendering: comma-joined ascending positions, len == tf
    assert row is not None
    parts = row["positions"].split(",")
    assert len(parts) == int(row["tf"])
    assert [int(x) for x in parts] == sorted(int(x) for x in parts)
    assert step1.count() == ix["term_document"].count()


def test_bm25_probe_persisted_matches_inflight(spark, sf_dir, index_path):
    from big_data_assignment_2_spark.operators.persist import bm25_probe_persisted
    from big_data_assignment_2_spark.operators.search import search_documents

    q = "vector query stream fast join"
    got = bm25_probe_persisted(spark, index_path, q, n_buckets=8).collect()
    want = search_documents(
        spark, load_table(spark, sf_dir, "documents"), q).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ivf_persist_prunes(spark, sf_dir, tmp_path_factory):
    from big_data_assignment_2_spark.operators.persist import (
        probe_ivf_lists, write_ivf)
    from big_data_assignment_2_spark.operators.similarity import ivf_build

    path = str(tmp_path_factory.mktemp("ivf"))
    em = load_table(spark, sf_dir, "embeddings")
    assigned, _ = ivf_build(em, n_centroids=8, seed=0)
    write_ivf(assigned, path)
    probe = probe_ivf_lists(spark, path, [0, 1])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    full = {r["vec_id"] for r in assigned.filter("list_id IN (0, 1)").collect()}
    assert {r["vec_id"] for r in probe.collect()} == full


def test_append_to_index_equals_full_build(spark, sf_dir, tmp_path_factory):
    """Incremental index maintenance (r11): building on part of the
    corpus then appending the rest IN TWO BATCHES must probe identically
    to a fresh full-corpus build — postings partition-append, df-log
    summation, and stats append reconstruct the exact index state."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.index import build_index
    from big_data_assignment_2_spark.operators.persist import (
        append_to_index, bm25_probe_persisted, write_index)

    docs = load_table(spark, sf_dir, "documents")
    nid = F.col("doc_id").cast("bigint")
    inc = str(tmp_path_factory.mktemp("ix_inc"))
    full = str(tmp_path_factory.mktemp("ix_full"))
    write_index(build_index(docs.filter((nid % 3) == 0)), inc)
    append_to_index(docs.filter((nid % 3) == 1), inc)
    append_to_index(docs.filter((nid % 3) == 2), inc)
    write_index(build_index(docs), full)
    q = "vector query stream fast join"
    got = [tuple(r) for r in bm25_probe_persisted(spark, inc, q).collect()]
    want = [tuple(r) for r in bm25_probe_persisted(spark, full, q).collect()]
    assert got == want and len(got) == 10
    # the df log really is per-batch: more rows than distinct terms,
    # and the probe's sum reconstructs the full-build df per term
    df_log = spark.read.parquet(f"{inc}/document_frequency")
    assert df_log.count() > df_log.select("term").distinct().count()
    summed = {r["term"]: r["s"] for r in df_log.groupBy("term")
              .agg(F.sum("df").alias("s")).collect()}
    fresh = {r["term"]: r["df"] for r in spark.read
             .parquet(f"{full}/document_frequency").collect()}
    assert summed == fresh


def test_append_to_delta_store_encodes_batch_to_match(spark, sf_dir,
                                                      tmp_path_factory):
    """Appending into a gap-encoded store (r16 advice): the batch must
    adopt the live store's positions_delta layout — a plain-positions
    append would silently corrupt positional consumers.  The grown
    store's decoded logical view must equal a fresh full delta build's."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.index import build_index
    from big_data_assignment_2_spark.operators.persist import (
        append_to_index, read_index, write_index)

    docs = load_table(spark, sf_dir, "documents")
    nid = F.col("doc_id").cast("bigint")
    inc = str(tmp_path_factory.mktemp("ixd_inc"))
    full = str(tmp_path_factory.mktemp("ixd_full"))
    write_index(build_index(docs.filter((nid % 2) == 0)), inc,
                delta_positions=True)
    append_to_index(docs.filter((nid % 2) == 1), inc)
    write_index(build_index(docs), full, delta_positions=True)
    # on disk: one uniform layout, no mixed columns
    raw = spark.read.parquet(f"{inc}/term_document")
    assert "positions_delta" in raw.columns and \
        "positions" not in raw.columns
    a = sorted(((r["term"], r["doc_id"], list(r["positions"]))
                for r in read_index(spark, inc)["term_document"].collect()))
    b = sorted(((r["term"], r["doc_id"], list(r["positions"]))
                for r in read_index(spark, full)["term_document"].collect()))
    assert a == b and a


def test_delta_positions_roundtrip_probe_equality_and_size(
        spark, sf_dir, index_path, tmp_path_factory):
    """Gap-encoded postings (r15): write_index(delta_positions=True) must
    (a) round-trip to the identical logical positions via
    read_index(delta_positions=True), (b) serve positional consumers
    (phrase_match) and the BM25 probe identically to the plain store,
    and (c) shrink the on-disk postings footprint (smaller stored ints →
    fewer parquet bit-packing bits)."""
    from big_data_assignment_2_spark.operators.persist import (
        bm25_probe_persisted)
    from big_data_assignment_2_spark.operators.search import phrase_match
    from big_data_assignment_2_spark.plans.search_queries import (
        FLAGSHIP_QUERY)

    delta_path = str(tmp_path_factory.mktemp("index_delta"))
    ix = build_index(load_table(spark, sf_dir, "documents"))
    write_index(ix, delta_path, term_buckets=8, delta_positions=True)

    plain = read_index(spark, index_path)["term_document"]
    decoded = read_index(spark, delta_path,
                         delta_positions=True)["term_document"]
    a = sorted(((r["term"], r["doc_id"], r["tf"], list(r["positions"]))
                for r in plain.collect()))
    b = sorted(((r["term"], r["doc_id"], r["tf"], list(r["positions"]))
                for r in decoded.collect()))
    assert a == b and a

    # the stored form really is gaps, under the self-describing column
    # name (r16 advice: a delta store must be distinguishable on disk)
    raw = spark.read.parquet(delta_path + "/term_document")
    assert "positions_delta" in raw.columns
    assert "positions" not in raw.columns
    multi = raw.filter(F.size("positions_delta") >= 2).limit(5).collect()
    for r in multi:
        dec = [r["positions_delta"][0]]
        for g in r["positions_delta"][1:]:
            assert g >= 0
            dec.append(dec[-1] + g)
        assert dec == sorted(dec)

    # flag-free read of a delta store auto-decodes (self-describing):
    # identical logical view, no flag required
    auto = read_index(spark, delta_path)["term_document"]
    c = sorted(((r["term"], r["doc_id"], r["tf"], list(r["positions"]))
                for r in auto.collect()))
    assert c == a

    # asserting delta on a PLAIN store fails fast instead of
    # double-decoding
    import pytest as _pytest
    with _pytest.raises(ValueError, match="refusing to guess"):
        read_index(spark, index_path, delta_positions=True)

    # positional consumer equality
    pm_plain = sorted(map(tuple, phrase_match(
        plain, ["vector", "query"]).collect()))
    pm_delta = sorted(map(tuple, phrase_match(
        decoded, ["vector", "query"]).collect()))
    assert pm_plain == pm_delta

    # scoring path equality (positions are column-pruned, no flag needed)
    probe_plain = sorted(map(tuple, bm25_probe_persisted(
        spark, index_path, FLAGSHIP_QUERY, k=10, n_buckets=8).collect()))
    probe_delta = sorted(map(tuple, bm25_probe_persisted(
        spark, delta_path, FLAGSHIP_QUERY, k=10, n_buckets=8).collect()))
    assert probe_plain == probe_delta and probe_plain

    def du(p):
        return sum(os.path.getsize(os.path.join(d, f))
                   for d, _, fs in os.walk(os.path.join(p, "term_document"))
                   for f in fs)
    plain_b, delta_b = du(index_path), du(delta_path)
    assert delta_b < plain_b, (delta_b, plain_b)


def test_sq8_persisted_probe_equals_inflight_and_shrinks(spark, sf_dir,
                                                         tmp_path_factory):
    """Persisted SQ8 tier (r15): the int8 store probe must equal the
    in-flight sq8_topk BIT-FOR-BIT (codes are whole doubles <= 127 —
    tinyint cast and read-back multiply are both exact), and the store
    must be materially smaller than the float64 parquet."""
    from big_data_assignment_2_spark.operators.persist import (
        sq8_probe_persisted, write_sq8)
    from big_data_assignment_2_spark.operators.similarity import sq8_topk

    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")
    path = str(tmp_path_factory.mktemp("sq8")) + "/store"
    write_sq8(em, path)
    a = sorted(map(tuple, sq8_topk(em, q, k=10).collect()))
    b = sorted(map(tuple, sq8_probe_persisted(spark, path, q,
                                              k=10).collect()))
    assert a == b and a

    def du(p):
        if os.path.isdir(p):
            return sum(os.path.getsize(os.path.join(d, f))
                       for d, _, fs in os.walk(p) for f in fs)
        return os.path.getsize(p)
    raw = du(os.path.join(sf_dir, "embeddings.parquet"))
    assert du(path) < raw / 2, (du(path), raw)


def test_sq8_append_equals_fresh_full_store(spark, sf_dir,
                                            tmp_path_factory):
    """sq8_append (r15): per-vector scales mean no trained state, so
    base-write + append must probe identically to a fresh full-corpus
    store — bit-for-bit."""
    from big_data_assignment_2_spark.operators.persist import (
        sq8_append, sq8_probe_persisted, write_sq8)

    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")
    nid = F.col("vec_id").cast("bigint")
    d = str(tmp_path_factory.mktemp("sq8app"))
    grown, fresh = d + "/grown", d + "/fresh"
    write_sq8(em.filter((nid % 10) != 9), grown)
    sq8_append(em.filter((nid % 10) == 9), grown)
    write_sq8(em, fresh)
    a = sorted(map(tuple, sq8_probe_persisted(spark, grown, q,
                                              k=10).collect()))
    b = sorted(map(tuple, sq8_probe_persisted(spark, fresh, q,
                                              k=10).collect()))
    assert a == b and a


def test_sq8_delete_masks_and_compact_equals_filtered_fresh(
        spark, sf_dir, tmp_path_factory):
    """SQ8 lifecycle (r16, VERDICT r15 #4): tombstoned ids must vanish
    from probe results immediately (masked scan, before compaction);
    compaction must leave a store that is RESULT-identical to the
    masked probe AND bit-identical on disk semantics to a fresh
    survivors-only write (per-vector scales are row-independent, so
    dropping rows cannot perturb survivors); the tombstone log must be
    gone afterwards so later probes pay no anti-join."""
    from big_data_assignment_2_spark.operators.persist import (
        sq8_compact, sq8_delete, sq8_probe_persisted, write_sq8)

    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 5) \
        .selectExpr("vec_id AS query_id", "embedding")
    nid = F.col("vec_id").cast("bigint")
    d = str(tmp_path_factory.mktemp("sq8del"))
    live_path, fresh_path = d + "/live", d + "/fresh"
    write_sq8(em, live_path)
    dead = em.filter((nid % 7) == 2).select("vec_id")
    dead_ids = {r[0] for r in dead.collect()}
    assert dead_ids
    sq8_delete(spark, live_path, dead)

    masked = sq8_probe_persisted(spark, live_path, q, k=10).collect()
    assert masked
    assert not {r["neighbor_id"] for r in masked} & {str(i) for i in
                                                     dead_ids} \
        and not {r["neighbor_id"] for r in masked} & dead_ids

    sq8_compact(spark, live_path)
    assert not os.path.exists(live_path + "/tombstones")
    compacted = sq8_probe_persisted(spark, live_path, q, k=10).collect()
    assert sorted(map(tuple, compacted)) == sorted(map(tuple, masked))

    write_sq8(em.filter((nid % 7) != 2), fresh_path)
    fresh = sq8_probe_persisted(spark, fresh_path, q, k=10).collect()
    assert sorted(map(tuple, compacted)) == sorted(map(tuple, fresh))
    # physical removal, not just masking: the survivors' code rows only
    n_live = spark.read.parquet(live_path + "/codes").count()
    n_fresh = spark.read.parquet(fresh_path + "/codes").count()
    assert n_live == n_fresh

    # compact with no tombstone log is a no-op, not an error
    sq8_compact(spark, fresh_path)
    assert sorted(map(tuple,
                      sq8_probe_persisted(spark, fresh_path, q,
                                          k=10).collect())) \
        == sorted(map(tuple, fresh))

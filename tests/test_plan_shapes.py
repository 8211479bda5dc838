"""Plan-shape regression tests: the optimizations SCALE.md claims must be
visible in the physical plans (pushdown, pruning, broadcast, no-global-sort
top-k).  These fail loudly if a refactor silently de-optimizes a query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.plans.relational_queries import (
    q_pricing_summary, q_region_revenue)
from big_data_assignment_2_spark.plans.search_queries import q_bm25_topk
from big_data_assignment_2_spark.sources.io import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(q_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: text columns not in ReadSchema
    assert "l_comment" not in plan


def test_q5_all_dimensions_broadcast(spark, sf_dir):
    plan = plan_of(q_region_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    # partial + final agg split (map-side combine)
    assert "partial_sum" in plan


def test_bm25_topk_no_global_sort(spark, sf_dir):
    plan = plan_of(q_bm25_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_projection_prunes_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    plan = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_asof_join_single_shuffle_no_blowup(spark, sf_dir):
    """The union+window as-of join must not plan a nested-loop/cartesian
    pairwise stage; one hash exchange on the key feeds the sort+window."""
    from big_data_assignment_2_spark.plans.relational_queries import q_asof_join

    plan = plan_of(q_asof_join(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning(user_id") <= 2


def test_window_query_single_exchange(spark, sf_dir):
    from big_data_assignment_2_spark.plans.window_queries import q_sliding_sum

    plan = plan_of(q_sliding_sum(spark, sf_dir))
    assert "Window" in plan
    assert plan.count("Exchange") == 1        # one shuffle on user_id


def test_inrow_minhash_signatures_no_exchange(spark, sf_dir):
    """The round-4 in-row signature path must stay map-side: scan →
    project, zero Exchange operators (the exploded formulation pays a
    hash-agg shuffle; the rewrite's whole point is not to)."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.functions.text import tokenize
    from big_data_assignment_2_spark.operators.dedup import (
        minhash_signatures_from_arrays)

    docs = load_table(spark, sf_dir, "documents")
    arrays = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.sort_array(F.array_distinct(tokenize("text"))).alias("__toks"))
    plan = plan_of(minhash_signatures_from_arrays(arrays))
    assert "Exchange" not in plan, plan


def test_partitioned_scan_prunes_partitions(spark, sf_dir):
    """source_partitioned_prune's storage claim, asserted on the plan: the
    status predicate must land in PartitionFilters (directory-level skip —
    the Cassandra-partition-key analogue), not as a post-scan filter."""
    from big_data_assignment_2_spark.plans.source_queries import (
        q_partitioned_prune)

    plan = plan_of(q_partitioned_prune(spark, sf_dir))
    assert "PartitionFilters" in plan
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "o_orderstatus" in pf and "= F" in pf, plan


def test_no_accidental_cartesian_in_any_query(spark, sf_dir):
    """Sweep every declared query's physical plan: product joins
    (CartesianProduct / BroadcastNestedLoopJoin) are allowed only where a
    non-equi pairing is the SEMANTICS (documented allowlist); anywhere
    else one appearing means a join key got lost in a refactor."""
    import __spark_entry__ as contract

    INTENTIONAL = {
        # broadcast 1-row stats relation / tiny query-set scoring
        # (append_probe shares bm25_topk's scoring plan verbatim)
        "search_bm25_topk", "search_bm25_batch",
        "search_bm25_append_probe",
        # BM25 over the CJK bigram index reuses the same
        # _bm25_scores_from_terms plan (broadcast 1-row N+avgdl) (r17)
        "search_bm25_cjk",
        # delete/compact probes share bm25_topk's scoring plan verbatim too
        "search_bm25_delete_probe", "search_bm25_compact_probe",
        # batched persisted probe: bm25_topk_batch's broadcast 1-row
        # stats relation over the shared probe read side (r13)
        "search_bm25_batch_probe",
        # exact baseline scores every vector against the broadcast query
        # set by definition (the scale paths are sim_ann_lsh / IVF)
        "sim_ann_bruteforce", "sim_ann_lsh",
        # SQ8 is the same full-scan broadcast scoring over the
        # reconstructed int8 store — the win is the 4x-smaller scan,
        # not candidate pruning (IVF composes on top) (r14)
        "sim_sq8_topk",
        # recall = persisted-probe top-k ∩ brute-force top-k: the exact
        # ground-truth side embeds sim_ann_bruteforce's broadcast scoring
        # pass by definition (the ANN side stays list-pruned)
        "sim_ivfpq_recall", "sim_ivfpq_rerank_recall",
        # production-config quality rows: same composition — the recall
        # thresholds are asserted against the embedded brute-force
        # ground truth (the ANN side stays list-pruned; boundedc scans
        # all lists by configuration, still via the list equi-join)
        "sim_ivfpq_quality", "sim_ivfpq_quality_boundedc",
        # ADC scores every m-byte CODE row against the broadcast query
        # set — that full pass over the compressed codes is the PQ
        # contract (the compression, not candidate pruning, is the win;
        # IVF-style pruning composes on top and is covered by sim_ivf_topk)
        "sim_pq_topk",
        # broadcast 1-row corpus-size relation (IDF needs N, as BM25 does)
        "sim_tfidf_topk",
        # exact-total (1 row) x sketch-union estimate (1 row): a literal
        # join key would be constant-folded away, so this 1x1 pairing can
        # only plan as a broadcast nested-loop — benign by construction
        "rel_hll_sketch_union",
        # candidate counts x broadcast 1-row total-count relation (the
        # integer threshold freq*(k+1) > n needs n, like BM25 needs N)
        "text_heavy_hitters_exact",
        # BM25F: broadcast 1-row per-field avgdl + corpus-N relations,
        # same composition as the bm25 rows (r14)
        "search_bm25f_topk",
        # fuzzy expansion: the Levenshtein<=1 theta-join of the broadcast
        # OOV query terms x the VOCABULARY relation (document_frequency,
        # never postings) is the operator's semantics; scoring then
        # shares bm25_topk's broadcast 1-row stats plan (r14)
        "search_fuzzy_topk",
        # hybrid RRF embeds bm25_topk (1-row stats) AND the exact-cosine
        # list (sim_ann_bruteforce's broadcast scoring, by definition);
        # the fusion itself is a union + hash-agg (r14)
        "search_hybrid_rrf",
        # snippet page selection embeds bm25_topk's 1-row stats relation;
        # window selection is pure array functions, no join at all (r14)
        "search_snippet",
        # more-like-this: the 1-row corpus-N relation joins the source
        # doc's term set for tf-idf term selection, then the standard
        # broadcast-terms BM25 scoring plan (r14)
        "search_more_like_this",
        # filtered-recall embeds the label-filtered brute-force ground
        # truth (sim_ann_bruteforce's broadcast scoring with a label
        # conjunct, by definition); both IVF variants under comparison
        # stay list-pruned equi-joins (r14)
        "sim_filtered_recall",
        # keyset pagination: the broadcast 1-ROW cursor relation joins the
        # scored page by definition (plus bm25's 1-row stats relation);
        # the after-cursor predicate itself is a pushed-down filter (r14)
        "search_page_after",
        # proximity boost embeds bm25_topk's broadcast 1-row stats
        # relation; the pair stage is a doc_id equi-join (r14)
        "search_proximity",
        # MMR re-ranks the exact brute-force top-C page (embedded
        # broadcast scoring, by definition); the selection chain itself
        # is per-query equi-joins over the |Q|·C candidate relation (r14)
        "sim_mmr_diversify",
        # ranker eval embeds BOTH retrievers under comparison (bm25 +
        # bm25f, each with its broadcast 1-row stats relation); the
        # metric math itself is equi-joins + windows (r14)
        "search_eval_ndcg",
        # gap-encoded store probe IS bm25_probe_persisted (broadcast
        # 1-row stats relation, same as every bm25 row) — the delta
        # layout never changes the probe plan (r15)
        "search_bm25_probe_delta",
        # prefix expansion: wildcards × VOCABULARY theta-join (the
        # PrefixQuery rewrite — same shape as search_fuzzy_topk), then
        # bm25's broadcast 1-row stats relation (r15)
        "search_prefix_topk",
        # persisted SQ8 tier serves via exact brute-force scoring over
        # the reconstructed store — broadcast scoring is the operator's
        # definition, same as sim_sq8_topk (r15)
        "sim_sq8_probe_persisted", "sim_sq8_append_probe",
        # lifecycle rows probe through the same broadcast brute-force
        # serving path; the tombstone mask is a broadcast anti-join on
        # top (r16)
        "sim_sq8_delete_probe", "sim_sq8_compact_probe",
        # streaming SQ8 ingest ends in the same broadcast brute-force
        # probe over the grown store (r16)
        "stream_sq8_ingest_live",
        # append-health embeds the brute-force ground truth (broadcast
        # scoring, by definition — the recall is measured against it)
        # plus the documented 1-row x 1-row x 1-row stats assembly;
        # both probed indexes stay list-pruned equi-joins (r15)
        "sim_ivfpq_append_recall",
    }
    offenders = {}
    for name, fn in contract.queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) \
                and name not in INTENTIONAL:
            offenders[name] = True
    assert not offenders, f"unexpected product joins in: {sorted(offenders)}"


def test_global_cumsum_no_single_partition_window(spark):
    """The full-data window must be partitioned by the physical partition
    id; only the per-partition-totals relation (one row per partition) may
    use an unpartitioned window."""
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.relational import global_cumsum

    df = spark.range(10_000).withColumn("v", (F.col("id") % 7).cast("int"))
    plan = plan_of(global_cumsum(df, [F.col("id")], "v", partitions=8))
    assert "Window" in plan
    # every full-data window spec carries the __pid partition key
    import re
    specs = re.findall(r"Window \[[^\]]*\](?:, \[([^\]]*)\])?", plan)
    assert any("__pid" in (s or "") for s in specs), plan


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """The claim rel_bucketed_join makes for 100 TB: two fact tables
    bucketed on the join key at the same bucket count join with ZERO
    Exchange operators — the layout cost paid at write time replaces the
    per-join shuffle of both sides.  Broadcast is disabled so the plan is
    the sort-merge join a real fact-fact pair would take."""
    from big_data_assignment_2_spark.operators.persist import write_bucketed

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    write_bucketed(li, "t_bj_lineitem", "l_orderkey", n_buckets=4,
                   sort_col="l_orderkey", path=str(tmp_path / "li"))
    write_bucketed(o, "t_bj_orders", "o_orderkey", n_buckets=4,
                   sort_col="o_orderkey", path=str(tmp_path / "o"))
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        lb, ob = spark.table("t_bj_lineitem"), spark.table("t_bj_orders")
        joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # both scans actually use the bucket layout
        assert plan.count("SelectedBucketsCount: 4 out of 4") == 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_tfidf_persists_tf_and_w_and_dfreq_broadcasts(spark, sf_dir):
    """Pins the tfidf two-stage cache contract (rounds 7-8): BOTH tf and
    w are persisted stages.  tf cached → the tokenize subtree is paid
    once on first materialization (dfreq derives from the cache); w
    cached → the three consumers (norms, query side, corpus side) read
    the weights directly on warm runs instead of re-paying the
    broadcast-join + multiply each (the r6→r7 driver-bench regression).
    dfreq must arrive via BroadcastHashJoin, never shuffled against the
    corpus-sized side."""
    import re

    from big_data_assignment_2_spark.plans.similarity_queries import (
        q_tfidf_topk)

    df = q_tfidf_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [{c.split("#")[0].strip() for c in cols.split(",")}
             for cols in re.findall(r"InMemoryTableScan \[([^\]]*)\]", plan)]
    assert scans, f"no cached stage in plan:\n{plan[:2000]}"
    # Consumers read the cached WEIGHT stage...
    assert any("w" in names for names in scans), scans
    # ...and every cached scan is one of the two declared stages.
    for names in scans:
        assert names <= {"doc_id", "term", "tf", "w"}, scans
    assert "BroadcastHashJoin" in plan

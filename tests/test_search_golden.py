"""Golden micro-corpus (FIXTURES.md §1.3): hand-computed BM25 against the
exact reference formula (idf=ln(max(1,N/max(1,df))), k1=1.0, b=0.75)."""

from __future__ import annotations

import pytest

from big_data_assignment_2_spark.operators.index import build_index
from big_data_assignment_2_spark.operators.search import bm25_topk, collection_stats

CORPUS = [
    ("d1", "Apple Pie", "apple apple banana"),
    ("d2", "Banana Split", "banana cherry"),
    ("d3", "Cherry Tart", "cherry cherry cherry apple"),
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id string, title string, text string")
    ix = build_index(docs, title_col="title")
    for df in ix.values():
        df.cache().count()
    return ix


def topk(spark, index, q):
    rows = bm25_topk(spark, q, index["term_document"],
                     index["document_frequency"], index["documents_info"]).collect()
    return [(r["doc_id"], r["score"]) for r in rows]


def test_index_tables(index):
    postings = {(r["term"], r["doc_id"]): (r["tf"], r["positions"])
                for r in index["term_document"].collect()}
    assert postings == {
        ("apple", "d1"): (2, [0, 1]), ("apple", "d3"): (1, [3]),
        ("banana", "d1"): (1, [2]), ("banana", "d2"): (1, [0]),
        ("cherry", "d2"): (1, [1]), ("cherry", "d3"): (3, [0, 1, 2]),
    }
    assert {r["term"]: r["df"] for r in index["document_frequency"].collect()} == {
        "apple": 2, "banana": 2, "cherry": 2}
    assert {r["doc_id"]: r["length"] for r in index["documents_info"].collect()} == {
        "d1": 3, "d2": 2, "d3": 4}
    n, avgdl = collection_stats(index["documents_info"])
    assert (n, avgdl) == (3, 3.0)


def test_bm25_single_term(spark, index):
    assert topk(spark, index, "apple") == [("d1", 0.540620), ("d3", 0.360413)]


def test_bm25_two_terms(spark, index):
    assert topk(spark, index, "banana cherry") == [
        ("d2", 0.926777), ("d3", 0.572421), ("d1", 0.405465)]


def test_bm25_zero_df_term_skipped(spark, index):
    # 'pie' appears only in a title; titles are unindexed (`mapper1.py:15`),
    # so df=0 and the term is skipped (`query.py:165-167`).
    assert topk(spark, index, "apple pie") == [("d1", 0.540620), ("d3", 0.360413)]


def test_bm25_empty_query(spark, index):
    assert topk(spark, index, "...") == []


def test_phrase_match_golden(index):
    from big_data_assignment_2_spark.operators.search import phrase_match

    td = index["term_document"]
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_match(td, ["apple", "banana"]).collect()}
    assert got == {"d1": 1}                 # "apple apple banana": one match
    got2 = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_match(td, ["cherry", "cherry"]).collect()}
    assert got2 == {"d3": 2}                # "cherry cherry cherry": overlaps
    assert phrase_match(td, ["banana", "apple"]).count() == 0


def test_bm25_batch_matches_single(spark, index):
    from big_data_assignment_2_spark.operators.search import bm25_topk_batch

    out = bm25_topk_batch(spark, {"q1": "apple", "q2": "banana cherry"},
                          index["term_document"], index["document_frequency"],
                          index["documents_info"], k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"], r["rank"]))
    for q in by_q:
        by_q[q].sort(key=lambda x: x[2])
    assert [(d, s) for d, s, _ in by_q["q1"]] == [("d1", 0.540620), ("d3", 0.360413)]
    assert [(d, s) for d, s, _ in by_q["q2"]] == [
        ("d2", 0.926777), ("d3", 0.572421), ("d1", 0.405465)]

"""BM25F fielded scoring + fuzzy query expansion (r14, VERDICT r13 #6/#7).

BM25F golden values are re-derived IN THE TEST from Robertson's
simple-BM25F formula by an independent pure-Python replication, so the
Spark plan is checked against the math, not against itself.
"""

from __future__ import annotations

import math

import pytest

from big_data_assignment_2_spark.operators.index import build_index
from big_data_assignment_2_spark.operators.search import (bm25_fuzzy_topk,
                                                          bm25_topk,
                                                          bm25f_topk)

# (doc_id, title, body)
CORPUS = [
    ("d1", "apple pie", "apple apple banana"),
    ("d2", "banana split", "banana cherry"),
    ("d3", "cherry tart", "cherry cherry cherry apple"),
]
WEIGHTS = {"title": 2.0, "body": 1.0}
K1, B = 1.0, 0.75


@pytest.fixture(scope="module")
def fields(spark):
    docs = spark.createDataFrame(CORPUS,
                                 "doc_id string, title string, body string")
    out = {}
    for f in ("title", "body"):
        ix = build_index(docs.select("doc_id", f), text_col=f)
        out[f] = {"term_document": ix["term_document"].cache(),
                  "documents_info": ix["documents_info"].cache()}
    return out


def bm25f_reference(query: str) -> list[tuple[str, float]]:
    """Independent replication: simple BM25F on CORPUS."""
    toks = {f: {d: t.split() for d, *fs in CORPUS
                for t in [fs[0 if f == "title" else 1]]}
            for f in ("title", "body")}
    avg = {f: sum(len(v) for v in toks[f].values()) / len(CORPUS)
           for f in toks}
    n = len(CORPUS)
    scores: dict[str, float] = {}
    for term in query.split():
        df = sum(1 for d, *_ in CORPUS
                 if any(term in toks[f][d] for f in toks))
        if df == 0:
            continue
        idf = math.log(max(1.0, n / max(1, df)))
        for d, *_ in CORPUS:
            tfw = sum(
                WEIGHTS[f] * toks[f][d].count(term)
                / (1 - B + B * len(toks[f][d]) / avg[f])
                for f in toks)
            if tfw > 0:
                scores[d] = scores.get(d, 0.0) + idf * tfw / (K1 + tfw)
    return sorted(((d, round(s, 6)) for d, s in scores.items()),
                  key=lambda x: (-x[1], x[0]))


@pytest.mark.parametrize("query", ["apple", "banana cherry",
                                   "apple banana cherry"])
def test_bm25f_matches_independent_replication(spark, fields, query):
    got = [(r["doc_id"], r["score"])
           for r in bm25f_topk(spark, query, fields, WEIGHTS).collect()]
    assert got == bm25f_reference(query)


def test_bm25f_title_weight_reorders(spark, fields):
    """'banana' sits in d2's TITLE but only d1's body: with w_title=2 the
    title doc must outrank the body doc (lengths equalized by the norm)."""
    got = [r["doc_id"]
           for r in bm25f_topk(spark, "banana", fields, WEIGHTS).collect()]
    assert got == ["d2", "d1"]


def test_bm25f_weights_keys_validated(spark, fields):
    with pytest.raises(ValueError, match="weights keys"):
        bm25f_topk(spark, "apple", fields, {"title": 2.0})


@pytest.fixture(scope="module")
def flat_index(spark):
    docs = spark.createDataFrame([(d, f"{t} {b}") for d, t, b in CORPUS],
                                 "doc_id string, text string")
    ix = build_index(docs)
    for df in ix.values():
        df.cache()
    return ix


def _fuzzy(spark, ix, q):
    return [(r["doc_id"], r["score"])
            for r in bm25_fuzzy_topk(spark, q, ix["term_document"],
                                     ix["document_frequency"],
                                     ix["documents_info"]).collect()]


def _exact(spark, ix, q):
    return [(r["doc_id"], r["score"])
            for r in bm25_topk(spark, q, ix["term_document"],
                               ix["document_frequency"],
                               ix["documents_info"]).collect()]


def test_fuzzy_oov_term_expands_to_neighbor(spark, flat_index):
    # 'aple' is OOV, Levenshtein-1 from exactly one vocab term: 'apple'
    assert _fuzzy(spark, flat_index, "aple banana") == \
        _exact(spark, flat_index, "apple banana")


def test_fuzzy_in_vocab_terms_pass_through(spark, flat_index):
    assert _fuzzy(spark, flat_index, "apple banana") == \
        _exact(spark, flat_index, "apple banana")


def test_fuzzy_hopeless_term_contributes_nothing(spark, flat_index):
    assert _fuzzy(spark, flat_index, "aple zzzzzz") == \
        _exact(spark, flat_index, "apple")


def test_fuzzy_multi_neighbor_expansion(spark):
    """An OOV term with SEVERAL distance-1 neighbors contributes all of
    them — equivalent to querying every neighbor explicitly."""
    docs = spark.createDataFrame(
        [("d1", "cat cat dog"), ("d2", "car dog"), ("d3", "cab cab cab")],
        "doc_id string, text string")
    ix = build_index(docs)
    assert _fuzzy(spark, ix, "caq") == _exact(spark, ix, "cat car cab")

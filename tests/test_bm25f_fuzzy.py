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


def test_rrf_fuse_golden(spark):
    """RRF by hand: doc2 in both lists beats doc1's single first place
    (1/61+1/62 > 1/61), missing-list docs get no NULL arithmetic."""
    l1 = spark.createDataFrame([("1", 1), ("2", 2)], "doc_id string, rank int")
    l2 = spark.createDataFrame([("2", 1), ("3", 2)], "doc_id string, rank int")
    from big_data_assignment_2_spark.operators.search import rrf_fuse

    got = [(r["doc_id"], r["rrf_score"], r["n_lists"])
           for r in rrf_fuse([l1, l2], k_rrf=60, k=10).collect()]
    exp = [("2", round(1 / 62 + 1 / 61, 6), 2),
           ("1", round(1 / 61, 6), 1),
           ("3", round(1 / 62, 6), 1)]
    assert got == exp


def test_snippet_best_window_and_ties(spark):
    """Best window maximizes hits; ties resolve to the SMALLEST start;
    the snippet text is the window's tokens re-rendered."""
    from big_data_assignment_2_spark.operators.search import snippet_extract

    docs = spark.createDataFrame(
        [("1", "a b c apple d e apple f g h i j apple apple k"),
         ("2", "apple x y z w v u t s r q p"),
         ("3", "nothing here at all")],
        "doc_id string, text string")
    ix = build_index(docs)
    ids = spark.createDataFrame([("1",), ("2",), ("3",)], "doc_id string")
    got = {r["doc_id"]: (r["snippet_start"], r["n_hits"], r["snippet"])
           for r in snippet_extract(ix["term_document"], docs, ids,
                                    ["apple"], window=5).collect()}
    # doc1 hits at 3,6,12,13: windows [3,8) and [12,17) both hold 2 hits;
    # tie -> start 3.  doc3 has no hits -> no row.
    assert got == {"1": (3, 2, "apple d e apple f"),
                   "2": (0, 1, "apple x y z w")}


def test_snippet_window_clips_at_doc_end(spark):
    """A best window near the end of a short doc renders fewer than
    `window` tokens instead of failing."""
    from big_data_assignment_2_spark.operators.search import snippet_extract

    docs = spark.createDataFrame([("1", "x y apple")],
                                 "doc_id string, text string")
    ix = build_index(docs)
    ids = spark.createDataFrame([("1",)], "doc_id string")
    [r] = snippet_extract(ix["term_document"], docs, ids, ["apple"],
                          window=5).collect()
    assert (r["snippet_start"], r["n_hits"], r["snippet"]) == (2, 1, "apple")


def test_more_like_this_golden(spark):
    """MLT by hand on a corpus where doc d1's single highest-tf*idf term
    ('apple', tf=2, df=2) must become the query: d3 (contains apple)
    is retrieved, d2 (no apple) is not, d1 itself is excluded."""
    from big_data_assignment_2_spark.operators.search import more_like_this

    docs = spark.createDataFrame(
        [("d1", "apple apple banana"),
         ("d2", "banana cherry"),
         ("d3", "cherry cherry cherry apple")],
        "doc_id string, text string")
    ix = build_index(docs)
    got = [(r["doc_id"], r["score"])
           for r in more_like_this(spark, "d1", ix["term_document"],
                                   ix["document_frequency"],
                                   ix["documents_info"],
                                   n_terms=1).collect()]
    # expected: BM25 for query 'apple' minus d1 -> exactly bm25 on d3
    exp = [(r["doc_id"], r["score"])
           for r in bm25_topk(spark, "apple", ix["term_document"],
                              ix["document_frequency"],
                              ix["documents_info"]).collect()
           if r["doc_id"] != "d1"]
    assert got == exp and [d for d, _ in got] == ["d3"]


def _prefix(spark, ix, q):
    from big_data_assignment_2_spark.operators.search import bm25_prefix_topk
    return [(r["doc_id"], r["score"])
            for r in bm25_prefix_topk(spark, q, ix["term_document"],
                                      ix["document_frequency"],
                                      ix["documents_info"]).collect()]


def test_prefix_wildcard_expands_to_vocab(spark, flat_index):
    # 'ch*' matches exactly 'cherry' in the corpus vocabulary
    assert _prefix(spark, flat_index, "ch* banana") == \
        _exact(spark, flat_index, "cherry banana")


def test_prefix_plain_terms_pass_through(spark, flat_index):
    assert _prefix(spark, flat_index, "apple banana") == \
        _exact(spark, flat_index, "apple banana")


def test_prefix_multi_match_scores_each_term(spark, flat_index):
    # 'b*' -> banana; 'a*' -> apple; both expansions together == the
    # two-term exact query (each matched term scored with its own df)
    assert _prefix(spark, flat_index, "a* b*") == \
        _exact(spark, flat_index, "apple banana")


def test_prefix_bare_star_and_no_match_contribute_nothing(spark, flat_index):
    # a bare '*' is guarded (empty stem would match the whole vocabulary
    # by accident); 'zz*' matches nothing
    assert _prefix(spark, flat_index, "* zz* apple") == \
        _exact(spark, flat_index, "apple")

"""Index invariants on real testdata (SURVEY.md §5.3):
- sum(tf) per doc == doc length
- df(term) == number of postings rows for that term
- tf == len(positions); positions sorted, 0-based, in-range
- query tokenizer ≡ index tokenizer
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.index import (
    build_postings, doc_freq, doc_freq_exact, doc_stats, tokenize_positions)
from big_data_assignment_2_spark.functions.text import tokenize_query
from big_data_assignment_2_spark.sources.io import load_table


@pytest.fixture(scope="module")
def pieces(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tokens = tokenize_positions(docs).cache()
    postings = build_postings(tokens).cache()
    return docs, tokens, postings


def test_sum_tf_equals_length(spark, pieces):
    docs, _, postings = pieces
    stats = doc_stats(docs)
    joined = (postings.groupBy("doc_id").agg(F.sum("tf").alias("tf_sum"))
              .join(stats, "doc_id"))
    assert joined.filter(F.col("tf_sum") != F.col("length")).count() == 0
    assert joined.count() == docs.filter(F.length("text") > 0).count()


def test_df_equals_postings_rows(pieces):
    _, tokens, postings = pieces
    via_postings = doc_freq(postings)
    via_distinct = doc_freq_exact(tokens)
    assert via_postings.exceptAll(via_distinct).count() == 0
    assert via_distinct.exceptAll(via_postings).count() == 0


def test_tf_matches_positions(pieces):
    _, _, postings = pieces
    bad = postings.filter(
        (F.size("positions") != F.col("tf"))
        | (F.col("positions") != F.sort_array("positions"))
        | (F.element_at("positions", 1) < 0)
    )
    assert bad.count() == 0


def test_query_tokenizer_parity(spark, pieces):
    docs, tokens, _ = pieces
    # On every document body the two tokenizers must agree.
    sample = [r["text"] for r in docs.limit(50).collect()]
    from big_data_assignment_2_spark.functions.text import tokenize
    df = spark.createDataFrame([(t,) for t in sample], "text string")
    spark_toks = [r[0] for r in df.select(tokenize("text")).collect()]
    for text, st in zip(sample, spark_toks):
        assert st == tokenize_query(text)


def test_tokenizer_unicode_and_punct(spark):
    cases = [
        ("Hello, World! it's 42.", ["hello", "world", "it", "s", "42"]),
        ("  ...  ", []),
        ("Café naïve Зеленський 東京", ["café", "naïve", "зеленський", "東京"]),
        ("under_score-dash", ["under_score", "dash"]),
    ]
    from big_data_assignment_2_spark.functions.text import tokenize
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = [r[0] for r in df.select(tokenize("text")).collect()]
    for (text, want), g in zip(cases, got):
        assert g == want, text
        assert tokenize_query(text) == want, text


def test_merge_index_equals_full_rebuild(spark, sf_dir):
    from big_data_assignment_2_spark.operators.index import build_index, merge_index

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter("doc_id < 250")
    new = docs.filter("doc_id >= 250")
    merged = merge_index(build_index(old), new)
    full = build_index(docs)
    for name in ("term_document", "document_frequency", "documents_info"):
        a, b = merged[name], full[name]
        assert a.exceptAll(b).count() == 0, name
        assert b.exceptAll(a).count() == 0, name

"""Vocabulary-driven BPE encoder: merge-fold edge semantics pinned on
literal words (the oracle row certifies whole-corpus parity; these pin
the algorithm's corner cases explicitly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.textstats import (bpe_encode,
                                                             bpe_encode_word)


def _encode(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "w string")
    rows = df.select("w", bpe_encode_word(F.col("w")).alias("p")).collect()
    return {r["w"]: r["p"] for r in rows}


def test_cascading_merges(spark):
    got = _encode(spark, ["data", "the", "thththe"])
    assert got["data"] == ["data"]          # a+t, d+at, dat+a cascade
    assert got["the"] == ["the"]            # t+h then th+e
    # left-to-right non-overlap: t,h,t,h,t,h,e -> th th th -> last th+e
    assert got["thththe"] == ["th", "th", "the"]


def test_rank_order_blocking(spark):
    # e+r (rank 6) consumes the e before u+e (rank 13) can see it.
    got = _encode(spark, ["query", "value"])
    assert got["query"] == ["q", "u", "er", "y"]
    assert got["value"] == ["v", "a", "l", "ue"]


def test_repeated_pair_left_to_right(spark):
    # (a,n) on "anan": merge both non-overlapping occurrences.
    got = _encode(spark, ["anan", "aaat"])
    assert got["anan"] == ["an", "an"]
    # (a,t) fires once on the last (a,t); leading a's stay single.
    assert got["aaat"] == ["a", "a", "at"]


def test_single_char_and_unknown(spark):
    got = _encode(spark, ["a", "z", "xyz"])
    assert got["a"] == ["a"]
    assert got["z"] == ["z"]
    assert got["xyz"] == ["x", "y", "z"]    # no applicable merges


def test_doc_level_assembly(spark):
    docs = spark.createDataFrame(
        [(1, "the data"), (2, "query the query")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_pieces"], r["pieces"])
           for r in bpe_encode(docs).collect()}
    assert got["1"] == (2, "the data")
    assert got["2"] == (9, "q u er y the q u er y")

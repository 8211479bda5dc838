"""pandas_udf demonstration: Arrow-batched, matches a pure-Python oracle."""

from __future__ import annotations

import math
from collections import Counter

from big_data_assignment_2_spark.functions.udfs import shannon_entropy
from big_data_assignment_2_spark.sources.io import load_table


def py_entropy(t: str) -> float:
    if not t:
        return 0.0
    n = len(t)
    return round(-sum((c / n) * math.log2(c / n)
                      for c in Counter(t).values()), 6)


def test_entropy_matches_python(spark):
    rows = [(1, "aaaa"), (2, "abab"), (3, ""), (4, None), (5, "abcdefgh")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["e"]
           for r in df.select("id", shannon_entropy("text").alias("e")).collect()}
    assert got[1] == 0.0
    assert got[2] == 1.0
    assert got[3] == 0.0 and got[4] == 0.0
    assert got[5] == 3.0


def test_entropy_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("doc_id", shannon_entropy("text").alias("e")).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        assert r["e"] == py_entropy(texts[r["doc_id"]])


def test_minmax_scale_by_group(spark):
    from big_data_assignment_2_spark.functions.udfs import \
        minmax_scale_by_group

    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
            ("b", 4, 7), ("b", 5, 7),          # constant group -> 0.0
            ("c", 6, 42)]                      # singleton group -> 0.0
    df = spark.createDataFrame(rows, "grp string, id int, v int")
    got = {r["id"]: (r["grp"], r["scaled"])
           for r in minmax_scale_by_group(df, "grp", "v").collect()}
    assert got[1] == ("a", 0.0)
    assert got[2] == ("a", 0.5)
    assert got[3] == ("a", 1.0)
    assert got[4][1] == 0.0 and got[5][1] == 0.0
    assert got[6][1] == 0.0
    # schema passthrough: all source columns + scaled
    out = minmax_scale_by_group(df, "grp", "v")
    assert out.columns == ["grp", "id", "v", "scaled"]

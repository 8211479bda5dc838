"""Sequence packing + the scale-safe global cumulative sum it rides on."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_assignment_2_spark.operators.packing import (SEQ_BUDGET,
                                                           pack_sequences)
from big_data_assignment_2_spark.operators.relational import global_cumsum
from big_data_assignment_2_spark.sources.io import load_table


def test_global_cumsum_equals_naive_window(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(500)], "id long, v int")
    got = global_cumsum(df, [F.col("id")], "v", cum_col="cum", partitions=7)
    naive = df.withColumn(
        "cum", F.sum("v").over(
            Window.orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert sorted((r["id"], r["cum"]) for r in got.collect()) == \
        sorted((r["id"], r["cum"]) for r in naive.collect())


def test_pack_sequences_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(pack_sequences(docs).collect(), key=lambda r: int(r["doc_id"]))
    assert len(rows) == docs.count()
    # stream layout: each doc starts exactly where the previous one ended
    cum = 0
    for r in rows:
        assert r["seq_id"] == cum // SEQ_BUDGET
        assert r["seq_offset"] == cum % SEQ_BUDGET
        if r["n_tokens"] == 0:
            assert r["n_seq_spans"] == 0
        else:
            last = cum + r["n_tokens"] - 1
            assert r["n_seq_spans"] == last // SEQ_BUDGET - cum // SEQ_BUDGET + 1
        cum += r["n_tokens"]

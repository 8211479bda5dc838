"""Cross-validate the hand-rolled MinHash-LSH dedup against pyspark.ml's
MinHashLSH on the planted-duplicate corpus: both must surface the same
high-Jaccard pairs (ml's hash family is JVM-seeded so exact signatures
differ — which is exactly why the oracle-checked pipeline rolls its own —
but the retrieved pair sets at a given distance threshold must agree)."""

from __future__ import annotations

import pytest
from pyspark.ml.feature import CountVectorizer, MinHashLSH
from pyspark.sql import functions as F

from big_data_assignment_2_spark.functions.text import tokenize
from big_data_assignment_2_spark.operators.dedup import minhash_near_dups

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "dog lazy the over jumps fox brown quick the"),
    (4, "the quick brown fox jumps over the lazy cat"),
    (5, "completely different words about spark engines here"),
    (6, "spark engines process completely different words here fast"),
]


def test_ml_minhash_agrees_with_ours(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    ours = {(r["doc_a"], r["doc_b"])
            for r in minhash_near_dups(docs, threshold=0.5).collect()}

    toks = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       F.array_distinct(tokenize("text")).alias("toks"))
    cv = CountVectorizer(inputCol="toks", outputCol="features", binary=True)
    model_cv = cv.fit(toks)
    feats = model_cv.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=16, seed=42)
    model = lsh.fit(feats)
    # Jaccard distance threshold 0.5 == Jaccard similarity >= 0.5
    sim = model.approxSimilarityJoin(feats, feats, 0.5, distCol="dist")
    ml_pairs = {
        (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
        for r in sim.collect()
        if int(r["datasetA"]["doc_id"]) < int(r["datasetB"]["doc_id"])
        and (1.0 - r["dist"]) >= 0.5
    }
    assert ours == ml_pairs

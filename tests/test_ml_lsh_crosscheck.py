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


def test_ml_euclidean_lsh_agrees_with_banded_cosine(spark, sf_dir):
    """Cross-validate the banded sign-LSH near-dup against pyspark.ml's
    BucketedRandomProjectionLSH on planted near-identical vectors.  For
    L2-normalized vectors, euclidean distance and cosine relate by
    d^2 = 2 - 2c, so a cosine threshold t is the euclidean threshold
    sqrt(2-2t); both approximate retrievers must surface every planted
    pair, and on the overlap the two engines' metrics must satisfy the
    identity."""
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.similarity import \
        cosine_near_dups_banded
    from big_data_assignment_2_spark.sources.io import load_table

    em = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = em.count()
    dup = em.select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.transform("embedding",
                    lambda x, i: F.when(i == 0, x * F.lit(1.01)).otherwise(x))
        .cast("array<float>").alias("embedding"))
    vectors = em.unionByName(dup).cache()
    planted = {(i, i + n) for i in range(n)}

    thr = 0.99
    ours = {(r["vec_a"], r["vec_b"]) for r in cosine_near_dups_banded(
        vectors, threshold=thr, rows_per_band=8, bands=4).collect()}

    feats = (vectors.select("vec_id",
                            array_to_vector(F.col("embedding").cast("array<double>"))
                            .alias("raw")))
    feats = Normalizer(inputCol="raw", outputCol="features", p=2.0) \
        .transform(feats)
    brp = BucketedRandomProjectionLSH(inputCol="features", outputCol="hashes",
                                      numHashTables=8, bucketLength=0.3,
                                      seed=7)
    model = brp.fit(feats)
    d_thr = math.sqrt(2.0 - 2.0 * thr)
    sim = model.approxSimilarityJoin(feats, feats, d_thr, distCol="dist")
    ml_pairs = {}
    for r in sim.collect():
        a, b = r["datasetA"]["vec_id"], r["datasetB"]["vec_id"]
        if a < b:
            ml_pairs[(a, b)] = r["dist"]

    # both retrievers recover (nearly) all planted near-dups
    assert len(planted - ours) <= 0.05 * n
    assert len(planted - set(ml_pairs)) <= 0.05 * n
    # metric identity d^2 = 2 - 2c on the planted overlap: our cosine at
    # 0.99+ must match ml's euclidean distance through the identity
    cos = {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in cosine_near_dups_banded(
        vectors, threshold=thr, rows_per_band=8, bands=4).collect()}
    checked = 0
    for pair in (planted & ours & set(ml_pairs)):
        c_implied = 1.0 - ml_pairs[pair] ** 2 / 2.0
        assert abs(c_implied - cos[pair]) < 1e-4
        checked += 1
    assert checked >= 0.9 * n

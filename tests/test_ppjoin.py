"""PPJoin length + positional filters (Xiao et al. WWW'08 §3.2):
candidate pruning is real on an adversarial small-vocabulary corpus and
provably lossless — the verified pair set is identical with and without
the filters."""

from __future__ import annotations

import random

from big_data_assignment_2_spark.operators.dedup import (
    df_ordered_token_arrays, ppjoin_candidates, prefix_jaccard_pairs)

THRESH = 0.8


def _adversarial_docs(spark):
    """200 docs drawn from a 12-word vocabulary: every prefix token is
    globally common, so the bare prefix filter admits a large fraction of
    all pairs — the regime that measured 54 s @ sf1 pre-filter."""
    vocab = [f"w{i}" for i in range(12)]
    rng = random.Random(9)
    rows = []
    for d in range(200):
        k = rng.randint(4, 12)
        rows.append((d, " ".join(rng.sample(vocab, k))))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_filters_shrink_candidates(spark):
    docs = _adversarial_docs(spark)
    ordered = df_ordered_token_arrays(docs)
    loose = ppjoin_candidates(ordered, THRESH, ppjoin_filters=False).count()
    tight = ppjoin_candidates(ordered, THRESH, ppjoin_filters=True).count()
    # The corpus has ~19.9k ordered pairs; the bare prefix filter admits
    # thousands, the PPJoin filters must cut them by well over half.
    assert tight < loose / 2, (tight, loose)
    ordered.unpersist()


def test_filters_are_lossless_adversarial(spark):
    docs = _adversarial_docs(spark)
    with_f = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
              prefix_jaccard_pairs(docs, THRESH).collect()}
    without = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
               prefix_jaccard_pairs(docs, THRESH,
                                    ppjoin_filters=False).collect()}
    assert with_f == without
    assert with_f  # the corpus genuinely contains qualifying pairs


def test_filters_are_lossless_harness_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_f = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
              prefix_jaccard_pairs(docs, 0.9).collect()}
    without = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
               prefix_jaccard_pairs(docs, 0.9,
                                    ppjoin_filters=False).collect()}
    assert with_f == without


def test_planted_boundary_pair_survives(spark):
    """A pair at exactly the threshold (J = 8/10 = 0.8) must survive the
    filters; a pair just below (J = 7/11) must not appear."""
    vocab = [f"t{i}" for i in range(20)]
    a = vocab[:9]                       # |A|=9
    b = vocab[1:10]                     # |B|=9, inter=8, union=10 -> 0.8
    c = vocab[:9]                       # |C|=9 vs D: inter=7, union=11
    d = vocab[2:11]
    docs = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c[:8])),
         (4, " ".join(d))],
        "doc_id bigint, text string")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in prefix_jaccard_pairs(docs, THRESH).collect()}
    assert got.get(("1", "2")) == 0.8
    assert ("3", "4") not in got

"""SemDeDup-style semantic dedup (operators/similarity.py r9): planted
duplicates, precedence semantics, and corpus invariants."""

from __future__ import annotations

import math

from big_data_assignment_2_spark.operators.similarity import semdedup

DIM = 8


def _vec(seed, scale=1.0):
    return [round(math.sin(seed * 13 + d * 7) * scale, 3)
            for d in range(DIM)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_planted_duplicate_dropped_keeps_nearest_centroid(spark):
    """Two colinear vectors (cosine 1.0) land in one cluster; the one
    farther from the centroid must drop, the nearer one survives."""
    base = _vec(1)
    far = [x * 3.0 for x in base]         # same direction, farther out
    rows = [(0, base), (1, far),
            (2, _vec(9)), (3, _vec(17)), (4, _vec(25))]
    out = {r["vec_id"]: r for r in
           semdedup(_df(spark, rows), k=2, iters=1, threshold=0.95,
                    dim=DIM).collect()}
    assert len(out) == 5
    zero, one = out[0], out[1]
    if zero["list_id"] == one["list_id"]:
        # exactly one of the colinear pair survives
        assert zero["keep"] != one["keep"]
        survivor = zero if zero["keep"] else one
        loser = one if zero["keep"] else zero
        assert survivor["cdist"] <= loser["cdist"]


def test_cross_cluster_duplicates_not_compared(spark):
    """Identical vectors forced into different clusters are both kept —
    SemDeDup only dedups within a cluster by design."""
    a = [1.0] * DIM
    b = [-1.0] * DIM
    rows = [(0, a), (1, b), (2, a), (3, b)]
    # k=2, init = two lowest ids (a, b) -> clusters split by sign; the
    # copies land with their twins, so each cluster has an identical pair.
    out = {r["vec_id"]: r for r in
           semdedup(_df(spark, rows), k=2, iters=1, threshold=0.99,
                    dim=DIM).collect()}
    assert out[0]["keep"] and out[1]["keep"]          # cluster heads
    assert not out[2]["keep"] and not out[3]["keep"]  # in-cluster twins
    assert out[0]["list_id"] == out[2]["list_id"]
    assert out[1]["list_id"] == out[3]["list_id"]


def test_determinism_and_schema(spark, sf_dir):
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    r1 = sorted(map(tuple, semdedup(em, k=4, iters=1, threshold=0.4,
                                    dim=64).collect()))
    r2 = sorted(map(tuple, semdedup(em, k=4, iters=1, threshold=0.4,
                                    dim=64).collect()))
    assert r1 == r2
    assert len(r1) == em.count()
    kept = sum(1 for t in r1 if t[3])
    assert 0 < kept <= len(r1)


def test_threshold_one_keeps_non_identical(spark):
    """At threshold 1.0 only exact-direction duplicates drop."""
    rows = [(i, _vec(i * 3 + 1)) for i in range(6)]
    out = semdedup(_df(spark, rows), k=2, iters=1, threshold=1.0,
                   dim=DIM).collect()
    assert all(r["keep"] for r in out)


def test_join_assignment_equals_literal(spark):
    """r12: the broadcast-join argmin (k > LITERAL_ARGMIN_MAX_K) must be
    bit-interchangeable with the literal codegen argmin — same zip_with
    fold, same (d, cid) tie-break — on ties included."""
    import numpy as np
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.similarity import (
        _assign_nearest)

    rng = np.random.RandomState(7)
    rows = [(int(i), [float(x) for x in rng.randn(8)]) for i in range(60)]
    # add exact duplicates of a centroid-to-be so distance ties exist
    rows += [(100, list(rows[3][1])), (101, list(rows[3][1]))]
    v = spark.createDataFrame(rows, "id bigint, v array<double>")
    cent = [r[1] for r in rows[:20]] + [list(rows[3][1])]  # dup centroid -> tie
    lit = {(r["id"]): (r["list_id"], round(r["d"], 9))
           for r in _assign_nearest(v, cent[:16], dist_col="d").collect()}
    # same 16 centroids through the join path: force it by exceeding the
    # threshold with padding centroids FAR away (never win), keeping the
    # argmin over the shared prefix identical
    far = [[1e6 + j] * 8 for j in range(5)]
    jn = {(r["id"]): (r["list_id"], round(r["d"], 9))
          for r in _assign_nearest(v, cent[:16] + far, dist_col="d").collect()}
    assert lit == jn
    # tie-break check at full centroid list (cent[3] == cent[20]): the
    # duplicate ids 100/101 must land on cid 3, never 20
    full = _assign_nearest(v, cent, dist_col="d")
    got = {r["id"]: r["list_id"] for r in full.collect()}
    assert got[100] == 3 and got[101] == 3


def test_semdedup_scaled_k_crosses_join_threshold(spark):
    """semdedup at k > LITERAL_ARGMIN_MAX_K (the join assignment path)
    must agree with a literal-path replay: same keep/drop set computed
    with the threshold monkeypatched high."""
    import numpy as np

    from big_data_assignment_2_spark.operators import similarity as sim

    rng = np.random.RandomState(11)
    rows = [(int(i), [float(x) for x in rng.randn(64)]) for i in range(120)]
    em = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out_join = sorted(map(tuple, sim.semdedup(em, k=20, iters=2,
                                              threshold=0.4).collect()))
    old = sim.LITERAL_ARGMIN_MAX_K
    sim.LITERAL_ARGMIN_MAX_K = 1000
    try:
        out_lit = sorted(map(tuple, sim.semdedup(em, k=20, iters=2,
                                                 threshold=0.4).collect()))
    finally:
        sim.LITERAL_ARGMIN_MAX_K = old
    assert out_join == out_lit


def test_chain_superset_of_pairwise_keep_set(spark, sf_dir):
    """Theorem pin: a pairwise-kept vector has NO above-threshold
    predecessor at all, so the greedy keep-chain (which only drops on a
    SURVIVING predecessor) must keep it too — chain keep-set ⊇ pairwise
    keep-set on the real corpus."""
    from big_data_assignment_2_spark.operators.similarity import (
        semdedup_chain)
    from big_data_assignment_2_spark.sources.io import load_table

    em = load_table(spark, sf_dir, "embeddings")
    pw = {r["vec_id"] for r in
          semdedup(em, k=4, iters=2, threshold=0.4).collect() if r["keep"]}
    ch = {r["vec_id"] for r in
          semdedup_chain(em, k=4, iters=2, threshold=0.4).collect()
          if r["keep"]}
    assert pw <= ch, sorted(pw - ch)[:5]


def test_chain_reinstates_vector_whose_predecessor_dropped(spark):
    """The policy divergence itself: a → b → c where b duplicates a and
    c duplicates only b.  Pairwise precedence drops BOTH b and c (c has
    the nearer-to-centroid neighbor b, dropped or not); the keep-chain
    drops b but re-instates c because its only near-duplicate
    predecessor did not survive."""
    import math as m

    from big_data_assignment_2_spark.operators.similarity import (
        semdedup_chain)

    theta = m.acos(0.96)

    def unit(angle):
        v = [m.cos(angle), m.sin(angle)] + [0.0] * (DIM - 2)
        return [round(x, 6) for x in v]

    # a at 0, b at θ, c at 2θ (cos(a,b)=cos(b,c)=0.96 ≥ t;
    # cos(a,c)=cos 2θ ≈ 0.843 < t); d at −40° drags the centroid toward
    # a so the scan order is a, b, c; decoys far away hold cluster 2.
    rows = [(0, unit(0.0)), (1, unit(theta)), (2, unit(2 * theta)),
            (3, unit(m.radians(-40))),
            (10, [0.0] * (DIM - 1) + [5.0]),
            (11, [0.0] * (DIM - 2) + [0.1, 5.0])]
    df = _df(spark, rows)
    pw = {r["vec_id"]: r["keep"]
          for r in semdedup(df, k=2, iters=2, threshold=0.95,
                            dim=DIM).collect()}
    ch = {r["vec_id"]: r["keep"]
          for r in semdedup_chain(df, k=2, iters=2, threshold=0.95,
                                  dim=DIM).collect()}
    assert pw[0] and ch[0]            # a survives under both policies
    assert not pw[1] and not ch[1]    # b drops under both
    assert not pw[2]                  # pairwise: c drops (b precedes it)
    assert ch[2]                      # chain: c re-instated (b was dropped)

"""Skew mitigation (100 TB concern: one hot key serializes a whole stage).

First line of defense is AQE skew-join splitting (on in session.py) — it
splits oversized partitions at runtime with no code change.  These manual
tools cover what AQE can't:

- ``salted_join``: AQE only splits SORT-MERGE join partitions; when the
  build side must replicate (e.g. a medium dimension too big to broadcast
  but with a hot fact key), salt the fact side with ``hash(row) % S`` and
  replicate the dimension S ways — the hot key fans out over S tasks.
- ``two_phase_agg``: aggregation skew isn't handled by AQE at all.  A
  partial agg on (key, salt) spreads the hot key over S reducers, then the
  tiny (key, salt) partials collapse in a second exact agg.  For algebraic
  aggregates (sum/count/min/max) this is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, on: str, salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated
    ``salt`` ways.  Result is identical to ``fact.join(dim, on, how)``
    for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                         F.lit(salt)).cast("int"))
    d = dim.withColumn("__salt", F.explode(F.array(
        *[F.lit(i) for i in range(salt)])))
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(df: DataFrame, key: str, aggs: dict[str, tuple[str, str]],
                  salt: int = 16) -> DataFrame:
    """Skew-safe exact aggregation for algebraic functions.

    ``aggs`` maps output column → (input column, fn) with fn in
    sum/count/min/max.  Phase 1 aggregates on (key, salt); phase 2 merges
    the ≤``salt`` partials per key (count merges via sum).
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out_col, (_, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{fn} is not algebraic-mergeable")
    salted = df.withColumn("__salt", F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int"))
    phase1 = salted.groupBy(key, "__salt").agg(*[
        getattr(F, fn)(col).alias(out_col)
        for out_col, (col, fn) in aggs.items()])
    phase2 = phase1.groupBy(key).agg(*[
        getattr(F, merge_fn[fn])(out_col).alias(out_col)
        for out_col, (_, fn) in aggs.items()])
    return phase2

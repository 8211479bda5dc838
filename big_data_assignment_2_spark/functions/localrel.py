"""Tiny driver-side relations as pure-JVM inline tables (r17).

``spark.createDataFrame(rows)`` builds a PYTHON-backed RDD relation with
``defaultParallelism`` slices: every scan of it launches a wave of
Python-worker rounds (measured ~0.4-0.7 s per scan on local[32] vs
~0.1 s for an inline-literal relation), and every query that embeds one
— a query-term relation, a 1-row query-id, a cursor — pays that wave
per consumer.  For SMALL, plan-time-known row sets the right shape is a
literal array of structs exploded on a 1-row range: all-JVM, one
partition, no Python workers, codegen-friendly, and trivially
broadcastable.

Semantically identical to ``createDataFrame(rows, schema)`` for the
same rows: field names/types come from the DDL schema (each literal is
cast to its declared field type).  Use ONLY for bounded row sets
(query terms, centroids, tombstone ids, cursors) — never for data that
scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def inline_rows(spark: SparkSession, rows: list[tuple],
                schema: str) -> DataFrame:
    """A small relation as ONE literal inline table (no Python RDD).

    ``schema`` is a DDL string like ``"term string"`` or
    ``"query_id string, term string"``; each value is cast to its
    declared type, so the result's columns match
    ``createDataFrame(rows, schema)``.
    """
    st = StructType.fromDDL(schema)
    if not rows:
        return spark.createDataFrame([], schema)
    # Arity guard (r18 advice): zip() would silently truncate a
    # wrong-arity row where createDataFrame raises — fail loudly instead
    # of handing a buggy caller wrong data.  Input is bounded by
    # contract, so the per-row check is free.
    for i, row in enumerate(rows):
        if len(row) != len(st.fields):
            raise ValueError(
                f"inline_rows: row {i} has {len(row)} values for "
                f"{len(st.fields)}-field schema {schema!r}")
    structs = [
        F.struct(*[
            F.lit(v).cast(f.dataType).alias(f.name)
            for v, f in zip(row, st.fields)
        ])
        for row in rows
    ]
    return (spark.range(1)
            .select(F.explode(F.array(*structs)).alias("__r"))
            .select(*[F.col(f"__r.{f.name}").alias(f.name)
                      for f in st.fields]))

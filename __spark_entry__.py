"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 query end-to-end at sf0.001;
``queries()`` / ``oracle_sql()`` expose every declared operator from
SURVEY.md §2 (+ the extension surface) with DuckDB oracle twins.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_assignment_2_spark.plans import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 over the sf0.001 documents corpus —
    the reference's whole pipeline (index build + search) as one plan."""
    from big_data_assignment_2_spark.plans.search_queries import q_bm25_topk

    return q_bm25_topk(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for each query (omitted ⇒ rows-only check)."""
    return all_oracles()

"""Query registry: every implemented operator from SURVEY.md §2 (and the
extension surface) declared as a ``(spark, sf_dir) -> DataFrame`` callable
with a DuckDB ANSI-SQL oracle twin.

Each family module exposes ``QUERIES: dict[str, callable]`` and
``ORACLES: dict[str, str]``; :func:`all_queries` / :func:`all_oracles` merge
them for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict = {}
    for mod in _family_modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for mod in _family_modules():
        out.update(mod.ORACLES)
    return out


def _family_modules():
    from . import search_queries
    mods = [search_queries]
    for name in ("relational_queries", "window_queries", "sql_queries",
                 "dedup_queries", "similarity_queries", "text_queries",
                 "streaming_queries", "multimodal_queries"):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods

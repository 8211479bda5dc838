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
    return _prioritized(_interleaved([m.QUERIES for m in _family_modules()]))


def all_oracles() -> dict[str, str]:
    return _prioritized(_interleaved([m.ORACLES for m in _family_modules()]))


def _family_modules():
    # Family list order: never-driver-verified families (round 1 gate cut)
    # lead; the proven search/relational/window families close the list.
    mods = []
    for name in ("dedup_queries", "similarity_queries", "text_queries",
                 "streaming_queries", "multimodal_queries", "source_queries",
                 "skew_queries", "events_queries", "graph_queries",
                 "sql_queries",
                 "search_queries", "relational_queries", "window_queries"):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods


def _interleaved(dicts: list[dict]) -> dict:
    """Round-robin across the family dicts (intra-family order preserved):
    the external correctness driver walks queries() in dict order under a
    budget, so ANY prefix cut covers every family roughly evenly instead
    of silently dropping whole late families (the round-1 failure mode,
    where everything after position 50 got no correctness row)."""
    out: dict = {}
    iters = [iter(d.items()) for d in dicts]
    while iters:
        alive = []
        for it in iters:
            try:
                k, v = next(it)
            except StopIteration:
                continue
            out[k] = v
            alive.append(it)
        iters = alive
    return out


# Promoted ahead of the proven-green tail so they are verified even under a
# tight driver budget: round-1 rows fixed this round (first four) and
# queries NEW this round that live in late-registry families.
_PROMOTED = ("search_postings", "rel_scalar_json", "rel_scalar_map",
             "rel_approx_distinct", "rel_join_full", "rel_approx_quantiles",
             "rel_explode_outer", "search_index_merge", "win_distribution",
             "rel_profile_orders",
             # never reached by the round-1 gate (sat past its 50-entry cut)
             "sql_string_funcs", "sql_case_buckets", "sql_percentile",
             # new in round 2, late-registry families
             "rel_global_rank", "events_zscore_outliers",
             # flagship heavies: a hard row for these matters most
             "search_bm25_topk", "dedup_minhash_near", "dedup_clusters",
             "sim_cosine_near_dups")


def _prioritized(entries: dict) -> dict:
    head = {k: entries[k] for k in _PROMOTED if k in entries}
    head.update(entries)
    return head

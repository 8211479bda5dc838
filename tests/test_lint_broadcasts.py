"""Broadcast-hint governance (VERDICT r16 #1 + #5).

Two layers: the AST lint proves every literal ``F.broadcast`` in the
package is allowlisted with a bounded-by-definition justification (or
lives in hints.py), and the hint helpers are pinned BOTH ways — hinted
under the gate, bare above it — so a refactor can't silently re-commit a
corpus-scaled relation to a broadcast plan.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from big_data_assignment_2_spark.hints import (
    broadcast_if_small, broadcast_if_source_small, plan_size_bytes)
from big_data_assignment_2_spark.sources.io import load_table


def test_no_unjustified_broadcast_literals():
    sys.path.insert(0, ".")
    from tools.lint_broadcasts import run
    problems = run()
    assert problems == [], "\n".join(problems)


def _hinted(df) -> bool:
    return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()


def test_broadcast_if_small_both_ways(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    assert plan_size_bytes(c) > 0
    assert _hinted(broadcast_if_small(c))            # under the gate
    assert not _hinted(broadcast_if_small(c, gate_bytes=1))  # above it
    # and the gated plan actually broadcasts under the gate
    li = load_table(spark, sf_dir, "lineitem")
    plan = (li.join(broadcast_if_small(c), li.l_orderkey == c.c_custkey)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_broadcast_if_source_small_both_ways(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from big_data_assignment_2_spark.functions.text import tokenize
    dfreq = (docs.select(F.explode(tokenize("text")).alias("term"))
             .groupBy("term").agg(F.count("*").alias("df")))
    # the gate reads the SOURCE size, not the derived relation's estimate
    assert _hinted(broadcast_if_source_small(dfreq, docs))
    assert not _hinted(broadcast_if_source_small(dfreq, docs, gate_bytes=1))

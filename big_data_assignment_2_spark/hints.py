"""Size-gated broadcast hints.

A literal ``F.broadcast(rel)`` is a plan commitment: Spark will build and
ship ``rel`` to every executor no matter how big it turns out to be.  That
is right for relations that are bounded *by definition* (a 1-row stats
aggregate, an n_queries-bounded query set, the 5-row region table) and
wrong for relations that scale with the corpus — a vocabulary/document-
frequency table has billions of distinct terms at web scale, and an
SF-scaled TPC-H dimension (customer, supplier, part) is only "small"
at bench scale.  Hinting those turns a 100× scale-up into a driver OOM
instead of letting AQE demote the join to shuffle from observed sizes.

These helpers keep the hint where it provably helps and drop it where it
would lie:

- :func:`broadcast_if_small` gates on the relation's own Catalyst static
  size estimate — accurate for scans and scan+filter trees, which is what
  the TPC-H dimension sites are.
- :func:`broadcast_if_source_small` gates a *derived* relation (distinct
  vocabulary, per-term df, distinct fingerprint keys) on the size of the
  base relation it derives from, because Catalyst's static estimate for
  an aggregate output is unreliable while the source scan's is exact and
  bounds the derived size from above.

Above the gate both return the relation un-hinted: the join key shuffle
that produced the derived relation gives AQE exact runtime sizes, so the
broadcast still happens when (and only when) it actually fits.  Every
OTHER ``F.broadcast`` literal in this package must be bounded by
definition and is enforced by ``tools/lint_broadcasts.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Gate for relations whose static estimate is trusted directly (scans and
# filtered scans): aligned with the session autoBroadcastJoinThreshold so
# "hinted" and "auto-broadcastable" mean the same thing — the hint only
# pins the decision where filter selectivity would otherwise make the
# optimizer guess.
DIM_GATE_BYTES = 64 * 1024 * 1024

# Gate for vocabulary-class derived relations, applied to the SOURCE
# corpus: a distinct-term relation of a <=256 MB corpus is at most a few
# million rows (Heaps' law) == tens of MB serialized — comfortably under
# the executor broadcast budget.  Past this, no static claim is safe and
# AQE decides from the runtime size of the aggregate's own shuffle output.
VOCAB_SOURCE_GATE_BYTES = 256 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's static size estimate (bytes) for the relation — exact
    for parquet scans (file footer sizes), conservative upward for most
    derived trees.  Driver-side only; runs no job."""
    return int(str(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes()))


def broadcast_if_small(df: DataFrame,
                       gate_bytes: int = DIM_GATE_BYTES) -> DataFrame:
    """Broadcast-hint ``df`` only when its own static size estimate is
    under the gate (use for scans / filtered scans of SF-scaled tables:
    customer, supplier, part).  Above the gate the relation is returned
    bare and AQE picks the join strategy at runtime."""
    if plan_size_bytes(df) <= gate_bytes:
        return F.broadcast(df)
    return df


def broadcast_if_source_small(
        df: DataFrame, source: DataFrame,
        gate_bytes: int = VOCAB_SOURCE_GATE_BYTES) -> DataFrame:
    """Broadcast-hint a corpus-DERIVED relation (vocabulary, per-term df,
    distinct keys) only when the base ``source`` relation it derives from
    is small enough that the derived relation is provably broadcastable.
    The source's scan estimate is an upper bound on any relation of its
    distinct values; the derived relation's own static estimate is not
    trustworthy (aggregates inherit child sizes)."""
    if plan_size_bytes(source) <= gate_bytes:
        return F.broadcast(df)
    return df

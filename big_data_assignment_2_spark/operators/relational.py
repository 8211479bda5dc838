"""Relational operators beyond the reference's surface (SURVEY.md §2.4/§2.6
gap notes: the reference has only three joins-in-disguise — J1-J3 — and no
outer/semi/anti/range/as-of joins, no set ops, no windows).

Most of the family needs no code here: ``df.join(..., how=...)`` covers it
and the declared queries in ``plans/relational_queries.py`` exercise each
category.  This module holds the operators that deserve a scale-aware
implementation of their own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              tolerance: Column | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: for each left row, the single right row with the largest
    ``right_ts <= left_ts`` (direction='backward') within the same ``on`` key.

    Scale-first implementation: a naive ``left ⋈ right ON key AND rts<=lts``
    + argmax explodes quadratically per key (every left row pairs with every
    earlier right row before the argmax prunes).  Instead, union both sides
    tagged, sort once per key by time, and carry the latest right payload
    forward with ``last(..., ignorenulls)`` — one shuffle on ``on``, zero
    row blow-up, identical result.  This is the standard Spark point-in-time
    join pattern (cf. Flink temporal joins / QuestDB ASOF JOIN semantics).

    Right-side ties on ``right_ts`` resolve to the row latest in the sort —
    with the tag ordering below, the largest payload tuple; declared-query
    oracles mirror that with ``ORDER BY rts DESC, payload DESC`` + rn=1.
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    payload = F.struct(F.col(right_ts).alias("__rts"),
                       *[F.col(c) for c in right_cols])

    l = left.select(F.col(on), F.col(left_ts).alias("__t"),
                    F.lit(1).alias("__side"), F.lit(None).cast(
                        right.select(payload).schema[0].dataType).alias("__p"),
                    F.struct(*[F.col(c) for c in left.columns]).alias("__l"))
    r = right.select(F.col(on), F.col(right_ts).alias("__t"),
                     F.lit(0).alias("__side"), payload.alias("__p"),
                     F.lit(None).cast(l.schema["__l"].dataType).alias("__l"))

    # Right rows sort before left rows at equal timestamps so a right row at
    # exactly left_ts is visible (<=); among equal-ts right rows the payload
    # struct orders them and `last` keeps the greatest.
    w = (Window.partitionBy(on)
         .orderBy(F.col("__t"), F.col("__side"), F.col("__p"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (l.unionByName(r)
               .withColumn("__match", F.last("__p", ignorenulls=True).over(w))
               .filter(F.col("__side") == 1))
    if tolerance is not None:
        carried = carried.withColumn(
            "__match",
            F.when(F.col("__match.__rts") >= F.col("__t") - tolerance,
                   F.col("__match")))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__match.{c}").alias(c) for c in right_cols]
    return carried.select(*out_cols)


def global_rank(df: DataFrame, order_cols: list[Column],
                rank_col: str = "rank", partitions: int | None = None) -> DataFrame:
    """Total-order enumeration WITHOUT the single-partition window trap.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY plans a
    window over ONE partition — every row funnels through a single task,
    the textbook scale killer.  This operator produces the identical rank
    with bounded per-task work:

    1. ``repartitionByRange`` on the sort keys (Spark samples range
       boundaries), then ``sortWithinPartitions`` — partition *i* holds a
       contiguous, locally-sorted slice of the total order.
    2. ``monotonically_increasing_id`` encodes (partition id << 33) +
       record position — a documented layout — so the partition-local
       position falls out of the low 33 bits with no further shuffle.
    3. Per-partition counts (a tiny agg, one row per partition) turn into
       cumulative offsets with a window over that driver-sized relation;
       a broadcast join adds each row's offset to its local position.

    One full-data range shuffle + one broadcast join, vs. the naive plan's
    all-data-on-one-task sort.  ``order_cols`` must total-order the data
    (include a unique tiebreaker) or ranks among ties are arbitrary.
    """
    n = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    local = (df.repartitionByRange(int(n), *order_cols)
             .sortWithinPartitions(*order_cols)
             .withColumn("__pid", F.spark_partition_id())
             .withColumn("__pos", F.monotonically_increasing_id()
                         .bitwiseAND(F.lit((1 << 33) - 1))))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # One row per partition: a window over it is driver-sized by
    # construction, not a data-volume single-partition sort.
    w = (Window.orderBy("__pid")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = counts.withColumn(
        "__off", F.sum("__n").over(w) - F.col("__n")).drop("__n")
    return (local.join(F.broadcast(offsets), "__pid")
            .withColumn(rank_col, (F.col("__off") + F.col("__pos") + 1)
                        .cast("bigint"))
            .drop("__pid", "__pos", "__off"))


def global_cumsum(df: DataFrame, order_cols: list[Column], value_col: str,
                  cum_col: str = "cum", partitions: int | None = None) -> DataFrame:
    """Inclusive running sum of ``value_col`` over a TOTAL order, without the
    single-partition window trap (same scale story as :func:`global_rank`).

    1. ``repartitionByRange`` on the sort keys → partition *i* holds a
       contiguous slice of the total order.
    2. A window partitioned by the physical partition id computes the
       LOCAL running sum — per-task work is one partition's rows, never
       the whole relation.
    3. Per-partition totals (one row per partition) become cumulative
       offsets via a window over that driver-sized relation, broadcast
       back and added.

    ``order_cols`` must total-order the data (unique tiebreaker) or the
    running sum among ties is arbitrary.
    """
    n = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    local = (df.repartitionByRange(int(n), *order_cols)
             .withColumn("__pid", F.spark_partition_id()))
    w_local = (Window.partitionBy("__pid").orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = local.withColumn("__lcum", F.sum(value_col).over(w_local))
    totals = local.groupBy("__pid").agg(F.sum(value_col).alias("__n"))
    w = (Window.orderBy("__pid")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = totals.withColumn(
        "__off", F.sum("__n").over(w) - F.col("__n")).drop("__n")
    return (local.join(F.broadcast(offsets), "__pid")
            .withColumn(cum_col,
                        (F.col("__off") + F.col("__lcum")).cast("bigint"))
            .drop("__pid", "__lcum", "__off"))


def top_k_per_group(df: DataFrame, partition_cols: list[str],
                    order_cols: list[Column], k: int) -> DataFrame:
    """Grouped top-k via row_number — the distributed replacement for the
    reference's driver-side ``takeOrdered`` (T1) when a per-group limit is
    needed.  Spark plans a partial sort per partition; no global sort."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))

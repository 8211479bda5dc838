"""SparkSession factory tuned for the test harness and for scale.

Local mode here is ``local[N]`` single-JVM; the conf is chosen so the same
code runs unchanged on a multi-executor cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), broadcast threshold explicit,
shuffle partitions sized to the harness.  At 100 TB you'd raise
``spark.sql.shuffle.partitions`` (or rely on AQE coalescing from a high
initial number) and set ``spark.sql.files.maxPartitionBytes`` so scan tasks
stay ~128-256 MB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bda2-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
        # ones, demote/promote join strategies from observed sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Dimension tables (region/nation/supplier, query-term relations)
        # must broadcast — never sort-merge a 5-row table at 100 TB.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime row-level filtering: build a bloom filter from the small
        # join side and push it into the big side's scan — at 100 TB this
        # skips most of a fact scan when the dimension filter is selective
        # (complements static partition pruning / DPP).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Arrow for any pandas_udf / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # The harness events table stores TIMESTAMP(NANOS) which the Spark
        # parquet reader rejects; read nanos as long and let sources.io
        # convert to a proper timestamp (floor to micros, as DuckDB does).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
